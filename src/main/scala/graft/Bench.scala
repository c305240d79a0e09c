package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints a detailed JSON line with per-query
  * median seconds (n=3 sweeps), then a compact total-only JSON line as
  * the LAST stdout line (tail-window parsers see the compact one).
  *
  * A short untimed warm-up executes each query once at the smallest scale
  * factor so the timed pass measures query execution, not JVM/codegen/
  * classloader warm-up — the local[32] stand-in for a warmed executor
  * fleet. Queries run in sorted key order for run-to-run comparability.
  *
  * The timed action is a `noop`-format write, not `count()`: a count lets
  * Catalyst drop the contract ORDER BY (EliminateSorts) and prune every
  * unreferenced projection, so expression-heavy queries would time near
  * zero. The noop sink consumes every row and column — full plan cost,
  * no sink I/O.
  *
  * The JSON line goes to stdout (bare — build.sbt routes forked stdout
  * through sbt unprefixed) AND to bench_result.json, so the driver can
  * parse either. */
object Bench {
  /** Runs the full plan: every column is materialized and shipped to the
    * noop sink, so sorts/projections survive optimization and get timed. */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Untimed warm-up at the smallest sf: JIT + codegen + parquet footers.
    val warmDir = "/root/testdata/sf0.001"
    val warmSf =
      if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    names.foreach { n =>
      try exec(SparkEntry.queries(n)(spark, warmSf))
      catch { case _: Throwable => () }
    }

    // a failed query must be VISIBLE in the output (value -1), not
    // recorded as a healthy-looking time-to-crash
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { exec(SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // n timed passes, per-query MEDIAN: sub-second queries swing 2-4x
    // run-to-run (GC, page cache) and a single sample can't separate a
    // plan regression from noise. Passes interleave whole sweeps (not
    // back-to-back repeats) so cache warmth is comparable across queries.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val samples = (1 to runs).map(_ => names.map(n => n -> timeOne(n)).toMap)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map { n =>
      val all = samples.map(_(n))
      // ANY failed sweep marks the query failed (-1): medianing only the
      // successful runs would report an intermittently-crashing query as
      // a healthy-looking time
      n -> (if (all.exists(_ < 0)) -1.0 else median(all))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Belt and braces: persist the same line where the driver (or a human)
    // can read it even if stdout gets wrapped by the build tool.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_result.json"), json + "\n")
    catch { case _: Throwable => () }
    // The detailed line above is ~4 KB and the driver's tail window can
    // start mid-line (BENCH_r01/r02 both parsed null). This compact
    // total-only line is printed LAST so any tail parser catches it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}

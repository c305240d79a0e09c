package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: `runMain graft.Explain <queryKey> [sfDir]`
  * prints the formatted physical plan of one declared query — the
  * `.explain("formatted")` loop the build rule asks for, runnable
  * without a REPL (sbt console swallows forked stdout). */
object Explain {
  def main(args: Array[String]): Unit = {
    // --time <queryKey> [sfDir] [n]: per-sample wall times (bench
    // prints only the trimmed mean — regressions hide in the spread)
    val timeMode = args.headOption.contains("--time")
    val rest = if (timeMode) args.drop(1) else args
    val name = rest.headOption.getOrElse(
      sys.error("usage: Explain [--time] <queryKey> [sfDir] [n]"))
    val sfDir =
      if (rest.length > 1) rest(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (timeMode) {
      val n = if (rest.length > 2) rest(2).toInt else 5
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      (1 to n).foreach(i => println(f"TIME $name sample $i: ${once()}%.3f s"))
      spark.stop(); return
    }
    val df = SparkEntry.queries(name)(spark, sfDir)
    // stdout arrives bare (build.sbt StdoutOutput), greppable by marker
    println("=== EXPLAIN " + name + " ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("=== END EXPLAIN ===")
    spark.stop()
  }
}

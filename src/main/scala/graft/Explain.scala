package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: `runMain graft.Explain <queryKey> [sfDir]`
  * prints the formatted physical plan of one declared query — the
  * `.explain("formatted")` loop the build rule asks for, runnable
  * without a REPL (sbt console swallows forked stdout). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: Explain <queryKey> [sfDir]"))
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Sessions.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // stdout arrives bare (build.sbt StdoutOutput), greppable by marker
    println("=== EXPLAIN " + name + " ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    println("=== END EXPLAIN ===")
    spark.stop()
  }
}

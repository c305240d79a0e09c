package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (UTC, small shuffle fan-out). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.configure(SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated synthetic tables
  * (`TESTDATA.md`): TPC-H-ish star schema + events/documents/embeddings.
  *
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes
  * filters/projections into the parquet reader (row-group skipping +
  * column pruning) — at 100 TB the scan is the dominant cost and the
  * pushdown is what keeps it proportional to the query, not the table.
  */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. The session must carry
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at construction —
    * see [[Sessions.configure]]); the loader then converts the raw nanos
    * to a microsecond TIMESTAMP_NTZ — the same truncation DuckDB applies,
    * so oracle parity holds. The loader itself is side-effect-free. */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

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
  /** `events.ts` normalizes to microsecond TIMESTAMP_NTZ whatever the
    * parquet physical type is — the generator has shipped it as both
    * TIMESTAMP(NANOS) (rounds ≤8) and TIMESTAMP(MICROS, not adjusted
    * to UTC) (round 9), and a loader pinned to one layout breaks the
    * moment the data refreshes:
    *  - NANOS rejects Spark's vectorized reader outright, so sessions
    *    carry `spark.sql.legacy.parquet.nanosAsLong=true` from
    *    construction ([[Sessions.configure]] — all in-repo mains/tests
    *    do; the loader idempotently fills it for caller-built sessions
    *    that missed it, and only when genuinely unset — an explicit
    *    caller choice, even "false", is respected) and the raw long
    *    nanos truncate to micros — the same truncation DuckDB applies;
    *  - MICROS arrives as a timestamp already (NTZ under the default
    *    inference; cast is then a no-op normalization).
    * Either way downstream sees the identical TIMESTAMP_NTZ column, so
    * oracle parity holds across data layouts. */
  def events(s: SparkSession, d: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!org.apache.spark.sql.graftbridge.isConfSet(s, k))
      s.conf.set(k, "true")
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Every loader above, by its table name — the catalog face's source
    * of truth (events included, with its nanos→NTZ normalization). */
  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "region" -> region _, "nation" -> nation _, "customer" -> customer _,
    "supplier" -> supplier _, "part" -> part _, "orders" -> orders _,
    "lineitem" -> lineitem _, "events" -> events _,
    "documents" -> documents _, "embeddings" -> embeddings _)

  /** Ad-hoc SQL entry face (reference `README.md:21` — the declared
    * query surface is analysts typing SQL against warehouse tables):
    * registers every lake table as a session temp view, so
    * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")` works
    * verbatim. Views are LAZY — registration reads only parquet
    * schemas; scans/pushdown happen per-query exactly as through the
    * loaders, because a temp view IS the loader's logical plan, not a
    * materialization. Idempotent (createOrReplace), so re-pointing a
    * session at a different scale dir is one call. */
  def registerViews(s: SparkSession, sfDir: String): Unit = {
    SqlCompat.register(s)
    all.foreach { case (name, load) =>
      load(s, sfDir).createOrReplaceTempView(name)
    }
  }
}

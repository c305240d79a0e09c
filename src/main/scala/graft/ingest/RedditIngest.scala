package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** The canonical post row (SURVEY §1.1/§1.2): the typed face of the
  * ingest path for callers who want compile-time field checks. */
case class RedditPost(
    id: String, title: String, score: Int, num_comments: Int,
    author: String, created_utc: Option[java.sql.Timestamp], url: String,
    over_18: Boolean, edited: Boolean, spoiler: Boolean, stickied: Boolean)

/** The reference's entire ingest/transform surface (SURVEY.md §2.1–§2.2,
  * Tier A), re-expressed as declarative Column expressions so the whole
  * extract→cleanse→sink pipeline fuses into one whole-stage-codegen pass —
  * the Spark equivalent of the reference's O(1)-memory generator pipelining
  * (reference `etls/reddit_etl.py:43-59,106-116`,
  * `ARCHITECTURE_EVOLUTION.md:17-25`).
  *
  * No UDFs: every line of the reference's `transform_post`
  * (`etls/reddit_etl.py:63-85`) maps to built-in expressions (SURVEY §2.2),
  * which keeps the battery codegen'd and pushdown-friendly at any scale.
  */
object RedditIngest {

  /** Contract schema + column order (reference `etls/reddit_etl.py:22`,
    * legacy copy `utils/constants.py:28-41`). */
  val PostFields: Seq[String] = Seq(
    "id", "title", "score", "num_comments", "author", "created_utc",
    "url", "over_18", "edited", "spoiler", "stickied")

  /** Canonical post-cleanse schema (SURVEY §1.2). */
  val CleanSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("score", IntegerType),
    StructField("num_comments", IntegerType),
    StructField("author", StringType),
    StructField("created_utc", TimestampType),
    StructField("url", StringType),
    StructField("over_18", BooleanType),
    StructField("edited", BooleanType),
    StructField("spoiler", BooleanType),
    StructField("stickied", BooleanType)))

  /** Golden-CSV read schema: the committed files use the legacy naive
    * timestamp format, parsed as UTC (SURVEY §1.5). */
  val GoldenCsvSchema: StructType = CleanSchema

  /** A3 source-level projection with null padding: keep exactly
    * `PostFields`; absent attributes become NULL columns
    * (reference `etls/reddit_etl.py:55`). */
  def project(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    df.select(PostFields.map(f =>
      if (present(f)) col(f) else lit(null).as(f)): _*)
  }

  /** The A10–A15 cleansing battery (reference `etls/reddit_etl.py:63-85`).
    * Accepts raw columns of any type (`try_cast` instead of Python's
    * throwing casts — the reference aborts the whole run on a bad cell,
    * `etls/reddit_etl.py:130-132`; at engine scale a null-safe cast with
    * defaults is the correct semantics).
    *
    *  - A10 epoch seconds → UTC timestamp (null/absent stays null)
    *  - A11 int cast, None→0 (`int(x or 0)`)
    *  - A12 string cast, None/''→'Unknown' (`str(x or 'Unknown')`)
    *  - A13 trim, None→'' (`str(x or '').strip()`)
    *  - A14 bool coerce, None→false
    *  - A15 `edited` tri-state: PRAW yields a bool or an edit *timestamp*;
    *    only literal booleans pass, anything else → false
    *    (`etls/reddit_etl.py:82-83`, SURVEY §7.5-1)
    */
  def cleanse(df: DataFrame, onError: String = "skip"): DataFrame = {
    require(onError == "skip" || onError == "abort",
      s"onError must be skip|abort, got $onError")
    // `abort` = the reference's error_handling contract (a bad cell fails
    // the run, etls/reddit_etl.py:130-132 + config etl_settings): a
    // non-null cell whose cast fails raises from inside the codegen'd
    // expression. `skip` (default) null-safes to the field default — the
    // engine-scale semantics.
    def orRaise(c: String, t: String): Column =
      if (onError == "skip") lit(null).cast(t)
      else when(col(c).isNotNull, raise_error(
        concat(lit(s"[abort] malformed $c: "), col(c).cast("string")))
          .cast(t))
    def intOrZero(c: String): Column =
      coalesce(expr(s"try_cast($c as int)"), orRaise(c, "int"), lit(0)).as(c)
    def boolOrFalse(c: String): Column =
      coalesce(expr(s"try_cast($c as boolean)"), orRaise(c, "boolean"),
        lit(false)).as(c)
    val editedStr = lower(col("edited").cast("string"))
    project(df).select(
      col("id").cast("string").as("id"),
      trim(coalesce(col("title").cast("string"), lit(""))).as("title"),
      intOrZero("score"),
      intOrZero("num_comments"),
      when(col("author").isNull || col("author").cast("string") === "",
        lit("Unknown")).otherwise(col("author").cast("string")).as("author"),
      coalesce(expr("try_cast(created_utc as double)"),
        orRaise("created_utc", "double")).cast("timestamp").as("created_utc"),
      col("url").cast("string").as("url"),
      boolOrFalse("over_18"),
      // `edited` stays tri-state in both modes: PRAW legitimately yields
      // an edit timestamp there, which coerces to false, never aborts
      when(editedStr.isin("true", "false"), editedStr.cast("boolean"))
        .otherwise(lit(false)).as("edited"),
      boolOrFalse("spoiler"),
      boolOrFalse("stickied"))
  }

  /** Typed view of a cleansed frame (SURVEY §2.6-2): `Dataset[RedditPost]`
    * carries the schema in the type system — the property-test surface and
    * the API for type-safe downstream `map`/`filter` logic. Encoders are
    * Catalyst-native, so this stays columnar until a lambda forces
    * deserialization. */
  def toTyped(cleansed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[RedditPost] = {
    val spark = cleansed.sparkSession
    import spark.implicits._
    cleansed.as[RedditPost]
  }

  /** A2 server-side top-k: `subreddit.top(limit)` ranked by score
    * (reference `etls/reddit_etl.py:49`). Catalyst plans
    * TakeOrderedAndProject — per-partition heap, k rows to the driver. */
  def topK(df: DataFrame, k: Int): DataFrame =
    df.orderBy(col("score").desc, col("id").asc).limit(k)

  /** §1.4 latest-wins upsert keyed on `id` — the engine-side equivalent of
    * the reference's Redshift MERGE (`README.md:13`). One shuffle on the
    * key; at scale, pre-bucketing the lake by `id` makes this exchange-free. */
  def latestWins(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Read the reference's committed golden CSVs: legacy naive timestamps
    * parsed as UTC, Python-repr booleans (`True`/`False`), RFC-4180
    * quoting (SURVEY §1.5, FIXTURES §1). */
  def readGoldenCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(GoldenCsvSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(path)

  /** A5 CSV sink: header, fixed column order, RFC-4180 quoting
    * (reference `etls/reddit_etl.py:109-116`). ISO-8601 UTC rendering at
    * the boundary matches the current transform contract
    * (`tests/test_reddit_etl.py:30`). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.select(PostFields.map {
        case "created_utc" =>
          date_format(col("created_utc"), "yyyy-MM-dd'T'HH:mm:ssxxx")
            .as("created_utc")
        case f => col(f)
      }: _*)
      .write.mode("overwrite").option("header", "true")
      // Spark's CSV writer trims cell whitespace by default; the reference's
      // Python csv.DictWriter preserves it (RFC-4180 faithful) — match that.
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** A1 end-to-end: the landed paged API dump (`graft-paged` DataSourceV2,
    * one file per fetched page — the offline face of the reference's lazy
    * paged generator, `etls/reddit_etl.py:43-59`) parsed and cleansed into
    * the canonical schema. Payload parsing is `from_json` over permissive
    * string fields; [[cleanse]] applies the A10–A15 battery. A downstream
    * `.limit(n)` pushes into the source and stops opening pages once
    * enough are read — the "stop asking the API" behavior, preserved
    * through the whole pipeline because every step here is narrow. */
  def fromPagedDir(spark: SparkSession, dir: String,
                   pageSize: Option[Int] = None,
                   onError: String = "skip"): DataFrame = {
    val rawSchema = StructType(PostFields.map(f => StructField(f, StringType)))
    val reader = spark.read.format("graft-paged")
    val paged = pageSize.map(p => reader.option("pageSize", p.toString))
      .getOrElse(reader).load(dir)
    cleanse(paged
      .select(from_json(col("value"), rawSchema).as("j"))
      .select("j.*"), onError)
  }

  /** Streaming face of [[fromPagedDir]]: a `graft-paged` readStream over
    * the landing directory — newly fetched pages are parsed and cleansed
    * incrementally as they land, turning the reference's daily Airflow
    * rerun into a continuously running pipeline. Compose with
    * [[graft.streaming.StreamingOps.upsertStreamPartitioned]] for the
    * full extract→cleanse→merge DAG. */
  def fromPagedStream(spark: SparkSession, dir: String,
                      onError: String = "skip"): DataFrame = {
    val rawSchema = StructType(PostFields.map(f => StructField(f, StringType)))
    cleanse(spark.readStream.format("graft-paged").load(dir)
      .select(from_json(col("value"), rawSchema).as("j"))
      .select("j.*"), onError)
  }

  /** Config-driven ingest — the reference's `config.conf` contract wired
    * end-to-end (`utils/constants.py`): `etl_settings.batch_size` is the
    * landing page size (drives the paged source's limit-pushdown math),
    * `error_handling` selects the cleanse mode, `file_paths.output_path`
    * receives the CSV. Returns the ingested row count (observed during
    * the write — one pass). */
  def ingestWithConfig(spark: SparkSession, cfg: graft.Config.GraftConfig,
                       pagedDir: String): Long = {
    val etl = cfg.etlSettings
    val cleansed = fromPagedDir(spark, pagedDir,
      Some(etl.batchSize), etl.errorHandling)
    val obs = new org.apache.spark.sql.Observation()
    writeCsv(cleansed.observe(obs, count(lit(1)).as("rows")),
      cfg.filePaths.outputPath)
    obs.get("rows").asInstanceOf[Long]
  }

  /** A8 atomic extract→transform→load fusion (reference
    * `etls/reddit_etl.py:87-132`): one action over one pipelined plan —
    * no intermediate materialization, mirroring the reference's
    * single-task design rationale (`ARCHITECTURE_EVOLUTION.md:30-44`). */
  def ingest(raw: DataFrame, outPath: String, limit: Option[Int] = None): Long = {
    val cleansed = cleanse(raw)
    val limited = limit.map(topK(cleansed, _)).getOrElse(cleansed)
    // A7 row-count accumulator (reference `etls/reddit_etl.py:112-117`)
    // via observe() — counted during the write, no second pass.
    val obs = new org.apache.spark.sql.Observation()
    writeCsv(limited.observe(obs, count(lit(1)).as("rows")), outPath)
    obs.get("rows").asInstanceOf[Long]
  }
}

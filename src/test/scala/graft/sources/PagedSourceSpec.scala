package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.sources.paged.PagedSource

/** Tier A1: the offline paged source — lazy page iteration, limit
  * pushdown (page pruning visible in the plan), incremental streaming. */
class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def landPages(dir: String, pages: Int, rows: Int,
                        from: Int = 0): Unit =
    (from until pages).foreach { p =>
      val body = (0 until rows)
        .map(r => s"""{"id":${p * rows + r},"page":$p}""").mkString("\n")
      Files.writeString(Paths.get(dir, f"page-$p%05d.jsonl"), body + "\n")
    }

  test("batch read: every landed page, one row per line, page ids intact") {
    val dir = Files.createTempDirectory("graft_paged").toString
    landPages(dir, pages = 3, rows = 10)
    val df = spark.read.format("graft-paged").load(dir)
    assert(df.count() == 30)
    assert(df.select("page").distinct().collect().map(_.getLong(0)).toSet
      == Set(0L, 1L, 2L))
    // payload round-trips through from_json — transport vs parse split
    val parsed = df.select(from_json(col("value"),
      org.apache.spark.sql.types.DataType.fromDDL("struct<id:bigint,page:bigint>"))
      .as("j")).select("j.id")
    assert(parsed.agg(max("id")).first().getLong(0) == 29L)
  }

  test("limit pushdown prunes pages: only the needed prefix is opened") {
    val dir = Files.createTempDirectory("graft_paged_lim").toString
    landPages(dir, pages = 5, rows = 10)
    val df = spark.read.format("graft-paged")
      .option("pageSize", "10").load(dir).limit(7)
    PagedSource.pagesOpened.set(0)
    assert(df.count() == 7)
    assert(PagedSource.pagesOpened.get() == 1,
      "LIMIT 7 with pageSize 10 must open exactly one page file")
    // the pushed limit is visible in the physical plan's scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=7"), s"plan must show the push: $plan")
  }

  test("limit pruning validates the pageSize contract: short pages fall back to more") {
    // extractor landed 4-line pages under a DECLARED pageSize of 10: a
    // blind ceil(n/ps) prefix would plan 1 page (4 rows) and LIMIT 7
    // would silently return 4 — planning counts lines and extends the
    // prefix until the limit is covered.
    val dir = Files.createTempDirectory("graft_paged_short").toString
    landPages(dir, pages = 5, rows = 4)
    val df = spark.read.format("graft-paged")
      .option("pageSize", "10").load(dir).limit(7)
    assert(df.count() == 7,
      "LIMIT must deliver n rows even when pages under-fill the declared pageSize")
  }

  test("fromPagedDir: landed API pages parse + cleanse end-to-end with pushdown") {
    val dir = Files.createTempDirectory("graft_paged_ingest").toString
    (0 until 3).foreach { p =>
      val body = (0 until 10).map { r =>
        val i = p * 10 + r
        s"""{"id":"p$i","title":"  t$i  ","score":"$i","author":"","created_utc":"1710000000","over_18":"true","edited":"1699999999.0"}"""
      }.mkString("\n")
      Files.writeString(Paths.get(dir, f"page-$p%05d.jsonl"), body + "\n")
    }
    val df = graft.ingest.RedditIngest.fromPagedDir(spark, dir, Some(10))
    // cleanse's defaults tighten nullability — compare names + types
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == graft.ingest.RedditIngest.CleanSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r = df.filter(col("id") === "p0").first()
    assert(r.getAs[String]("title") == "t0", "A13 trim applied")
    assert(r.getAs[String]("author") == "Unknown", "A12 default applied")
    assert(r.getAs[Boolean]("over_18"), "A14 coercion applied")
    assert(!r.getAs[Boolean]("edited"), "A15 tri-state: timestamp -> false")
    assert(r.getAs[Int]("num_comments") == 0, "A11 absent -> 0")
    assert(df.count() == 30)
    // the limit pushes through parse+cleanse into the source
    PagedSource.pagesOpened.set(0)
    assert(df.limit(5).count() == 5)
    assert(PagedSource.pagesOpened.get() == 1,
      "limit must reach the paged scan through the narrow pipeline")
  }

  test("error_handling: abort raises on a malformed cell, skip defaults it") {
    val dir = Files.createTempDirectory("graft_paged_err").toString
    Files.writeString(Paths.get(dir, "page-00000.jsonl"),
      """{"id":"ok","score":"5"}
        |{"id":"bad","score":"not-a-number"}
        |""".stripMargin)
    val skip = graft.ingest.RedditIngest.fromPagedDir(spark, dir)
    assert(skip.filter(col("id") === "bad").first().getAs[Int]("score") == 0,
      "skip mode: malformed int -> default 0")
    val abort = graft.ingest.RedditIngest.fromPagedDir(
      spark, dir, onError = "abort")
    val e = intercept[Exception] { abort.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("malformed score")),
      s"abort mode must raise from the bad cell: ${msgs(e)}")
  }

  test("ingestWithConfig honors batch_size, error_handling, output_path") {
    val dir = Files.createTempDirectory("graft_paged_cfg").toString
    landPages(dir, pages = 2, rows = 5)  // payloads: {"id":N,"page":P}
    val out = Files.createTempDirectory("graft_cfg_out").toString + "/posts"
    val cfg = graft.Config.parse(
      s"""[etl_settings]
         |batch_size = 5
         |error_handling = skip
         |[file_paths]
         |output_path = $out
         |""".stripMargin)
    val n = graft.ingest.RedditIngest.ingestWithConfig(spark, cfg, dir)
    assert(n == 10)
    val back = graft.ingest.RedditIngest.readGoldenCsv(spark, out)
    assert(back.count() == 10)
    assert(back.select("score").collect().forall(_.getInt(0) == 0),
      "absent score cleanses to 0 through the configured pipeline")
  }

  test("streaming detects a landing-order violation instead of re-delivering") {
    val dir = Files.createTempDirectory("graft_paged_order").toString
    // deliberately NON-padded names: 'page-2' sorts after 'page-10'
    Files.writeString(Paths.get(dir, "page-2.jsonl"), "a\nb\n")
    val q = spark.readStream.format("graft-paged").load(dir)
      .writeStream.format("memory").queryName("paged_order")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("paged_order").count() == 2)
    // lands BEFORE the consumed page in sort order -> indexes shift
    Files.writeString(Paths.get(dir, "page-10.jsonl"), "c\nd\n")
    val e = intercept[Exception] { q.processAllAvailable() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("landing-order violation")),
      s"must fail loudly, not silently re-deliver: ${msgs(e).take(3)}")
    q.stop()
  }

  test("streaming restart from checkpoint: no page re-delivered or skipped") {
    // the offset json round-trip ("pages:lastPage") is the risk: a
    // restarted query must resume exactly after the consumed prefix
    val dir = Files.createTempDirectory("graft_paged_restart").toString
    val sink = Files.createTempDirectory("graft_paged_rsink").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_paged_rckpt").toString
    landPages(dir, pages = 2, rows = 10)
    def start() = spark.readStream.format("graft-paged").load(dir)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // kill between micro-batches
    assert(spark.read.parquet(sink).count() == 20)
    // pages land while the query is DOWN; the restart must deliver
    // exactly these from the deserialized "2:page-00001.jsonl" offset
    landPages(dir, pages = 4, rows = 10, from = 2)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(sink)
    assert(rows.count() == 40, "each page delivered exactly once across restart")
    assert(rows.select("page").distinct().count() == 4, "no page skipped")
    val dup = rows.groupBy("page", "value").count()
      .filter(col("count") > 1).count()
    assert(dup == 0, "no line re-delivered after restart")
  }

  test("micro-batch streaming consumes pages incrementally, exactly once") {
    val dir = Files.createTempDirectory("graft_paged_stream").toString
    landPages(dir, pages = 2, rows = 10)
    val q = spark.readStream.format("graft-paged").load(dir)
      .writeStream.format("memory").queryName("paged_out")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("paged_out").count() == 20)
    // land two more pages while the query runs — picked up incrementally
    landPages(dir, pages = 4, rows = 10, from = 2)
    q.processAllAvailable()
    val rows = spark.table("paged_out")
    assert(rows.count() == 40, "new pages must be ingested incrementally")
    assert(rows.select("page").distinct().count() == 4)
    // exactly-once per page: no line duplicated across micro-batches
    assert(rows.select("value").distinct().count() == 40)
    q.stop()
  }
}

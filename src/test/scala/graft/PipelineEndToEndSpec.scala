package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.RedditIngest
import graft.sources.Lake

/** Capstone: the reference's whole production loop, end-to-end on its own
  * golden data — daily CSV drops → cleanse → date-partitioned lake →
  * latest-wins upsert view → ad-hoc SQL (reference `README.md:12-21`:
  * extract/transform → S3 lake → Redshift upsert → Athena queries). */
class PipelineEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def res(name: String) =
    getClass.getResource(s"/golden/$name").toString

  test("daily drops -> lake -> upsert view -> ad-hoc query") {
    // 1. ingest each daily drop (the Airflow task body, A8)
    val days = Seq("20240308", "20240309", "20240311").map { d =>
      RedditIngest.readGoldenCsv(spark, res(s"reddit_$d.csv"))
        .withColumn("snapshot_ts",
          to_timestamp(lit(d), "yyyyMMdd"))
    }
    val landed = days.reduce(_ unionByName _)

    // 2. land in a date-partitioned lake (the S3 raw/ zone, A6)
    val lakePath = java.nio.file.Files
      .createTempDirectory("graft_e2e_lake").toString
    Lake.writeDatePartitioned(landed, "snapshot_ts", lakePath)
    val lake = Lake.readDatePartitioned(spark, lakePath)
    assert(lake.select("p_date").distinct().count() == 3)

    // 3. latest-wins upsert view (the Redshift MERGE, README.md:13)
    val current = RedditIngest.latestWins(lake, Seq(col("p_date").desc))
    assert(current.count() == current.select("id").distinct().count())
    val row = current.filter(col("id") === "1b9ba5c").collect().head
    assert(row.getAs[Int]("score") == 79) // 03-09 metrics won

    // 4. ad-hoc SQL over the warehouse view (the Athena face, README.md:21)
    current.createOrReplaceTempView("posts")
    val top = spark.sql(
      """SELECT author, CAST(count(*) AS BIGINT) AS posts,
        |       max(score) AS best
        |FROM posts WHERE NOT over_18
        |GROUP BY author ORDER BY posts DESC, author LIMIT 3""".stripMargin)
      .collect()
    assert(top.nonEmpty && top.head.getLong(1) >= 1)
    spark.catalog.dropTempView("posts")
  }

  test("retrying runner: injected first-attempt failure, rerun is idempotent") {
    // the reference DAG's retries=1 contract (dags/reddit_dag.py:16-17):
    // attempt 0 dies MID-WRITE leaving partial junk in the output dir;
    // the retry reruns the same idempotent ingest and must converge to
    // exactly the clean result, junk gone.
    val raw = RedditIngest.readGoldenCsv(spark, res("reddit_20240309.csv"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_retry").toString + "/posts"
    val expected = raw.count()
    var attempts = 0
    val n = Runner.withRetry(retries = 1, onAttempt = a => attempts = a + 1) {
      if (attempts == 1) {
        // transient failure: the extractor died after partially writing
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, "part-junk.csv"), "partial,garbage\n")
        throw new RuntimeException("transient extractor failure")
      }
      RedditIngest.ingest(raw, out)
    }
    assert(attempts == 2, "exactly one retry")
    assert(n == expected, "retry returns the full ingest count")
    val back = RedditIngest.readGoldenCsv(spark, out)
    assert(back.count() == expected,
      "rerun overwrites the failed attempt's partial state completely")
    assert(!new java.io.File(out).listFiles().exists(_.getName == "part-junk.csv"),
      "mode(overwrite) must purge partial junk from the failed attempt")

    // exhausted retries rethrow the LAST failure
    val e = intercept[RuntimeException] {
      Runner.withRetry(retries = 1) {
        throw new RuntimeException("permanent failure")
      }: Unit
    }
    assert(e.getMessage == "permanent failure")
  }

  test("continuous DAG: paged landing -> streaming cleanse -> partitioned upsert") {
    // The same production loop as above, but running CONTINUOUSLY: the
    // reference's daily Airflow rerun becomes one always-on incremental
    // pipeline — pages land, the stream parses+cleanses them, and the
    // sink merges latest-wins rewriting only touched key partitions.
    import java.nio.file.{Files, Paths}
    val land = Files.createTempDirectory("graft_dag_land").toString
    val sink = Files.createTempDirectory("graft_dag_sink").toString + "/posts"
    val ckpt = Files.createTempDirectory("graft_dag_ckpt").toString

    def page(n: Int, rows: Seq[String]): Unit =
      Files.writeString(Paths.get(land, f"page-$n%05d.jsonl"),
        rows.mkString("", "\n", "\n"))
    def post(id: String, score: Int, utc: Long) =
      s"""{"id":"$id","title":"t-$id","score":"$score","author":"a","created_utc":"$utc"}"""

    page(0, Seq(post("x1", 10, 1710000000L), post("x2", 20, 1710000000L)))
    val q = graft.streaming.StreamingOps.upsertStreamPartitioned(
      RedditIngest.fromPagedStream(spark, land),
      keyCol = "id", sinkPath = sink, checkpoint = ckpt,
      numBuckets = 4, tsCol = "created_utc")
    q.processAllAvailable()
    assert(spark.read.parquet(sink).count() == 2)

    // a later page re-delivers x1 with fresher metrics -> latest wins
    page(1, Seq(post("x1", 99, 1710086400L), post("x3", 30, 1710000000L)))
    q.processAllAvailable()
    q.stop()
    val byId = spark.read.parquet(sink).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap
    assert(byId == Map("x1" -> 99, "x2" -> 20, "x3" -> 30),
      s"continuous upsert must hold the newest snapshot per id: $byId")
  }

  test("graft.Daily main: one execution date lands idempotently — the " +
      "second invocation leaves the lake byte-identical") {
    import java.nio.file.{Files, Paths}
    val land = Files.createTempDirectory("graft_daily_land").toString
    val lake = Files.createTempDirectory("graft_daily_lake").toString + "/posts"
    def post(id: String, score: Int) =
      s"""{"id":"$id","title":"t-$id","score":"$score","author":"a","created_utc":"1710000000"}"""
    Files.writeString(Paths.get(land, "page-00000.jsonl"),
      Seq(post("d1", 5), post("d2", 7), post("d3", 9))
        .mkString("", "\n", "\n"))

    // the main itself (arg parsing + run), embedded in the live session
    Daily.main(Array("2024-03-09", land, lake))
    def state(): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(lake))
        .filter(f => f.getName.endsWith(".parquet"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          f.getPath.stripPrefix(lake) ->
            md.digest(Files.readAllBytes(f.toPath)).map("%02x".format(_))
              .mkString
        }.toMap
    }
    val first = state()
    assert(first.nonEmpty, "first run must land parquet buckets")
    assert(spark.read.parquet(lake).count() == 3)

    // the reference DAG's safety property: a scheduler rerun of the same
    // execution date re-asserts the same (key, ts) facts — the merge
    // must converge, not duplicate or churn
    Daily.main(Array("2024-03-09", land, lake))
    assert(spark.read.parquet(lake).count() == 3,
      "rerun must not duplicate rows")
    assert(state().values.toSeq.sorted == first.values.toSeq.sorted,
      "rerun must leave the lake content byte-identical")

    // a LATER date's landing dir with fresher metrics wins; the earlier
    // rerun proved convergence, this proves the merge still moves forward
    val land2 = Files.createTempDirectory("graft_daily_land2").toString
    Files.writeString(Paths.get(land2, "page-00000.jsonl"),
      post("d1", 99) + "\n")
    Daily.main(Array("2024-03-10", land2, lake))
    val scores = spark.read.parquet(lake).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap
    assert(scores == Map("d1" -> 99, "d2" -> 7, "d3" -> 9), s"got $scores")

    intercept[IllegalArgumentException] { Daily.main(Array("nope")) }
  }

  test("Daily.backfill: two missed dates drain in ONE AvailableNow " +
      "invocation, byte-identical to two sequential Daily.run calls") {
    import java.nio.file.{Files, Paths}
    def post(id: String, score: Int) =
      s"""{"id":"$id","title":"t-$id","score":"$score","author":"a","created_utc":"1710000000"}"""
    // day 1 lands b1/b2; day 2 re-delivers b1 with fresher metrics and
    // adds b3 — the overlap is the case where drain-vs-sequential could
    // diverge if the merge path weren't shared
    val land1 = Files.createTempDirectory("graft_bf_land1").toString
    val land2 = Files.createTempDirectory("graft_bf_land2").toString
    Files.writeString(Paths.get(land1, "page-00000.jsonl"),
      Seq(post("b1", 5), post("b2", 7)).mkString("", "\n", "\n"))
    Files.writeString(Paths.get(land2, "page-00000.jsonl"),
      Seq(post("b1", 99), post("b3", 30)).mkString("", "\n", "\n"))

    // per-bucket-directory sorted content hashes: part-file names embed a
    // random write UUID, so "byte-identical lake" means each bucket holds
    // the same file CONTENTS, not the same file names
    def state(lake: String): Map[String, Seq[String]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(lake))
        .filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath.stripPrefix(lake))
        .map { case (bucket, fs) =>
          bucket -> fs.map { f =>
            val md = java.security.MessageDigest.getInstance("MD5")
            md.digest(Files.readAllBytes(f.toPath)).map("%02x".format(_))
              .mkString
          }.sorted
        }
    }

    // reference path: the scheduler ran both days normally
    val seqLake = Files.createTempDirectory("graft_bf_seq").toString + "/posts"
    Daily.run(spark, "2024-03-09", land1, seqLake)
    Daily.run(spark, "2024-03-10", land2, seqLake)

    // catch-up path: both days were missed, one drain recovers them
    val bfLake = Files.createTempDirectory("graft_bf_bf").toString + "/posts"
    val ckpt = Files.createTempDirectory("graft_bf_ckpt").toString
    Daily.backfill(spark,
      Seq("2024-03-09" -> land1, "2024-03-10" -> land2), bfLake, ckpt)

    val byId = spark.read.parquet(bfLake).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Int]("score")).toMap
    assert(byId == Map("b1" -> 99, "b2" -> 7, "b3" -> 30),
      s"drained lake must hold the newest execution date per key: $byId")
    assert(state(bfLake) == state(seqLake),
      "one AvailableNow drain must leave the lake byte-identical to " +
        "sequential Daily.run calls (same merge code path)")

    // the CLI verb drives the same drain (orchestrators shell out)
    val cliLake = Files.createTempDirectory("graft_bf_cli").toString + "/posts"
    val cliCkpt = Files.createTempDirectory("graft_bf_cckpt").toString
    Daily.main(Array("backfill", cliLake, cliCkpt,
      s"2024-03-09=$land1", s"2024-03-10=$land2"))
    assert(state(cliLake) == state(seqLake),
      "CLI backfill verb must produce the same lake")
    intercept[IllegalArgumentException] {
      Daily.main(Array("backfill", cliLake, cliCkpt, "no-equals-sign"))
    }
    intercept[IllegalArgumentException] { Daily.main(Array("backfill")) }
  }
}

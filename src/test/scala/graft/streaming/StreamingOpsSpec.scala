package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

case class Pv(probe: Long, embedding: Array[Float])

case class Dc(doc_id: Long, text: String)

/** §2.4 streaming suite over MemoryStream (no oracle — DuckDB can't replay
  * streams): tumbling/sliding/session windows, watermark late-data drop,
  * stateful dedup. Deterministic via processAllAvailable(). */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  private def runToTable(df: org.apache.spark.sql.DataFrame, name: String,
                         mode: OutputMode = OutputMode.Append()) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q.processAllAvailable()
    q
  }

  test("stream-static enrichment joins each batch against the dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val mem = MemoryStream[Ev]
    val q = runToTable(
      StreamingOps.enrichStream(mem.toDF(), dim, "user_id"), "enrich_out")
    mem.addData(
      Ev(1, t("10:00"), 1, "view", 1.0),
      Ev(2, t("10:05"), 2, "view", 2.0),
      Ev(3, t("10:06"), 7, "view", 3.0)) // no dim row -> left-join null
    q.processAllAvailable()
    mem.addData(Ev(4, t("10:10"), 1, "click", 4.0)) // second batch joins too
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich_out")
      .select("event_id", "segment").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows == Map(1L -> Some("gold"), 2L -> Some("silver"),
      3L -> None, 4L -> Some("gold")))
  }

  test("tumbling window counts + watermark drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runToTable(StreamingOps.tumblingCounts(mem.toDF(), "1 hour", "1 hour"),
      "tumbling_out")
    // batch 1: two events in hour 10, one in hour 11
    mem.addData(
      Ev(1, t("10:05"), 1, "view", 1.0),
      Ev(2, t("10:55"), 2, "view", 2.0),
      Ev(3, t("11:10"), 1, "click", 3.0))
    q.processAllAvailable()
    // batch 2: advance watermark far past hour 10 (wm = 14:00 - 1h)
    mem.addData(Ev(4, t("14:00"), 3, "view", 4.0))
    q.processAllAvailable()
    // batch 3: a late event for hour 10 — behind the watermark, dropped
    mem.addData(Ev(5, t("10:30"), 9, "view", 100.0))
    q.processAllAvailable()
    // close remaining windows
    mem.addData(Ev(6, t("20:00"), 3, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling_out")
      .select("ws", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 2L, 3.0)),
      s"hour-10 view count wrong (late row must be dropped): $rows")
    assert(rows.contains(("2024-01-01 11:00:00.0", "click", 1L, 3.0)))
  }

  test("sliding windows produce overlapping buckets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runToTable(
      StreamingOps.slidingCounts(mem.toDF(), "1 hour", "15 minutes", "1 hour"),
      "sliding_out")
    mem.addData(Ev(1, t("10:20"), 1, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(2, t("15:00"), 1, "view", 1.0)) // advance watermark
    q.processAllAvailable()
    mem.addData(Ev(3, t("23:00"), 1, "view", 1.0))
    q.processAllAvailable()
    val buckets = spark.table("sliding_out")
      .filter("event_type = 'view' and ws < timestamp'2024-01-01 11:00:00'")
      .collect().map(_.getTimestamp(0).toString).toSet
    q.stop()
    // 10:20 falls in 4 sliding buckets: 09:30, 09:45, 10:00, 10:15
    assert(buckets == Set("2024-01-01 09:30:00.0", "2024-01-01 09:45:00.0",
      "2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0"))
  }

  test("session window closes after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runToTable(
      StreamingOps.sessionCounts(mem.toDF(), "30 minutes", "1 hour"),
      "session_out")
    // user 1: events at 10:00, 10:10 (one session), then 12:00 (new session)
    mem.addData(
      Ev(1, t("10:00"), 1, "view", 1.0),
      Ev(2, t("10:10"), 1, "view", 1.0),
      Ev(3, t("12:00"), 1, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(4, t("20:00"), 2, "view", 1.0)) // close everything
    q.processAllAvailable()
    val sessions = spark.table("session_out").filter("user_id = 1")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(3)))
      .toSet
    q.stop()
    assert(sessions == Set(("2024-01-01 10:00:00.0", 2L),
      ("2024-01-01 12:00:00.0", 1L)))
  }

  test("dropDuplicatesWithinWatermark dedups replayed event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = runToTable(
      StreamingOps.dedupWithinWatermark(mem.toDF(), "1 hour"), "dedup_out")
    mem.addData(
      Ev(1, t("10:00"), 1, "view", 1.0),
      Ev(1, t("10:00"), 1, "view", 1.0)) // same-batch duplicate
    q.processAllAvailable()
    mem.addData(Ev(1, t("10:01"), 1, "view", 1.0)) // replay in later batch
    q.processAllAvailable()
    mem.addData(Ev(2, t("10:30"), 2, "click", 2.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").collect()
      .map(_.getAs[Long]("event_id")).toSeq.sorted
    q.stop()
    assert(ids == Seq(1L, 2L))
  }

  test("file-source streaming ingests incrementally (§2.4 unbounded ingest)") {
    // The reference's framing: an unbounded source consumed one page at a
    // time (etls/reddit_etl.py:53-55). Spark-native: a file-source stream
    // picks up files as they land.
    val dir = java.nio.file.Files.createTempDirectory("graft_filestream").toString
    // watermarks require TIMESTAMP (with local tz) — the oracle-parity NTZ
    // loader output is cast back for the streaming path
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    batch.limit(100).write.mode("overwrite").parquet(dir + "/drop1")
    // the stream watches a glob over landed files
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir + "/drop*/")
    val q = StreamingOps.tumblingCounts(stream, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("file_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // land a second batch; the running query ingests it incrementally
    batch.limit(300).write.mode("overwrite").parquet(dir + "/drop2")
    q.processAllAvailable()
    q.stop()
    assert(q.recentProgress.map(_.numInputRows).sum == 400,
      "stream must have consumed both file drops incrementally")
  }

  test("foreachBatch upsert sink applies latest-wins merges per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/table"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.upsertStream(mem.toDF(), "event_id", sink, ckpt)
    mem.addData(
      Ev(1, t("10:00"), 1, "view", 1.0),
      Ev(2, t("10:05"), 2, "view", 2.0))
    q.processAllAvailable()
    // batch 2: event 1 re-arrives with a newer ts and new value → replaces
    mem.addData(Ev(1, t("11:00"), 1, "click", 9.0))
    q.processAllAvailable()
    q.stop()
    val table = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(table.size == 2)
    assert(table(1L) == ("click", 9.0), "newest row must win")
    assert(table(2L) == ("view", 2.0))
  }

  test("streaming upsert and batch mergeInto interoperate on one bucketed table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft_interop").toString + "/table"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_interop_ck").toString
    // stream writes the table (and its bucket marker)
    val mem = MemoryStream[Ev]
    val q = StreamingOps.upsertStreamPartitioned(
      mem.toDF(), "event_id", sink, ckpt, numBuckets = 8)
    mem.addData((1L to 10L).map(i => Ev(i, t("10:00"), i, "view", i.toDouble)): _*)
    q.processAllAvailable(); q.stop()
    // batch MERGE into the same table: same layout, same marker
    val updates = Seq(Ev(3L, t("12:00"), 3, "click", 42.0)).toDF()
    graft.sources.Lake.mergeInto(updates, sink, "event_id", "ts", numBuckets = 8)
    val table = spark.read.parquet(sink)
    assert(table.count() == 10)
    assert(table.filter($"event_id" === 3L).first().getAs[String]("event_type")
      == "click", "batch merge latest-wins over stream-written rows")
    // wrong modulus is rejected by BOTH faces
    intercept[IllegalArgumentException] {
      graft.sources.Lake.mergeInto(updates, sink, "event_id", "ts", numBuckets = 16)
    }
    val mem2 = MemoryStream[Ev]
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_interop_ck2").toString
    val q2 = StreamingOps.upsertStreamPartitioned(
      mem2.toDF(), "event_id", sink, ckpt2, numBuckets = 16)
    mem2.addData(Ev(99L, t("13:00"), 99, "view", 1.0))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    def msgs(tt: Throwable): Seq[String] =
      if (tt == null) Nil else Option(tt.getMessage).toSeq ++ msgs(tt.getCause)
    assert(msgs(err).exists(_.contains("bucketed with 8")),
      s"mismatched stream must fail the batch loudly: ${msgs(err).take(3)}")
    assert(spark.read.parquet(sink).count() == 10,
      "failed mismatched batch must not have written anything")
  }

  test("AvailableNow drains a pre-landed backlog in bounded batches, then terminates") {
    import spark.implicits._
    // backlog: three file drops landed BEFORE the stream starts — the
    // reference's catchup=False skips these (dags/reddit_dag.py:24); the
    // backfill face replays them in bounded micro-batches and stops
    val base = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    val dir = base + "/backlog"
    val sink = base + "/table"
    val ckpt = base + "/ck"
    Seq(Ev(1L, t("10:00"), 1, "view", 1.0), Ev(2L, t("10:01"), 2, "view", 2.0))
      .toDF().write.parquet(dir + "/d1")
    Seq(Ev(3L, t("10:02"), 3, "view", 3.0)).toDF().write.parquet(dir + "/d2")
    Seq(Ev(1L, t("11:00"), 1, "click", 9.0)).toDF().write.parquet(dir + "/d3")
    val schema = Seq.empty[Ev].toDF().schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // bound each micro-batch
      .parquet(dir + "/d*/")
    val nBatches = StreamingOps.drainBacklog(
      stream, "event_id", sink, ckpt, numBuckets = 4)
    // terminated on its own (drainBacklog returned), drained in BOUNDED
    // batches (one file each), and the merge result is latest-wins
    assert(nBatches >= 3,
      s"maxFilesPerTrigger=1 over 3 drops must take >= 3 batches, got $nBatches")
    val table = spark.read.parquet(sink)
    assert(table.count() == 3)
    assert(table.filter($"event_id" === 1L).first()
      .getAs[String]("event_type") == "click",
      "the later backlog file's row must win the merge")
    // a second drain over the SAME checkpoint is a no-op (nothing new)
    val again = StreamingOps.drainBacklog(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(dir + "/d*/"), "event_id", sink, ckpt, numBuckets = 4)
    assert(spark.read.parquet(sink).count() == 3,
      s"re-drain must not duplicate or rewrite (ran $again batches)")
  }

  test("upsert crash recovery: completed __tmp is installed, partial __tmp is discarded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (a) a crash AFTER the tmp write completed but BEFORE the swap:
    // sink absent, __tmp holds a committed table (_SUCCESS) — the next
    // batch must install it, not treat the sink as empty.
    val base = java.nio.file.Files.createTempDirectory("graft_recover").toString
    val sinkA = base + "/a"
    Seq(Ev(7, t("09:00"), 7, "old", 7.0)).toDF()
      .write.parquet(sinkA + "__tmp")
    val memA = MemoryStream[Ev]
    val qA = StreamingOps.upsertStream(memA.toDF(), "event_id", sinkA,
      base + "/ckptA")
    memA.addData(Ev(8, t("10:00"), 8, "new", 8.0))
    qA.processAllAvailable(); qA.stop()
    val idsA = spark.read.parquet(sinkA).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(idsA == Set(7L, 8L), "committed __tmp rows must survive recovery")

    // (b) a crash MID-write on the very first batch: sink absent, __tmp
    // has task files but no _SUCCESS — installing it would wedge every
    // later read; it must be discarded and the sink rebuilt from the
    // incoming batch.
    val sinkB = base + "/b"
    val tmpB = new java.io.File(sinkB + "__tmp/_temporary/0")
    tmpB.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sinkB + "__tmp/part-00000"), "not parquet")
    val memB = MemoryStream[Ev]
    val qB = StreamingOps.upsertStream(memB.toDF(), "event_id", sinkB,
      base + "/ckptB")
    memB.addData(Ev(9, t("10:00"), 9, "new", 9.0))
    qB.processAllAvailable(); qB.stop()
    val idsB = spark.read.parquet(sinkB).select("event_id")
      .collect().map(_.getLong(0)).toSet
    assert(idsB == Set(9L), "partial __tmp must be discarded, sink rebuilt")
  }

  test("continuous corpus dedup: store condemns later copies, replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("dedup_stream").toString
    val (sig, sink, ckpt) = (s"$root/sigs", s"$root/sink", s"$root/ckpt")
    // distinct texts share no 3-gram shingles; copies are exact
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    val tC = "red orange yellow green blue indigo violet ultraviolet"
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupDocStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", sig, sink, ckpt)
    // batch 0: internal dup (11 copies 10) -> 10 and 12 survive
    mem.addData((10L, tA), (11L, tA), (12L, tB))
    q.processAllAvailable()
    // batch 1: 20 copies the STORED tA (condemned by signatures alone),
    // 21 is new -> only 21 survives
    mem.addData((20L, tA), (21L, tC))
    q.processAllAvailable()
    q.stop()
    def survivors = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(10L, 12L, 21L))
    // replay batch 1 (same id, same data — the crash-before-commit path):
    // state must converge to the same survivors, no duplicates
    StreamingOps.dedupDocBatch(
      Seq((20L, tA), (21L, tC)).toDF("doc_id", "text"), 1L,
      "doc_id", "text", sig, sink)
    assert(survivors == Set(10L, 12L, 21L),
      "replayed batch must overwrite its own partition, not append")
    // and the signature store matches the survivor set exactly
    val sigIds = spark.read.parquet(s"$sig/batch=0", s"$sig/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sigIds == Set(10L, 12L, 21L))
  }

  test("continuous NEAR-dup serving equals the batch q103 path: planted " +
      "near-dups of stored docs are condemned by signatures alone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    val (sig, sink, ckpt) = (s"$root/sigs", s"$root/sink", s"$root/ckpt")
    // 30 stored docs, 40 unique tokens each (disjoint vocabularies, so
    // cross-doc Jaccard is 0); a near-dup that edits ONE token keeps
    // J = (s-2)/(s+2) = 36/40 = 0.9 over word-3-gram shingle sets
    def text(d: Int) = (0 until 40).map(j => s"w${d}_$j").mkString(" ")
    def nearDup(d: Int) = // last token edited -> NEAR, not exact
      ((0 until 39).map(j => s"w${d}_$j") :+ "zzz").mkString(" ")
    val corpus = (0 until 30).map(d => (d.toLong, text(d)))
    val increment = (60 until 70).map(d => (d.toLong, text(d))) ++
      Seq((9003L, nearDup(3)), (9007L, nearDup(7)),     // vs store
        (9100L, text(80)), (9101L, nearDup(80)))         // within batch
    val mem = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupDocStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", sig, sink, ckpt)
    mem.addData(corpus: _*)
    q.processAllAvailable()
    mem.addData(increment: _*)
    q.processAllAvailable()
    q.stop()
    // the batch q103 path on the SAME data: store = signatures of the
    // batch-0 survivors, increment dedups against it
    val store = graft.operators.Dedup.minhashSignatures(
      spark.read.parquet(s"$sink/batch=0"), "doc_id", "text")
    val expected = graft.operators.Dedup.minhashIncremental(
        increment.toDF("doc_id", "text"), "doc_id", "text", store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val streamed = spark.read.parquet(s"$sink/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == expected,
      s"stream must equal the batch incremental path: $streamed vs $expected")
    // the planted near-dups of STORED docs are gone (signature-estimated
    // Jaccard over the store — corpus text never re-read), the planted
    // within-batch near-dup keeps only its smaller id, and the 10
    // genuinely-new docs all survive
    assert(!streamed.contains(9003L) && !streamed.contains(9007L),
      s"near-dups of stored docs must be condemned by signatures: $streamed")
    assert(streamed.contains(9100L) && !streamed.contains(9101L),
      "within-batch near-dup pair keeps the smaller id only")
    assert((60L until 70L).forall(streamed.contains),
      s"novel docs must all survive: $streamed")
  }

  test("PII scrub runs on an unbounded stream: stateless codegen'd " +
      "columns, per-batch output equals the batch scrub") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Privacy's scrub/stats are pure narrow Column expressions, so the
    // SAME calls compose onto a streaming frame with no state, no
    // watermark, no foreachBatch — the shape that scales to an
    // unbounded firehose (cost = the scan) — and must produce exactly
    // the batch pass's bytes
    val rows = Seq(
      (1L, "contact me at alice@example.com today"),
      (2L, "server 10.1.2.3 and backup 192.168.0.1"),
      (3L, "call 555-123-4567 or visit bob@test.org at 8.8.8.8"),
      (4L, "no pii here at all"))
    val mem = MemoryStream[(Long, String)]
    val streamed = graft.operators.Privacy.scrub(
      graft.operators.Privacy.stats(
        mem.toDF().toDF("doc_id", "text"), "text"), "text")
    val q = streamed.writeStream.format("memory")
      .queryName("pii_stream").outputMode("append").start()
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pii_stream")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    val expected = graft.operators.Privacy.scrub(
        graft.operators.Privacy.stats(
          rows.toDF("doc_id", "text"), "text"), "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    assert(got.toSeq == expected.toSeq,
      s"stream scrub must equal batch scrub:\n$got\nvs\n$expected")
    assert(got(0)._2.contains("<EMAIL>") && got(1)._2.contains("<IP>") &&
      got(2)._2.contains("<PHONE>") && got(3)._2 == "no pii here at all")
  }

  test("dedup backlog drain: AvailableNow processes a landed corpus batch-by-batch, then stops") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedup_drain").toString
    val (in, sig, sink, ckpt) =
      (s"$root/in", s"$root/sigs", s"$root/sink", s"$root/ckpt")
    val tA = "alpha beta gamma delta epsilon zeta eta theta"
    val tB = "one two three four five six seven eight nine"
    // two landed files: the second contains a copy of the first's doc —
    // with maxFilesPerTrigger=1 they arrive as separate micro-batches,
    // so the copy must be condemned by the SIGNATURE STORE, not
    // within-batch comparison
    Seq((1L, tA)).toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f0")
    Seq((2L, tA), (3L, tB)).toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$in/f1")
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(in)
    val q = StreamingOps.dedupDocStream(docs, "doc_id", "text", sig, sink,
      ckpt, Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q.awaitTermination()
    val survivors = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L),
      "the landed copy must be condemned by the store built from earlier batches")
    // drained: a re-run with the same checkpoint finds nothing new
    val q2 = StreamingOps.dedupDocStream(docs, "doc_id", "text", sig, sink,
      ckpt, Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
    q2.awaitTermination()
    assert(spark.read.parquet(sink).count() == 2)
  }

  test("stream-stream interval join correlates events within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = StreamingOps.intervalJoin(
      views.toDF().filter($"event_type" === "view"),
      clicks.toDF().filter($"event_type" === "click"),
      "user_id", horizon = "30 minutes", lateness = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sjoin_out")
      .outputMode("append").start()
    views.addData(Ev(1, t("10:00"), 1, "view", 1.0))
    clicks.addData(
      Ev(100, t("10:10"), 1, "click", 1.0),  // within 30 min -> joins
      Ev(101, t("11:30"), 1, "click", 1.0),  // outside horizon -> no
      Ev(102, t("10:10"), 2, "click", 1.0))  // other user -> no
    q.processAllAvailable()
    // advance both watermarks so results flush in append mode
    views.addData(Ev(2, t("20:00"), 9, "view", 1.0))
    clicks.addData(Ev(103, t("20:00"), 9, "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sjoin_out")
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    q.stop()
    assert(rows.contains((1L, 100L)), s"in-horizon pair must join: $rows")
    assert(!rows.exists(_._2 == 101L), "outside-horizon click must not join")
    assert(!rows.exists(_._2 == 102L), "other user's click must not join")
  }

  test("partitioned upsert rewrites only touched partitions (untouched files byte-identical)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sink = java.nio.file.Files.createTempDirectory("graft_pupsert").toString + "/table"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pckpt").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.upsertStreamPartitioned(
      mem.toDF(), "event_id", sink, ckpt, numBuckets = 8)
    // batch 1: enough keys to populate several buckets
    mem.addData((1L to 40L).map(i =>
      Ev(i, t("10:00"), i, "view", i.toDouble)): _*)
    q.processAllAvailable()

    // snapshot every parquet file: path -> (size, checksum)
    def snapshot(): Map[String, (Long, String)] = {
      val root = java.nio.file.Paths.get(sink)
      val files = java.nio.file.Files.walk(root).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var m = Map.empty[String, (Long, String)]
      files.forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          m += p.toString -> (bytes.length.toLong, md.map("%02x".format(_)).mkString)
        }
      }
      m
    }
    val before = snapshot()
    assert(before.nonEmpty)

    // batch 2: update a single key → exactly one bucket is touched
    mem.addData(Ev(7L, t("12:00"), 7, "click", 99.0))
    q.processAllAvailable()
    q.stop()
    val after = snapshot()

    val touchedBucket = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(7L)),
        org.apache.spark.sql.functions.lit(8))).first().getInt(0)
    val untouchedBefore = before.filter(!_._1.contains(s"__bucket=$touchedBucket"))
    val untouchedAfter = after.filter(!_._1.contains(s"__bucket=$touchedBucket"))
    assert(untouchedBefore == untouchedAfter,
      "files in untouched partitions must be byte-identical (same path, size, checksum)")
    assert(before.keySet.exists(_.contains(s"__bucket=$touchedBucket")),
      "sanity: the touched bucket existed before")

    // merge semantics: latest-wins applied, everything else intact
    val table = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("event_type"), r.getAs[Double]("value"))).toMap
    assert(table.size == 40)
    assert(table(7L) == ("click", 99.0))
    assert(table(8L) == ("view", 8.0))
  }

  test("annServeStream: micro-batched probes return exactly the batch " +
      "searchIndex results, replay rewrites not appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cs = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_ann_stream").toString
    val (idx, sink, ckpt) = (s"$base/idx", s"$base/sink", s"$base/ck")
    graft.operators.Ann.saveIndex(corpus, "id", cs, "cid", "embedding", idx)
    val allProbes = e.filter(col("vec_id").between(4, 9))
      .select(col("vec_id").as("probe"), col("embedding"))
    val rows = allProbes.as[Pv].collect().sortBy(_.probe)
    val (b1, b2) = rows.splitAt(3)
    val mem = MemoryStream[Pv]
    val q = StreamingOps.annServeStream(mem.toDF(), "probe", "embedding",
      idx, sink, ckpt, nprobe = 2, k = 3)
    mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
    mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    q.stop()
    val batchDirs = new java.io.File(sink).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
    assert(batchDirs.length >= 2,
      s"two drains must land two batch directories, got ${batchDirs.toSeq}")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe", "cand", "sim", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3))).toSet
    val expect = graft.operators.Ann.searchIndex(spark, idx, allProbes,
      "probe", "embedding", nprobe = 2, k = 3)
    assert(canon(spark.read.parquet(sink)) == canon(expect),
      "streamed top-k must be value-identical to the one-shot searchIndex")
    // replay: re-running a batch id rewrites its directory, never dups
    StreamingOps.annServeBatch(b1.toIndexedSeq.toDF(), 0L, "probe",
      "embedding", idx, sink, nprobe = 2, k = 3)
    assert(canon(spark.read.parquet(sink)) == canon(expect),
      "a replayed batch must rewrite its own directory idempotently")
  }

  test("semanticServeStream: committed store decides keep/drop, " +
      "deterministic across restart, replay rewrites not appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding"))
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("id"), col("embedding"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_sem_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    graft.operators.Dedup.saveSemanticStore(corpus, "id", "embedding",
      cs, "cid", "embedding", store)
    // a NEW id carrying a committed representative's EXACT vector must
    // drop; a one-hot vector far from every rep must keep
    val storeDir = graft.operators.Dedup.semanticStoreDir(spark, store)
    val repId = spark.read.parquet(s"$storeDir/reps").collect()
      .map(_.getAs[Long]("rep_id")).min
    val repVec = corpus.filter(col("id") === repId)
      .select("embedding").first().getSeq[Float](0).toArray
    val far = Array.tabulate(repVec.length)(i => if (i == 0) 1f else 0f)
    val b1 = Seq(Pv(100001L, repVec), Pv(100002L, far))
    val b2 = corpus.filter(col("id") > repId).limit(3)
      .select((col("id") + 200000L).as("probe"), col("embedding"))
      .as[Pv].collect().toSeq
    val mem = MemoryStream[Pv]
    val q = StreamingOps.semanticServeStream(mem.toDF(), "probe",
      "embedding", store, sink, ck, threshold = 0.9)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def decisions() = spark.read.parquet(sink)
      .select("probe", "cid", "rep_id", "sim", "keep").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    val d1 = decisions()
    assert(d1.size == 5)
    assert(!d1(100001L)._4 && d1(100001L)._3 > 0.99,
      "a clone of a committed representative must drop")
    assert(d1(100002L)._4, "a far one-hot vector must keep")
    // value-identity with the one-shot batch face over the same rows
    val oneShot = graft.operators.Dedup.semanticServeAudit(spark, store,
        (b1 ++ b2).toDF("probe", "embedding"), "probe", "embedding")
      .withColumn("keep", col("sim") < 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    assert(d1 == oneShot,
      "streamed decisions must equal the one-shot store audit")
    // RESTART on the same checkpoint: prior decisions untouched, a new
    // rep clone gets the same drop decision (committed state only)
    val q2 = StreamingOps.semanticServeStream(mem.toDF(), "probe",
      "embedding", store, sink, ck, threshold = 0.9)
    mem.addData(Pv(100003L, repVec)); q2.processAllAvailable()
    q2.stop()
    val d2 = decisions()
    assert(d2.size == 6 && !d2(100003L)._4,
      "post-restart decisions must come from the same committed store")
    assert(d1.forall { case (k, v) => d2(k) == v },
      "a restart must not disturb landed decisions")
    // replay: re-running batch 0 rewrites its directory, never dups
    StreamingOps.semanticServeBatch(b1.toDF(), 0L, "probe", "embedding",
      store, sink, threshold = 0.9)
    assert(decisions() == d2,
      "a replayed batch must rewrite its own directory idempotently")
  }

  test("boilerplateServeStream: cleaning decisions come from the " +
      "COMMITTED span gate, equal the one-shot serve, survive restart, " +
      "and replay rewrites not appends") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_bp_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    val TP = graft.operators.TextPipeline
    TP.saveBoilerplateStore(docs, "doc_id", "text", store)
    val gateDir = TP.boilerplateStoreDir(spark, store)
    val bpSpan = spark.read.parquet(s"$gateDir/spans")
      .orderBy(col("span")).first().getString(0)
    // batch 1: a doc that IS one committed boilerplate span (must clean
    // to nothing) + a fresh-vocabulary doc (gate can't touch it)
    val b1 = Seq(Dc(900001L, bpSpan), Dc(900002L, "zq1 zq2 zq3 zq4"))
    // batch 2: three corpus docs under fresh ids
    val b2 = docs.limit(3)
      .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      .as[Dc].collect().toSeq
    val mem = MemoryStream[Dc]
    val q = StreamingOps.boilerplateServeStream(mem.toDF(), "doc_id",
      "text", store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    def decisions() = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    val d1 = decisions()
    assert(d1.size == 5)
    assert(d1(900001L) == ((1L, 1L, 1.0, 0L)),
      "a doc that is one committed boilerplate span cleans to nothing")
    assert(d1(900002L)._2 == 0L && d1(900002L)._4 != 0L,
      "a fresh-vocabulary doc passes the committed gate untouched")
    // value-identity with the one-shot store-backed serve
    val oneShot = TP.boilerplateServe(spark, store,
        (b1 ++ b2).toDF(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    assert(d1 == oneShot,
      "streamed cleaning must equal the one-shot store serve")
    // RESTART on the same checkpoint: committed state only, prior
    // decisions untouched
    val q2 = StreamingOps.boilerplateServeStream(mem.toDF(), "doc_id",
      "text", store, sink, ck)
    mem.addData(Dc(900003L, bpSpan)); q2.processAllAvailable()
    q2.stop()
    val d2 = decisions()
    assert(d2.size == 6 && d2(900003L) == ((1L, 1L, 1.0, 0L)))
    assert(d1.forall { case (k, v) => d2(k) == v },
      "a restart must not disturb landed decisions")
    // replay: re-running batch 0 rewrites its directory, never dups
    StreamingOps.boilerplateServeBatch(b1.toDF(), 0L, "doc_id", "text",
      store, sink)
    assert(decisions() == d2,
      "a replayed batch must rewrite its own directory idempotently")
  }

  test("winnowServeStream: incoming docs match the COMMITTED corpus " +
      "fingerprint index, equal the one-shot serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_winnow_stream").toString
    val (idx, sink, ck) = (s"$base/idx", s"$base/sink", s"$base/ck")
    graft.operators.Dedup.saveWinnowIndex(corpus, "doc_id", "text", idx)
    // batch: a doc CONTAINING corpus doc 0's full text (shares every
    // run — must match corpus_id 0) + a fresh-vocabulary doc (no match)
    val d0 = corpus.filter(col("doc_id") === 0).first().getString(1)
    val b1 = Seq(Dc(900001L, s"zp1 zp2 $d0 zp3"),
      Dc(900002L, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"))
    val mem = MemoryStream[Dc]
    val q = StreamingOps.winnowServeStream(mem.toDF(), "doc_id", "text",
      idx, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((900001L, 0L)),
      "a doc containing a corpus doc's text must match it")
    assert(!rows.exists(_._1 == 900002L),
      "a fresh-vocabulary doc must match nothing")
    // value-identity with the one-shot store serve
    val oneShot = graft.operators.Dedup.winnowServe(spark, idx,
        b1.toDF(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == oneShot,
      "streamed matches must equal the one-shot index serve")
    // replay rewrites, never dups
    StreamingOps.winnowServeBatch(b1.toDF(), 0L, "doc_id", "text",
      idx, sink)
    assert(spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == rows)
  }

  test("dsirServeStream: micro-batches score against the COMMITTED " +
      "log-ratio table, equal the inline estimate on the reference") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, round}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_dsir_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    graft.operators.TextPipeline.saveDsirStore(docs, "doc_id", "text",
      col("lang") === "en", store)
    // stream three reference docs back through the committed table:
    // scores must equal the inline estimate-and-score on those docs
    val b1 = docs.filter(col("doc_id") < 3)
      .select(col("doc_id"), col("text")).as[Dc].collect().toSeq
    val mem = MemoryStream[Dc]
    val q = StreamingOps.dsirServeStream(mem.toDF(), "doc_id", "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(sink)
      .select(col("doc_id"), col("n_feats"),
        (round(col("logw"), 4) + 0.0).as("logw"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val inline = graft.operators.TextPipeline.dsirLogWeights(
        docs, "doc_id", "text", isTarget = col("lang") === "en")
      .filter(col("doc_id") < 3)
      .select(col("doc_id"), col("n_feats"),
        (round(col("logw"), 4) + 0.0).as("logw"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(streamed.size == 3 && streamed == inline,
      s"store-served scores must equal the inline estimate: " +
        s"$streamed vs $inline")
  }

  test("semanticServeAudit: a rep-less cluster keeps the batch row " +
      "(row-per-batch-row contract) instead of dropping it") {
    import spark.implicits._
    // controlled geometry: every corpus vector sits by c0, so c1
    // attracts zero members at build time and has no rep row — the
    // realistic empty-cluster case with user-supplied centroids
    val corpus = Seq(
      (10L, Array(1f, 0.1f, 0f, 0f)),
      (11L, Array(1f, 0.2f, 0f, 0f)),
      (12L, Array(1f, 0f, 0.1f, 0f))).toDF("id", "embedding")
    val cents = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f))).toDF("cid", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft_sem_repless").toString
    val store = s"$base/store"
    graft.operators.Dedup.saveSemanticStore(corpus, "id", "embedding",
      cents, "cid", "embedding", store)
    val batch = Seq(
      (100L, Array(0f, 1f, 0f, 0f)), // nearest the member-less c1
      (101L, Array(1f, 0.1f, 0f, 0f)) // exact clone of c0's rep (id 10)
    ).toDF("probe", "embedding")
    val rows = graft.operators.Dedup.semanticServeAudit(spark, store,
        batch, "probe", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(rows.size == 2, "one output row per batch row, always")
    assert(rows(100L)._1 == 1L && rows(100L)._2.isEmpty &&
      rows(100L)._3.isEmpty,
      "a rep-less cluster serves (rep_id null, sim null), not a vanish")
    assert(rows(101L)._2.contains(10L))
    // and the streaming keep rule defaults the rep-less row to keep
    StreamingOps.semanticServeBatch(batch, 0L, "probe", "embedding",
      store, s"$base/sink", threshold = 0.9)
    val keep = spark.read.parquet(s"$base/sink")
      .select("probe", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep(100L), "no committed representative => keep by default")
    assert(!keep(101L), "a clone of the committed rep still drops")
  }

  test("saveSemanticStore rebuild: versioned commit — a reader that " +
      "resolved pre-swap keeps a complete old view, the pointer flips " +
      "atomically, older generations reap") {
    import spark.implicits._
    val c0 = Seq((0L, Array(1f, 0f, 0f, 0f))).toDF("cid", "embedding")
    val corpusA = Seq((10L, Array(1f, 0.1f, 0f, 0f)),
      (11L, Array(1f, 0.2f, 0f, 0f))).toDF("id", "embedding")
    val corpusB = Seq((20L, Array(1f, 0.1f, 0f, 0f)))
      .toDF("id", "embedding")
    val store = java.nio.file.Files
      .createTempDirectory("graft_sem_versions").toString + "/store"
    val D = graft.operators.Dedup
    D.saveSemanticStore(corpusA, "id", "embedding", c0, "cid",
      "embedding", store)
    val dir1 = D.semanticStoreDir(spark, store)
    assert(dir1.endsWith("/v1"))
    D.saveSemanticStore(corpusB, "id", "embedding", c0, "cid",
      "embedding", store)
    val dir2 = D.semanticStoreDir(spark, store)
    assert(dir2.endsWith("/v2"))
    // grace: the pre-swap view a slow reader resolved stays complete
    assert(spark.read.parquet(s"$dir1/reps").collect()
      .map(_.getAs[Long]("rep_id")).toSeq == Seq(10L))
    assert(spark.read.parquet(s"$dir2/reps").collect()
      .map(_.getAs[Long]("rep_id")).toSeq == Seq(20L))
    // a third rebuild reaps v1 and keeps v2 as the new grace generation
    D.saveSemanticStore(corpusA, "id", "embedding", c0, "cid",
      "embedding", store)
    assert(D.semanticStoreDir(spark, store).endsWith("/v3"))
    val left = new java.io.File(store).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).toSet
    assert(left == Set("v2", "v3"),
      s"grace window is one generation, got $left")
  }

  test("drift monitor: finalized windows score PSI against the static " +
      "reference — calm window low, shifted window high; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference: values uniform over [0, 10) — built by the helper,
    // every bin present
    val refDf = StreamingOps.referenceHistogram(
      (0 until 100).map(i => i % 10 + 0.5).toDF("v"), "v",
      lo = 0.0, hi = 10.0, bins = 10)
    assert(refDf.count() == 10 &&
      refDf.collect().forall(_.getLong(1) == 10L))
    val sink = java.nio.file.Files
      .createTempDirectory("graft_drift_sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_drift_ckpt").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.driftMonitorStream(mem.toDF(), "value", refDf,
      lo = 0.0, hi = 10.0, bins = 10, sinkPath = sink, checkpoint = ckpt,
      window_ = "1 hour", lateness = "0 seconds")
    try {
      // hour 10: calm — same uniform shape as the reference
      mem.addData((0 until 50).map(i =>
        Ev(i, t("10:%02d".format(i % 50)), i, "view", i % 10 + 0.5)): _*)
      // hour 11: drifted — all mass in the top bin
      mem.addData((0 until 50).map(i =>
        Ev(100 + i, t("11:%02d".format(i % 50)), i, "view", 9.5)): _*)
      // hour 12 sentinel advances the watermark past both windows
      mem.addData(Ev(999, t("12:30"), 1, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(sink).collect()
        .map(r => r.getAs[java.sql.Timestamp]("ws").toString ->
          (r.getAs[Long]("n"), r.getAs[Double]("psi"))).toMap
      assert(rows.size == 2, s"two finalized windows expected: $rows")
      val (nCalm, psiCalm) = rows("2024-01-01 10:00:00.0")
      val (nHot, psiHot) = rows("2024-01-01 11:00:00.0")
      assert(nCalm == 50 && nHot == 50)
      assert(psiCalm < 0.1,
        s"reference-shaped window must read calm, got $psiCalm")
      assert(psiHot > 1.0,
        s"single-bin collapse must read strongly drifted, got $psiHot")
    } finally q.stop()
    // replay: the same batch id written twice rewrites its own
    // directory — the second write must not append
    val win = org.apache.spark.sql.functions.struct(
      org.apache.spark.sql.functions.lit(t("13:00")).as("start"),
      org.apache.spark.sql.functions.lit(t("14:00")).as("end"))
    val fake = Seq((0L, 50L)).toDF("bin", "c").select(win.as("window"),
      $"bin", $"c")
    val bid = new java.io.File(sink).listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).max + 1
    StreamingOps.driftBatch(fake, bid, refDf, 10, sink)
    val once = spark.read.parquet(sink).count()
    StreamingOps.driftBatch(fake, bid, refDf, 10, sink)
    assert(spark.read.parquet(sink).count() == once,
      "a replayed batch id must rewrite, never append")
  }

  test("lmServeStream: micro-batches score against the COMMITTED " +
      "n-gram tables, equal the inline train-and-score, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_lm_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    val train = docs.filter(col("doc_id") < 250)
    graft.operators.TextPipeline.saveLmStore(train, "text", store)
    val b1 = docs.filter(col("doc_id").between(300, 302))
      .select(col("doc_id"), col("text")).as[Dc].collect().toSeq
    val mem = MemoryStream[Dc]
    val q = StreamingOps.lmServeStream(mem.toDF(), "doc_id", "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = spark.read.parquet(sink)
      .select("doc_id", "n_tri", "n_tri_hit", "n_bi_hit", "n_uni",
        "avg_ll")
      .collect().map(key).toMap
    val (uni, bi, tri, nv) =
      graft.operators.TextPipeline.lmCounts(train, "text")
    val inline = graft.operators.TextPipeline.lmScore(
        b1.toDF(), "doc_id", "text", uni, bi, tri, nv)
      .select("doc_id", "n_tri", "n_tri_hit", "n_bi_hit", "n_uni",
        "avg_ll")
      .collect().map(key).toMap
    assert(streamed.size == 3 && streamed == inline,
      s"store-served LM scores must equal inline: $streamed vs $inline")
    // replay rewrites, never dups
    StreamingOps.lmServeBatch(b1.toDF(), 0L, "doc_id", "text",
      store, sink)
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("cmsServeStream: micro-batch tokens estimate against the " +
      "COMMITTED counter matrix, never undercount, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode, expr}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_cms_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    val corpusToks = docs.select(
      explode(expr(graft.operators.TextHashes.toks("text"))).as("tok"))
    graft.operators.Sketches.saveCmsStore(corpusToks, "tok", store)
    val exact = corpusToks.groupBy("tok").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b1 = docs.filter(col("doc_id") < 3)
      .select(col("doc_id"), col("text")).as[Dc].collect().toSeq
    val mem = MemoryStream[Dc]
    val q = StreamingOps.cmsServeStream(mem.toDF(), "doc_id", "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(sink)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, est, _) =>
      assert(est >= exact(t),
        s"$t: served estimate $est undercounts corpus exact ${exact(t)}")
    }
    // replay rewrites, never dups
    StreamingOps.cmsServeBatch(b1.toDF(), 0L, "text", store, sink)
    assert(spark.read.parquet(sink).count() == rows.length)
  }

  test("bloomServeStream: micro-batches screen against the COMMITTED " +
      "filter, equal the one-shot serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, explode, expr, size}
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_bloom_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    def shingles(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(graft.operators.TextHashes.shingleSet("toks")))
          .as("item"))
    graft.operators.Sketches.saveBloomStore(
      shingles(docs.filter(col("doc_id") < 20)).select("item").distinct()
        .withColumnRenamed("item", "s"),
      "s", store)
    // batch: one doc reusing eval doc 0's text (every shingle must
    // flag — the no-false-negative contract) + a fresh-vocabulary doc
    // (flags only by 4096-bit collision, so only ≤ is asserted)
    val d0 = docs.filter(col("doc_id") === 0)
      .select("text").first().getString(0)
    val b1 = Seq(Dc(900001L, d0),
      Dc(900002L, "zb1 zb2 zb3 zb4 zb5 zb6"))
    val mem = MemoryStream[Dc]
    val q = StreamingOps.bloomServeStream(mem.toDF(), "doc_id", "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows(900001L)._1 == rows(900001L)._2,
      s"an eval-text doc must flag every shingle, got ${rows(900001L)}")
    assert(rows(900002L)._2 <= rows(900002L)._1)
    // value-identity with the one-shot store serve
    val oneShot = graft.operators.Sketches.bloomServe(spark, store,
        shingles(b1.toDF()), "doc_id", "item")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows == oneShot,
      "streamed screen must equal the one-shot store serve")
    // replay rewrites, never dups
    StreamingOps.bloomServeBatch(b1.toDF(), 0L, "doc_id", "text",
      store, sink)
    assert(spark.read.parquet(sink)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap == rows)
  }

  test("pqServeStream: micro-batch vectors search the COMMITTED " +
      "IVF-ADC store, equal the one-shot serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, expr}
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_pq_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("c"))
    graft.operators.Pq.saveIvfAdcStore(
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand"), col("embedding")),
      "cand", "embedding", coarse, store)
    val b1 = e.filter(col("vec_id").between(4, 9))
      .collect().map(r => Pv(r.getLong(0),
        r.getSeq[Float](1).toArray)).toSeq
    val mem = MemoryStream[Pv]
    val q = StreamingOps.pqServeStream(mem.toDF(), "probe", "embedding",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rows = key(spark.read.parquet(sink))
    assert(rows.nonEmpty && rows.size == 6 * 3, s"6 probes × top-3: $rows")
    val oneShot = key(graft.operators.Pq.searchIvfAdcStore(spark, store,
      b1.toDF(), "probe", "embedding"))
    assert(rows == oneShot,
      "streamed search must equal the one-shot store serve")
    // replay rewrites, never dups
    StreamingOps.pqServeBatch(b1.toDF(), 0L, "probe", "embedding",
      store, sink)
    assert(key(spark.read.parquet(sink)) == rows)
  }

  test("pqRerankServeStream: micro-batch vectors shortlist + refine " +
      "against the COMMITTED withVectors store, equal the one-shot " +
      "rerank serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, expr}
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = java.nio.file.Files
      .createTempDirectory("graft_pqr_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    val coarse = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000) as bigint))")
          .as("c"))
    graft.operators.Pq.saveIvfAdcStore(
      e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand"), col("embedding")),
      "cand", "embedding", coarse, store, withVectors = true)
    val b1 = e.filter(col("vec_id").between(4, 9))
      .collect().map(r => Pv(r.getLong(0),
        r.getSeq[Float](1).toArray)).toSeq
    val mem = MemoryStream[Pv]
    val q = StreamingOps.pqRerankServeStream(mem.toDF(), "probe",
      "embedding", store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val rows = key(spark.read.parquet(sink))
    assert(rows.nonEmpty && rows.size == 6 * 3, s"6 probes × top-3: $rows")
    val oneShot = key(graft.operators.Pq.searchIvfAdcStoreRerank(spark,
      store, b1.toDF(), "probe", "embedding"))
    assert(rows == oneShot,
      "streamed rerank must equal the one-shot store serve")
    // replay rewrites, never dups
    StreamingOps.pqRerankServeBatch(b1.toDF(), 0L, "probe", "embedding",
      store, sink)
    assert(key(spark.read.parquet(sink)) == rows)
  }

  test("subwordServeStream: micro-batch docs segment under the " +
      "COMMITTED vocabulary, equal the one-shot serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 120)
      .select("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_subword_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    graft.operators.TextPipeline.saveSubwordStore(docs, "text", store)
    val b1 = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 20)
      .collect().map(r => Dc(r.getLong(0), r.getString(1))).toSeq
    val mem = MemoryStream[Dc]
    val q = StreamingOps.subwordServeStream(mem.toDF(), "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val rows = key(spark.read.parquet(sink))
    assert(rows.nonEmpty)
    val oneShot = key(graft.operators.TextPipeline.subwordServe(spark,
      store, b1.toDF(), "text"))
    assert(rows == oneShot,
      "streamed segmentation must equal the one-shot store serve")
    // replay rewrites, never dups
    StreamingOps.subwordServeBatch(b1.toDF(), 0L, "text", store, sink)
    assert(key(spark.read.parquet(sink)) == rows)
  }

  test("substrServeStream: micro-batch docs clean against the " +
      "COMMITTED keeper gate, equal the one-shot serve, replay rewrites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val run = "r1 r2 r3 r4 r5 r6"
    val ref = Seq(Dc(1L, s"a1 a2 $run a3"), Dc(2L, s"b1 $run b2"),
      Dc(3L, "c1 c2 c3 c4 c5")).toDF("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft_substr_stream").toString
    val (store, sink, ck) = (s"$base/store", s"$base/sink", s"$base/ck")
    graft.operators.Dedup.saveSubstrStore(ref, "doc_id", "text", store)
    // a NEW doc carrying the committed passage + a clean one
    val b1 = Seq(Dc(99L, s"n1 $run n2"), Dc(98L, "m1 m2 m3"))
    val mem = MemoryStream[Dc]
    val q = StreamingOps.substrServeStream(mem.toDF(), "doc_id", "text",
      store, sink, ck)
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    val rows = key(spark.read.parquet(sink))
    assert(rows(99L)._5 == "n1\nn2" && rows(99L)._2 == 6L,
      s"the streamed batch must lose the committed passage: ${rows(99L)}")
    assert(rows(98L)._2 == 0L && rows(98L)._5 == "m1 m2 m3")
    val oneShot = key(graft.operators.Dedup.substrServe(spark, store,
      b1.toDF(), "doc_id", "text"))
    assert(rows == oneShot,
      "streamed cleaning must equal the one-shot store serve")
    // replay rewrites, never dups
    StreamingOps.substrServeBatch(b1.toDF(), 0L, "doc_id", "text",
      store, sink)
    assert(key(spark.read.parquet(sink)) == rows)
  }
}

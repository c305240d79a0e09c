package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Lake round-trips (parquet/csv/json) and the partition-pruning
  * contract: a date filter over a partitioned layout must show up as
  * PartitionFilters, not data filters. */
class LakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private lazy val events =
    graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("json and csv round-trip with explicit schemas") {
    val src = events.select("event_id", "user_id", "event_type", "value")
    val j = tmp("lake_json")
    Lake.writeJson(src, j)
    val back = Lake.readJson(spark, j, src.schema)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val c = tmp("lake_csv")
    Lake.writeCsv(src, c)
    val backCsv = Lake.readCsv(spark, c, src.schema)
    assert(backCsv.agg(sum("event_id")).first().getLong(0)
      == src.agg(sum("event_id")).first().getLong(0))
  }

  test("orc round-trip preserves schema and pushes filters to the scan") {
    val src = events.select("event_id", "user_id", "event_type", "value")
    val o = tmp("lake_orc")
    Lake.writeOrc(src, o)
    val back = Lake.readOrc(spark, o)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val filtered = back.filter(col("user_id") === 1)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("user_id"),
      s"ORC scan must receive the pushed predicate:\n$scan")
    assert(filtered.count() ==
      src.filter(col("user_id") === 1).count())
  }

  test("clustered layout prunes row groups the unsorted layout reads") {
    import spark.implicits._
    // 40k rows over 4k keys; small row groups so pruning granularity is
    // visible even at test size
    val src = spark.range(0, 40000)
      .select((col("id") % 4000).as("k"), col("id").as("payload"))
    val clustered = tmp("lake_clustered")
    val unsorted = tmp("lake_unsorted")
    spark.conf.set("spark.hadoop.parquet.block.size", (64 * 1024).toString)
    try {
      Lake.writeClustered(src, clustered, Seq("k"), targetFiles = 8)
      // unsorted twin: same content, keys scattered round-robin
      src.orderBy("payload").repartition(8)
        .write.mode("overwrite").parquet(unsorted)
    } finally spark.conf.unset("spark.hadoop.parquet.block.size")

    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("k") === 17)
      df.collect() // execute
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val prunedRows = scanRows(clustered)
    val fullRows = scanRows(unsorted)
    // clustered: only the row group(s) whose [min,max] covers k=17 are
    // decoded; unsorted: every row group spans the whole key range
    assert(prunedRows < fullRows / 4,
      s"clustered scan must decode far fewer rows: $prunedRows vs $fullRows")
  }

  test("z-ordered layout prunes row groups on BOTH dimensions") {
    // 40k rows over two INDEPENDENT 200-value keys; small row groups so
    // pruning granularity is visible at test size
    // k2 via hash: independent of k1 AND dense within any row subset,
    // so neither min/max envelopes nor parquet dictionary filtering can
    // prune it under a k1-clustered layout — only a 2-D layout helps
    val src = spark.range(0, 40000)
      .select((col("id") % 200).as("k1"),
        pmod(hash(col("id")), lit(200)).cast("long").as("k2"),
        col("id").as("payload"))
    val zo = tmp("lake_zorder")
    val oneD = tmp("lake_oned")
    // 64 files = 64 z-intervals covering the plane as an ~8x8 grid, so
    // a point predicate on either dimension keeps ~1/8 of the files
    // (each file's min/max envelope spans ~1/8 of each axis); bounds
    // below leave 2x headroom over that theory. File-level stats prune
    // the same way row-group stats do at production block sizes.
    Lake.writeZordered(src, zo, "k1", "k2", bits = 8, targetFiles = 64)
    Lake.writeClustered(src, oneD, Seq("k1"), targetFiles = 64)
    def scanRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val full = 40000L
    // both layouts prune on k1 (1-D is sharper there — that's its job)
    val zK1 = scanRows(zo, col("k1") === 17)
    assert(zK1 < full / 4, s"z-order must prune on k1: $zK1 rows decoded")
    assert(scanRows(oneD, col("k1") === 17) < full / 8)
    // ...but only the z-order prunes on k2 (the 1-D layout scatters it)
    val zK2 = scanRows(zo, col("k2") === 17)
    val oneDK2 = scanRows(oneD, col("k2") === 17)
    assert(zK2 < full / 4,
      s"z-order must prune on the second dimension too: $zK2 rows decoded")
    assert(zK2 < oneDK2 / 2,
      s"z-order must beat the 1-D layout on k2: $zK2 vs $oneDK2")
    // layout changes nothing about the data
    assert(spark.read.parquet(zo).agg(sum("payload")).first().getLong(0)
      == src.agg(sum("payload")).first().getLong(0))
  }

  test("csv quarantine routes malformed rows aside, returns typed clean rows") {
    import org.apache.spark.sql.types._
    val dir = tmp("lake_badcsv")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("name", StringType)))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.csv"),
      """id,score,name
        |1,2.5,alpha
        |not_a_number,9.9,broken
        |2,3.5,beta
        |3,oops,also_broken
        |""".stripMargin)
    val quarantine = tmp("lake_quarantine")
    val clean = Lake.readCsvWithQuarantine(spark, dir, schema, quarantine)
    val ids = clean.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
    assert(clean.schema.fieldNames.toSeq == Seq("id", "score", "name"))
    val bad = spark.read.json(quarantine)
    val badLines = bad.select("raw_line").collect().map(_.getString(0))
    assert(badLines.length == 2 &&
      badLines.exists(_.startsWith("not_a_number")) &&
      badLines.exists(_.startsWith("3,oops")))
    // partially-parsed fields ride along for diagnosis
    assert(bad.columns.contains("score"))
  }

  test("date-partitioned write prunes partitions on read") {
    val path = tmp("lake_part")
    Lake.writeDatePartitioned(events, "ts", path)
    val lake = Lake.readDatePartitioned(spark, path)
    val days = lake.select("p_date").distinct().count()
    assert(days > 1, "fixture must span multiple days")
    val q = lake.filter(col("p_date") === "2024-01-01")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(p_date"),
      s"partition filter missing from scan:\n$scan")
    // pruned read touches only the one day's rows
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-01").count()
    assert(q.count() == expected)
  }

  test("mergeInto rewrites only touched buckets, latest-wins, modulus guarded") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val path = tmp("lake_merge") + "/table"
    val base = (1L to 40L).map(i => (i, t("10:00"), s"v$i"))
      .toDF("key", "ts", "payload")
    Lake.writeKeyBucketed(base, path, "key", numBuckets = 8)

    def snapshot(): Map[String, (Long, String)] = {
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var m = Map.empty[String, (Long, String)]
      files.forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          m += p.toString -> (bytes.length.toLong,
            md.map("%02x".format(_)).mkString)
        }
      }
      m
    }
    val before = snapshot()
    assert(before.nonEmpty)

    // update one key + insert one new key
    val updates = Seq((7L, t("12:00"), "updated"), (100L, t("12:00"), "new"))
      .toDF("key", "ts", "payload")
    Lake.mergeInto(updates, path, "key", "ts", numBuckets = 8)
    val after = snapshot()

    val touched = spark.range(1).select(
        pmod(hash(lit(7L)), lit(8)).as("a"),
        pmod(hash(lit(100L)), lit(8)).as("b"))
      .first() match { case r => Set(r.getInt(0), r.getInt(1)) }
    def untouchedOnly(m: Map[String, (Long, String)]) =
      m.filter { case (p, _) => !touched.exists(b => p.contains(s"__bucket=$b")) }
    assert(untouchedOnly(before) == untouchedOnly(after),
      "files in untouched buckets must be byte-identical (path, size, checksum)")

    val table = Lake.readKeyBucketed(spark, path).collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getString(2))).toMap
    assert(table.size == 41, "40 originals + 1 insert")
    assert(table(7L)._2 == "updated", "newest row must win")
    assert(table(100L)._2 == "new", "insert lands")
    assert(table(3L)._2 == "v3", "unrelated keys intact")

    // replaying the same merge is a no-op on contents (idempotent rerun)
    Lake.mergeInto(updates, path, "key", "ts", numBuckets = 8)
    assert(Lake.readKeyBucketed(spark, path).count() == 41)

    // a different modulus must be rejected, not silently misroute keys
    intercept[IllegalArgumentException] {
      Lake.mergeInto(updates, path, "key", "ts", numBuckets = 16)
    }

    // bootstrap: merging into a missing table creates it + its marker
    val fresh = tmp("lake_merge_boot") + "/t2"
    Lake.mergeInto(updates, fresh, "key", "ts", numBuckets = 4)
    assert(Lake.readKeyBucketed(spark, fresh).count() == 2)
    intercept[IllegalArgumentException] {
      Lake.mergeInto(updates, fresh, "key", "ts", numBuckets = 8)
    }
  }

  test("mergeInto absorbs schema drift: a new column lands, old rows " +
      "null-fill, later merges never drop it") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val path = tmp("lake_drift") + "/table"
    // wide key spread so several buckets stay untouched by the drift
    Lake.mergeInto((1L to 20L).map(i => (i, t("10:00"), s"v$i"))
      .toDF("key", "ts", "payload"), path, "key", "ts", numBuckets = 8)

    // drift: one update arrives with a NEW column — only its bucket
    // rewrites, every other bucket keeps the narrow file schema
    Lake.mergeInto(Seq((7L, t("11:00"), "v7b", "extra"))
      .toDF("key", "ts", "payload", "note"), path, "key", "ts",
      numBuckets = 8)
    val wide = Lake.readMerged(spark, path)
    assert(wide.columns.contains("note"),
      "the drift column must be visible through the merged reader")
    val byKey = wide.collect()
      .map(r => r.getAs[Long]("key") -> Option(r.getAs[String]("note")))
      .toMap
    assert(byKey(7L).contains("extra"))
    assert(byKey(1L).isEmpty, "pre-drift rows null-fill the new column")
    assert(wide.count() == 20)

    // the regression this pins: a LATER narrow batch whose touched set
    // spans BOTH a wide (post-drift) and a narrow bucket makes the
    // existing-side read see MIXED file schemas — without merged
    // footers the reader infers from one arbitrary file and can
    // silently drop `note` from the wide bucket's surviving rows
    val b7 = spark.range(1)
      .select(pmod(hash(lit(7L)), lit(8))).first().getInt(0)
    val sibling = spark.range(1000, 1200)
      .select(col("id"), pmod(hash(col("id")), lit(8)).as("b"))
      .filter(col("b") === b7).first().getLong(0)
    Lake.mergeInto(
      Seq((1L, t("12:00"), "v1b"), (sibling, t("12:00"), "vs"))
        .toDF("key", "ts", "payload"), path, "key", "ts", numBuckets = 8)
    val after = Lake.readMerged(spark, path)
    assert(after.columns.contains("note"),
      "a narrow late batch must not erase the drifted column")
    val k7 = after.filter(col("key") === 7L).collect().head
    assert(k7.getAs[String]("note") == "extra",
      "drifted values survive a mixed-schema bucket rewrite")
    assert(after.filter(col("key") === 1L).collect()
      .head.getAs[String]("payload") == "v1b")
    assert(after.count() == 21)
  }

  test("mergeInto CDC tombstones delete keys and reap fully-deleted buckets") {
    import spark.implicits._
    val path = tmp("lake_cdc")
    val nB = 4
    val base = Seq((1L, "a1", 1L), (2L, "b1", 1L), (3L, "c1", 1L))
      .toDF("k", "v", "ts")
    Lake.mergeInto(base, path, "k", "ts", nB)
    val upd = Seq(
      (1L, "xx", 5L, true),  // live tombstone -> k1 removed
      (2L, "xx", 0L, true),  // STALE tombstone (older than b1) -> k2 stays
      (4L, "d1", 5L, false)) // plain insert
      .toDF("k", "v", "ts", "deleted")
    Lake.mergeInto(upd, path, "k", "ts", nB, deleteCol = Some("deleted"))
    val back = Lake.readKeyBucketed(spark, path)
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == Map(2L -> "b1", 3L -> "c1", 4L -> "d1"))
    // the delete-marker column is never persisted
    assert(!Lake.readKeyBucketed(spark, path).columns.contains("deleted"))
    // on-disk partition dirs are exactly the surviving keys' buckets —
    // a bucket whose only key was tombstoned is reaped
    val expected = Seq(2L, 3L, 4L).toDF("k")
      .select(pmod(hash(col("k")), lit(nB)).as("b"))
      .collect().map(r => s"__bucket=${r.getInt(0)}").toSet
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("__bucket=")).map(_.getName).toSet
    assert(dirs == expected, s"stale bucket dirs must be reaped: $dirs vs $expected")
  }

  test("mergeInto staged commit survives injected crashes and converges") {
    import spark.implicits._
    val path = tmp("lake_crash")
    val nB = 4
    def readBack() = Lake.readKeyBucketed(spark, path)
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fsP = new org.apache.hadoop.fs.Path(path)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def scaffoldingGone() = {
      assert(!fs.exists(new org.apache.hadoop.fs.Path(fsP, "_graft_staging")),
        "staging dir must be cleared after commit")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(fsP, "_graft_old")),
        "parked-old dir must be cleared after commit")
    }
    Lake.mergeInto(Seq((1L, "a1", 1L), (2L, "b1", 1L), (3L, "c1", 1L))
      .toDF("k", "v", "ts"), path, "k", "ts", nB)

    // crash #1: die between the staging write and the swap — the live
    // table is byte-untouched (staging is underscore-invisible), and
    // the next merge resumes the staged commit before doing its own
    val upd = Seq((1L, "xx", 5L, true), (4L, "d1", 5L, false))
      .toDF("k", "v", "ts", "deleted")
    assert(Lake.stageMerge(upd, path, "k", "ts", nB, Some("deleted")))
    assert(readBack() == Map(1L -> "a1", 2L -> "b1", 3L -> "c1"),
      "a staged-but-uncommitted merge must be invisible to readers")
    Lake.mergeInto(upd, path, "k", "ts", nB, deleteCol = Some("deleted"))
    assert(readBack() == Map(2L -> "b1", 3L -> "c1", 4L -> "d1"))
    scaffoldingGone()

    // crash #2: die MID-swap — one bucket already swapped by hand, the
    // rest still staged; the table stays readable, and resuming the
    // commit (what the next merge's recovery does) converges
    val upd2 = Seq((2L, "b2", 9L, false), (3L, "c2", 9L, false))
      .toDF("k", "v", "ts", "deleted")
    assert(Lake.stageMerge(upd2, path, "k", "ts", nB, Some("deleted")))
    val b2 = spark.range(1).select(pmod(hash(lit(2L)), lit(nB))).first().getInt(0)
    val live = new org.apache.hadoop.fs.Path(fsP, s"__bucket=$b2")
    val staged = new org.apache.hadoop.fs.Path(fsP, s"_graft_staging/__bucket=$b2")
    val old = new org.apache.hadoop.fs.Path(fsP, "_graft_old")
    fs.mkdirs(old)
    fs.rename(live, new org.apache.hadoop.fs.Path(old, s"__bucket=$b2"))
    fs.rename(staged, live)
    assert(Lake.readKeyBucketed(spark, path).count() == 3,
      "mid-swap table must stay readable (every visible dir is complete)")
    Lake.commitStagedMerge(spark, path)
    assert(readBack() == Map(2L -> "b2", 3L -> "c2", 4L -> "d1"))
    scaffoldingGone()

    // crash #3: replaying the SAME merge after a completed commit (a
    // checkpoint replay) must converge to the same table
    Lake.mergeInto(upd2, path, "k", "ts", nB, deleteCol = Some("deleted"))
    assert(readBack() == Map(2L -> "b2", 3L -> "c2", 4L -> "d1"))
    scaffoldingGone()

    // crash #4: a dead bucket (tombstone reap) parked but not cleaned —
    // resume must leave it dead, not resurrect it
    val upd3 = Seq((4L, "xx", 20L, true)).toDF("k", "v", "ts", "deleted")
    assert(Lake.stageMerge(upd3, path, "k", "ts", nB, Some("deleted")))
    val b4 = spark.range(1).select(pmod(hash(lit(4L)), lit(nB))).first().getInt(0)
    val live4 = new org.apache.hadoop.fs.Path(fsP, s"__bucket=$b4")
    // only park by hand when the reap is the bucket's ONLY change (key 4
    // alone in it); sharing a bucket with a survivor means the staged
    // swap handles it — both paths end with k4 gone either way
    if (!fs.exists(new org.apache.hadoop.fs.Path(fsP,
        s"_graft_staging/__bucket=$b4")) && fs.exists(live4)) {
      fs.mkdirs(old)
      fs.rename(live4, new org.apache.hadoop.fs.Path(old, s"__bucket=$b4"))
    }
    Lake.commitStagedMerge(spark, path)
    assert(readBack() == Map(2L -> "b2", 3L -> "c2"),
      "a parked dead bucket must stay dead after resume")
    scaffoldingGone()
  }

  test("bucketed tables join without any shuffle (co-located join)") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    Lake.writeBucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "bkt_orders", "o_custkey", 8)
    Lake.writeBucketed(customer.select("c_custkey", "c_name"),
      "bkt_customer", "c_custkey", 8)
    // disable broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Lake.readTable(spark, "bkt_orders")
        .join(Lake.readTable(spark, "bkt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
      // and it still returns the right answer
      val n = joined.count()
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("ensureBucketed re-validates its memo against the catalog") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Lake.ensureBucketed(df, "bkt_memo_check", "k", 4)
    assert(spark.catalog.tableExists("bkt_memo_check"))
    // drop behind the memo's back (a warehouse wipe / session switch):
    // the next ensure call must notice and rewrite, not skip on the
    // JVM-local memo and leave readTable to fail
    spark.sql("DROP TABLE bkt_memo_check")
    Lake.ensureBucketed(df, "bkt_memo_check", "k", 4)
    try {
      assert(spark.catalog.tableExists("bkt_memo_check"),
        "memo hit must not skip the write after a catalog drop")
      assert(Lake.readTable(spark, "bkt_memo_check").count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_memo_check")
  }

  test("compact folds small files, preserves the data, skips compact dirs") {
    val dir = tmp("lake_compact") + "/t"
    val src = events.select("event_id", "user_id", "value")
    src.repartition(16).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(nFiles == 16)
    val before = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    // huge target -> everything folds into one file
    val n = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1 && nFiles == 1)
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "compaction must not change the data")
    // already compact: a second call is a no-op (no rewrite, same count)
    assert(Lake.compact(spark, dir, targetBytes = 1L << 30) == 1)
  }

  test("compact recovers the parked original after a crash between renames") {
    val dir = tmp("lake_compact_crash") + "/t"
    val src = events.select("event_id", "value")
    src.repartition(8).write.parquet(dir)
    val before = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: live dir parked, rename-in never ran
    // (plus stale compacted debris) — exactly the state compact leaves
    // if it dies between its two renames
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(dir + "__old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "__compact"))
    assert(!fs.exists(p))
    val n = Lake.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1)
    val after = spark.read.parquet(dir).orderBy("event_id").collect().toSeq
    assert(after == before, "recovery must restore the parked original")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + "__compact")))
  }
}

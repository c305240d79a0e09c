package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog

/** The persistent-catalog claim is CROSS-PROCESS: tables published by
  * one JVM are visible by bare name to a fresh one with zero
  * re-registration. An in-process test cannot show that (the suite JVM
  * already owns an in-memory-catalog session, and
  * `spark.sql.catalogImplementation` is static), so this spec drives
  * `graft.sources.Catalog`'s CLI verbs in FORKED JVMs — publish in one
  * process, query in another — against one Derby-backed home dir. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val classesDir = new java.io.File("target/scala-2.13/classes")

  // mirrors build.sbt's jdk17AddOpens: Spark 4.x sessions built outside
  // spark-submit need the module opens spark-submit would inject
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def fork(args: String*): (Int, String) = {
    val cmd = Seq(s"${sys.props("java.home")}/bin/java") ++ addOpens ++
      Seq("-Xmx3g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", classesDir.getPath + ":/opt/spark/jars/*",
        "graft.sources.Catalog") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private def rows(out: String): Seq[String] =
    out.linesIterator.filter(_.startsWith("CATALOG_ROW|"))
      .map(_.stripPrefix("CATALOG_ROW|")).toSeq

  test("publish in one JVM, query by bare name from a FRESH JVM; " +
      "re-publish repoints the database") {
    assume(classesDir.isDirectory, "compiled classes dir missing")
    val home = java.nio.file.Files
      .createTempDirectory("graft_catalog").toString
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"

    val (rcPub, outPub) = fork("publish", home, sfA)
    assert(rcPub == 0, s"publish failed:\n${outPub.takeRight(3000)}")

    // the analyst reconnects: a brand-new process, same home, no
    // registration calls — lineitem resolves, and the events VIEW
    // applies the same nanos->NTZ normalization as the loader
    val (rcQ, outQ) = fork("sql", home,
      "SELECT (SELECT count(*) FROM graft.lineitem), " +
        "(SELECT cast(min(ts) as string) FROM graft.events)")
    assert(rcQ == 0, s"fresh-JVM query failed:\n${outQ.takeRight(3000)}")
    val expectedCount =
      spark.read.parquet(s"$sfA/lineitem.parquet").count()
    val expectedMinTs = Tables.events(spark, sfA)
      .selectExpr("cast(min(ts) as string)").head().getString(0)
    assert(rows(outQ) == Seq(s"$expectedCount|$expectedMinTs"),
      s"fresh JVM saw: ${rows(outQ)}")

    // publish is declarative: pointing the same database at another
    // scale dir swaps every table (external = metadata-only)
    val (rcPub2, outPub2) = fork("publish", home, sfB)
    assert(rcPub2 == 0, s"re-publish failed:\n${outPub2.takeRight(3000)}")
    val (rcQ2, outQ2) =
      fork("sql", home, "SELECT count(*) FROM graft.lineitem")
    assert(rcQ2 == 0, outQ2.takeRight(3000))
    val countB = spark.read.parquet(s"$sfB/lineitem.parquet").count()
    assert(rows(outQ2) == Seq(s"$countB"),
      s"repointed count: ${rows(outQ2)} != $countB")
  }

  test("durable bucketed table + ANN index: published by one JVM, " +
      "bucket metadata and by-name index serving visible to a FRESH one") {
    assume(classesDir.isDirectory, "compiled classes dir missing")
    val home = java.nio.file.Files
      .createTempDirectory("graft_catalog_extras").toString
    val sf = "/root/testdata/sf0.001"

    // bucketed layout published once...
    val (rcB, outB) = fork("bucketed", home, sf, "orders", "o_custkey", "8")
    assert(rcB == 0, s"bucketed publish failed:\n${outB.takeRight(3000)}")
    // ...a fresh JVM sees the rows AND the bucket spec (the part a
    // plain parquet dir loses — it lives only in the metastore)
    val (rcQ, outQ) = fork("sql", home,
      "SELECT count(*) FROM graft.orders_bucketed")
    assert(rcQ == 0, outQ.takeRight(3000))
    val expected = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows(outQ) == Seq(s"$expected"), s"bucketed rows: ${rows(outQ)}")
    // the createtab_stmt cell is multi-line: assert on the raw fork
    // output (the CATALOG_ROW prefix only lands on its first line)
    val (rcD, outD) = fork("sql", home,
      "SHOW CREATE TABLE graft.orders_bucketed")
    assert(rcD == 0, outD.takeRight(3000))
    assert(outD.contains("CLUSTERED BY (o_custkey)") &&
      outD.contains("INTO 8 BUCKETS"),
      s"fresh JVM must see the bucket spec:\n${outD.takeRight(1500)}")

    // ANN index trained + saved + published by one JVM...
    val (rcI, outI) = fork("index_publish", home, sf, "emb")
    assert(rcI == 0, s"index publish failed:\n${outI.takeRight(3000)}")
    // ...served BY CATALOG NAME from a fresh JVM
    val (rcS, outS) = fork("index_search", home, sf, "emb")
    assert(rcS == 0, s"by-name search failed:\n${outS.takeRight(3000)}")
    val served = rows(outS)
    assert(served.length == 6 * 3,
      s"6 probes x top-3 expected, got ${served.length}: $served")
    // the manifest + views are real catalog objects
    val (rcM, outM) = fork("sql", home,
      "SELECT name, (SELECT count(*) FROM graft.emb_lists), " +
        "(SELECT count(*) FROM graft.emb_centroids) FROM graft.ann_indexes")
    assert(rcM == 0, outM.takeRight(3000))
    val m = rows(outM)
    assert(m.length == 1 && m.head.startsWith("emb|"),
      s"manifest row: $m")
    val Array(_, nLists, nCents) = m.head.split('|')
    assert(nCents.toLong == 4 && nLists.toLong > 0,
      s"views must read the index dirs: lists=$nLists cents=$nCents")
  }

  test("durable dedup store: published by one JVM, incremental dedup " +
      "served BY CATALOG NAME from a FRESH one (r9)") {
    assume(classesDir.isDirectory, "compiled classes dir missing")
    val home = java.nio.file.Files
      .createTempDirectory("graft_catalog_dedup").toString
    val sf = "/root/testdata/sf0.001"
    val (rcP, outP) = fork("dedup_publish", home, sf, "docs")
    assert(rcP == 0, s"dedup store publish failed:\n${outP.takeRight(3000)}")
    val (rcS, outS) = fork("dedup_incr", home, sf, "docs")
    assert(rcS == 0, s"by-name dedup failed:\n${outS.takeRight(3000)}")
    val survivors = rows(outS).map(_.toLong)
    // the catalog-served result must equal the in-process operator on
    // the same signature store (q103's semantics)
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val increment = docs.filter(col("doc_id").between(60, 99))
      .unionByName(docs.filter(col("doc_id") < 3)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val expected = graft.operators.Dedup.minhashIncremental(
        increment, "doc_id", "text",
        graft.operators.Dedup.minhashSignatures(
          docs.filter(col("doc_id") < 60), "doc_id", "text"))
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(survivors == expected,
      s"catalog-name serving must equal the operator face: " +
        s"got ${survivors.take(8)}..., want ${expected.take(8)}...")
    // planted copies were condemned by the STORE alone
    assert(!survivors.exists(_ >= 10000),
      s"planted copies of docs 0-2 must be condemned: $survivors")
    // the bucket spec is durable metadata, visible to a fresh JVM
    val (rcD, outD) = fork("sql", home,
      "SHOW CREATE TABLE graft.docs_sig_idx")
    assert(rcD == 0, outD.takeRight(3000))
    assert(outD.contains("CLUSTERED BY (bkey)"),
      s"fresh JVM must see the serving-index bucket spec:\n" +
        outD.takeRight(1200))

    // streaming-sink view: batches landed AFTER publishing are visible
    // (views list the path at query time — no partition repair)
    val sink = java.nio.file.Files
      .createTempDirectory("graft_catalog_sink").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$sink/batch=0")
    val (rcV, outV) = fork("sink_publish", home, sink, "stream_sink")
    assert(rcV == 0, s"sink publish failed:\n${outV.takeRight(3000)}")
    Seq((2L, "b"), (3L, "c")).toDF("id", "v")
      .write.parquet(s"$sink/batch=1") // lands AFTER the publish
    val (rcC, outC) = fork("sql", home,
      "SELECT count(*) FROM graft.stream_sink")
    assert(rcC == 0, outC.takeRight(3000))
    assert(rows(outC) == Seq("3"),
      s"post-publish batches must be visible through the view: " +
        rows(outC))
  }
}

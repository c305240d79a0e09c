package graft

import org.scalatest.funsuite.AnyFunSuite

/** q198's persistence claim is CROSS-PROCESS (round 15, r14 verdict
  * #2): a BPE merge table trained and landed by ONE JVM
  * ([[graft.sources.Lake.writeBpeTable]]) must serve segmentation to a
  * FRESH JVM by bare catalog name — train-once/serve-many, the
  * production tokenizer shape. CatalogSpec's forked-JVM pattern: the
  * suite JVM owns an in-memory-catalog session, so the durable half
  * runs in child processes against one Derby-backed home. */
class BpeStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val classesDir = new java.io.File("target/scala-2.13/classes")

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

  test("merge table trained + landed by one JVM; a FRESH JVM sees the " +
      "8-step store by bare name and serves segmentation from it " +
      "bit-identical to the inline-trained face") {
    assume(classesDir.isDirectory, "compiled classes dir missing")
    val home = java.nio.file.Files
      .createTempDirectory("graft_bpe_store").toString
    val sf = "/root/testdata/sf0.001"

    val (rcP, outP) = fork("bpe_publish", home, sf, "bpe_docs")
    assert(rcP == 0, s"bpe publish failed:\n${outP.takeRight(3000)}")

    // the store itself is a real catalog object: 8 merge rows in step
    // order, resolvable by bare name with zero re-registration
    val (rcQ, outQ) = fork("sql", home,
      "SELECT count(*), min(step), max(step), count(DISTINCT step) " +
        "FROM bpe_docs")
    assert(rcQ == 0, s"fresh-JVM store query failed:\n${outQ.takeRight(3000)}")
    assert(rows(outQ) == Seq("8|1|8|8"), s"store shape: ${rows(outQ)}")

    // serving: a THIRD JVM segments every distinct token reading ONLY
    // the store — must equal the in-process inline-trained face
    val (rcE, outE) = fork("bpe_encode", home, sf, "bpe_docs")
    assert(rcE == 0, s"store-served encode failed:\n${outE.takeRight(3000)}")
    val served = rows(outE)

    import org.apache.spark.sql.functions.{array_join, col}
    val docs = Tables.documents(spark, sf)
    val expected = graft.operators.TextPipeline.bpeSegment(
        docs, "doc_id", "text",
        graft.operators.TextPipeline.bpeTrain(
          docs, "doc_id", "text", merges = 8))
      .select(col("token"), array_join(col("symbols"), " ").as("seg"))
      .orderBy("token")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}").toSeq
    assert(served.nonEmpty && served == expected,
      s"store-served segmentation diverged from the inline face " +
        s"(served ${served.length} rows, expected ${expected.length}); " +
        s"first served: ${served.take(3)}, first expected: ${expected.take(3)}")

    // idempotent re-publish (the reaping write): same store, same serve
    val (rcP2, outP2) = fork("bpe_publish", home, sf, "bpe_docs")
    assert(rcP2 == 0, s"re-publish failed:\n${outP2.takeRight(3000)}")
    val (rcQ2, outQ2) = fork("sql", home, "SELECT count(*) FROM bpe_docs")
    assert(rcQ2 == 0, outQ2.takeRight(3000))
    assert(rows(outQ2) == Seq("8"), s"re-published store: ${rows(outQ2)}")
  }

  test("republish is invisible-or-complete (r15 verdict #4): the bare " +
      "name is a view swapped atomically onto the new version; a " +
      "reader that resolved pre-swap keeps a complete old generation; " +
      "older generations reap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def merges(tag: String) = (1 to 3).map(i =>
      (i.toLong, s"l$tag$i", s"r$tag$i", 10L - i))
      .toDF("step", "lhs", "rhs", "freq")
    val base = "bpe_swap_probe"
    graft.sources.Lake.writeBpeTable(merges("a"), base)
    // a reader resolves the view BEFORE the republish (analysis time)
    val preSwap = graft.sources.Lake.readBpeTable(spark, base)
    assert(spark.catalog.getTable(base).tableType == "VIEW",
      "the bare name must be the pointer view, not a table")
    graft.sources.Lake.writeBpeTable(merges("b"), base)
    // post-swap resolution serves the new store; the pre-swap plan
    // still reads its complete old generation (one-generation grace)
    assert(graft.sources.Lake.readBpeTable(spark, base)
      .select("lhs").as[String].collect().toSet ==
      Set("lb1", "lb2", "lb3"))
    assert(preSwap.select("lhs").as[String].collect().toSet ==
      Set("la1", "la2", "la3"),
      "a reader that resolved before the swap must keep a readable view")
    // at no point between publishes does the bare name vanish: the
    // only pointer mutation is the single CREATE OR REPLACE VIEW
    graft.sources.Lake.writeBpeTable(merges("c"), base)
    val vers = spark.catalog.listTables().collect()
      .map(_.name).filter(_.matches(s"${base}__v\\d+")).toSet
    assert(vers == Set(s"${base}__v2", s"${base}__v3"),
      s"grace window is one generation, got $vers")
  }

  test("writeBpeStore commits merges + vocab as ONE artifact; " +
      "readBpeStore hands back both halves of the same version") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val m = Seq((1L, "a", "b", 5L)).toDF("step", "lhs", "rhs", "freq")
    val v = Seq(("a", 1L), ("b", 2L), ("ab", 3L)).toDF("symbol", "sym_id")
    graft.sources.Lake.writeBpeStore(m, v, "bpe_joint_probe")
    val (mt, vb) = graft.sources.Lake.readBpeStore(spark, "bpe_joint_probe")
    assert(mt.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getLong(3))).toSeq == Seq((1L, "a", "b", 5L)))
    assert(vb.orderBy(col("sym_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("ab", 3L)))
  }
}

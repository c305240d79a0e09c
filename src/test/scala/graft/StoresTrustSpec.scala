package graft

import org.scalatest.funsuite.AnyFunSuite

/** Trust-committed serving (round 17, r16 verdict #6): the hermetic
  * default rebuilds every store in every fresh JVM; the trust conf
  * (`Stores.TrustConf`) must let a fresh process serve a COMMITTED
  * store with ZERO corpus-scanning jobs — staleness becomes the
  * publisher's contract. The proof is cross-process and adversarial
  * (CatalogSpec's forked-JVM pattern): publish in one JVM, DELETE THE
  * CORPUS, then serve from a second fresh JVM —
  *  - with trust on, the serve succeeds (the builder thunk never
  *    evaluates, so the dead corpus path is never even read) and the
  *    ensure-phase job census prints 0;
  *  - with trust off, the same serve FAILS (the hermetic rebuild needs
  *    the corpus), proving the flag is what changed the economics.
  * Served rows are checked against the in-process inline search on the
  * original data. */
class StoresTrustSpec extends AnyFunSuite {
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

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(); ()
  }

  test("a fresh JVM serves a committed PQ store with ZERO ensure-phase " +
      "jobs under trust, against a DELETED corpus; without trust the " +
      "same serve fails (hermetic rebuild needs the corpus)") {
    assume(classesDir.isDirectory, "compiled classes dir missing")
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files
      .createTempDirectory("graft_trust").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus.parquet"
    val sf = "/root/testdata/sf0.001"
    // land a private corpus copy so deleting it can't touch testdata
    graft.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
      .write.parquet(corpus)

    val (rcPub, outPub) = fork("pq_publish", store, corpus)
    assert(rcPub == 0, s"publish failed:\n${outPub.takeRight(3000)}")
    val (rcSt, outSt) = fork("store_status", store)
    assert(rcSt == 0 && outSt.contains("_graft_pqstore2_committed|v1"),
      s"status must show the committed marker:\n$outSt")

    // the corpus is GONE: any code path that reads it now fails loudly
    rm(new java.io.File(corpus))

    val probesPath = s"/root/testdata/sf0.001/embeddings.parquet"
    val (rcTrust, outTrust) =
      fork("pq_serve", store, probesPath, corpus, "true")
    assert(rcTrust == 0,
      s"trusted serve must not touch the deleted corpus:\n" +
        outTrust.takeRight(3000))
    assert(outTrust.linesIterator.contains("CATALOG_ENSURE_JOBS|0"),
      s"trusted ensure must run zero Spark jobs:\n$outTrust")
    val served = outTrust.linesIterator
      .filter(_.startsWith("CATALOG_ROW|")).toSeq
    assert(served.size == 18, s"6 probes x top-3, got ${served.size}")

    // value identity vs the in-process inline path on the original data
    val e = graft.Tables.embeddings(spark, sf)
    val cb = graft.operators.Pq.trainCodebooks(
      e.filter(col("vec_id") >= 0), "vec_id", "embedding")
    val inline = graft.operators.Pq.search(
        e.select(col("vec_id").as("cand"), col("embedding")), "cand",
        e.filter(col("vec_id").between(4, 9))
          .select(col("vec_id").as("probe"), col("embedding")), "probe",
        "embedding", cb)
      .orderBy("probe", "rk")
      .collect()
      .map(r => s"CATALOG_ROW|${r.getLong(0)}|${r.getLong(1)}|${r.getLong(2)}|${r.getLong(3)}")
      .toSeq
    assert(served == inline, "store-served rows must equal inline")

    // hermetic mode: the fresh JVM must try to rebuild and fail on the
    // missing corpus — trust is what deleted the corpus pass
    val (rcHermetic, _) =
      fork("pq_serve", store, probesPath, corpus, "false")
    assert(rcHermetic != 0,
      "without trust, a fresh JVM rebuilds and must fail on the " +
        "deleted corpus")
  }
}

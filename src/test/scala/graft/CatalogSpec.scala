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
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The custom expression must be reachable from plain SQL once the
  * extension is installed. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("array_dot is callable from SQL after install()") {
    GraftExtensions.install(spark)
    val d = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .first().getDouble(0)
    assert(d == 32.0)
    // through a table scan (whole-stage codegen path)
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("ext_emb")
    val selfDot = spark.sql(
      """SELECT array_dot(transform(embedding, x -> cast(x as double)),
        |                 transform(embedding, x -> cast(x as double))) AS d
        |FROM ext_emb LIMIT 5""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(selfDot.forall(v => math.abs(v - 1.0) < 1e-5))
    spark.catalog.dropTempView("ext_emb")
  }

  test("builder-time extension wiring applies without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("array_dot rejects non-double-array inputs with a typed error") {
    GraftExtensions.install(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT array_dot(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("array<double>"))
  }
}

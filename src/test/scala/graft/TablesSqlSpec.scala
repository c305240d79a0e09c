package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc SQL entry face ([[Tables.registerViews]]): the reference's
  * declared user surface is analysts typing SQL against warehouse tables
  * (reference `README.md:21`), so the SAME SQL text the DuckDB oracle
  * runs must execute through `spark.sql` over the registered views and
  * match the DataFrame-API inventory query row for row. */
class TablesSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-compare canon: columns sorted by name, rows as strings. */
  private def canon(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.toString).toSeq

  // portable-ANSI inventory queries: scan+topk, shuffle join, broadcast
  // join, multi-agg group, HAVING gate, distinct-count
  private val sqlRunnable = Seq("q04_topk", "q11_join_inner",
    "q12_join_broadcast", "q20_agg_group", "q21_agg_having",
    "q22_count_distinct")

  test("oracle SQL strings run verbatim over registered views and match " +
      "the DataFrame inventory results") {
    Tables.registerViews(spark, dir)
    sqlRunnable.foreach { name =>
      val viaSql = canon(spark.sql(SparkEntry.oracleSql(name)))
      val viaApi = canon(SparkEntry.queries(name)(spark, dir))
      assert(viaSql == viaApi, s"$name: SQL face deviates from the API")
    }
  }

  test("every lake table is queryable as a view, including the " +
      "nanos-normalized events table") {
    Tables.registerViews(spark, dir)
    Tables.all.foreach { case (name, load) =>
      val n = spark.sql(s"SELECT count(*) AS n FROM $name")
        .collect()(0).getLong(0)
      assert(n == load(spark, dir).count(), s"view $name row count")
      assert(n > 0, s"view $name is empty")
    }
    // the normalization is part of the view (timestamp_ntz, not raw long)
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    // an ad-hoc cross-table query an analyst would type
    val rev = spark.sql(
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(rev.count() > 0)
  }
}

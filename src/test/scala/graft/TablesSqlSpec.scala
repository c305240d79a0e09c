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

  /** Driver-compare canon: columns sorted by name, rows as sorted
    * strings (the inventory's ORDER BY columns can tie, and the two
    * faces may emit tied rows in different orders). Two type-metadata
    * normalizations mirror what the driver's own compare does: Decimal
    * → double (Spark parses `10000.0` literals as DECIMAL where both
    * the DataFrame API and DuckDB compute in double) and
    * session-timezone timestamp → TIMESTAMP_NTZ (Spark's `date_trunc`
    * returns LTZ where the API and DuckDB carry NTZ — same wall-clock
    * instant under the UTC test session). */
  private def canon(df: DataFrame): Seq[String] = {
    val typed = df.select(df.schema.fields.map(f => f.dataType match {
      case _: org.apache.spark.sql.types.DecimalType =>
        col(f.name).cast("double").as(f.name)
      case org.apache.spark.sql.types.TimestampType =>
        col(f.name).cast("timestamp_ntz").as(f.name)
      case _ => col(f.name)
    }).toIndexedSeq: _*)
    typed.select(typed.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  test("SQL face sweep: every Spark-runnable oracle string matches the " +
      "DataFrame inventory, and the runnable subset is measured") {
    Tables.registerViews(spark, dir)
    var runnable = 0
    val unrunnable = scala.collection.mutable.Buffer[String]()
    val mismatches = scala.collection.mutable.Buffer[String]()
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, sql) =>
      // parse + analyze + execute under Spark; dialect-specific oracle
      // SQL (DuckDB list_* functions, bare FILTER(cond), etc.) drops
      // out here and is counted, never silently skipped
      val viaSql =
        try {
          val df = spark.sql(sql)
          df.schema // force analysis
          Some(canon(df))
        } catch { case scala.util.control.NonFatal(_) => None }
      viaSql match {
        case None => unrunnable += name
        case Some(rows) =>
          runnable += 1
          if (rows != canon(SparkEntry.queries(name)(spark, dir)))
            mismatches += name
      }
    }
    info(s"Spark-runnable oracle SQL: $runnable/" +
      s"${SparkEntry.oracleSql.size}; dialect-bound: " +
      s"${unrunnable.size} (${unrunnable.mkString(", ")})")
    assert(mismatches.isEmpty,
      s"runnable oracle SQL must match the DataFrame face: $mismatches")
    // the measured dual-face coverage — a drop below this means either
    // new queries shipped DuckDB-only SQL that could have been portable,
    // or a dialect regression crept into existing strings. Round 9
    // closed the board to 146/146: the GraftSqlParser dialect bridge
    // ([[graft.plans.GraftSqlParser]]) rewrites DuckDB ASOF JOIN to the
    // per-left-row rank-1 plan and executes UNION-fixpoint RECURSIVE
    // CTEs as an exact parse-time delta iteration — floor pinned just
    // below measured so one genuinely-divergent future builtin doesn't
    // block a round.
    assert(runnable >= 144,
      s"Spark-runnable oracle coverage regressed: $runnable")
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

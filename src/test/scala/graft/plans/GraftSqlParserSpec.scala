package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The dialect bridge's text/plan rewrites in isolation (the 146/146
  * integration sweep lives in TablesSqlSpec): ASOF JOIN direction
  * handling, marker hygiene, and the recursion executor's fixpoint
  * semantics + guard rails. */
class GraftSqlParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(sql: String): Set[Seq[Any]] =
    spark.sql(sql).collect().map(_.toSeq.toSeq).toSet

  test("ASOF JOIN backward: each left row pairs with the greatest " +
      "right ts at-or-before, inner semantics") {
    spark.sql("SELECT * FROM VALUES (1, 10), (1, 20), (2, 5) AS t(k, ts)")
      .createOrReplaceTempView("l_asof")
    spark.sql(
      "SELECT * FROM VALUES (1, 9, 'a'), (1, 15, 'b'), (3, 1, 'c') AS t(k, ts, v)")
      .createOrReplaceTempView("r_asof")
    val got = rows(
      """SELECT l.k, l.ts, r.ts AS rts, r.v
        |FROM l_asof l ASOF JOIN r_asof r
        |ON l.k = r.k AND r.ts <= l.ts""".stripMargin)
    // (1,10)→(9,a); (1,20)→(15,b); (2,5) has no partner — dropped
    assert(got == Set(Seq(1, 10, 9, "a"), Seq(1, 20, 15, "b")))
  }

  test("ASOF JOIN forward: smallest right ts at-or-after") {
    val got = rows(
      """SELECT l.k, l.ts, r.ts AS rts
        |FROM l_asof l ASOF JOIN r_asof r
        |ON l.k = r.k AND r.ts >= l.ts""".stripMargin)
    // (1,10)→15; (1,20) has nothing at-or-after; (2,5) has no k match
    assert(got == Set(Seq(1, 10, 15)),
      s"(1,10)→15 is the only at-or-after match: $got")
  }

  test("LEFT ASOF JOIN keeps unmatched left rows with null right " +
      "columns, matches stay rank-1") {
    val got = rows(
      """SELECT l.k, l.ts, r.ts AS rts, r.v
        |FROM l_asof l LEFT ASOF JOIN r_asof r
        |ON l.k = r.k AND r.ts <= l.ts""".stripMargin)
    assert(got == Set(
      Seq(1, 10, 9, "a"), Seq(1, 20, 15, "b"), Seq(2, 5, null, null)),
      s"left form pads unmatched rows instead of dropping: $got")
  }

  test("DuckDB keyword order ASOF LEFT JOIN rewrites to the same " +
      "left form") {
    val got = rows(
      """SELECT l.k, l.ts, r.ts AS rts
        |FROM l_asof l ASOF LEFT JOIN r_asof r
        |ON l.k = r.k AND r.ts <= l.ts""".stripMargin)
    assert(got == Set(
      Seq(1, 10, 9), Seq(1, 20, 15), Seq(2, 5, null)),
      s"ASOF LEFT JOIN (DuckDB order) must pad unmatched rows: $got")
  }

  test("ASOF JOIN output carries no helper columns under SELECT *") {
    val df = spark.sql(
      """SELECT * FROM l_asof l ASOF JOIN r_asof r
        |ON l.k = r.k AND r.ts <= l.ts""".stripMargin)
    assert(!df.columns.exists(c => c == "__asof_lid" || c == "__asof_rn"),
      s"helpers leaked into SELECT *: ${df.columns.mkString(",")}")
    // a.* ++ b.* exactly, DuckDB's ASOF output shape
    assert(df.columns.toSeq == Seq("k", "ts", "k", "ts", "v"))
    assert(df.count() == 2)
  }

  test("ASOF JOIN with no recognizable ordering conjunct fails loudly " +
      "instead of returning every candidate") {
    // unqualified right timestamp: ofRight can't see it — silent
    // degradation to a plain join would return 3 rows for (1,*)
    val e = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(
        """SELECT l.k FROM l_asof l ASOF JOIN r_asof r
          |ON l.k = r.k""".stripMargin).collect()
    }
    assert(e.getMessage.contains("ordering conjunct"),
      s"error must name the contract: ${e.getMessage}")
  }

  test("queries already using the reserved ASOF helper names are " +
      "rejected up front") {
    val e = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(
        """SELECT l.k AS __asof_lid FROM l_asof l ASOF JOIN r_asof r
          |ON l.k = r.k AND r.ts <= l.ts""".stripMargin).collect()
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("non-ASOF SQL passes through the parser untouched") {
    assert(rows("SELECT 'asof' AS s").head == Seq("asof"))
    // a plain join with an inequality is NOT rewritten (no marker)
    val plain = rows(
      """SELECT l.ts, r.ts FROM l_asof l JOIN r_asof r
        |ON l.k = r.k AND r.ts <= l.ts""".stripMargin)
    assert(plain == Set(Seq(10, 9), Seq(20, 9), Seq(20, 15)),
      s"plain range join keeps ALL matches: $plain")
  }

  test("WITH RECURSIVE UNION fixpoint: transitive closure over a cycle " +
      "terminates and is exact") {
    // 1→2→3→1 cycle plus isolated 5→6: UNION ALL recursion would never
    // terminate here; the fixpoint executor must
    val got = rows(
      """WITH RECURSIVE e(u, v) AS (
        |  SELECT * FROM VALUES (1, 2), (2, 3), (3, 1), (5, 6) AS t(u, v)),
        |reach(u, v) AS (
        |  SELECT u, v FROM e
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
        |SELECT u, min(v) AS mv FROM reach GROUP BY u""".stripMargin)
    assert(got == Set(Seq(1, 1), Seq(2, 1), Seq(3, 1), Seq(5, 6)),
      s"closure of the cycle must reach every member: $got")
  }

  test("recursive CTE over BINARY columns converges (value equality, " +
      "not Array[Byte] reference equality)") {
    // Row.equals compares binary by reference — the old working set
    // re-added identical byte arrays every round and never converged
    val got = rows(
      """WITH RECURSIVE be(u, v, tag) AS (
        |  SELECT u, v, cast('x' as binary) AS tag
        |  FROM VALUES (1, 2), (2, 3) AS t(u, v)),
        |reach(u, v, tag) AS (
        |  SELECT u, v, tag FROM be
        |  UNION
        |  SELECT r.u, e.v, e.tag FROM reach r JOIN be e ON r.v = e.u)
        |SELECT u, count(*) AS n FROM reach GROUP BY u""".stripMargin)
    assert(got == Set(Seq(1, 2L), Seq(2, 1L)),
      s"binary-carrying closure must converge exactly: $got")
  }

  test("oversized WITH RECURSIVE escalates to the distributed delta " +
      "loop instead of erroring") {
    // shrink the driver threshold so the closure (8 rows working set)
    // crosses it mid-iteration — the same SQL text must now run
    // distributed and produce the identical fixpoint
    spark.conf.set("graft.sql.recursion.maxRows", "3")
    try {
      val got = rows(
        """WITH RECURSIVE e(u, v) AS (
          |  SELECT * FROM VALUES (1, 2), (2, 3), (3, 1), (5, 6) AS t(u, v)),
          |reach(u, v) AS (
          |  SELECT u, v FROM e
          |  UNION
          |  SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u)
          |SELECT u, min(v) AS mv FROM reach GROUP BY u""".stripMargin)
      assert(got == Set(Seq(1, 1), Seq(2, 1), Seq(3, 1), Seq(5, 6)),
        s"distributed fixpoint must equal the driver one: $got")
    } finally spark.conf.unset("graft.sql.recursion.maxRows")
  }

  test("a recursive step whose schema diverges from the base fails " +
      "with an error naming the CTE and both schemas") {
    val e = intercept[Exception] {
      rows(
        """WITH RECURSIVE r2(n) AS (
          |  SELECT 1 AS n
          |  UNION
          |  SELECT cast(n AS string) FROM r2 WHERE n < 3)
          |SELECT * FROM r2""".stripMargin)
    }
    assert(e.getMessage.contains("r2") &&
        e.getMessage.contains("base relation"),
      s"schema-contract error must be self-explanatory: ${e.getMessage}")
  }

  test("UNION ALL recursion is left to Spark (only UNION-fixpoint " +
      "is intercepted)") {
    // bounded UNION ALL recursion: Spark 4 executes this natively; the
    // rewrite must not touch it (splitUnion skips UNION ALL)
    val got = rows(
      """WITH RECURSIVE cnt(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM cnt WHERE n < 3)
        |SELECT n FROM cnt""".stripMargin)
    assert(got == Set(Seq(1), Seq(2), Seq(3)))
  }
}

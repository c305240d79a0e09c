package graft

import org.scalatest.funsuite.AnyFunSuite

/** Each [[SqlCompat]] alias resolves through `spark.sql` to the intended
  * native expression and computes DuckDB-matching values (the literal
  * expectations below were cross-checked against DuckDB 1.0). */
class SqlCompatSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; SqlCompat.register(s); s }

  private def one(sql: String): Any =
    spark.sql(sql).collect()(0).get(0)

  test("array + list aliases") {
    assert(one("SELECT len(list_value(1,2,3))") == 3)
    assert(one("SELECT list_extract(list_value('a','b','c'), 2)") == "b")
    assert(one("SELECT array_to_string(list_value(1,2,3), ',')") == "1,2,3")
    assert(one("SELECT len(list_filter(list_value('a',''), x -> x <> ''))") == 1)
    assert(one("SELECT list_extract(list_transform(list_value(1,2), x -> x*10), 1)") == 10)
    assert(one("SELECT list_contains(list_value('the','a'), 'the')") == true)
    assert(one("SELECT len(list_distinct(list_value(1,1,2)))") == 2)
    assert(one("SELECT list_extract(list_sort(list_value(3,1,2)), 1)") == 1)
    assert(one("SELECT len(list_intersect(list_value(1,2), list_value(2,3)))") == 1)
    assert(one("SELECT list_max(list_value(1.0D, 3.0D, 2.0D))") == 3.0)
    assert(one("SELECT CAST(list_sum(list_value(1,2,3)) AS BIGINT)") == 6L)
    assert(one("SELECT array_to_string(array_slice(list_value(1,2,3,4), 2, 3), ',')") == "2,3")
    assert(one("SELECT array_to_string(array_slice(list_value(1,2,3), 1, 10), ',')") == "1,2,3")
    assert(one("SELECT list_dot_product(list_value(1.0D,2.0D), list_value(3.0D,4.0D))") == 11.0)
  }

  test("unnest as generator, string_split literal semantics") {
    val rows = spark.sql(
      "SELECT unnest(string_split('a b', ' ')) AS w").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a", "b"))
    // literal separator is regex-quoted: '.' must not fan out per char
    assert(one("SELECT len(string_split('a.b', '.'))") == 2)
    val gs = spark.sql("SELECT unnest(generate_series(1, 3)) AS i")
      .collect().map(_.getInt(0))
    assert(gs.toSeq == Seq(1, 2, 3))
  }

  test("temporal aliases + arity-dispatching overrides") {
    assert(one("SELECT epoch_us(TIMESTAMP_NTZ '2020-01-01 00:00:00.5')") == 1577836800500000L)
    assert(one("SELECT CAST(make_timestamp(1577836800000000) AS DATE)").toString == "2020-01-01")
    assert(one("SELECT make_timestamp(2020, 1, 2, 0, 0, 0)") != null)
    // day-diff via epoch_us arithmetic (no datediff compat — parser-blocked)
    assert(one("""SELECT CAST((epoch_us(CAST(DATE '2020-01-05' AS TIMESTAMP))
      - epoch_us(CAST(DATE '2020-01-01' AS TIMESTAMP))) / 86400000000 AS BIGINT)""") == 4L)
    val spine = spark.sql(
      """SELECT CAST(d AS DATE) AS day FROM (SELECT
        |  unnest(generate_series(DATE '2020-01-01', DATE '2020-01-03',
        |    INTERVAL 1 DAY)) AS d)""".stripMargin).collect()
    assert(spine.length == 3)
  }

  test("quantile_cont matches DuckDB's interpolating quantile") {
    assert(one("SELECT quantile_cont(x, 0.5) FROM VALUES (1.0D),(2.0D),(4.0D) t(x)") == 2.0)
    assert(one("SELECT quantile_cont(x, 0.25) FROM VALUES (1.0D),(2.0D),(3.0D) t(x)") == 1.5)
  }

  test("json + regexp + misc") {
    assert(one("""SELECT CAST(json_extract_string('{"k": 7}', '$.k') AS BIGINT)""") == 7L)
    assert(one("""SELECT array_to_string(json_keys('{"a":1,"b":2}'), ',')""") == "a,b")
    assert(one("SELECT regexp_replace('a1b2', '[0-9]', 'x', 'g')") == "axbx")
    assert(one("SELECT regexp_replace('a1b2', '[0-9]', 'x')") == "axbx")
    // Spark's OWN 4-arg form (integer start position) must delegate to
    // the builtin, not die in the compat override
    assert(one("SELECT regexp_replace('a1b2', '[0-9]', 'x', 3)") == "a1bx")
    assert(one("SELECT xor(5, 3)") == 6)
    // escapedStringLiterals carries \b through to the regex engine
    assert(one("""SELECT len(regexp_extract_all('call 555-123-4567 now',
      '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', 0))""") == 1)
  }

  test("ordered collect via list + list_sort round-trip") {
    assert(one(
      """SELECT array_to_string(list_sort(list(x)), ',')
        |FROM VALUES ('b'),('a'),('c') t(x)""".stripMargin) == "a,b,c")
  }
}

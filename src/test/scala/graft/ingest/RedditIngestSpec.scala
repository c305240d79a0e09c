package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The reference's transform battery on its own dirty fixtures
  * (reference `tests/test_reddit_etl.py:6-42`, FIXTURES.md §2), plus
  * seeded property-style totality/idempotence checks. */
class RedditIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rawSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("score", StringType),
    StructField("num_comments", StringType),
    StructField("author", StringType),
    StructField("created_utc", StringType),
    StructField("url", StringType),
    StructField("over_18", StringType),
    StructField("edited", StringType),
    StructField("spoiler", StringType),
    StructField("stickied", StringType)))

  private def cleanseRows(rows: Seq[Row]) =
    RedditIngest.cleanse(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), rawSchema))

  test("dirty fixture row cleanses exactly like the reference") {
    // tests/test_reddit_etl.py:11-30
    val out = cleanseRows(Seq(Row(
      "12345", "  Messy Title  ", "100", null, "some_user",
      "1710000000", null, null, null, null, null))).collect().head
    assert(out.getAs[String]("title") == "Messy Title")
    assert(out.getAs[Int]("score") == 100)
    assert(out.getAs[Int]("num_comments") == 0)
    assert(!out.getAs[Boolean]("over_18"))
    // epoch 1710000000 → 2024-03-09T16:00:00Z
    assert(out.getAs[java.sql.Timestamp]("created_utc").toInstant.toString
      == "2024-03-09T16:00:00Z")
  }

  test("missing fields get defaults (minimal row)") {
    // tests/test_reddit_etl.py:32-42 — only id present.
    val minimal = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("123"))),
      StructType(Seq(StructField("id", StringType))))
    val out = RedditIngest.cleanse(minimal).collect().head
    assert(out.getAs[Int]("num_comments") == 0)
    assert(out.getAs[String]("author") == "Unknown")
    assert(out.getAs[String]("title") == "")
    assert(!out.getAs[Boolean]("edited"))
    assert(out.isNullAt(out.fieldIndex("created_utc")))
  }

  test("edited tri-state: bools pass, edit timestamps coerce to false") {
    // etls/reddit_etl.py:82-83 — PRAW yields False or an epoch float.
    val out = cleanseRows(Seq(
      Row("a", null, null, null, null, null, null, null, "true", null, null),
      Row("b", null, null, null, null, null, null, null, "False", null, null),
      Row("c", null, null, null, null, null, null, null, "1710000000.0", null, null),
      Row("d", null, null, null, null, null, null, null, null, null, null)))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Boolean]("edited")).toSeq
      == Seq(true, false, false, false))
  }

  test("cleanse output schema matches the canonical contract") {
    assert(cleanseRows(Seq.empty).schema
      .map(f => (f.name, f.dataType)) ==
      RedditIngest.CleanSchema.map(f => (f.name, f.dataType)))
  }

  test("property: defaulted columns are never null, and cleanse is idempotent") {
    val rnd = new scala.util.Random(42)
    def cell(): String = rnd.nextInt(6) match {
      case 0 => null
      case 1 => rnd.alphanumeric.take(rnd.nextInt(8)).mkString
      case 2 => (rnd.nextInt(2001) - 1000).toString
      case 3 => Seq("true", "false", "True", "False")(rnd.nextInt(4))
      case 4 => ""
      case 5 => s"${1600000000 + rnd.nextInt(200000000)}"
    }
    val rows = (1 to 40).map(i => Row((s"id$i" +: Seq.fill(10)(cell())): _*))
    val once = cleanseRows(rows)
    val collected = once.collect()
    collected.foreach { r =>
      Seq("title", "score", "num_comments", "author",
          "over_18", "edited", "spoiler", "stickied").foreach { c =>
        assert(!r.isNullAt(r.fieldIndex(c)), s"null in defaulted col $c")
      }
    }
    // idempotence: re-cleansing the cleansed output (timestamps re-cast
    // from their epoch-rendered form) is a fixpoint.
    val twiceIn = once.withColumn("created_utc",
      org.apache.spark.sql.functions.unix_timestamp(
        org.apache.spark.sql.functions.col("created_utc")).cast("string"))
    val twice = RedditIngest.cleanse(twiceIn).collect()
    assert(twice.sortBy(_.getAs[String]("id"))
      .sameElements(collected.sortBy(_.getAs[String]("id"))))
  }

  test("typed Dataset[RedditPost] round-trips the cleansed schema") {
    val cleansed = cleanseRows(Seq(Row(
      "12345", "  Messy Title  ", "100", null, "some_user",
      "1710000000", "http://x", null, null, "true", null)))
    val typed = RedditIngest.toTyped(cleansed).collect().head
    assert(typed == RedditPost("12345", "Messy Title", 100, 0, "some_user",
      Some(java.sql.Timestamp.from(java.time.Instant.parse("2024-03-09T16:00:00Z"))),
      "http://x", over_18 = false, edited = false, spoiler = true,
      stickied = false))
  }

  test("topK returns the k highest scores (server-side top-k, A2)") {
    val raw = (1 to 50).map(i =>
      Row(s"id$i", null, i.toString, null, null, null, null, null, null, null, null))
    val top = RedditIngest.topK(cleanseRows(raw), 5).collect()
    assert(top.map(_.getAs[Int]("score")).toSeq == Seq(50, 49, 48, 47, 46))
  }
}

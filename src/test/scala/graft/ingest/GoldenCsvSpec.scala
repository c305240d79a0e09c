package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Replay of the reference's committed golden outputs
  * (`data/output/reddit_2024030{8,9}.csv`, `…11.csv` — copied into test
  * resources per SURVEY §5.2): schema, row counts, quoting round-trip, and
  * the latest-wins upsert over overlapping daily snapshots (SURVEY §1.4). */
class GoldenCsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def res(name: String) =
    getClass.getResource(s"/golden/$name").toString

  private lazy val days = Seq("20240308", "20240309", "20240311").map { d =>
    d -> RedditIngest.readGoldenCsv(spark, res(s"reddit_$d.csv"))
      .withColumn("snapshot_date", lit(d))
  }.toMap

  test("golden files parse with the contract schema and row counts 23/23/17") {
    assert(days("20240308").count() == 23)
    assert(days("20240309").count() == 23)
    assert(days("20240311").count() == 17)
    days.values.foreach { df =>
      assert(df.drop("snapshot_date").schema.map(f => (f.name, f.dataType))
        == RedditIngest.CleanSchema.map(f => (f.name, f.dataType)))
    }
  }

  test("naive legacy timestamps parse as UTC (SURVEY §1.5)") {
    val first = days("20240308").filter(col("id") === "1b9ba5c")
      .collect().head
    assert(first.getAs[java.sql.Timestamp]("created_utc").toInstant.toString
      == "2024-03-08T01:27:24Z")
  }

  test("daily snapshots overlap; latest-wins upsert keeps the newest metrics") {
    val union = days.values.reduce(_ unionByName _)
    val total = union.count()
    val deduped = RedditIngest.latestWins(union,
      Seq(col("snapshot_date").desc))
    val perId = deduped.groupBy("id").count()
      .filter(col("count") > 1).count()
    assert(perId == 0, "latest-wins must yield one row per id")
    assert(deduped.count() < total, "snapshots must actually overlap")
    // id 1b9ba5c: score 75/comments 31 on 03-08 → 79/34 on 03-09
    val row = deduped.filter(col("id") === "1b9ba5c").collect().head
    assert(row.getAs[String]("snapshot_date") == "20240309")
    assert(row.getAs[Int]("score") == 79)
    assert(row.getAs[Int]("num_comments") == 34)
    // created_utc immutable across snapshots
    val cu = union.filter(col("id") === "1b9ba5c")
      .select("created_utc").distinct().count()
    assert(cu == 1)
  }

  test("CSV sink round-trips quoting (titles with commas and quotes, A5)") {
    val src = days("20240311").drop("snapshot_date")
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString
    RedditIngest.writeCsv(src, out)
    val back = spark.read.schema(RedditIngest.GoldenCsvSchema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
      .csv(out)
    assert(back.count() == 17)
    val titles = back.select("title").collect().map(_.getString(0)).toSet
    val origTitles = src.select("title").collect().map(_.getString(0)).toSet
    assert(titles == origTitles)
    assert(origTitles.exists(t => t.contains(",") || t.contains("\"")),
      "fixture must exercise quoting")
    // timestamps survive the ISO render + reparse
    val ts = back.filter(col("id") === src.select("id").first().getString(0))
      .select("created_utc").first().getTimestamp(0)
    val origTs = src.select("created_utc").first().getTimestamp(0)
    assert(ts == origTs)
  }

  test("ingest() fuses cleanse+topK+sink and reports the row count (A7/A8)") {
    val raw = days("20240308").drop("snapshot_date")
      .withColumn("created_utc", unix_timestamp(col("created_utc")).cast("string"))
      .withColumn("score", col("score").cast("string"))
    val out = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val n = RedditIngest.ingest(raw, out, limit = Some(10))
    assert(n == 10)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == 10)
  }
}

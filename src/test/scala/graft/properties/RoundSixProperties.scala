package graft.properties

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-6 scale-shape gates: the two r5-flagged uncapped candidate
  * joins (q110 containment, q118 estimator calibration) must stay O(d)
  * under a planted stop-shingle / boilerplate band key — the adversarial
  * corpus where the old inline joins exploded to O(d²).
  */
class RoundSixProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("containmentPairs: a stop-shingle in 1000 docs yields O(d) pairs, " +
      "not O(d^2), and true containments survive the df cap") {
    import spark.implicits._
    // Every doc carries the SAME stop 3-gram plus a per-doc unique tail;
    // docs 0/1 and 2/3 additionally share a RARE 3-gram (df=2, well
    // under the cap) — those are the real containment pairs.
    val docs = (0L until 1000L).map { i =>
      val stop = "the common boilerplate"
      val rare = if (i < 2) "rare shared alpha"
        else if (i < 4) "rare shared beta"
        else s"unique u$i v$i"
      (i, s"$stop $rare w$i x$i")
    }.toDF("doc_id", "text")
    val pairs = graft.queries.CurationQueries
      .containmentPairs(docs, dfCap = 20)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // uncapped, the stop shingles alone would emit ~499,500 pairs
    assert(pairs.length < 50,
      s"df cap must bound stop-shingle pairs: got ${pairs.length}")
    assert(pairs.contains((0L, 1L)) && pairs.contains((2L, 3L)),
      "rare-shingle containment pairs must survive the cap")
  }

  test("lshCandidates: a boilerplate band bucket of 1000 identical docs " +
      "star-links to O(d) candidates, not O(d^2)") {
    import spark.implicits._
    // identical text → identical signatures → ALL docs share every band
    // key: the worst-case hot bucket for an uncapped self-join
    val docs = (0L until 1000L)
      .map(i => (i, "same words repeated here for every single doc"))
      .toDF("doc_id", "text")
    val sigs = graft.operators.Dedup
      .minhashSignatures(docs, "doc_id", "text")
    val n = graft.operators.Dedup
      .lshCandidates(sigs, "doc_id", maxBucketSize = 100).count()
    // star linking: ≤ starCenters(2) × docs × bands(4) before distinct —
    // an uncapped join would emit 499,500 distinct pairs
    assert(n <= 2 * 1000 * 4,
      s"hot band bucket must star-link, got $n candidate pairs")
    // and the pairs still CONNECT the cluster: every doc appears
    val touched = graft.operators.Dedup
      .lshCandidates(sigs, "doc_id", maxBucketSize = 100)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .distinct().count()
    assert(touched == 1000, s"star links must cover all docs: $touched")
  }
}

package graft.properties

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-7 scale-shape gates. The r6 verdict flagged q136's
  * min-over-shingle WINDOW: a boilerplate shingle appearing in d
  * documents put all d rows into ONE window partition (one task — a
  * corpus-sized straggler at 100×). The rewritten body aggregates both
  * sides down to doc_id before anything meets, so the hot key collapses
  * map-side in a combiner-safe groupBy and no Window node exists to
  * own it.
  */
class RoundSevenProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("noveltyByDoc: one shingle planted in 1000 docs never owns a " +
      "window partition, and the hot key collapses map-side") {
    import spark.implicits._
    // Every doc carries the SAME stop 3-gram (df=1000 — the hot key)
    // plus a per-doc unique 3-gram. Doc 0 is first everywhere it
    // appears; docs 1..999 own only their unique shingle.
    val docs = (0L until 1000L)
      .map(i => (i, s"the common boilerplate u$i v$i"))
      .toDF("doc_id", "text").repartition(8)
    val res = graft.queries.CurationQueries.noveltyByDoc(docs)

    // Plan contract: NO Window operator anywhere — a window over the
    // raw shingle key is exactly the corpus-sized-partition shape this
    // gate exists to forbid. (Same discipline as PlanContractSpec's
    // q29/q96 asserts.)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Window"),
      s"novelty must aggregate+join-back, never window the shingle key:\n$plan")

    // Combiner contract: the shingle-keyed exchange carries at most one
    // row per (partition, distinct shingle) — the df=1000 stop shingle
    // contributes <= 8 partial rows, not 1000 rows into one reducer.
    // Feed volume: 1000 docs x 3 shingles each (3 distinct + hot).
    // Distinct shingles ~2001; with partial agg the two groupBys +
    // doc-keyed join shuffle well under the ~5000-row raw-feed level a
    // window form (which CANNOT partial-aggregate) is forced to move.
    val shuffledRecs = graft.Metrics.shuffleOf(spark) {
      graft.queries.CurationQueries.noveltyByDoc(docs)
        .write.format("noop").mode("overwrite").save()
    }.recordsWritten
    assert(shuffledRecs <= 20000L,
      s"hot shingle must collapse map-side, shuffled $shuffledRecs records")

    // Semantics survive the rewrite: the first doc in doc_id order gets
    // credit for the shared shingle; every doc owns its unique shingles.
    val byDoc = res.select("doc_id", "n_shingles", "n_first")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // "the common boilerplate u$i v$i" => 3 shingles per doc: the shared
    // "the common boilerplate" + 2 unique ones containing u$i/v$i
    assert(byDoc(0L) == ((3L, 3L)),
      s"doc 0 must win its unique shingles AND the shared one: ${byDoc(0L)}")
    assert((1L until 1000L).forall(i => byDoc(i) == ((3L, 2L))),
      "docs 1..999 must win exactly their two unique shingles")
  }
}

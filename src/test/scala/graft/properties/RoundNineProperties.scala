package graft.properties

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-9 equivalence gates for the serving-layout and dialect-bridge
  * machinery:
  *
  *  1. **Indexed ≡ direct incremental dedup**: `minhashIncrementalIndexed`
  *     over the bucketed serving layout ([[graft.operators.Dedup
  *     .sigIndexRows]] band rows with inline signatures) must keep the
  *     EXACT survivor set of the signature-table face on the same store
  *     — including under a replicated increment (the family-collapse
  *     regime) and a store the increment heavily collides with.
  *  2. **ASOF SQL bridge ≡ operator face**: the parse-level rewrite (a
  *     candidates → per-left-row rank-1 plan) and `Temporal.asofJoin`
  *     (the union+window plan) are DIFFERENT physical strategies for
  *     the same semantics — they must agree row for row on a generated
  *     event set with same-ts ties, unmatched rows, both directions,
  *     and the left form.
  *  3. **Narrow novelty ≡ brute force**: the r9 zero-pairs-exchange
  *     `noveltyByDoc` must equal a from-first-principles recomputation
  *     (per-doc distinct shingles, first occurrence by min doc_id)
  *     performed with an independent (collected, driver-side) oracle.
  */
class RoundNineProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("indexed incremental dedup == signature-table face, including " +
      "replicated increments") {
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val store = docs.filter(col("doc_id") < 60)
    val sigs = Dedup.minhashSignatures(store, "doc_id", "text")
    // adversarial increment: fresh docs + THREE interleaved copies of
    // stored docs 0-4 under scattered ids + a within-increment dup pair
    val increment = docs.filter(col("doc_id").between(60, 99))
      .unionByName((0 until 3).map(k =>
        docs.filter(col("doc_id") < 5)
          .select((col("doc_id") * 100 + 1000 + k).as("doc_id"),
            col("text"))).reduce(_.unionByName(_)))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val direct = ids(Dedup.minhashIncremental(
      increment, "doc_id", "text", sigs))
    val indexed = ids(Dedup.minhashIncrementalIndexed(
      increment, "doc_id", "text", Dedup.sigIndexRows(sigs, "doc_id")))
    assert(indexed == direct,
      s"serving layouts must be invisible to semantics: " +
        s"indexed=${indexed.take(10)}... direct=${direct.take(10)}...")
    // and the planted copies were condemned in both
    assert(!direct.exists(_ >= 1000),
      s"copies of stored docs must be condemned: $direct")
  }

  test("ASOF SQL bridge == Temporal.asofJoin on generated events with " +
      "ties and unmatched rows, all three forms") {
    import graft.operators.Temporal
    import spark.implicits._
    // deterministic generated set: keys 0-9, left ts = k*7+i*13 mod 50,
    // right ts multiples of 5 — guarantees exact-tie matches, unmatched
    // lefts (key 9 has no rights), and multi-candidate rows
    val left = (for (k <- 0L to 9L; i <- 0L to 9L)
      yield (k, (k * 7 + i * 13) % 50, k * 100 + i))
      .toDF("k", "ts", "lid")
    val right = (for (k <- 0L to 8L; j <- 0L to 9L)
      yield (k, j * 5, k * 1000 + j)).toDF("k", "ts", "rid")
    left.createOrReplaceTempView("ev_l")
    right.createOrReplaceTempView("ev_r")
    def viaSql(join: String, ineq: String): Set[(Long, Long, Option[Long])] =
      spark.sql(
        s"""SELECT l.lid, l.ts, r.rid FROM ev_l l $join ev_r r
           |ON l.k = r.k AND r.ts $ineq l.ts""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    def viaOp(direction: String, keep: Boolean): Set[(Long, Long, Option[Long])] =
      Temporal.asofJoin(left, right, "k", "ts", direction, keep)
        .select("lid", "ts", "r_rid")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(viaSql("ASOF JOIN", "<=") == viaOp("backward", keep = false),
      "backward inner: bridge and operator disagree")
    assert(viaSql("ASOF JOIN", ">=") == viaOp("forward", keep = false),
      "forward inner: bridge and operator disagree")
    assert(viaSql("ASOF LEFT JOIN", "<=") == viaOp("backward", keep = true),
      "backward left: bridge and operator disagree")
  }

  test("narrow novelty == driver-side brute force on a hot-shingle corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 80)
      .select(col("doc_id"),
        concat(lit("the shared boilerplate prefix "), col("text"))
          .as("text"))
    val got = graft.queries.CurationQueries.noveltyByDoc(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // independent oracle: per-doc shingle sets in plain Scala
    val raw = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val shingles: Seq[(Long, Set[String])] = raw.toSeq.map { case (id, t) =>
      val toks = t.trim.split(" ").filter(_.nonEmpty).toSeq
      id -> (if (toks.size < 3) Set.empty[String]
             else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty).sortBy(_._1)
    val firstOwner = scala.collection.mutable.Map[String, Long]()
    for ((id, sh) <- shingles; s <- sh)
      if (!firstOwner.contains(s)) firstOwner(s) = id
    val expected = shingles.map { case (id, sh) =>
      val nFirst = sh.count(s => firstOwner(s) == id).toLong
      (id, sh.size.toLong, nFirst,
        math.floor(nFirst * 10000.0 / sh.size) / 10000.0)
    }
    assert(got.toSeq == expected,
      s"novelty mismatch: got ${got.take(3)}, want ${expected.take(3)}")
  }
}

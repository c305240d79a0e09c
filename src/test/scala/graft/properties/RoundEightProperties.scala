package graft.properties

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Dedup

/** Round-8 scale-shape gates: the identical-shingle-set FAMILY COLLAPSE
  * in `Dedup.verifiedPairs` claims two things —
  *
  *  1. **Equivalence**: replicating documents (the crawl-dump regime the
  *     10× SCALE_PROBE models) changes neither the cluster structure nor
  *     the survivor set beyond the provable family expansion: every
  *     replica labels to its family's minimum, and the family minima
  *     cluster exactly as the unreplicated base corpus does.
  *  2. **Linearity**: the verified-edge set grows with REPLICAS (one
  *     rep→member edge each), never with replica PAIRS — the m² shape
  *     the collapse exists to delete.
  *
  * Driven over a real corpus slice (generator near-dups included) with
  * ADVERSARIAL replication: shifted ids interleave families across the
  * id space, so the min-id representative of a family is NOT always a
  * base doc — the equivalence must hold under relabeling, not just for
  * the convenient base-id-is-minimum layout. */
class RoundEightProperties extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("family collapse: replicated corpus clusters/survivors are the " +
      "base corpus's under family expansion; edges stay linear") {
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 60).select(col("doc_id"), col("text"))
    // 4 replicas with INTERLEAVED ids: replica k of base doc d gets id
    // d*10 + k (k=0 is the base row). Family minimum = d*10, but the
    // candidate/verification machinery sees families scattered across
    // the id space, not contiguous blocks.
    val mult = 4
    val replicated = (0 until mult).map { k =>
      base.select((col("doc_id") * 10 + k).as("doc_id"), col("text"))
    }.reduce(_.unionByName(_))

    // --- equivalence: clusters ---------------------------------------
    val baseClusters = Dedup.connectedComponents(
        Dedup.minhashEdges(base, "doc_id", "text",
          maxBucketSize = Int.MaxValue))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repClusters = Dedup.connectedComponents(
        Dedup.minhashEdges(replicated, "doc_id", "text",
          maxBucketSize = Int.MaxValue))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // expected: replica (d, k) labels to 10 * (base cluster label of d)
    // — base docs without edges keep their own id (absent from the map)
    for (d <- 0L until 60L; k <- 0 until mult) {
      val expected = 10L * baseClusters.getOrElse(d, d)
      val got = repClusters.getOrElse(d * 10 + k, d * 10 + k)
      assert(got == expected,
        s"replica ($d, $k): labeled $got, expected $expected")
    }

    // --- equivalence: survivors --------------------------------------
    val baseKept = Dedup.minhashLsh(base, "doc_id", "text",
        maxBucketSize = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val repKept = Dedup.minhashLsh(replicated, "doc_id", "text",
        maxBucketSize = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // survivors of the replicated corpus = the k=0 replica of each base
    // survivor (every k>0 replica is dominated by its family minimum;
    // family minima are dominated exactly when their base doc was)
    assert(repKept == baseKept.map(_ * 10),
      s"survivor set must be the base survivors' minima: got " +
        s"${repKept.toSeq.sorted.take(10)}… expected " +
        s"${baseKept.map(_ * 10).toSeq.sorted.take(10)}…")

    // --- linearity: edge count ---------------------------------------
    val baseEdges = Dedup.minhashEdges(base, "doc_id", "text",
      maxBucketSize = Int.MaxValue).count()
    val repEdges = Dedup.minhashEdges(replicated, "doc_id", "text",
      maxBucketSize = Int.MaxValue).count()
    // every doc with >= 3 tokens contributes (mult - 1) family edges;
    // rep-level edges equal the base corpus's (one per verified base
    // pair). The all-members graph would instead carry
    // C(mult,2) = 6 intra-family pairs per doc PLUS mult^2 = 16 copies
    // of every base edge — assert the collapse's exact arithmetic.
    val docsWithShingles = base
      .select(col("doc_id"),
        expr(graft.operators.TextHashes.toks("text")).as("t"))
      .filter(size(col("t")) >= 3).count()
    assert(repEdges == baseEdges + (mult - 1) * docsWithShingles,
      s"edges must be base ($baseEdges) + ${mult - 1} per family " +
        s"($docsWithShingles families), got $repEdges")
  }
}

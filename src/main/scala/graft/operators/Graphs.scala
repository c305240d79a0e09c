package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration iterative graph computation (round 16 — the one
  * operator CLASS the inventory lacked): weighted PageRank over a
  * token co-occurrence graph, i.e. TextRank keyword extraction
  * (Mihalcea & Tarau 2004, on Page et al. 1999's random surfer). The
  * reference's warehouse answers "what are the salient terms" with
  * exact top-word counts (q42); TextRank is the graph-structural
  * version a curation pipeline uses when frequency alone ranks
  * boilerplate above content.
  *
  * **Fixed-point integer contract.** A floating-point PageRank is not
  * differentially testable: per-node contribution sums run in
  * partition order, so two engines (or two runs) disagree in the last
  * ulps, and five iterations compound the disagreement. Ranks here are
  * BIGINT fixed-point at 1e4 scale (r0 = 10000 ≡ 1.0), every division
  * floors, and every intermediate stays an exact integer — bit-equal
  * on any engine, any partitioning, any summation order:
  *
  *   r'(v) = 1500 + floor(85 · Σ_u floor(w(u,v) · r(u) / wdeg(u)) / 100)
  *
  * (damping 0.85 split into the exact 85/100; 1500 = (1−d)·1e4). The
  * per-term floor biases each contribution down by < 1 fixed-point ulp
  * (1e-4) — a defined, deterministic variant, not an approximation
  * drift. Floors are evaluated as floor(double-division) both engines:
  * exact while w·r < 2^53 (a 1e4-fixed-point rank against per-edge
  * weights leaves ~9 decimal orders of headroom over this corpus; a
  * deployment needing more rescales the fixed point down).
  *
  * **Scale shape.** Edges = adjacent-token pairs — one narrow
  * transform + one |E|-bounded aggregate (|E| ≤ |vocab|², in practice
  * the distinct-bigram count). Each iteration is ONE join (ranks ⋈
  * edges on src) + ONE |V|-keyed aggregate — on a real cluster,
  * pre-partition edges by src once and every iteration's join is
  * co-partitioned (zero edge movement; only the |V|-sized rank vector
  * shuffles). The edge frame is consumed by all iterations, so it is
  * checkpoint-pinned once (q185's sibling-consumer rule — unpinned,
  * the tokenize scan would re-run per iteration); the pinned frame is
  * |E| rows, strictly smaller than one corpus pass. */
object Graphs {

  /** The undirected co-occurrence edge frame `(src, dst, w)`: adjacent
    * token pairs within each doc, both directions, self-loops dropped,
    * w = occurrence count. Both orientations come out of ONE generate
    * (each adjacent pair emits its two directed structs inside the
    * same flatten) — a union of two references to the unpinned
    * tokenize subtree would run the corpus scan twice (q185's
    * sibling-consumer rule applies INSIDE an operator build too). */
  def cooccurrenceEdges(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(expr(TextHashes.toks(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(1, size(toks) - 1),
          |  i -> array(named_struct('src', element_at(toks, i),
          |                          'dst', element_at(toks, i + 1)),
          |             named_struct('src', element_at(toks, i + 1),
          |                          'dst', element_at(toks, i)))))"""
          .stripMargin)).as("p"))
      .filter(col("p.src") =!= col("p.dst"))
      .groupBy(col("p.src").as("src"), col("p.dst").as("dst"))
      .agg(count(lit(1)).as("w"))

  /** Fixed-point TextRank over [[cooccurrenceEdges]]: `(token, r_fp,
    * rank)` with `r_fp` the exact BIGINT fixed-point rank (the
    * deterministic sort/compare key) and `rank` = r_fp/1e4 rounded to
    * 4 (the human-facing value). Every node in the graph appears (an
    * undirected edge gives both endpoints in-edges, so no dangling
    * handling is needed; tokens never adjacent to a different token
    * are out of the graph by definition). */
  def textRank(docs: DataFrame, textCol: String,
               iterations: Int = 5): DataFrame = {
    val edges = cooccurrenceEdges(docs, textCol).localCheckpoint(false) // lazy pin (r19): every iteration full-scans
    val wdeg = edges.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    // (src, dst, w, wdeg) — derived lazily from the PINNED edges each
    // iteration (two |E|-bounded ops per pass; the expensive tokenize
    // scan ran exactly once, into the checkpoint)
    val ew = edges.join(wdeg, "src")
    var ranks = wdeg.select(col("src").as("tok"), lit(10000L).as("r"))
    for (_ <- 1 to iterations) {
      ranks = ew.join(ranks, ew("src") === ranks("tok"))
        .select(col("dst"),
          floor(col("w") * col("r") / col("wdeg")).cast("long").as("t"))
        .groupBy(col("dst"))
        .agg(sum(col("t")).as("contrib"))
        .select(col("dst").as("tok"),
          (lit(1500L) +
            floor(col("contrib") * lit(85L) / lit(100)).cast("long"))
            .as("r"))
    }
    ranks.select(col("tok").as("token"), col("r").as("r_fp"),
      (round(col("r") / 10000.0, 4) + 0.0).as("rank"))
  }
}

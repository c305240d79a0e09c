package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset-mixing operators (builder mandate: the
  * curation step that composes a training corpus from heterogeneous
  * sources at fixed ratios — "30k docs of language A, 10k of B" or
  * "keep 25% of crawl X, all of curated Y"). Both faces are
  * reproducible across runs AND engines: selection is keyed on a
  * portable md5 of the row id, never `rand()`, so a re-run of the
  * pipeline (or the DuckDB oracle) picks the identical rows.
  */
object Sampling {

  /** EXACT-count stratified sample: for each stratum named in `counts`,
    * keep exactly that many rows — the smallest-`md5(id)` ones, id as
    * the tiebreak (fewer rows than asked keeps them all). Strata not in
    * `counts` are dropped, so the output IS the declared mixture.
    *
    * Scale shape: one exchange on the stratum key and a per-stratum
    * ranked window — and the `rank <= n` filter is pushed BELOW the
    * exchange by WindowGroupLimit (same contract as q39's top-k per
    * group, plan-pinned in SamplingSpec), so a billion-row stratum
    * ships ~partitions × n rows, never the stratum. The hash order
    * makes the kept set stable under corpus growth ONLY in
    * distribution, not membership (a new doc hashing low displaces the
    * previous n-th) — for membership-stable increments use
    * [[stratifiedRate]]. */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: String,
                      counts: Map[String, Long]): DataFrame = {
    require(counts.nonEmpty && counts.values.forall(_ >= 0),
      "need a non-empty strata -> count map with counts >= 0")
    val cmap = map(counts.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__n", element_at(cmap, col(strataCol).cast("string")))
      .filter(col("__n").isNotNull)
      .withColumn("__rk", row_number().over(w))
      // the LITERAL bound (max over all strata) is what lets Catalyst
      // plan WindowGroupLimit — rank <= column is opaque to the rule,
      // rank <= literal prunes each stratum to max(n) rows MAP-SIDE,
      // before the exchange; the per-stratum exact cut follows
      .filter(col("__rk") <= lit(counts.values.max))
      .filter(col("__rk") <= col("__n"))
      .drop("__n", "__rk")
  }

  /** Uniform-ish [0,1) hash of the id under a salt: the first four hex
    * nibbles of md5 (portable `instr` arithmetic, granularity 1/65536 —
    * the same trick the SimHash/fingerprint family uses, DuckDB-
    * replicable verbatim). */
  private def hashFrac(idCol: String, salt: String) = {
    // both land inside an expr() SQL string: restrict to shapes that
    // can't break parsing (a quote in the salt) or smuggle expressions
    require(salt.matches("[A-Za-z0-9_.:-]*"),
      s"salt must be [A-Za-z0-9_.:-]*, got '$salt'")
    require(idCol.matches("[A-Za-z0-9_]+"),
      s"idCol must be a plain identifier, got '$idCol'")
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substr(md5(concat('$salt:', cast($idCol as string))),$i,1)) - 1)"
    expr(s"(${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) / 65536.0")
  }

  /** RATE-based stratified mixture: keep each stratum's rows whose
    * id-hash falls under the stratum's fraction — "all of Y, a quarter
    * of X". Fully NARROW (a codegen'd filter, zero shuffle, zero
    * window), and membership-stable: a row's keep/drop decision never
    * changes as the corpus grows, so incremental slices can be mixed
    * independently and unioned (the property exact counts cannot
    * have). Strata not in `fractions` are dropped. `salt` decorrelates
    * this gate from other hash-keyed decisions on the same ids (e.g.
    * `TextPipeline.hashSplit`). */
  def stratifiedRate(df: DataFrame, strataCol: String, idCol: String,
                     fractions: Map[String, Double],
                     salt: String = "mix"): DataFrame = {
    require(fractions.nonEmpty &&
      fractions.values.forall(f => f >= 0 && f <= 1),
      "need a non-empty strata -> fraction map with fractions in [0, 1]")
    val fmap = map(fractions.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    df.withColumn("__f", element_at(fmap, col(strataCol).cast("string")))
      .filter(col("__f").isNotNull &&
        hashFrac(idCol, salt) < col("__f"))
      .drop("__f")
  }
}

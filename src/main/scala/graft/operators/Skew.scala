package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for heavy-hitter keys (SURVEY.md §2.8 /
  * builder scale mandate). AQE's skew-join splitting handles most cases
  * at runtime; these are the explicit forms for when the skew is known
  * (a handful of keys holding a large share of a 100 TB table) or when
  * the aggregation buffer itself is the bottleneck.
  *
  * INPUT CONTRACT: both salted forms derive the salt from
  * (partition id, row position) — which a task RETRY reproduces only
  * when the input recomputes deterministically in the same order.
  * Direct file-source scans do (Spark replays the same splits in the
  * same order — the q89/q116 shape); applying these operators
  * DOWNSTREAM OF ANOTHER SHUFFLE does not (intra-partition order can
  * differ across retries — the SPARK-23207 class), so a lost-executor
  * recompute could re-salt rows already consumed by completed reducers.
  * For shuffled inputs, pre-assign a stable row id and salt by
  * `pmod(hash(id), n)` instead.
  */
object Skew {

  /** Two-phase (salted) aggregation: counts/sums group first by
    * (key, salt) — spreading a hot key across `saltBuckets` reducers —
    * then re-aggregate by key. Correct for any algebraic aggregate
    * expressible as (partialAgg, mergeAgg) pairs; count/sum given here.
    *
    * Phase 1 shuffles on (key, salt): a key holding 30% of the table now
    * occupies saltBuckets reducers instead of one. Phase 2's input is at
    * most |keys| × saltBuckets rows — negligible. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.select(key.as("k"), value.as("v"))
      .withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col("k"), col("__salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("sum_v"))
  }

  /** Salted broadcast-side replicated join for a skewed fact⋈dim join
    * where the dim is too large to broadcast whole but the skew lives in
    * a few fact keys: fact rows get a random salt, dim rows are
    * replicated across all salts, and the join key becomes (key, salt) —
    * no single reducer sees the whole hot key.
    *
    * `salts` multiplies the dim side — use the smallest value that
    * flattens the skew (typically 8–32). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}

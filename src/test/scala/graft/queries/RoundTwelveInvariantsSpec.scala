package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Mathematical invariants of the round-12 operators on sf0.001 —
  * properties the DuckDB hash gate cannot express (it proves engine
  * AGREEMENT; these prove the statistics are the statistics they
  * claim to be). */
class RoundTwelveInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q170 largest-remainder quotas: sum EXACTLY the budget, each " +
      "within 1 of the exact proportional share") {
    val rows = run("q170_stratified_quota").collect()
    val n = rows.map(_.getAs[Long]("n_c")).sum
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L,
      "Hamilton allocation must exhaust the budget exactly")
    rows.foreach { r =>
      val exact = 1000.0 * r.getAs[Long]("n_c") / n
      val q = r.getAs[Long]("quota")
      assert(math.abs(q - exact) < 1.0,
        s"quota $q deviates >=1 from exact share $exact (quota rule)")
    }
  }

  test("q174 Gini lies in [0, 1) and equals the O(n^2) mean-absolute-" +
      "difference definition") {
    val gini = run("q174_activity_gini").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("gini"))
      .toMap
    assert(gini.values.forall(g => g >= 0.0 && g < 1.0))
    // reference: G = sum_ij |x_i - x_j| / (2 n^2 mu), truncated at 4.
    // The sorted-rank closed form (2*sum(i*x_i) - (n+1)*S) / (n*S) is
    // algebraically identical; check one type end-to-end.
    val xs = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .collect().map(_.getAs[Long]("x").toDouble)
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
    val ref = math.floor(mad / (2 * n * n * mu) * 10000) / 10000.0
    assert(math.abs(gini("click") - ref) <= 1e-4,
      s"closed form ${gini("click")} vs O(n^2) definition $ref")
  }

  test("q178 coverage is non-decreasing in k and bounded by 1; " +
      "q167 JS divergence lies in [0, ln 2]") {
    val cov = run("q178_coverage_curve").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("coverage"))
      .sortBy(_._1)
    assert(cov.map(_._2).sameElements(cov.map(_._2).sorted),
      "more vocabulary cannot cover less mass")
    assert(cov.forall { case (_, c) => c >= 0.0 && c <= 1.0 })
    val js = run("q167_js_divergence").collect().head
      .getAs[Double]("js_divergence")
    assert(js >= 0.0 && js <= math.log(2) + 1e-9,
      s"JS divergence $js outside [0, ln 2]")
  }

  test("q177 per-source entropy is bounded by ln(#destinations); the " +
      "pooled rate is a convex combination of the per-source entropies") {
    val rows = run("q177_markov_entropy").collect()
    // bound by the GLOBAL event-type count, not the result row count:
    // the result has one row per distinct SOURCE, but a type that only
    // ever appears as a destination still widens the true support, so
    // ln(#result rows) can spuriously under-bound on skewed data
    val nTypes = spark.read
      .parquet(s"$sf/events.parquet")
      .select("event_type").distinct().count()
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0 && h <= math.log(nTypes.toDouble) + 1e-9,
        s"entropy $h exceeds ln($nTypes)")
    }
    val hs = rows.map(_.getAs[Double]("entropy"))
    val rate = rows.head.getAs[Double]("entropy_rate")
    assert(rate >= hs.min - 1e-9 && rate <= hs.max + 1e-9,
      "a weighted mean must lie within the per-source range")
  }

  test("q175 quartiles are ordered within the extremes; q179 " +
      "correlations lie in [-1, 1]; q169 inverse-frequency weights " +
      "average to 1 over the event stream") {
    val p = run("q175_embed_norms").collect().head
    val (mn, p25, p50, p75, mx) = (p.getAs[Double]("min_norm"),
      p.getAs[Double]("p25"), p.getAs[Double]("p50"),
      p.getAs[Double]("p75"), p.getAs[Double]("max_norm"))
    assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx)
    run("q179_lag_corr").collect().foreach { r =>
      val c = r.getAs[Double]("lag1_corr")
      assert(c >= -1.0 && c <= 1.0, s"corr $c outside [-1, 1]")
    }
    // sum over classes of n_c * (N / (k*n_c)) = N: the weighted event
    // stream keeps its total mass (within the 1e-4 truncation per class)
    val w = run("q169_class_weights").collect()
    val n = w.map(_.getAs[Long]("n_c")).sum.toDouble
    val mass = w.map(r => r.getAs[Long]("n_c") * r.getAs[Double]("w_inv")).sum
    assert(math.abs(mass - n) <= w.length * 1e-4 * n,
      s"inverse-frequency mass $mass drifts from $n beyond truncation")
  }

  test("q172 hapax ratios and q173 MATTR lie in (0, 1]; q171 VMR is " +
      "non-negative; q168 unseen mass lies in [0, 1]") {
    run("q172_hapax_ratio").collect().foreach { r =>
      val x = r.getAs[Double]("hapax_ratio")
      assert(x >= 0.0 && x <= 1.0)
    }
    run("q173_mattr").collect().foreach { r =>
      val m = r.getAs[Double]("mattr")
      assert(m > 0.0 && m <= 1.0, s"MATTR $m outside (0, 1]")
    }
    run("q171_burstiness").collect().foreach { r =>
      assert(r.getAs[Double]("vmr") >= 0.0, "variance/mean cannot be negative")
    }
    run("q168_good_turing").collect().foreach { r =>
      val p0 = r.getAs[Double]("p0_unseen")
      assert(p0 >= 0.0 && p0 <= 1.0)
    }
  }

  test("q180 KS statistic lies in [0, 1]; q181 MI is non-negative and " +
      "bounded by both marginal entropies; q182 mean <= max distance") {
    val ks = run("q180_ks_test").collect().head.getAs[Double]("ks_d")
    assert(ks >= 0.0 && ks <= 1.0, s"KS D $ks outside [0, 1]")
    val mi = run("q181_mutual_info").collect().head
    val (m, hl, hs) = (mi.getAs[Double]("mi"), mi.getAs[Double]("h_lang"),
      mi.getAs[Double]("h_source"))
    assert(m >= -1e-4, s"MI $m negative beyond rounding")
    assert(m <= math.min(hl, hs) + 1e-4,
      s"MI $m exceeds min marginal entropy ${math.min(hl, hs)}")
    run("q182_label_cohesion").collect().foreach { r =>
      assert(r.getAs[Double]("mean_dist") <= r.getAs[Double]("max_dist") + 1e-9)
    }
  }

  test("q176 within-type shares sum to 1 up to the per-cell truncation") {
    val rows = run("q176_hour_profile").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, cells) =>
      val s = cells.map(_.getAs[Double]("share")).sum
      assert(s <= 1.0 + 1e-9 && s >= 1.0 - cells.length * 1e-4,
        s"$t shares sum to $s (cells=${cells.length})")
    }
  }
}

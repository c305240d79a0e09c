package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sketch estimators vs exact answers on the synthetic tables: HLL
  * within its error bound, sketch UNION equals rescanning (the
  * mergeable-artifact property), CMS never under-counts. */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("hllDistinct tracks exact count-distinct within the bound") {
    val li = graft.Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.hllDistinct(li, "l_returnflag", "l_partkey")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= n * 0.05,
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }

  test("sketch union over partitions equals re-scanning the union") {
    val li = graft.Tables.lineitem(spark, sf)
    // two disjoint 'daily' slices, sketched separately (the persisted-
    // artifact scenario), then unioned without touching rows again
    val day1 = Sketches.hllSketches(
      li.filter(col("l_orderkey") % 2 === 0), "l_returnflag", "l_partkey")
    val day2 = Sketches.hllSketches(
      li.filter(col("l_orderkey") % 2 === 1), "l_returnflag", "l_partkey")
    val merged = Sketches.hllUnionEstimate(
      day1.unionByName(day2), "l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n) <= n * 0.05,
        s"$k: union-estimate ${merged(k)} vs exact $n")
    }
  }

  // rank of `v` in `xs` (count of values <= v) must sit within
  // eps*n (+1 interpolation slack) of the target rank p*n — the GK
  // guarantee, checked on VALUES via ranks so near-duplicate prices
  // can't mask a violation
  private def assertRankBound(xs: Array[Double], p: Double, v: Double,
                              eps: Double, what: String): Unit = {
    val n = xs.length
    val rank = xs.count(_ <= v)
    val target = p * n
    assert(math.abs(rank - target) <= eps * n + 1,
      s"$what: value $v has rank $rank, target $target, n=$n")
  }

  test("quantileSketch estimates sit within the rank-error bound of exact") {
    val sfSmall = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sfSmall)
    val eps = 0.01
    val pcts = Seq(0.25, 0.5, 0.75)
    val est = Sketches.approxQuantiles(li, "l_returnflag",
        "l_extendedprice", pcts, eps)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, xs) =>
      pcts.zipWithIndex.foreach { case (p, i) =>
        assertRankBound(xs, p, est(k)(i), eps, s"group $k p$p")
      }
    }
  }

  test("quantile sketch union over daily artifacts equals rescanning (bound holds)") {
    val sfSmall = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sfSmall)
    val eps = 0.01
    // two disjoint 'daily' slices sketched separately, persisted-artifact
    // style, then unioned without touching rows again
    val day1 = Sketches.quantileSketch(
      li.filter(col("l_orderkey") % 2 === 0), "l_returnflag",
      "l_extendedprice", eps)
    val day2 = Sketches.quantileSketch(
      li.filter(col("l_orderkey") % 2 === 1), "l_returnflag",
      "l_extendedprice", eps)
    val merged = Sketches.quantileUnionEstimate(
        day1.unionByName(day2), "l_returnflag", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val exact = li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    exact.foreach { case (k, xs) =>
      // merging two eps-sketches can cost up to 2*eps rank error
      assertRankBound(xs, 0.5, merged(k), 2 * eps, s"union group $k median")
    }
  }

  test("count-min frequency never under-counts and stays close") {
    val ev = graft.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val items = exact.keys.toSeq.sorted
    val approx = Sketches.itemFrequency(ev, "event_type", items)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    items.foreach { t =>
      assert(approx(t) >= exact(t), "CMS can only over-count")
      assert(approx(t) <= exact(t) + (ev.count() * 0.01).toLong,
        s"$t: ${approx(t)} too far above ${exact(t)}")
    }
  }

  test("portable CMS never under-counts, and counter matrices merge by union") {
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(expr(TextHashes.toks("text"))).as("tok"))
    val counters = Sketches.cmsCounters(toks, "tok")
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
    val est = Sketches.cmsEstimate(exact.select("tok"), "tok", counters)
      .join(exact, "tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    est.foreach { case (t, e, n) =>
      assert(e >= n, s"$t: CMS estimate $e under-counts exact $n")
    }
    // mergeability: counters over two disjoint slices, unioned and
    // re-aggregated cell-wise, equal the counters over the whole stream
    val docs = graft.Tables.documents(spark, sf)
    def slice(p: org.apache.spark.sql.Column) = docs.filter(p)
      .select(explode(expr(TextHashes.toks("text"))).as("tok"))
    val merged = Sketches
      .cmsCounters(slice(col("doc_id") % 2 === 0), "tok")
      .unionByName(Sketches.cmsCounters(slice(col("doc_id") % 2 === 1), "tok"))
      .groupBy("j", "b").agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val whole = counters
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == whole, "cell-wise union of slice counters must equal the whole-stream matrix")
  }

  test("portable HLL tracks exact distinct within the m=16 bound, and register tables merge by max") {
    val toks = graft.Tables.documents(spark, sf)
      .select(col("source"),
        explode(expr(TextHashes.toks("text"))).as("tok"))
    val est = Sketches.hllEstimate(
        Sketches.hllRegisters(toks, "source", "tok"), "source")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = toks.groupBy("source").agg(countDistinct(col("tok")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      // m=16 raw bound is ~26% rel. error; small cardinalities ride
      // the linear-counting branch which is tighter — allow the loose
      // raw bound plus absolute slack for tiny groups
      assert(math.abs(est(k) - n) <= n * 0.35 + 3,
        s"$k: estimate ${est(k)} vs exact $n")
    }
    // mergeability: register tables over two disjoint slices, unioned
    // and re-maxed cell-wise, equal the whole-stream registers
    val docs = graft.Tables.documents(spark, sf)
    def slice(p: org.apache.spark.sql.Column) = docs.filter(p)
      .select(col("source"),
        explode(expr(TextHashes.toks("text"))).as("tok"))
    val merged = Sketches
      .hllRegisters(slice(col("doc_id") % 2 === 0), "source", "tok")
      .unionByName(
        Sketches.hllRegisters(slice(col("doc_id") % 2 === 1), "source", "tok"))
      .groupBy("source", "j").agg(max(col("mj")).as("mj"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    val whole = Sketches.hllRegisters(toks, "source", "tok")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(merged == whole,
      "cell-wise max of slice registers must equal the whole-stream table")
  }

  test("bloom filter has no false negatives, and the committed store serves identically") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val items = docs
      .select(col("doc_id"), expr(TextHashes.toks("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(TextHashes.shingleSet("toks"))).as("s"))
    val ev = items.filter(col("doc_id") < 20).select("s").distinct()
    val bits = Sketches.bloomBits(ev, "s")
    // no false negatives: screening the EVAL docs against their own
    // filter must flag every single shingle
    val self = Sketches.bloomScreen(
        items.filter(col("doc_id") < 20), "doc_id", "s", bits)
      .collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.get(0)}: ${r.getLong(2)} of ${r.getLong(1)} shingles flagged — a Bloom false negative")
    }
    // store round-trip: bloomServe from the committed artifact must
    // equal the inline screen bit-for-bit; an uncommitted path refuses
    val path = java.nio.file.Files
      .createTempDirectory("graft-bloom-spec").toString
    val batch = items.filter(col("doc_id") >= 20)
    intercept[IllegalArgumentException] {
      Sketches.bloomServe(spark, path, batch, "doc_id", "s").collect()
    }
    Sketches.saveBloomStore(ev, "s", path)
    val inline = Sketches.bloomScreen(batch, "doc_id", "s", bits)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val served = Sketches.bloomServe(spark, path, batch, "doc_id", "s")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(served == inline, "store-served screen must equal the inline screen")
  }
}

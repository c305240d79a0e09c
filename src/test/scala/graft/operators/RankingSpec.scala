package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** approxNtile = the distributed scale path for q29's exact global
  * ntile: cross-checked against the exact window on sf0.001. */
class RankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approxNtile matches exact ntile on sf0.001 (high accuracy)") {
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select("c_custkey", "c_acctbal")
    val exact = cust.withColumn("q_exact",
      ntile(4).over(Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc))
        .cast("long"))
    val both = Ranking.approxNtile(exact, "c_acctbal", 4, tileCol = "q_approx",
      accuracy = 1000000)
    val n = both.count()
    val mismatched = both.filter(col("q_exact") =!= col("q_approx")).count()
    // value-based split vs row-count split can only disagree on rows tied
    // with a boundary value; at full sketch accuracy that is ~0 here
    assert(mismatched <= n / 100,
      s"approx tiles must track exact ntile: $mismatched/$n mismatched")
    // tiles must stay balanced (each within 2% of n/4)
    val sizes = both.groupBy("q_approx").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    sizes.values.foreach(c =>
      assert(math.abs(c - n / 4.0) <= n * 0.02, s"unbalanced tiles: $sizes"))
  }

  test("exactNtile + exactPercentRank match the single-task window exactly (sf0.01)") {
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.01")
      .select("c_custkey", "c_acctbal")
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val expected = cust.select(
        col("c_custkey"),
        ntile(4).over(w).cast("long").as("q_exact"),
        percent_rank().over(w).as("pr_exact"))
    val ord = Seq("c_acctbal", "c_custkey")
    val got = Ranking.exactPercentRank(
        Ranking.exactNtile(cust, ord, 4, tileCol = "q_dist", partitions = 8),
        ord, prCol = "pr_dist", partitions = 8)
      .select("c_custkey", "q_dist", "pr_dist")
    val joined = expected.join(got, "c_custkey")
    assert(joined.count() == cust.count())
    assert(joined.filter(col("q_exact") =!= col("q_dist")).count() == 0,
      "distributed ntile must be bit-identical to the window form")
    assert(joined.filter(abs(col("pr_exact") - col("pr_dist")) > 1e-12).count() == 0,
      "distributed percent_rank must match the window form")
    // the fused single-pass form must agree with both
    val fused = Ranking.exactNtilePercentRank(cust, ord, 4,
        tileCol = "q_f", prCol = "pr_f", partitions = 8)
      .select("c_custkey", "q_f", "pr_f")
    val jf = expected.join(fused, "c_custkey")
    assert(jf.filter(col("q_exact") =!= col("q_f")).count() == 0,
      "fused ntile must be bit-identical to the window form")
    assert(jf.filter(abs(col("pr_exact") - col("pr_f")) > 1e-12).count() == 0,
      "fused percent_rank must match the window form")
  }

  test("exactRowNumber is a 1..N permutation honoring the order (small N edge)") {
    import spark.implicits._
    // N=3 < partitions AND < ntile n: offsets, ANSI-safe tile math, and
    // the q=0 branch all get exercised
    val tiny = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val rn = Ranking.exactRowNumber(tiny, Seq("k"), partitions = 8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("rn")).toMap
    assert(rn == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val tiles = Ranking.exactNtile(tiny, Seq("k"), 5, partitions = 8)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("tile")).toMap
    assert(tiles == Map(1L -> 1L, 2L -> 2L, 3L -> 3L),
      "N < n: each row its own tile, no division blow-up")
  }

  test("exactQuantilesByGroup matches the percentile aggregate exactly (sf0.01)") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val got = Ranking.exactQuantilesByGroup(li, "l_returnflag",
        "l_extendedprice", Seq(0.25, 0.5, 0.75), partitions = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](1); (p(0), p(1), p(2))
      }).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { g =>
      val (g1, g2, g3) = got(g); val (w1, w2, w3) = want(g)
      assert(math.abs(g1 - w1) < 1e-9 && math.abs(g2 - w2) < 1e-9 &&
        math.abs(g3 - w3) < 1e-9, s"group $g: $got vs $want")
    }
  }

  test("exactQuantilesByGroup edges: single-row group, integer-rank targets") {
    import spark.implicits._
    // group a: one value (every quantile = it); group b: 1..5 (p=0.5
    // lands exactly on rank 3, p=0.25 interpolates between ranks 2,3)
    val df = (Seq((100.0, "a")) ++ (1 to 5).map(v => (v.toDouble, "b")))
      .toDF("v", "g")
    val q = Ranking.exactQuantilesByGroup(df, "g", "v", Seq(0.25, 0.5),
        partitions = 4)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(q("a") == ((100.0, 100.0)))
    assert(q("b") == ((2.0, 3.0)))
  }

  test("exactQuantilesByGroupMulti fuses columns: one pass, per-column parity") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val fused = Ranking.exactQuantilesByGroupMulti(li, "l_returnflag",
        Seq("l_quantity" -> Seq(0.5), "l_extendedprice" -> Seq(0.25, 0.75)),
        partitions = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m"),
        expr("percentile(l_extendedprice, array(0.25, 0.75))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](2); (r.getDouble(1), p(0), p(1))
      }).toMap
    assert(fused.keySet == want.keySet)
    fused.keySet.foreach { g =>
      val (f1, f2, f3) = fused(g); val (w1, w2, w3) = want(g)
      assert(math.abs(f1 - w1) < 1e-9 && math.abs(f2 - w2) < 1e-9 &&
        math.abs(f3 - w3) < 1e-9, s"group $g: $fused vs $want")
    }
  }

  test("exactQuantilesByGroupScan matches the percentile aggregate exactly (sf0.01)") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val got = Ranking.exactQuantilesByGroupScan(li, "l_returnflag",
        Seq("l_quantity" -> Seq(0.5), "l_extendedprice" -> Seq(0.25, 0.75)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("m"),
        expr("percentile(l_extendedprice, array(0.25, 0.75))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](2); (r.getDouble(1), p(0), p(1))
      }).toMap
    assert(got == want,
      "histogram-refinement selection must be bit-exact vs percentile()")
  }

  test("exactQuantilesByGroupScan refinement edges: tiny cap forces rounds") {
    import spark.implicits._
    // collectCap=1 with buckets=2: every target must refine to a
    // single-row (or single-value) interval — exercises the bucket
    // walk, offset accounting, and last-bucket hi-edge carry
    val df = (Seq((100.0, "a")) ++ (1 to 9).map(v => (v.toDouble, "b")))
      .toDF("v", "g")
    val q = Ranking.exactQuantilesByGroupScan(df, "g",
        Seq("v" -> Seq(0.0, 0.25, 0.5, 1.0)), buckets = 2, collectCap = 1)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(q("a") == ((100.0, 100.0, 100.0, 100.0)))
    assert(q("b") == ((1.0, 3.0, 5.0, 9.0)))
    // duplicate-heavy group: interval narrows to a repeated value
    val dup = Seq.fill(50)(7.0).map((_, "c")) ++ Seq((1.0, "c"), (9.0, "c"))
    val qd = Ranking.exactQuantilesByGroupScan(dup.toDF("v", "g"), "g",
        Seq("v" -> Seq(0.5)), buckets = 2, collectCap = 1)
      .head().getDouble(1)
    assert(qd == 7.0)
  }

  test("quantile scan: non-finite values and timestamp/null group keys") {
    import spark.implicits._
    // ±Inf/NaN sort as -Inf < finite < +Inf < NaN in both engines; the
    // scan classifies their ranks by region instead of refining (an
    // interval can't hold them: nextUp(NaN)=NaN, infinite bucket width)
    val nf = Seq(("a", Double.NegativeInfinity), ("a", 1.0), ("a", 2.0),
      ("a", Double.PositiveInfinity), ("a", Double.NaN),
      ("b", Double.NaN), ("b", Double.NaN)).toDF("g", "v")
    val got = Ranking.exactQuantilesByGroupScan(nf, "g",
        Seq("v" -> Seq(0.0, 0.5, 1.0)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = nf.groupBy("g")
      .agg(expr("percentile(v, array(0.0, 0.5, 1.0))").as("p"))
      .collect().map(r => r.getString(0) -> {
        val p = r.getSeq[Double](1); (p(0), p(1), p(2))
      }).toMap
    def same(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b
    assert(got.keySet == want.keySet)
    got.keySet.foreach { g =>
      assert(same(got(g)._1, want(g)._1) && same(got(g)._2, want(g)._2) &&
        same(got(g)._3, want(g)._3), s"group $g: ${got(g)} vs ${want(g)}")
    }
    // timestamp group keys: java.sql.Timestamp.toString renders a
    // trailing ".0" that Spark's cast-to-string does not — the join
    // keys must come from Spark's cast on BOTH sides (scan + Multi)
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val ts = Seq((t1, 1.0), (t1, 3.0), (t1, 5.0), (t2, 10.0), (t2, 20.0))
      .toDF("g", "v")
    val wantTs = Map(t1 -> 3.0, t2 -> 15.0)
    val gotScan = Ranking.exactQuantilesByGroupScan(ts, "g",
        Seq("v" -> Seq(0.5)), collectCap = 1)
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(gotScan == wantTs, s"scan timestamp groups: $gotScan")
    val gotMulti = Ranking.exactQuantilesByGroup(ts, "g", "v", Seq(0.5),
        partitions = 4)
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    assert(gotMulti == wantTs, s"range-sort timestamp groups: $gotMulti")
    // null group keys rank too (null-safe join in the scan)
    val ng = Seq((null.asInstanceOf[String], 1.0), (null, 3.0), ("x", 5.0))
      .toDF("g", "v")
    val gotNull = Ranking.exactQuantilesByGroupScan(ng, "g",
        Seq("v" -> Seq(0.5)), collectCap = 1)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(gotNull == Map(None -> 2.0, Some("x") -> 5.0),
      s"null group must not be dropped: $gotNull")
  }

  test("quantile scan: -0.0 and +0.0 share a bin (SQL equality)") {
    import spark.implicits._
    // SQL comparisons treat -0.0 == 0.0, so the sortable-bits coarse
    // binning must too: with them split, a -0.0 row is counted in the
    // prefix-sum offset AND re-matched by `__v >= 0.0` refinement
    // filters, skewing ranks that land inside the zero run's tail
    val df = Seq(-0.0, -0.0, 0.0, 0.0, 1.0, 2.0).map(("g", _)).toDF("g", "v")
    for (cap <- Seq(1, 1000)) {
      val got = Ranking.exactQuantilesByGroupScan(df, "g",
          Seq("v" -> Seq(0.0, 0.25, 0.5, 0.75, 1.0)), buckets = 4,
          collectCap = cap)
        .head()
      val want = df.agg(
          expr("percentile(v, array(0.0, 0.25, 0.5, 0.75, 1.0))")).head()
        .getSeq[Double](0)
      (1 to 5).foreach { i =>
        assert(got.getDouble(i) == want(i - 1),
          s"cap=$cap q${i - 1}: ${got.getDouble(i)} vs ${want(i - 1)}")
      }
    }
    // the bit image itself must map the two zeros to ONE key
    val bits = Seq(-0.0, 0.0).toDF("v")
      .select(org.apache.spark.sql.graftbridge.toColumn(
        graft.functions.DoubleSortableBits(
          org.apache.spark.sql.graftbridge.toExpression(col("v")))))
      .collect().map(_.getLong(0)).distinct
    assert(bits.length == 1, s"-0.0 and +0.0 bits differ: ${bits.toSeq}")
  }

  test("rank metadata above the literal-map cap broadcast-joins instead") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    // force the fallback: cap 0 means even this cardinality must join
    val df = Ranking.exactQuantilesByGroup(li, "l_returnflag",
      "l_extendedprice", Seq(0.25, 0.5, 0.75), partitions = 8,
      maxLiteralEntries = 0)
    // the boundary-row join is a broadcast join on both paths; the
    // fallback is visible as attachMeta's "__mk" key in a SECOND one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__mk"),
      s"offset metadata must ship as a broadcast join above the cap:\n$plan")
    assert(!Ranking.exactQuantilesByGroup(li, "l_returnflag",
        "l_extendedprice", Seq(0.5), partitions = 8)
      .queryExecution.executedPlan.toString.contains("__mk"),
      "below the cap the literal-map path must stay join-free")
    val got = df.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val want = Ranking.exactQuantilesByGroup(li, "l_returnflag",
        "l_extendedprice", Seq(0.25, 0.5, 0.75), partitions = 8)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got == want, "broadcast-join path must be value-identical to " +
      "the literal-map path")
  }

  test("exactQuantilesByGroupScan: materialize=true is value-identical " +
      "to the re-derive default") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    def run(mat: Boolean) = Ranking.exactQuantilesByGroupScan(
        li, "l_returnflag",
        Seq("l_extendedprice" -> Seq(0.25, 0.5, 0.75)), materialize = mat)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(run(true) == run(false),
      "checkpointing the stacked stream must not change any quantile")
    // the checkpoint blocks are released before the call returns — the
    // operator must not leak storage into the shared session
    assert(spark.sparkContext.getPersistentRDDs.size <= persistedBefore,
      "materialized scan stream must be unpersisted on completion")
  }

  test("runningAgg matches the single-task window (sum/max/min × " +
      "inclusive/exclusive, nulls, all-null partitions)") {
    import spark.implicits._
    // 200 rows over 8 range partitions (25 rows each): ids 1-10 are a
    // leading all-null prefix (SQL yields NULL there), ids 50-120 are a
    // null block wide enough that several ENTIRE range partitions
    // aggregate to NULL — the r5-flagged getLong NPE shape.
    val rows = (1L to 200L).map { k =>
      val v: java.lang.Long =
        if (k <= 10 || (k >= 50 && k <= 120)) null
        else java.lang.Long.valueOf((k * 37 % 101) - 50)
      (k, v)
    }
    val df = rows.toDF("k", "v")
    for (fn <- Seq("sum", "max", "min"); inclusive <- Seq(true, false)) {
      val w0 = Window.orderBy(col("k").asc)
      val w = if (inclusive)
        w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.unboundedPreceding, -1)
      val aggF: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        fn match { case "sum" => sum; case "max" => max; case _ => min }
      val expected = df.select(col("k"), aggF(col("v")).over(w).as("want"))
      val got = Ranking.runningAgg(df, Seq("k"), "v", fn, "got",
        inclusive = inclusive, partitions = 8)
      val joined = expected.join(got.select("k", "got"), "k")
      assert(joined.count() == 200)
      val bad = joined.filter(!(col("want") <=> col("got"))).count()
      assert(bad == 0,
        s"fn=$fn inclusive=$inclusive: $bad rows deviate from the window")
    }
  }

  test("exactPercentRankByGroup matches the per-group window exactly " +
      "(ties, singleton group, null order values, many partitions)") {
    import spark.implicits._
    // 4 groups: g0/g1 dense with heavy TIES (values mod 7 — percent_rank
    // must use SQL rank, min-over-ties, not row_number), g2 a singleton
    // (pr = 0.0 by definition), g3 with a null block (ASC nulls first)
    val rows = (1L to 500L).flatMap { k =>
      val g = (k % 2).toString
      val v: java.lang.Double =
        if (k % 17 == 0) null else java.lang.Double.valueOf((k * 31 % 7).toDouble)
      Seq((s"g$g", v, k))
    } ++ Seq(("g2", java.lang.Double.valueOf(5.0), 1000L),
      ("g3", null.asInstanceOf[java.lang.Double], 1001L),
      ("g3", java.lang.Double.valueOf(1.0), 1002L))
    val df = rows.toDF("grp", "v", "id")
    val w = Window.partitionBy(col("grp")).orderBy(col("v").asc)
    val expected = df.select(col("id"), percent_rank().over(w).as("want"))
    val got = Ranking.exactPercentRankByGroup(df, "grp", "v",
      prCol = "got", partitions = 8)
    assert(got.count() == rows.size.toLong,
      "join-back must preserve every row (incl. null order values)")
    val joined = expected.join(got.select("id", "got"), "id")
    val bad = joined.filter(!(col("want") <=> col("got"))).count()
    assert(bad == 0, s"$bad rows deviate from the per-group window")
  }

  test("exactGlobalRowAndGroupPercentRank: rn is a value-ordered 1..N " +
      "permutation AND pr matches the per-group window, in one pass") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"), col("value"))
    val (got, n) = Ranking.exactGlobalRowAndGroupPercentRank(
      ev, "value", "event_type", rnCol = "rn", prCol = "pr", partitions = 8)
    assert(n == ev.count())
    // rn: permutation of 1..N, ordered consistently with value
    assert(got.select(col("rn")).distinct().count() == n)
    assert(got.agg(min(col("rn")), max(col("rn"))).collect().head
      .toSeq == Seq(1L, n))
    val inversions = got.select(col("rn"), col("value")).as("x")
      .join(got.select(col("rn").as("rn2"), col("value").as("v2")).as("y"),
        col("rn") < col("rn2") && col("value") > col("v2"))
      .count()
    assert(inversions == 0, s"rn must honor the value order: $inversions")
    // pr: exact window parity
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").asc)
    val want = ev.select(col("event_id"), percent_rank().over(w).as("want"))
    val bad = want.join(got.select(col("event_id"), col("pr")), "event_id")
      .filter(!(col("want") <=> col("pr"))).count()
    assert(bad == 0, s"$bad rows deviate from the per-group window")
  }

  test("runningAggMulti: several columns in ONE pass match per-column " +
      "runningAgg calls exactly (mixed fns, nulls)") {
    import spark.implicits._
    val rows = (1L to 300L).map { k =>
      val a: java.lang.Long =
        if (k % 11 == 0) null else java.lang.Long.valueOf(k * 13 % 97 - 40)
      val b: java.lang.Long =
        if (k % 7 == 0) null else java.lang.Long.valueOf(k * 29 % 53)
      (k, a, b)
    }
    val df = rows.toDF("k", "a", "b")
    val multi = Ranking.runningAggMulti(df, Seq("k"),
      Seq(("a", "sum", "ra"), ("b", "max", "rb"), ("a", "min", "rc")),
      partitions = 8)
    val single = Ranking.runningAgg(
      Ranking.runningAgg(
        Ranking.runningAgg(df, Seq("k"), "a", "sum", "ra", partitions = 8),
        Seq("k"), "b", "max", "rb", partitions = 8),
      Seq("k"), "a", "min", "rc", partitions = 8)
    val bad = multi.select("k", "ra", "rb", "rc").as("m")
      .join(single.select(col("k"), col("ra").as("sa"), col("rb").as("sb"),
        col("rc").as("sc")).as("s"), "k")
      .filter(!(col("ra") <=> col("sa")) || !(col("rb") <=> col("sb")) ||
        !(col("rc") <=> col("sc")))
      .count()
    assert(bad == 0, s"$bad rows deviate between fused and per-column runs")
  }

  test("approxNtile stays in [1, n] and is monotone in the order column") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("n_chars").cast("double").as("len"))
    val tiled = Ranking.approxNtile(docs, "len", 10)
    val bad = tiled.filter(col("tile") < 1 || col("tile") > 10).count()
    assert(bad == 0)
    // monotonicity: a doc with a larger value never gets a smaller tile
    val viol = tiled.toDF().as("x").join(tiled.toDF().as("y"),
        col("x.len") > col("y.len") && col("x.tile") < col("y.tile"))
      .count()
    assert(viol == 0, "tile assignment must be monotone in the value")
  }
}

package graft.properties

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Ann, Profile, Ranking}

/** Property suites for the round-3 operators: each distributed
  * formulation must agree with a direct reference computed in plain
  * Scala (or Spark's own single-pass form) on random inputs — the same
  * discipline TemporalProperties applies to the temporal family. */
object RoundThreeProperties extends Properties("round3") {
  private lazy val spark = TestSpark.spark

  // ---- Profile.sequenceGaps == brute-force missing-run scan -----------

  private val keySetGen: Gen[Set[Long]] = for {
    n <- Gen.chooseNum(1, 40)
    ks <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
  } yield ks.toSet

  property("sequenceGaps.equals-bruteforce") =
    Prop.forAllNoShrink(keySetGen) { keys =>
      import spark.implicits._
      val got = Profile.sequenceGaps(keys.toSeq.toDF("k"), "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val lo = keys.min; val hi = keys.max
      val missing = (lo to hi).filterNot(keys)
      // group consecutive missing values into runs
      val runs = missing.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: tail, v) if v == e + 1 => (s, v) :: tail
        case (acc, v)                          => (v, v) :: acc
      }.map { case (s, e) => (s, e, e - s + 1) }.toSet
      got == runs
    }

  // ---- Ranking.exactQuantilesByGroup == percentile aggregate ----------

  private val groupedValsGen: Gen[List[(String, Double)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-1000, 1000)
    } yield (g, v / 8.0))
  } yield rows

  property("exactQuantilesByGroup.equals-percentile") =
    Prop.forAllNoShrink(groupedValsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("g", "v")
      val ps = Seq(0.1, 0.5, 0.9)
      val got = Ranking.exactQuantilesByGroup(df, "g", "v", ps, partitions = 4)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val want = df.groupBy("g")
        .agg(expr("percentile(v, array(0.1, 0.5, 0.9))").as("p"))
        .collect().map(r => r.getString(0) -> {
          val p = r.getSeq[Double](1); (p(0), p(1), p(2))
        }).toMap
      got.keySet == want.keySet && got.keySet.forall { g =>
        val (a1, a2, a3) = got(g); val (b1, b2, b3) = want(g)
        math.abs(a1 - b1) < 1e-9 && math.abs(a2 - b2) < 1e-9 &&
          math.abs(a3 - b3) < 1e-9
      }
    }

  // ---- Ann.ivfSearch at nprobe=K == brute-force top-k -----------------

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(-100, 100)).map(_.map(_ / 100.0f).toArray)
      .suchThat(v => v.exists(_ != 0.0f))

  private val corpusGen: Gen[(List[Array[Float]], Array[Float])] = for {
    n <- Gen.chooseNum(3, 20)
    cands <- Gen.listOfN(n, vecGen)
    probe <- vecGen
  } yield (cands, probe)

  property("ivfSearch.nprobe=K.equals-bruteforce") =
    Prop.forAllNoShrink(corpusGen) { case (cands, probe) =>
      import spark.implicits._
      val cents = Seq(
        (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (1L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("cid", "v")
      val candDf = cands.zipWithIndex
        .map { case (v, i) => (i.toLong + 10L, v) }.toDF("id", "v")
      val probeDf = Seq((1L, probe)).toDF("pid", "v")
      val k = 5
      val got = Ann.ivfSearch(candDf, "id", probeDf, "pid",
          cents, "cid", "v", nprobe = 2, k = k)
        .orderBy("rank").select("id").as[Long].collect().toSeq
      val brute = candDf
        .crossJoin(broadcast(probeDf.select(
          graft.functions.Vectors.asDouble(col("v")).as("vp"))))
        .select(col("id"),
          round(graft.functions.Vectors.cosine(
            graft.functions.Vectors.asDouble(col("v")), col("vp")), 4)
            .as("sim"))
        .orderBy(col("sim").desc, col("id").asc)
        .limit(k).select("id").as[Long].collect().toSeq
      got == brute
    }
}

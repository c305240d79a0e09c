package graft.properties

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{Ranking, TextPipeline}

/** Property suites for the round-4 operators: the scan-based quantile
  * selection and the persisted-vocabulary encode must agree with
  * reference computations on random inputs (same discipline as
  * RoundThreeProperties).
  */
object RoundFourProperties extends Properties("round4") {
  private lazy val spark = TestSpark.spark

  // ---- exactQuantilesByGroupScan == percentile aggregate --------------
  // small buckets + tiny collect cap force multiple refinement rounds,
  // so the bucket walk / offset accounting / edge carry are all hit;
  // duplicate-heavy values exercise the narrow-interval resolution

  private val groupedValsGen: Gen[List[(String, Double)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.frequency(
        (6, Gen.chooseNum(-1000, 1000).map(_ / 8.0)), // spread values
        (3, Gen.oneOf(1.0, 2.0, 3.0)),                // heavy duplicates
        (1, Gen.oneOf(Double.NegativeInfinity,        // non-finite regions
          Double.PositiveInfinity, Double.NaN)))
    } yield (g, v))
  } yield rows

  property("quantilesScan.equals-percentile") =
    Prop.forAllNoShrink(groupedValsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("g", "v")
      val got = Ranking.exactQuantilesByGroupScan(df, "g",
          Seq("v" -> Seq(0.0, 0.3, 0.5, 0.9, 1.0)),
          buckets = 4, collectCap = 2)
        .collect().map(r => r.getString(0) ->
          (1 to 5).map(r.getDouble)).toMap
      val want = df.groupBy("g")
        .agg(expr("percentile(v, array(0.0, 0.3, 0.5, 0.9, 1.0))").as("p"))
        .collect().map(r => r.getString(0) -> {
          val p = r.getSeq[Double](1); p.toIndexedSeq
        }).toMap
      got.keySet == want.keySet && got.keySet.forall { g =>
        got(g).zip(want(g)).forall { case (a, b) =>
          (a.isNaN && b.isNaN) || a == b }
      }
    }

  // ---- encode(vocab) == driver-side dictionary lookup -----------------
  // random docs over a tiny alphabet, vocabulary from a prefix slice:
  // shared tokens must map through the vocabulary's ids, unseen tokens
  // to unkId, in original token order

  private val docsGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 12)
    docs <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(0, 8)
      toks <- Gen.listOfN(len, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield toks.mkString(" "))
  } yield docs

  property("encodeVocab.equals-dictionary") =
    Prop.forAllNoShrink(docsGen) { docs =>
      import spark.implicits._
      val all = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val trainN = math.max(1, all.size / 2)
      val train = all.take(trainN)
      val df = all.toDF("doc_id", "text")
      val vocabDf = TextPipeline.rankedVocabulary(
        train.toDF("doc_id", "text"), "doc_id", "text")
      val got = TextPipeline.encode(df, "doc_id", "text", vocabDf, 0, -7L)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // reference: document-frequency-ranked dictionary in plain Scala
      val dfCount = train.flatMap { case (_, t) =>
        t.split(" ").filter(_.nonEmpty).distinct
      }.groupBy(identity).map { case (t, o) => t -> o.size }
      val dict = dfCount.toSeq.sortBy { case (t, c) => (-c, t) }
        .zipWithIndex.map { case ((t, _), i) => t -> (i + 1).toLong }.toMap
      all.forall { case (id, text) =>
        val want = text.split(" ").filter(_.nonEmpty)
          .map(t => dict.getOrElse(t, -7L)).toSeq
        got(id) == want
      }
    }
}

package graft.properties

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark
import graft.operators.Batching

/** Random-corpus parity proofs for the batch-assembly operators: the
  * distributed pack/cap assignments must equal a scalar greedy
  * reference that replays the same portable hash order (same
  * discipline as RoundThree/Four/FiveProperties).
  */
object BatchingProperties extends Properties("batching") {
  private lazy val spark = TestSpark.spark

  /** Scalar twin of the operators' salted md5 hash key. */
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val corpusGen: Gen[Seq[(Long, String, Long)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 999L)
      strat <- Gen.oneOf("a", "b", "c")
      nt <- Gen.chooseNum(1L, 50L)
    } yield (id, strat, nt))
  } yield rows.groupBy(_._1).map(_._2.head).toSeq // unique ids

  property("packChunks.equals-scalar-concat-and-chunk") =
    Prop.forAllNoShrink(corpusGen) { rows =>
      import spark.implicits._
      val budget = 64L
      val df = rows.toDF("id", "strat", "nt")
      val got = Batching.packChunks(df, "strat", "id", "nt", budget)
        .select("id", "chunk").as[(Long, Long)].collect().toMap
      val want: Map[Long, Long] = rows.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.sortBy(r => (md5hex(s"pack:${r._1}"), r._1))
        ordered.scanLeft(0L)(_ + _._3).zip(ordered)
          .map { case (cumExcl, r) => r._1 -> cumExcl / budget }
      }
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("capTokens.equals-scalar-greedy-prefix") =
    Prop.forAllNoShrink(corpusGen) { rows =>
      import spark.implicits._
      val budget = 120L
      val df = rows.toDF("id", "strat", "nt")
      val got = Batching.capTokens(df, "strat", "id", "nt", budget)
        .select("id").as[Long].collect().toSet
      val want: Set[Long] = rows.groupBy(_._2).flatMap { case (_, g) =>
        val ordered = g.sortBy(r => (md5hex(s"cap:${r._1}"), r._1))
        var cum = 0L
        ordered.takeWhile { r => cum += r._3; cum <= budget }.map(_._1)
      }.toSet
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("temperatureMix.equals-scalar-sqrt-share-selection") =
    Prop.forAllNoShrink(corpusGen) { rows =>
      import spark.implicits._
      val keep = 20L
      val df = rows.toDF("id", "strat", "nt")
      val got = (if (rows.nonEmpty)
          Batching.temperatureMix(df, "strat", "id", keep)
            .select("id").as[Long].collect()
        else Array.empty[Long]).toSet
      // scalar twin: exact fixed-point sqrt shares, then the stratum's
      // smallest salted-md5 ids up to its target
      val bySt = rows.groupBy(_._2)
      val sq = bySt.map { case (st, g) =>
        st -> math.floor(math.sqrt(g.size.toDouble) * 1000000.0).toLong }
      val sqt = sq.values.sum
      val want: Set[Long] = bySt.flatMap { case (st, g) =>
        val target = math.floor(sq(st).toDouble * keep / sqt).toLong
        g.sortBy(r => (md5hex(s"mix:${r._1}"), r._1))
          .take(target.toInt).map(_._1)
      }.toSet
      Prop(got == want) :| s"got=$got want=$want"
    }
}

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

  property("waterFillAllocation.equals-scalar-level-search") =
    Prop.forAllNoShrink(corpusGen, Gen.chooseNum(0L, 300L)) { (rows, budget) =>
      import spark.implicits._
      val df = rows.toDF("id", "strat", "nt")
      val got = (if (rows.nonEmpty)
          Batching.waterFillAllocation(df, "strat",
              org.apache.spark.sql.functions.col("nt"), budget)
            .select("strat", "alloc").as[(String, Long)].collect()
        else Array.empty[(String, Long)]).toMap
      // scalar twin: exhaustive level search over sorted strata
      val ns = rows.groupBy(_._2).map { case (st, g) => st -> g.map(_._3).sum }
      val tot = ns.values.sum
      val want: Map[String, Long] =
        if (ns.isEmpty) Map.empty
        else if (budget >= tot) ns
        else {
          val sorted = ns.toSeq.sortBy { case (k, v) => (v, k) }
          val s = sorted.size
          var level = -1L
          for (i <- 0 until s if level < 0) {
            val p = sorted.take(i).map(_._2).sum
            val l = Math.floorDiv(budget - p, (s - i).toLong)
            val okLow = i == 0 || sorted(i - 1)._2 <= l
            if (okLow && l < sorted(i)._2) level = l
          }
          ns.map { case (k, v) => k -> math.min(v, math.max(level, 0L)) }
        }
      val spent = got.values.sum
      val tight = budget >= tot || got.isEmpty ||
        spent <= budget && (budget - spent) < ns.size
      Prop(got == want && tight) :|
        s"got=$got want=$want spent=$spent budget=$budget"
    }
}

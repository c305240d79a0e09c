package graft.properties

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark
import graft.operators.Temporal

/** Property suites for the temporal operators: the distributed
  * formulations (union-window asof, binned range pairing, windowed
  * sessionization) must agree with direct O(n²)/O(n log n) reference
  * implementations computed in plain Scala on the same random inputs. */
object TemporalProperties extends Properties("temporal") {
  private lazy val spark = TestSpark.spark

  private val base = 1700000000L // epoch seconds
  private val evGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(1, 24)
    rows <- Gen.listOfN(n, for {
      key <- Gen.chooseNum(1L, 3L)
      off <- Gen.chooseNum(0L, 36000L) // 10-hour spread, second granularity
    } yield (key, off))
  } yield rows.zipWithIndex.map { case ((k, off), i) =>
    (k, i.toLong, base + off)
  }

  private def toDF(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.map { case (k, id, sec) => (k, id, new Timestamp(sec * 1000L)) }
      .toDF("k", "id", "ts")
  }

  // pairsWithin == the brute-force quadratic definition
  property("pairsWithin.equals-bruteforce") =
    Prop.forAllNoShrink(evGen) { rows =>
      val horizon = 3600L
      val got = Temporal.pairsWithin(toDF(rows), "k", "id", "ts", horizon)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val want = (for {
        (k1, a, t1) <- rows; (k2, b, t2) <- rows
        if k1 == k2 && a < b && math.abs(t2 - t1) <= horizon
      } yield (a, b)).toSet
      got == want
    }

  // sessionize: same islands as a sort-and-sweep reference
  property("sessionize.equals-sweep") =
    Prop.forAllNoShrink(evGen) { rows =>
      val gap = 1800L
      val got = Temporal.sessionize(toDF(rows), "k", "ts", gap)
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3))).toSet
      val want = rows.groupBy(_._1).flatMap { case (k, evs) =>
        val ts = evs.map(_._3).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head <= gap) (t :: acc.head) :: acc.tail
          else List(t) :: acc
        }
        sessions.map(sess =>
          (k, sess.min, sess.max, sess.length.toLong))
      }.toSet
      got == want
    }

  // asofJoin: every left row maps to the max right ts <= its ts (inner)
  property("asofJoin.equals-bruteforce") =
    Prop.forAllNoShrink(evGen, evGen) { (lRows, rRowsRaw) =>
      // right must be unique per (key, ts): keep max id
      val rRows = rRowsRaw.groupBy(r => (r._1, r._3))
        .map(_._2.maxBy(_._2)).toList
      val left = toDF(lRows).toDF("k", "id", "ts")
      val right = toDF(rRows).toDF("k", "rid", "ts")
        .withColumnRenamed("rid", "view_id")
      val got = Temporal.asofJoin(left, right, "k", "ts")
        .select("id", "r_view_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        (lk, lid, lt) <- lRows
        cands = rRows.filter(r => r._1 == lk && r._3 <= lt)
        if cands.nonEmpty
      } yield lid -> cands.maxBy(r => (r._3, r._2))._2).toMap
      got == want
    }

  // forward direction: every left row maps to the MIN right ts >= its ts
  property("asofJoin.forward.equals-bruteforce") =
    Prop.forAllNoShrink(evGen, evGen) { (lRows, rRowsRaw) =>
      val rRows = rRowsRaw.groupBy(r => (r._1, r._3))
        .map(_._2.maxBy(_._2)).toList
      val left = toDF(lRows).toDF("k", "id", "ts")
      val right = toDF(rRows).toDF("k", "rid", "ts")
        .withColumnRenamed("rid", "view_id")
      val got = Temporal.asofJoin(left, right, "k", "ts",
          direction = "forward")
        .select("id", "r_view_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = (for {
        (lk, lid, lt) <- lRows
        cands = rRows.filter(r => r._1 == lk && r._3 >= lt)
        if cands.nonEmpty
      } yield lid -> cands.minBy(r => (r._3, -r._2))._2).toMap
      got == want
    }
}

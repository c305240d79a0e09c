package graft.properties

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Property suites for the round-5 curation operators: the inverted-index
  * containment pipeline and the int8 quantizer must agree with driver-side
  * reference computations on random inputs (same discipline as
  * RoundThree/RoundFourProperties).
  */
object RoundFiveProperties extends Properties("round5") {
  private lazy val spark = TestSpark.spark

  // ---- containment pipeline == brute-force set arithmetic -------------
  // random short docs over a tiny alphabet make shingle collisions (and
  // therefore candidate pairs) common; the DataFrame inverted-index join
  // must report exactly the containments a per-pair Set computation gives

  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(3, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(2, 8)
    docs <- Gen.listOfN(n, docGen)
  } yield docs

  private def shingleSet(text: String): Set[String] = {
    val t = text.trim.split(" ").filter(_.nonEmpty)
    (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  property("containment.equals-bruteforce") =
    Prop.forAllNoShrink(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // the q110 pipeline shape, inlined over the random corpus
      val sh = df.select(col("doc_id"),
          expr("filter(split(trim(text), ' '), x -> x != '')").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          graft.operators.TextHashes.shingleTransform("toks"))).as("s"))
        .distinct()
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val got = sh.toDF("a", "s")
        .join(sh.toDF("b", "s2"), col("s") === col("s2") && col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
        .join(cnt.toDF("a", "na"), "a")
        .join(cnt.toDF("b", "nb"), "b")
        .select(col("a"), col("b"),
          (col("inter").cast("double") / col("na")).as("ca"),
          (col("inter").cast("double") / col("nb")).as("cb"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3))).toMap
      val sets = docs.zipWithIndex
        .map { case (t, i) => i.toLong -> shingleSet(t) }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys
        if a < b
        inter = (sets(a) & sets(b)).size
        if inter > 0
      } yield (a, b) ->
        (inter.toDouble / sets(a).size, inter.toDouble / sets(b).size)).toMap
      got == want
    }

  // ---- prefix-filter similarity join == brute force -------------------
  // the AllPairs prefix principle claims LOSSLESS candidate generation;
  // random corpora over a tiny alphabet produce dense near-threshold
  // Jaccard values, so both missed pairs (broken prefix math) and false
  // positives (broken verification) would surface

  private val tokDocGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 10)
    toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
  } yield toks.mkString(" ")

  private val tokCorpusGen: Gen[(List[String], Double)] = for {
    n <- Gen.chooseNum(2, 8)
    docs <- Gen.listOfN(n, tokDocGen)
    t <- Gen.oneOf(0.3, 0.5, 0.75, 1.0)
  } yield (docs, t)

  property("prefixJoin.equals-bruteforce") =
    Prop.forAllNoShrink(tokCorpusGen) { case (docs, t) =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .prefixSimilarityJoin(df, "doc_id", "text", t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sets = docs.zipWithIndex.map { case (s, i) =>
        i.toLong -> s.split(" ").filter(_.nonEmpty).toSet }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size
        j = inter.toDouble / (sets(a) | sets(b)).size
        if j >= t
      } yield (a, b) -> j).toMap
      got == want
    }

  // ---- int8 quantizer == driver-side reference ------------------------
  // the engine-portable floor(x*127/amax + 0.5) must reproduce the exact
  // integer vectors a scalar implementation gives, and containment of the
  // quantized cosine within the analytic error budget follows

  private val vecGen: Gen[List[Double]] = for {
    n <- Gen.chooseNum(4, 16)
    v <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 250.0))
    if v.exists(_ != 0.0)
  } yield v

  private def quantRef(v: List[Double]): List[Long] = {
    val amax = v.map(math.abs).max
    v.map(x => math.floor(x * 127.0 / amax + 0.5).toLong)
  }

  property("quantize.equals-reference") =
    Prop.forAllNoShrink(vecGen) { v =>
      import spark.implicits._
      val df = Seq(Tuple1(v)).toDF("v")
        .withColumn("amax",
          expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))"))
        .withColumn("qv",
          expr("transform(v, x -> cast(floor(x * 127.0D / nullif(amax, 0D) + 0.5D) as long))"))
      val got = df.select("qv").first().getSeq[Long](0).toList
      got == quantRef(v)
    }

  // ---- temporal analytics operators == driver references --------------
  // random irregular event streams (duplicate timestamps included — the
  // tie-break and zero-weight paths must hold); references are scalar
  // re-computations, agreement to 1e-9 absorbs float summation order

  private case class Ev(key: Long, id: Long, us: Long, value: Double,
                        typ: String)

  private val streamGen: Gen[List[Ev]] = for {
    n <- Gen.chooseNum(1, 40)
    evs <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0L, 3L)
      us <- Gen.chooseNum(0L, 20L)          // dense → frequent ties
      v <- Gen.chooseNum(-100, 100).map(_ / 10.0)
      t <- Gen.oneOf("a", "b", "c")
    } yield (k, us, v, t))
  } yield evs.zipWithIndex.map { case ((k, us, v, t), i) =>
    Ev(k, i.toLong, us, v, t) }

  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-9

  property("twap.equals-reference") =
    Prop.forAllNoShrink(streamGen) { evs =>
      import spark.implicits._
      val df = evs.map(e => (e.key, e.id, e.us, e.value))
        .toDF("key", "id", "us", "value")
      val got = graft.operators.Temporal
        .twap(df, "key", "us", "value", "id")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(4))).toMap
      val want = evs.groupBy(_.key).flatMap { case (k, es) =>
        val sorted = es.sortBy(e => (e.us, e.id))
        val ws = sorted.zip(sorted.tail)
          .map { case (a, b) => (a.value, b.us - a.us) }
        val tw = ws.map(_._2).sum
        if (ws.isEmpty || tw == 0L) None
        else Some(k -> (ws.length.toLong,
          ws.map { case (v, w) => v * w }.sum / tw))
      }
      got.keySet == want.keySet && want.forall { case (k, (n, t)) =>
        got(k)._1 == n && close(got(k)._2, t) }
    }

  property("transitions.equals-reference-and-normalized") =
    Prop.forAllNoShrink(streamGen) { evs =>
      import spark.implicits._
      val df = evs.map(e => (e.key, e.id, e.us, e.typ))
        .toDF("key", "id", "us", "typ")
      val rows = graft.operators.Temporal
        .transitionMatrix(df, "key", "typ", "us", "id")
        .collect()
      val got = rows.map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
      val want = evs.groupBy(_.key).toList.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e.us, e.id))
        sorted.zip(sorted.tail).map { case (a, b) => (a.typ, b.typ) }
      }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      val normalized = rows.groupBy(_.getString(0)).forall {
        case (_, rs) => close(rs.map(_.getDouble(3)).sum, 1.0) }
      got == want && normalized
    }

  property("decayedSum.equals-reference") =
    Prop.forAllNoShrink(streamGen) { evs =>
      import spark.implicits._
      val df = evs.map(e => (e.key, e.us, e.value))
        .toDF("key", "us", "value")
      val half = 10L // in the us range, so decay is non-trivial
      val got = graft.operators.Temporal
        .decayedSum(df, "key", "us", "value", half)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      val want = evs.groupBy(_.key).map { case (k, es) =>
        val last = es.map(_.us).max
        k -> (es.length.toLong, es.map(e =>
          e.value * math.pow(0.5, (last - e.us).toDouble / half)).sum)
      }
      got.keySet == want.keySet && want.forall { case (k, (n, s)) =>
        got(k)._1 == n && close(got(k)._2, s) }
    }
}

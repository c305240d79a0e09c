package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Fixed-point TextRank (Graphs): hand-computed iteration on a
  * controlled 3-node graph, the structural properties (self-loop drop,
  * undirected symmetry), and top-rank sanity on a star graph. The
  * cross-engine bit-identity of the fixed-point arithmetic is the
  * differential harness's job (q216). */
class GraphsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cooccurrence edges: weights, symmetry, self-loops dropped") {
    val docs = Seq("a b", "a b", "b c", "x x").toDF("text")
    val edges = Graphs.cooccurrenceEdges(docs, "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(edges == Map(
      ("a", "b") -> 2L, ("b", "a") -> 2L,
      ("b", "c") -> 1L, ("c", "b") -> 1L),
      s"unexpected edge set $edges — self-loop 'x x' must not appear")
  }

  test("one fixed-point iteration matches the hand computation") {
    // graph: a-b (w 2), b-c (w 1); wdeg a=2, b=3, c=1; r0 = 10000
    //  a: floor(2*10000/3)=6666 -> 1500+floor(85*6666/100)   = 7166
    //  b: floor(2*10000/2)+floor(1*10000/1)=20000 -> 1500+17000 = 18500
    //  c: floor(1*10000/3)=3333 -> 1500+floor(85*3333/100)   = 4333
    val docs = Seq("a b", "a b", "b c").toDF("text")
    val r = Graphs.textRank(docs, "text", iterations = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 7166L, "b" -> 18500L, "c" -> 4333L), s"got $r")
  }

  test("star center out-ranks leaves after five iterations") {
    val docs = Seq("hub l1", "hub l2", "hub l3", "hub l4").toDF("text")
    val ranked = Graphs.textRank(docs, "text")
      .orderBy(col("r_fp").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ranked.head._1 == "hub")
    assert(ranked.forall(_._2 > 0L))
    // leaves are interchangeable — identical fixed-point ranks
    assert(ranked.tail.map(_._2).distinct.size == 1)
  }
}

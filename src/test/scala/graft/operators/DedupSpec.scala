package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Corpus-level dedup API: planted duplicates must be removed (smallest
  * id kept), unrelated docs must survive, and the real corpus (no dups)
  * must pass through unchanged. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val planted = {
    import spark.implicits._
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(40)
    val dups = real.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val nearDups = real.filter(col("doc_id") >= 5 && col("doc_id") < 8)
      .select((col("doc_id") + 2000).as("doc_id"),
        concat(col("text"), lit("extra tail token")).as("text"))
    real.unionByName(dups).unionByName(nearDups)
  }

  test("exact dedup removes planted copies, keeps originals") {
    val out = Dedup.exact(planted, "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "planted exact copies must be dropped")
    assert((0 until 5).forall(i => ids.contains(i.toLong)),
      "originals must survive")
    assert(ids.count(_ >= 2000) == 3, "near-dups are NOT exact dups")
  }

  test("minhash LSH two-stage: drops verified near-dups, keeps LSH false positives") {
    val out = Dedup.minhashLsh(planted, "doc_id", "text", threshold = 0.8)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "exact copies share every band and have J=1 -> dropped")
    assert((5 until 8).map(_ + 2000L).forall(i => !ids.contains(i)),
      "tail-appended near-dups have J>0.8 -> dropped")
    assert((0 until 8).forall(i => ids.contains(i.toLong)),
      "originals must survive")
    // the generator itself planted one near-dup in this slice: doc 12 is
    // doc 8 plus a "dup dup dup" tail (true Jaccard 0.974). The two-stage
    // pass must find exactly that one and reject every chance LSH band
    // collision (verified: all other true J < 0.01).
    val realOnly = Dedup.minhashLsh(
      planted.filter(col("doc_id") < 1000), "doc_id", "text", threshold = 0.8)
    val realIds = realOnly.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!realIds.contains(12L), "planted near-dup of doc 8 must be dropped")
    assert(realIds.contains(8L))
    assert(realOnly.count() == 39)
  }

  test("simhash dedup drops identical-signature docs only") {
    val out = Dedup.simhash(planted, "doc_id", "text")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1005).forall(i => !ids.contains(i.toLong)),
      "identical token sets -> identical simhash -> dropped")
    assert((0 until 5).forall(i => ids.contains(i.toLong)))
  }

  test("embedding cosine dedup removes planted identical vectors") {
    import spark.implicits._
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").limit(50)
    val dupVecs = real.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = real.unionByName(dupVecs)
    val out = Dedup.embeddingCosine(corpus, "vec_id", "embedding", 0.999)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert((1000 until 1003).forall(i => !ids.contains(i.toLong)),
      "identical vectors (cos=1) must be dropped")
    assert((0 until 3).forall(i => ids.contains(i.toLong)))
    // distinct random vectors (max observed cos ~0.4) all survive
    assert(ids.size == 50)
  }
}

package graft.properties

import org.scalacheck.{Gen, Prop, Properties, Test}
import graft.TestSpark
import graft.sources.Lake

/** Random-sequence parity proof for the lake MERGE: any sequence of
  * update/CDC batches applied through [[Lake.mergeInto]] must leave the
  * table equal to a driver-side latest-wins fold. LakeSpec pins the
  * crash/layout mechanics; this pins the MERGE SEMANTICS over shapes no
  * hand-written case enumerates (re-deletes, delete-then-reinsert,
  * keys never seen, empty batches). Batches carry strictly increasing
  * timestamps (the (key, ts)-unique CDC-feed discipline the operator
  * documents), so the expected state is a deterministic fold. */
object LakeProperties extends Properties("lake") {
  private lazy val spark = TestSpark.spark

  // disk-backed merges are ~1s each: fewer, richer cases
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private case class Op(key: Long, payload: String, delete: Boolean)

  private val batchGen: Gen[List[Op]] = for {
    n <- Gen.chooseNum(0, 6)
    ops <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1L, 6L)
      p <- Gen.alphaLowerStr.map(_.take(4))
      d <- Gen.prob(0.3)
    } yield Op(k, p, d))
  } yield ops.groupBy(_.key).map(_._2.head).toList // (key, ts) unique

  private val seqGen: Gen[List[List[Op]]] =
    Gen.chooseNum(1, 4).flatMap(Gen.listOfN(_, batchGen))

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(): Unit
  }

  property("mergeInto.equals-scalar-latest-wins-fold") =
    Prop.forAllNoShrink(seqGen) { batches =>
      import spark.implicits._
      val dir = java.nio.file.Files
        .createTempDirectory("graft_lake_prop").toString
      val path = dir + "/t"
      try {
      def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + i}%02d:00:00")
      batches.zipWithIndex.foreach { case (b, i) =>
        val df = b.map(o => (o.key, ts(i), o.payload, o.delete))
          .toDF("key", "ts", "payload", "__del")
        Lake.mergeInto(df, path, "key", "ts", numBuckets = 4,
          deleteCol = Some("__del"))
      }
      // driver-side fold: newer ts wins; a winning tombstone removes
      val expected = batches.zipWithIndex
        .flatMap { case (b, i) => b.map(o => (o, i)) }
        .foldLeft(Map.empty[Long, (Int, Option[String])]) {
          case (m, (o, i)) =>
            if (m.get(o.key).exists(_._1 > i)) m
            else m + (o.key -> (i, if (o.delete) None else Some(o.payload)))
        }
        .collect { case (k, (_, Some(p))) => k -> p }
      // a fully-deleted (or never-written) table has no parquet files
      // and the reader cannot infer a schema from nothing
      def hasData(f: java.io.File): Boolean =
        f.isFile && f.getName.endsWith(".parquet") ||
          (f.isDirectory && f.listFiles().exists(hasData))
      val got =
        if (new java.io.File(path).exists() && hasData(new java.io.File(path)))
          Lake.readMerged(spark, path).collect()
            .map(r => r.getAs[Long]("key") -> r.getAs[String]("payload"))
            .toMap
        else Map.empty[Long, String]
      Prop(got == expected) :| s"got=$got want=$expected batches=$batches"
      } finally deleteRec(new java.io.File(dir))
    }
}

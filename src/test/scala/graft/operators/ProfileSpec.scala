package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Profiling on planted fixtures: describe counts nulls/distincts
  * exactly; sequenceGaps finds exactly the missing runs (and none at
  * the boundaries). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("describe reports nulls, distincts, and ranges per column") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, null), (2L, 30.0), (null, 20.0))
      .toDF("a", "b")
    val prof = Profile.describe(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(prof("a") == ((4L, 3L, 2L, 1.0, 2.0)))
    assert(prof("b") == ((4L, 3L, 3L, 10.0, 30.0)))
  }

  test("sequenceGaps finds exactly the interior missing runs") {
    // present: 1,2,5,6,10 -> gaps [3,4] and [7,9]; nothing outside [1,10]
    val df = Seq(1L, 2L, 5L, 6L, 10L).toDF("k")
    val gaps = Profile.sequenceGaps(df, "k")
      .orderBy("gap_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gaps == Seq((3L, 4L, 2L), (7L, 9L, 3L)))
  }

  test("sequenceGaps on a contiguous sequence is empty") {
    val df = spark.range(100, 200).toDF("k")
    assert(Profile.sequenceGaps(df, "k").count() == 0)
  }
}

package graft.properties

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark
import graft.ingest.RedditIngest

/** ScalaCheck property suites (run natively by sbt's ScalaCheck
  * framework): algebraic invariants of the cleansing battery and the
  * similarity kernel that a fixture table can't pin down. */
object EngineProperties extends Properties("graft") {
  private lazy val spark = TestSpark.spark

  private val rawSchema = StructType(
    RedditIngest.PostFields.map(f => StructField(f, StringType)))

  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.const(null: String),
    Gen.alphaNumStr.map(s => s.take(12)),
    Gen.chooseNum(-100000, 2000000000).map(_.toString),
    Gen.oneOf("true", "false", "True", "False", "", "  padded  ",
      "1710000000.0", "not,a\"number"))

  private val rowGen: Gen[List[String]] = Gen.listOfN(11, cellGen)

  private def cleanse(rows: Seq[Seq[String]]) =
    RedditIngest.cleanse(spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*))), rawSchema))

  // Totality: no nulls escape any defaulted column, for ANY input row.
  property("cleanse.defaulted-columns-total") =
    Prop.forAllNoShrink(Gen.listOfN(8, rowGen)) { rows =>
      val out = cleanse(rows).collect()
      val defaulted = Seq("title", "score", "num_comments", "author",
        "over_18", "edited", "spoiler", "stickied")
      out.forall(r => defaulted.forall(c => !r.isNullAt(r.fieldIndex(c))))
    }

  // Boolean-ness of the tri-state edited column: output ∈ {true,false},
  // and anything non-literal-boolean maps to false.
  property("cleanse.edited-tri-state") =
    Prop.forAllNoShrink(cellGen) { cell =>
      val out = cleanse(Seq(Seq("id", null, null, null, null, null, null,
        null, cell, null, null))).collect().head
      val v = out.getAs[Boolean]("edited")
      val isLiteralBool =
        cell != null && Seq("true", "false").contains(cell.toLowerCase)
      if (isLiteralBool) v == cell.equalsIgnoreCase("true") else !v
    }

  // Title is always trimmed.
  property("cleanse.title-trimmed") =
    Prop.forAllNoShrink(cellGen) { cell =>
      val out = cleanse(Seq(Seq("id", cell, null, null, null, null, null,
        null, null, null, null))).collect().head
      val t = out.getAs[String]("title")
      t == t.trim
    }

  // Cosine kernel: symmetric, and cos(v,v) == 1 for non-zero vectors.
  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  property("vectors.cosine-symmetric-and-self-unit") =
    Prop.forAllNoShrink(Gen.listOfN(4, Gen.zip(vecGen, vecGen))) { pairs =>
      import spark.implicits._
      val df = pairs.toDF("a", "b")
        .select(
          graft.functions.Vectors.cosine(col("a"), col("b")).as("ab"),
          graft.functions.Vectors.cosine(col("b"), col("a")).as("ba"),
          graft.functions.Vectors.cosine(col("a"), col("a")).as("aa"))
      df.collect().forall { r =>
        r.getDouble(0) == r.getDouble(1) &&
          math.abs(r.getDouble(2) - 1.0) < 1e-9 &&
          r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9
      }
    }

  // MinHash invariance: duplicating shingles never changes the min-hash
  // (the algebraic fact that let q46 drop its distinct()).
  property("minhash.duplicate-invariant") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(Gen.alphaStr.map(_.take(8)))) { sh =>
      import spark.implicits._
      val once = sh.toDF("s")
      val dup = (sh ++ sh).toDF("s")
      def mh(df: org.apache.spark.sql.DataFrame) =
        df.agg(min(md5(concat(lit("0:"), col("s"))))).first().getString(0)
      mh(once) == mh(dup)
    }
}

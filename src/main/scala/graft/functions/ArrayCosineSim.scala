package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused codegen'd cosine similarity over two `array<double>` columns.
  *
  * The composed form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
  * walks each array three times (and re-reads `a` and `b` twice each);
  * this expression accumulates all three sums in ONE pass — the shape
  * that matters when the pair join ships millions of candidate vectors.
  *
  * Bit-compatibility: each of the three accumulators performs exactly
  * the same left-to-right double additions as its standalone
  * [[ArrayDotProduct]] counterpart (IEEE 754 addition is deterministic
  * per accumulator; interleaving independent accumulators does not
  * change their sums), and the final expression applies the same
  * `/(sqrt·sqrt)` combination — so results are bit-identical to the
  * composed form and to the DuckDB oracle's
  * `list_dot_product(...)/(sqrt(...)*sqrt(...))`.
  * Null-intolerant like the composed form: null array → null.
  *
  * RAGGED PAIRS ERROR: the composed form computed full-length norms
  * but a min-length dot, deflating similarity; a fused min-length
  * version would inflate it (cosine([3,4],[3]) = 1.0). Neither is
  * defensible, so unequal lengths throw — schema drift between
  * embedding batches fails visibly instead of corrupting dedup.
  */
case class ArrayCosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"array_cosine requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"array_cosine: length mismatch (${x.numElements()} vs ${y.numElements()}) — " +
          "truncating norms would silently inflate similarity")
    val n = x.numElements()
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; aa += xv * xv; bb += yv * yv
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_cosine: length mismatch (" + $a.numElements() + " vs " +
         |    $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayCosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_cosine"
}

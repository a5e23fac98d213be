package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two numeric-array columns
  * (each side independently `array<float>` or `array<double>`),
  * accumulated in double (single fused loop: dot + both norms).
  *
  * Rationale (SURVEY.md §7.3): the composed
  * `aggregate(zip_with(...))` formulation allocates an intermediate array
  * and walks three interpreted lambdas per row; this expression is one
  * tight loop inside whole-stage codegen — the custom-Expression rung of
  * the extension ladder (custom Expression > UDF). The accumulation
  * order matches the HOF formulation term for term (sequential dot, then
  * `dot / (sqrt(na) * sqrt(nb))`), so results are bit-identical to
  * `cosineHof` — which is what lets the IVF/centroid assignment paths
  * (float corpus × double codebook) run the fused loop without moving a
  * single oracle cell. Returns null if either side is null or lengths
  * differ; 0.0 when either norm is 0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  // reject non-numeric-array inputs at analysis time (an AnalysisException
  // with the plan context) instead of an IllegalArgumentException from
  // elemIsDouble mid-execution
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
          (t.asInstanceOf[ArrayType].elementType != DoubleType &&
            t.asInstanceOf[ArrayType].elementType != FloatType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> inputs, got ${t.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case t => throw new IllegalArgumentException(
      s"cosine_similarity expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = elemIsDouble(left)
    val rd = elemIsDouble(right)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      def get(arr: String, idx: String, isDouble: Boolean): String =
        if (isDouble) s"$arr.getDouble($idx)"
        else s"(double) $arr.getFloat($idx)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = ${get(x, i, elemIsDouble(left))};
         |    final double $yi = ${get(y, i, elemIsDouble(right))};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

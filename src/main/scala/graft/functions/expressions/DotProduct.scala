package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric-array columns (each
  * side independently `array<float>` or `array<double>`), accumulated in
  * double — the fused-loop sibling of [[CosineSimilarity]] for the
  * places that need the raw inner product (PQ's expanded-form L2
  * distances, ADC lookup tables, norms): the HOF formulation walks an
  * interpreted `zip_with` + `aggregate` lambda pair per evaluation, and
  * PQ's encode stage evaluates three dots per (vector, subspace, code).
  * Accumulation is sequential, identical to the HOF form and DuckDB's
  * `list_inner_product`, so swapping it in moves no oracle cell.
  * Null if either side is null or lengths differ.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

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
      s"dot_product expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = elemIsDouble(left)
    val rd = elemIsDouble(right)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      def get(arr: String, idx: String, isDouble: Boolean): String =
        if (isDouble) s"$arr.getDouble($idx)"
        else s"(double) $arr.getFloat($idx)"
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ${get(x, i, elemIsDouble(left))} * ${get(y, i, elemIsDouble(right))};
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

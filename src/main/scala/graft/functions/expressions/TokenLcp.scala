package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd longest-common-prefix of two token arrays: the
  * number of leading positions where both arrays carry equal non-null
  * elements. The q354 suffix-LCP kernel.
  *
  * Exists because the HOF formulation — `array_position(zip_with(a, b,
  * (x, y) => coalesce(x = y, false)), false)` with the 0-sentinel
  * remap to `least(size(a), size(b))` — is interpreted (Catalyst
  * higher-order functions are CodegenFallback, the [[TokenNgrams]]
  * lesson) and allocates a max(|a|,|b|)-element boolean array per row,
  * on a path that runs once per corpus token occurrence. The fused
  * loop compares in place and stops at the first mismatch. Semantics
  * are identical to the HOF form: zip_with pads the shorter side with
  * null and `coalesce(x = y, false)` maps any null comparison to a
  * mismatch, so its first-false position minus one IS the count of
  * leading equal non-null pairs — which is what the loop counts.
  */
case class TokenLcp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_lcp"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string>, got ${l.sql}, ${r.sql}")
    }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = math.min(x.numElements(), y.numElements())
    var i = 0
    var go = true
    while (go && i < m) {
      if (x.isNullAt(i) || y.isNullAt(i)) go = false
      else {
        val xs = x.getUTF8String(i)
        val ys = y.getUTF8String(i)
        if (xs.equals(ys)) i += 1 else go = false
      }
    }
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val u = classOf[UTF8String].getName
      s"""
         |final int $m = Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |while ($i < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) break;
         |  final $u ${i}x = $a.getUTF8String($i);
         |  final $u ${i}y = $b.getUTF8String($i);
         |  if (!${i}x.equals(${i}y)) break;
         |  $i++;
         |}
         |${ev.value} = (long) $i;
       """.stripMargin
    })
}

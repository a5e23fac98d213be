package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd token n-gram builder: `array<string>` of the
  * space-joined n-grams of a token array, where the n-gram at OUTPUT
  * INDEX i covers input tokens [i, i+n) — position provenance by index,
  * which is what the span-dedup family keys on. Arrays shorter than `n`
  * yield an empty array.
  *
  * Exists because the HOF formulation
  * (`transform(sequence(…), i => concat_ws(" ", slice(toks, i, n)))`)
  * is interpreted — Catalyst higher-order functions are CodegenFallback
  * — and the span build runs once per corpus token occurrence, which
  * measured ~+18% on q87's warm cost when the r6 rewrite first swapped
  * the window-lead build for the HOF form. Semantics are identical to
  * the HOF form (and to the window-lead form before it): `concat_ws`
  * skips null tokens the same way.
  */
case class TokenNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.sql}")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) { buf(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, buf: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val buf = ctx.freshName("buf")
      val u = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $m = $toks.numElements();
         |final Object[] $out = new Object[$m < $n ? 0 : $m - $n + 1];
         |final $u[] $buf = new $u[$n];
         |for (int $i = 0; $i <= $m - $n; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $buf[$j] = $toks.getUTF8String($i + $j);
         |  }
         |  $out[$i] = $u.concatWs($sepRef, $buf);
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
}

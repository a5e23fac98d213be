package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-bit LSH bucket of an `array<float>` vector against `nPlanes`
  * deterministic pseudo-random hyperplanes, in one fused loop.
  *
  * Plane components come from a splitmix64-style mix of (plane, dim) —
  * data-independent, identical on every executor, no broadcast state.
  * Codegen emits a call to [[computeBucket]] through a reference object,
  * so the surrounding stage stays inside whole-stage codegen (no
  * CodegenFallback row materialization) while the loop itself runs as
  * compiled Scala.
  */
case class LshSignBucket(child: Expression, nPlanes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sign_bucket"

  /** splitmix64 finalizer → double in [-1, 1). */
  private def planeComponent(p: Int, d: Int): Double = {
    var z = seed + (p.toLong << 32 | (d.toLong & 0xffffffffL)) * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** The fused projection loop; public so generated code can call it. */
  def computeBucket(x: ArrayData): Long = {
    val n = x.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += x.getFloat(d).toDouble * planeComponent(p, d)
        d += 1
      }
      bucket = bucket * 2 + (if (proj >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(v: Any): Any = computeBucket(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshSignBucket].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.computeBucket($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignBucket =
    copy(child = newChild)
}

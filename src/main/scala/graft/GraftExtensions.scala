package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{CosineSimilarity, LshSignBucket}

/** Session extension registering the engine's native expressions for the
  * SQL surface (SURVEY.md §1.1: the API is dual — DSL and SQL), so
  * `SELECT cosine_similarity(a, b)` works anywhere `spark.sql` does.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; [[GraftExtensions.register]]
  * does the same on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      info("cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two float arrays in double precision"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("lsh_bucket",
      info("lsh_bucket",
        "_FUNC_(v, nPlanes) - deterministic sign-LSH bucket of a float array"),
      (es: Seq[Expression]) => {
        if (es.length != 2)
          throw new IllegalArgumentException(
            s"lsh_bucket expects 2 arguments, got ${es.length}")
        val planesExpr = es(1)
        if (!planesExpr.foldable)
          throw new IllegalArgumentException(
            "lsh_bucket: nPlanes must be a literal integer")
        val planes = planesExpr.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"lsh_bucket: nPlanes must be integral, got $other")
        }
        // >63 overflows the Long bucket (silent plane aliasing); <1 is a
        // constant bucket that degrades any bucket join to all-pairs
        if (planes < 1 || planes > 63)
          throw new IllegalArgumentException(
            s"lsh_bucket: nPlanes must be in [1, 63], got $planes")
        LshSignBucket(es(0), planes, 42L)
      }))

  /** Register on a live session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, built on
  * higher-order functions (codegen'd; no UDF crossing). Dot products are
  * accumulated in double to keep Spark/DuckDB parity at 4-decimal rounding.
  */
object Vectors {

  /** Dot product of two float-array columns, accumulated in double —
    * the composed HOF formulation (interpreted; kept as the cross-check
    * baseline, the [[cosineHof]] role).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Native codegen'd dot product (fused loop, float/double arrays per
    * side) — bit-identical accumulation to [[dot]]; the hot-path form.
    */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — native codegen'd expression
    * (one fused loop; bit-identical to the composed dot/norm formulation,
    * which `cosineHof` keeps for reference/tests).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The composed higher-order-function formulation (interpreted; ~5×
    * slower per row than [[cosine]] — kept as the cross-check baseline).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused PQ encode + ADC scoring against broadcast flat codebook/LUT
    * arrays — see [[graft.functions.expressions.PqAdcScores]].
    */
  def pqAdcScores(v: Column, cbFlat: Column, cnorm2Flat: Column,
      lutFlat: Column, m: Int, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.PqAdcScores(
      ColumnBridge.expression(v), ColumnBridge.expression(cbFlat),
      ColumnBridge.expression(cnorm2Flat), ColumnBridge.expression(lutFlat),
      m, k))
  }

  /** Sign-bit signature of `v` against `nPlanes` deterministic random
    * hyperplanes → a compact bucket id (random-hyperplane LSH for cosine).
    * Vectors with high cosine land in the same bucket with high probability;
    * the bucket join replaces the O(n²) all-pairs shuffle at scale.
    * Native fused-loop expression (the nested-HOF formulation evaluated one
    * interpreted lambda per plane × dim).
    */
  def lshBucket(v: Column, nPlanes: Int, seed: Long = 42L): Column = {
    // same guard as the SQL-builder path (GraftExtensions): > 63 silently
    // aliases buckets in the Long signature, < 1 degrades the bucket join
    // to all-pairs
    require(nPlanes >= 1 && nPlanes <= 63,
      s"nPlanes must be in [1, 63], got $nPlanes")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.LshSignBucket(
      ColumnBridge.expression(v), nPlanes, seed))
  }
}

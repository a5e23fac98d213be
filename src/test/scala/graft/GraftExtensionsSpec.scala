package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expressions usable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val cos = spark.sql("SELECT cosine_similarity(a, b) AS c FROM vecs")
      .as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12 && math.abs(cos(1)) < 1e-12)
    val buckets = spark.sql("SELECT lsh_bucket(a, 6) AS bk FROM vecs")
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 64))
    // SQL result ≡ DSL result on real embeddings
    Tables.embeddings(spark, sf0001).limit(20).createOrReplaceTempView("emb20")
    val viaSql = spark.sql(
      "SELECT vec_id, cosine_similarity(embedding, embedding) AS c FROM emb20")
    assert(viaSql.select(min(col("c"))).head().getDouble(0) > 0.999999)
  }

  test("lsh_bucket optional seed arg gives distinct hash tables; bad args rejected") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf0001).limit(50).createOrReplaceTempView("emb50")
    // different seeds must disagree on at least one vector (independent
    // hyperplane sets — the multi-table ANN requirement)
    val diff = spark.sql(
      """SELECT count(*) AS n FROM emb50
         WHERE lsh_bucket(embedding, 6) <> lsh_bucket(embedding, 6, 43)""")
      .head().getLong(0)
    assert(diff > 0)
    // default seed = explicit 42
    val same = spark.sql(
      """SELECT count(*) AS n FROM emb50
         WHERE lsh_bucket(embedding, 6) <> lsh_bucket(embedding, 6, 42)""")
      .head().getLong(0)
    assert(same === 0)
    intercept[Exception](spark.sql("SELECT lsh_bucket(embedding, 64) FROM emb50").collect())
    intercept[Exception](spark.sql("SELECT lsh_bucket(embedding, 0) FROM emb50").collect())
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class KnobAdvisorSpec extends SparkSpecBase {
  import spark.implicits._

  /** The advisor's integer forms, mirrored locally. */
  private def planesInt(n: Long): Int = {
    val m = (n + 31) / 32
    val raw = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(4, math.min(62, raw))
  }
  private def kInt(n: Long): Int =
    math.min(1 << 20, math.max(2, ((n + 999) / 1000).toInt))

  test("integer planes/k forms equal the shipped float knobs across a size grid incl. power-of-two boundaries") {
    val grid = Seq(1L, 2L, 31L, 32L, 33L, 63L, 64L, 65L, 100L, 500L,
      511L, 512L, 513L, 1000L, 1001L, 2048L, 4095L, 4096L, 4097L,
      100000L, 1048576L, 1048577L, 1L << 30, (1L << 30) + 1, 1L << 40) ++
      (1 to 200).map(i => i * 997L) // a non-round sweep
    grid.foreach { n =>
      assert(planesInt(n) === SimilarityOps.planesFor(n),
        s"planes diverge at n=$n")
      assert(kInt(n) === SimilarityOps.kFor(n), s"kFor diverges at n=$n")
    }
  }

  test("advisor df-cap row equals effectiveDfCap on fixtures incl. the float-noise boundary n=1150") {
    for (n <- Seq(10L, 1150L, 2500L, 9999L, 10001L)) {
      val docs = spark.range(n).select(col("id").as("doc_id"),
        lit("t").as("text"), lit("en").as("lang"), lit("s").as("source"),
        lit(1L).as("n_chars"))
      val fromOp = DedupOps.effectiveDfCap(docs).as[Long].head()
      val emb = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
      val ev = Seq((1L, 1L)).toDF("user_id", "event_id")
      val row = KnobAdvisor.knobAdvisorOn(docs, emb, ev)
        .filter(col("knob") === "dedup_df_cap").head()
      assert(row.getLong(3) === fromOp, s"df cap diverges at n=$n")
      assert(row.getLong(2) === n)
    }
  }

  test("the panel on sf0.001 recommends exactly the values the entry points would compute") {
    val docs = graft.Tables.documents(spark, sf0001)
    val emb = graft.Tables.embeddings(spark, sf0001)
    val ev = graft.Tables.events(spark, sf0001)
    val got = KnobAdvisor.knobAdvisorOn(docs, emb, ev)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.keySet === Set("dedup_df_cap", "lsh_n_planes",
      "lsh_bucket_cap", "ivf_k_lists", "skew_n_salts"))
    val nVecs = emb.count()
    assert(got("lsh_n_planes") === SimilarityOps.planesFor(nVecs).toLong)
    assert(got("ivf_k_lists") === SimilarityOps.kFor(nVecs).toLong)
    assert(got("dedup_df_cap") ===
      DedupOps.effectiveDfCap(docs).as[Long].head())
    // bucket cap: the 4n/2^p shift form is exact (power-of-two scale)
    val p = SimilarityOps.planesFor(nVecs)
    val cap = math.max(32L,
      math.ceil(nVecs * (SimilarityOps.BucketCapMult / math.pow(2.0, p))).toLong)
    assert(got("lsh_bucket_cap") === cap)
    assert(got("skew_n_salts") >= 1L && got("skew_n_salts") <= 64L)
  }

  test("empty events: skew_n_salts is the explicit 1-salt sentinel, never a silent NULL") {
    val docs = spark.range(10L).select(col("id").as("doc_id"),
      lit("t").as("text"), lit("en").as("lang"), lit("s").as("source"),
      lit(1L).as("n_chars"))
    val emb = Seq((1L, Seq(1.0f))).toDF("vec_id", "embedding")
    val ev = Seq.empty[(Long, Long)].toDF("user_id", "event_id")
    val row = KnobAdvisor.knobAdvisorOn(docs, emb, ev)
      .filter(col("knob") === "skew_n_salts").head()
    assert(!row.isNullAt(2) && !row.isNullAt(3),
      "degenerate corpus must not emit NULL cells")
    assert(row.getLong(2) === 0L) // the visible "no data" stat
    assert(row.getLong(3) === 1L) // the no-op salting recommendation
  }
}

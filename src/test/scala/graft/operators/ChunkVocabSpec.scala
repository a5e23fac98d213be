package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The q114–q116 additions: sliding-window chunking on a hand-sliced
  * document, hard-negative mining's band/rank contract against an
  * independent exact recompute, and vocabulary-coverage arithmetic on a
  * corpus with a known vocabulary cut.
  */
class ChunkVocabSpec extends SparkSpecBase {
  import spark.implicits._

  test("docChunks: hand-computed lattice, overlap, tail chunk, digest parity") {
    // 5 tokens, chunkSize=3, stride=2 -> starts 0,2,4:
    //   [t1 t2 t3], [t3 t4 t5], [t5]
    val docs = Seq((7L, "A  b\tC d E")).toDF("doc_id", "text")
    val got = PipelineOps.docChunksOn(docs, chunkSize = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq((7L, 0, 0, 3), (7L, 1, 2, 3), (7L, 2, 4, 1)))
    // digests: chunk 0 = md5("a b c") of the NORMALIZED text
    val md5s = PipelineOps.docChunksOn(docs, chunkSize = 3, stride = 2)
      .select(col("chunk_md5")).as[String].collect()
    val exp = Seq("a b c", "c d e", "e").map { s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    }
    assert(md5s.toSeq === exp)
    // single-token doc: exactly one chunk of one token
    val one = PipelineOps.docChunksOn(
      Seq((1L, "solo")).toDF("doc_id", "text"), 64, 48).collect()
    assert(one.length === 1 && one.head.getInt(3) === 1)
  }

  test("hardNegatives: band respected, ranks dense, scores match exact recompute") {
    val out = SimilarityOps.hardNegatives(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos >= 0.20 && cos < 0.45, s"out of band: $cos")
      assert(r.getLong(0) !== r.getLong(1))
    }
    // ranks dense 1..n per query, scores non-increasing
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length).toSeq)
      val scores = sorted.map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // independent exact recompute: every returned cos equals the 4dp
    // cosine of the raw vectors
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    out.foreach { r =>
      val (q, n) = (vecs(r.getLong(0)), vecs(r.getLong(1)))
      val dot = q.zip(n).map { case (a, b) => a * b }.sum
      val exact = dot / (math.sqrt(q.map(x => x * x).sum) *
        math.sqrt(n.map(x => x * x).sum))
      assert(math.abs(BigDecimal(exact).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble - r.getDouble(2)) < 1e-9)
    }
  }

  test("vocabCoverage: hand-computed OOV split at the vocab boundary") {
    // token counts: a×4, b×3, c×2, d×1; vocabSize=2 -> vocab {a,b};
    // src1 tokens (a a b c) -> 1 oov of 4; src2 (a a b b c d) -> 2 of 6
    val docs = Seq(
      ("s1", "a a b c"),
      ("s2", "a a b b c d")).toDF("source", "text")
    val got = TextAnalysisOps.vocabCoverageOn(docs, vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(("s1", 4L, 1L, 0.25), ("s2", 6L, 2L, 0.333333)))
    // tie at the boundary is broken token-asc: with vocabSize=3, c (2)
    // beats d (1); with counts c=d=1 the lexicographically smaller wins
    val tie = Seq(("s", "a b c c d d")).toDF("source", "text")
    val g2 = TextAnalysisOps.vocabCoverageOn(tie, vocabSize = 3)
      .collect().head
    // vocab = {c, d (2,2)… then a vs b tie at 1 -> a}: oov = b only
    assert(g2.getLong(2) === 1L)
  }
}

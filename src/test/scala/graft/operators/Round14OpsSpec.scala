package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-14 fixture specs: hand-checkable cases for the new operators
  * beyond their oracle gates.
  */
class Round14OpsSpec extends SparkSpecBase {

  test("q324 k-means|| init: deterministic, k rows, seeds spread across planted clusters") {
    import spark.implicits._
    // three tight planted clusters of different sizes along distinct
    // axes (4-dim, deterministic jitter on a non-dominant component):
    // the d2-proportional oversampling must place at least one seed in
    // EVERY cluster — the exact property a uniform sample lacks
    def cluster(axis: Int, n: Int, base: Long) =
      (0 until n).map { i =>
        val v = Array.fill(4)(0.001f * ((i % 7) + 1))
        v(axis) = 1.0f
        (base + i, v.toSeq)
      }
    val emb = (cluster(0, 30, 0L) ++ cluster(1, 20, 100L) ++
      cluster(2, 10, 200L)).toDF("vec_id", "embedding")

    val cb1 = SimilarityOps.kMeansParallelInit(emb, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val cb2 = SimilarityOps.kMeansParallelInit(emb, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    assert(cb1.length === 3)
    assert(cb1.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // pure function of the input: two independent builds agree exactly
    assert(cb1.toSeq === cb2.toSeq)
    // each picked centroid is a corpus vector — identify its planted
    // cluster by the dominant component; all three clusters seeded
    val clustersHit = cb1.map { case (_, cv) =>
      cv.zipWithIndex.maxBy(_._1)._2
    }.toSet
    assert(clustersHit === Set(0, 1, 2),
      s"seeds collapsed onto clusters $clustersHit")

    // the weighted reduction orders by attracted population: the seed
    // with clabel 1 must come from the LARGEST cluster
    assert(cb1.find(_._1 == 1L).get._2.zipWithIndex.maxBy(_._1)._2 === 0)
  }

  test("q325 dHash: one-byte edit at a sampled position flips exactly the touching gradient bits") {
    import spark.implicits._
    def codeOf(texts: Seq[(Long, String)]): Map[Long, Long] =
      texts.toDF("doc_id", "text")
        .select(col("doc_id"),
          octet_length(encode(col("text"), "UTF-8")).cast("long").as("n"),
          hex(encode(col("text"), "UTF-8")).as("h"))
        .select(col("doc_id"), expr(MultimodalOps.dhashExpr).as("code"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val base = "abcdefgh" * 32 // 256 bytes; sample s_32 = byte index 129
    val oneByte = base.substring(0, 129) + "z" + base.substring(130)
    val codes = codeOf(Seq((1L, base), (2L, oneByte), (3L, base)))
    // identical payloads -> identical codes
    assert(codes(1L) === codes(3L))
    // the one-byte variant differs in EXACTLY the two gradient bits
    // whose comparisons touch sample 32 (bits 31 and 32)
    val x = codes(1L) ^ codes(2L)
    assert(java.lang.Long.bitCount(x) === 2, s"hamming = ${java.lang.Long.bitCount(x)}")
    assert(x === ((1L << 31) | (1L << 32)), s"flipped bits = ${x.toBinaryString}")

    // end-to-end: the planted pair surfaces from the banded join with
    // hamming 2 at sf0.001 (md5 exact-dedup cannot see this pair)
    val got = MultimodalOps.mediaNearDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((9000001L, 9000002L, 2)), got.mkString(", "))

    // no payload bytes cross a shuffle: every exchange in the executed
    // plan carries only id/code/band-width columns (the fingerprint is
    // computed at scan; binary columns never leave the scan stage)
    val plan = MultimodalOps.mediaNearDup(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      assert(!e.child.output.exists(
        _.dataType == org.apache.spark.sql.types.BinaryType),
        s"binary payload crosses a shuffle: ${e.child.output}")
    }
  }

  test("q326 reservoir: the merge law holds — global min-k equals merged shard min-ks") {
    val rows = PipelineOps.reservoirSample(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length === 2)
    val byMethod = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byMethod.keySet === Set("global", "sharded_merge"))
    // the whole point: identical profiles (same n, types, mass, id set)
    assert(byMethod("global") === byMethod("sharded_merge"))
    assert(byMethod("global")._1 === 100L)
  }

  test("q327 sketch: rank error within the sum-of-strides bound, exact half is exact") {
    import spark.implicits._
    val out = EventOps.quantileSketchMerge(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (p, target, rankErr, bound) =
        (r.getInt(0), r.getLong(1), r.getLong(4), r.getLong(5))
      assert(rankErr <= bound, s"p$p: rank error $rankErr exceeds bound $bound")
      assert(target >= 1L)
    }
    // hand-checkable fixture: 200 events, v_c = event_id cents, one
    // shard grid of 16; stride 100 -> per-shard coresets; exact p50 of
    // 1..200 at target rank ceil(50*200/100)=100 -> value 100
    def ev(id: Long) = (id,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view",
      id / 100.0, """{"k": 1}""")
    val df = (1L to 200L).map(ev)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.quantileSketchMergeOn(df).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(got(50)._1 === 100L)
    assert(got(50)._2 === 100L) // exact half: value == rank on this grid
    assert(got(99)._2 === 198L)
  }

  test("q328 contamination: a planted cross-source dup pair produces exactly its cluster cell") {
    // engine-side sanity at fixture scale (the oracle gate covers the
    // corpus): the matrix is symmetric-upper (src_a < src_b) and counts
    // clusters once however many docs each side contributes
    val m = DedupOps.clusterContamination(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    m.foreach { case (a, b, n) =>
      assert(a < b, s"matrix must be upper-triangular: ($a, $b)")
      assert(n >= 1L)
    }
  }

  test("q331 label propagation: a planted two-community graph plateaus at 2 labels") {
    import spark.implicits._
    // two 4-cliques bridged by ONE edge: LP must collapse each clique
    // to its min label and the plateau must be exactly 2 communities
    // (the bridge's single vote never outnumbers the clique mode)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val pairs = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((4L, 10L)))
      .toDF("i", "j")
    val got = GraphOps.lpOn(pairs, rounds = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(0) === ((8L, 1L)))
    assert(got(3) === ((2L, 4L)) && got(4) === ((2L, 4L)),
      s"expected a 2-community plateau, got $got")
  }

  test("q324 profile halves agree with their own operators on the same codebook") {
    // the comparison query's balance half must equal q194's formula on
    // the identical assignment (internal consistency, not oracle parity)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = SimilarityOps.kFor(emb.count(), 100L)
    val got = SimilarityOps.q324InitCompare(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet === Set("kmeans_par", "sampled"))
    got.values.foreach { case (nLists, nVecs, maxSize, imb, hits) =>
      assert(nLists === k.toLong)
      assert(nVecs === emb.count())
      assert(maxSize >= nVecs / nLists && maxSize <= nVecs)
      assert(imb === maxSize * nLists * 1000L / nVecs)
      assert(hits >= 0L && hits <= 40L) // 8 queries x k=5
    }
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("stratified sample: content-hash stable, rate tracks threshold") {
    val a = PipelineOps.stratifiedSample(spark, sf0001).collect()
    val b = PipelineOps.stratifiedSample(spark, sf0001).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // rerun-stable
    val sampled = a.map(_.getAs[Long]("n_sampled")).sum
    // keepBelow=64 → expect ~25% of 500 docs; allow generous slack
    assert(sampled > 60 && sampled < 200, s"sampled=$sampled")
  }

  test("shard packing: cumulative totals monotone, shard ids contiguous from 0") {
    val rows = PipelineOps.shardPacking(spark, sf0001, tokensPerShard = 500)
      .collect()
    rows.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      val cums = sorted.map(_.getAs[Long]("cum_tokens"))
      assert(cums.zip(cums.tail).forall { case (x, y) => y > x }) // strictly increasing
      val shards = sorted.map(_.getAs[Int]("shard_id"))
      assert(shards.head === 0)
      assert(shards.zip(shards.tail).forall { case (x, y) => y == x || y == x + 1 })
      // each doc's shard matches its cumulative budget bucket
      sorted.foreach { r =>
        assert(r.getAs[Int]("shard_id") === ((r.getAs[Long]("cum_tokens") - 1) / 500).toInt)
      }
    }
  }

  test("sequence packing: full chunks exactly seqLen, per-doc spans cover and stay contiguous") {
    val seqLen = 256L
    val got = PipelineOps.sequencePacking(spark, sf0001, seqLen = seqLen).collect()
    assert(got.nonEmpty)
    // chunk_off + len never exceeds the chunk, offsets non-negative
    assert(got.forall { r =>
      val co = r.getAs[Long]("chunk_off"); val l = r.getAs[Long]("len")
      co >= 0 && l > 0 && co + l <= seqLen && r.getAs[Long]("doc_off") >= 0
    })
    // every chunk except each shard's LAST packs exactly seqLen tokens —
    // the training-batch invariant the layout exists for
    val byChunk = got.groupBy(r => (r.getAs[Int]("shard"), r.getAs[Long]("chunk_id")))
      .view.mapValues(_.map(_.getAs[Long]("len")).sum).toMap
    val lastChunk = byChunk.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    byChunk.foreach { case ((sh, ch), tot) =>
      if (ch == lastChunk(sh)) assert(tot <= seqLen, s"shard $sh tail overfull: $tot")
      else assert(tot === seqLen, s"shard $sh chunk $ch has $tot tokens")
    }
    // per-doc spans: contiguous from 0 in chunk order and covering the
    // doc's full token count
    val nTokens = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    got.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rows) =>
      val spans = rows.sortBy(_.getAs[Long]("chunk_id"))
        .map(r => (r.getAs[Long]("doc_off"), r.getAs[Long]("len")))
      assert(spans.head._1 === 0L)
      spans.sliding(2).foreach {
        case Array((o1, l1), (o2, _)) => assert(o2 === o1 + l1, s"doc $doc gap")
        case _ =>
      }
      assert(spans.map(_._2).sum === nTokens(doc), s"doc $doc coverage")
    }
    // rerun-deterministic
    assert(PipelineOps.sequencePacking(spark, sf0001).collect().map(_.toSeq).toSeq
      === got.map(_.toSeq).toSeq)
  }

  test("trainValSplit's persisted assignment is session-cached and evicted") {
    def run() = PipelineOps.trainValSplit(spark, sf0001).collect()
    run()
    // repeated invocations must NOT accumulate persisted relations: the
    // assignment is served from the session-cache registry, so the
    // registry footprint is stable across calls (the round-2 audit found
    // one fresh persist per invocation here). Deliberately NOT an
    // equality over the global getPersistentRDDs census: that census
    // shrinks asynchronously when ContextCleaner collects other suites'
    // GC'd localCheckpoint RDDs, so asserting on it is a race (the
    // round-4 flake)
    val afterFirst = SessionCaches.entryCount(spark)
    val censusAfterFirst = spark.sparkContext.getPersistentRDDs.size
    assert(afterFirst > 0)
    run(); run()
    assert(SessionCaches.entryCount(spark) === afterFirst)
    // and the GLOBAL census must not GROW — an unregistered per-call
    // persist (the original round-2 leak) is invisible to the registry
    // count but adds census entries; ≤ (not ==) because ContextCleaner
    // may concurrently collect other suites' GC'd checkpoint RDDs
    // (shrink is legal, growth is the leak)
    assert(spark.sparkContext.getPersistentRDDs.size <= censusAfterFirst)
    // eviction releases every registry entry and every CacheManager-
    // tracked relation of the session (checkpoint RDDs from the CC
    // fixpoint are RDD-level, not CacheManager, and are owned by their
    // own lifecycle)
    DedupOps.clearSessionCaches(spark)
    assert(SessionCaches.entryCount(spark) === 0)
    assert(spark.sharedState.cacheManager.isEmpty)
    // and the operator still works after eviction (cache rebuilds)
    assert(run().nonEmpty)
  }

  test("pii scrub masks emails and long digit runs, leaves short numbers") {
    val df = Seq(
      (1L, "write to jane.doe+x@sub.example.org today"),
      (2L, "call 5551234567 or ext 123"),
      (3L, "clean text, nothing to scrub"))
      .toDF("doc_id", "text")
    val scrubbed = df.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[0-9]{7,}", "<PHONE>").as("t"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t")).toMap
    assert(scrubbed(1L) === "write to <EMAIL> today")
    assert(scrubbed(2L) === "call <PHONE> or ext 123") // 3-digit ext kept
    assert(scrubbed(3L) === "clean text, nothing to scrub")
  }

  test("mixtureWeights: distribution valid, monotone, alpha<1 upsamples the tail") {
    val rows = PipelineOps.mixtureWeights(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("weight")))
    val totalW = rows.map(_._3).sum
    assert(math.abs(totalW - 1.0) < 1e-4, s"weights sum to $totalW")
    // weight order tracks token-count order (sqrt is monotone)
    val byTokens = rows.sortBy(_._2).map(_._3)
    assert(byTokens === byTokens.sorted)
    // temperature smoothing: the smallest source's weight share exceeds
    // its raw token share, the largest source's is below it
    val totalT = rows.map(_._2).sum.toDouble
    val smallest = rows.minBy(_._2); val largest = rows.maxBy(_._2)
    assert(smallest._3 > smallest._2 / totalT,
      s"tail not upsampled: $smallest")
    assert(largest._3 < largest._2 / totalT,
      s"head not downsampled: $largest")
  }
}

package graft.streaming

import graft.SparkSpecBase
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Checkpoint-restart recovery (VERDICT r14 item 2): the untested half
  * of the exactly-once claim. Each test runs a stateful query over a
  * file-source landing dir, force-stops it BETWEEN micro-batches with
  * state still open, starts a NEW query from the same checkpoint, lands
  * the remaining files, and asserts the combined output equals the
  * uninterrupted run — state that spans the stop boundary (an open
  * session, a lifetime fold) must come back from the checkpoint, not
  * restart from zero. One test per custom-state API family:
  * flatMapGroupsWithState (Sessionize) and transformWithState
  * (LifetimeStatsStream, RocksDB-backed — recovery must reload the
  * RocksDB snapshot, not just the HDFS commit log).
  */
class CheckpointRestartSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  /** Land `df` as one parquet file in the watch dir (the staged
    * landing-zone shape a production stream consumes file-by-file).
    */
  private def land(watch: String, df: DataFrame, n: Int): Unit = {
    val tmp = Files.createTempDirectory("graft-cp-stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(watch, f"staged-$n%03d.parquet"))
  }

  /** Drive the stream through the production foreachBatch sink (the
    * memory sink cannot recover from a checkpoint), drain everything
    * available (including the no-data micro-batch that fires
    * event-time timeouts), stop at the batch boundary, and return the
    * rows the RUN appended (batch dirs that did not exist before).
    */
  private def drain(df: DataFrame, mode: String, cp: String,
      outDir: String): DataFrame = {
    val before = Option(new java.io.File(outDir).list())
      .map(_.toSet).getOrElse(Set.empty[String])
    val q = df.writeStream.outputMode(mode)
      .option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => ForeachBatchSink.writeBatch(b.toDF(), outDir, id))
      .start()
    q.processAllAvailable()
    q.stop()
    val dirs = new java.io.File(outDir).list().toSet -- before
    val paths = dirs.toSeq.sorted.map(d => s"$outDir/$d")
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }

  private val sessSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  private def sessionStream(watch: String) =
    spark.readStream.schema(sessSchema).parquet(watch)
      .withWatermark("ts", "1 hour")
      .as[Sessionize.SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        Sessionize.sessionizeGroup(30 * 60000000L))
      .toDF()

  // file 1: user1 opens a session (10:00, 10:05); user2 opens (10:00);
  // user3 closes one in-stream (9:00 | gap | 9:45 open)
  private def sessFile1 = Seq(
    (1L, ts(600), "view"), (1L, ts(605), "click"),
    (2L, ts(600), "view"),
    (3L, ts(540), "view"), (3L, ts(585), "view"))
    .toDF("user_id", "ts", "event_type")

  // file 2: user1's 10:20 event must MERGE into the recovered open
  // session; user2's 11:30 closes their first; the 14:00 sentinel
  // advances the watermark to 13:00 and times out every open session
  private def sessFile2 = Seq(
    (1L, ts(620), "view"),
    (2L, ts(690), "view"),
    (99L, ts(840), "view"))
    .toDF("user_id", "ts", "event_type")

  private def sessRows(df: DataFrame) = df
    .select(col("user_id"), col("session_start"), col("session_end"),
      col("n_events"))
    .collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000L,
      r.getTimestamp(2).getTime / 60000L, r.getInt(3))).toSet

  test("flatMapGroupsWithState: a force-stopped sessionizer restarted from its checkpoint merges the cross-boundary session") {
    val watch = Files.createTempDirectory("graft-cp-sess").toString
    val cp = Files.createTempDirectory("graft-cp-sess-ck").toString
    val sink = Files.createTempDirectory("graft-cp-sess-out").toString

    land(watch, sessFile1, 0)
    val out1 = drain(sessionStream(watch), "append", cp, sink)
    // only user3's in-stream-closed session emitted before the stop
    assert(sessRows(out1) === Set((3L, 540L, 540L, 1)))

    // forced stop happened at the batch boundary; land the rest and
    // restart a NEW query from the SAME checkpoint
    land(watch, sessFile2, 1)
    val out2 = drain(sessionStream(watch), "append", cp, sink)

    val combined = sessRows(out1) ++ sessRows(out2)
    // user1's session spans the stop: ONE merged (10:00-10:20, n=3).
    // Lost state would instead surface a (620,620,1) fragment and
    // lose the (600,605) half entirely.
    val expected = Set(
      (1L, 600L, 620L, 3), (2L, 600L, 600L, 1), (2L, 690L, 690L, 1),
      (3L, 540L, 540L, 1), (3L, 585L, 585L, 1))
    assert(combined === expected)
    // committed output is not re-emitted after restart (replay safety)
    assert(sessRows(out2).intersect(sessRows(out1)).isEmpty)

    // ≡ the uninterrupted run over the same two files
    val watchU = Files.createTempDirectory("graft-cp-sess-u").toString
    val cpU = Files.createTempDirectory("graft-cp-sess-u-ck").toString
    val sinkU = Files.createTempDirectory("graft-cp-sess-u-out").toString
    land(watchU, sessFile1, 0); land(watchU, sessFile2, 1)
    val un = drain(sessionStream(watchU), "append", cpU, sinkU)
    assert(combined === sessRows(un))
  }

  test("built-in windowed state: a force-stopped tiered aggregation restarted from its checkpoint merges cross-boundary buckets") {
    val watch = Files.createTempDirectory("graft-cp-tier").toString
    val cp = Files.createTempDirectory("graft-cp-tier-ck").toString
    val sink = Files.createTempDirectory("graft-cp-tier-out").toString
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def stream() = TieredAggStream.tieredTree(
      spark.readStream.schema(schema).parquet(watch))
    def rows(df: DataFrame) =
      if (df.columns.isEmpty) Set.empty[(Long, String, Long, Long, Long)]
      else df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet

    // file 1 fills two 15-min buckets of hour 10 (both stay in tier-1
    // state: nothing can emit under a 1-hour watermark)
    land(watch, Seq((ts(600), "click", 1.0), (ts(620), "click", 2.0))
      .toDF("ts", "event_type", "value"), 0)
    val out1 = drain(stream().toDF(), "append", cp, sink)
    assert(rows(out1).isEmpty)

    // file 2 adds to the SAME [10:15,10:30) bucket — the recovered
    // tier-1 partial must absorb it, then the 14:00 sentinel flushes
    // hour 10. Lost state would drop file 1's partials entirely.
    land(watch, Seq((ts(625), "click", 3.0), (ts(840), "view", 0.0))
      .toDF("ts", "event_type", "value"), 1)
    val out2 = drain(stream().toDF(), "append", cp, sink)
    val hour10us = 600L * 60L * 1000000L
    assert(rows(out1) ++ rows(out2) ===
      Set((hour10us, "click", 3L, 600L, 2L)))

    // ≡ uninterrupted run over the same two files
    val watchU = Files.createTempDirectory("graft-cp-tier-u").toString
    val cpU = Files.createTempDirectory("graft-cp-tier-u-ck").toString
    val sinkU = Files.createTempDirectory("graft-cp-tier-u-out").toString
    land(watchU, Seq((ts(600), "click", 1.0), (ts(620), "click", 2.0))
      .toDF("ts", "event_type", "value"), 0)
    land(watchU, Seq((ts(625), "click", 3.0), (ts(840), "view", 0.0))
      .toDF("ts", "event_type", "value"), 1)
    val un = drain(TieredAggStream.tieredTree(
      spark.readStream.schema(schema).parquet(watchU)),
      "append", cpU, sinkU)
    assert(rows(un) === rows(out1) ++ rows(out2))
  }

  test("transformWithState: a force-stopped lifetime tracker restarted from its checkpoint resumes the RocksDB folds") {
    val prevProvider =
      spark.conf.getOption(LifetimeStatsStream.rocksConf._1)
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    try {
      val watch = Files.createTempDirectory("graft-cp-life").toString
      val cp = Files.createTempDirectory("graft-cp-life-ck").toString
      val sink = Files.createTempDirectory("graft-cp-life-out").toString
      val schema = StructType(Seq(StructField("user_id", LongType),
        StructField("value", DoubleType)))
      def stream() = LifetimeStatsStream.lifetimeStats(
        spark.readStream.schema(schema).parquet(watch)).toDF()
      def rows(df: DataFrame) = df
        .select(col("user_id"), col("n_events"), col("value_c"),
          col("max_value_c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet

      land(watch, Seq((1L, 1.0), (1L, 2.0), (2L, 3.0))
        .toDF("user_id", "value"), 0)
      val out1 = drain(stream(), "update", cp, sink)
      assert(rows(out1) === Set((1L, 2L, 300L, 200L), (2L, 1L, 300L, 300L)))

      land(watch, Seq((1L, 0.5), (2L, 4.0)).toDF("user_id", "value"), 1)
      val out2 = drain(stream(), "update", cp, sink)
      // counts/sums CONTINUE from the recovered state; a reset state
      // would emit (1,1,50,50)/(2,1,400,400)
      assert(rows(out2) === Set((1L, 3L, 350L, 200L), (2L, 2L, 700L, 400L)))

      // the post-restart panel ≡ the batch twin over all landed rows
      val all = Seq((1L, 1.0), (1L, 2.0), (2L, 3.0), (1L, 0.5), (2L, 4.0))
        .toDF("user_id", "value")
      val batch = LifetimeStatsStream.lifetimeStatsBatch(all).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows(out2) === batch)
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(LifetimeStatsStream.rocksConf._1, v)
        case None => spark.conf.unset(LifetimeStatsStream.rocksConf._1)
      }
    }
  }

  test("mid-batch kill in ForeachBatchSink: partial files land, no commit marker — restart rewrites the batch exactly-once") {
    // VERDICT r15 item 6: the previous restart gates force-stop BETWEEN
    // micro-batches; this one dies INSIDE the sink call — after partial
    // parquet files exist under the batch dir (plus an in-flight task
    // temp file), before foreachBatch returns, so the checkpoint never
    // records batch 0 as committed. The exactly-once claim rests on the
    // idempotent overwrite: the replayed batch must REPLACE the partial
    // output bit-for-bit, never append to it.
    val watch = Files.createTempDirectory("graft-cp-fbk").toString
    val out = Files.createTempDirectory("graft-cp-fbk-out").toString
    val cp = Files.createTempDirectory("graft-cp-fbk-chk").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val data = (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v")
    land(watch, data, 0)
    def stream() = spark.readStream.schema(schema).parquet(watch)

    val q = stream().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => {
        // the kill window, made real: 2 of 6 rows land...
        ForeachBatchSink.writeBatch(b.limit(2).toDF(), out, id)
        // ...plus an orphaned in-flight task file...
        Files.write(Paths.get(s"$out/batch=$id/part-crash.c000.parquet.tmp"),
          Array[Byte](1, 2, 3))
        // ...then the executor dies before the sink returns
        throw new RuntimeException("injected mid-batch kill")
      })
      .start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination()
    }
    q.stop()
    // the crash window is REAL: partial output + orphan exist, and the
    // checkpoint carries no commit for batch 0 (read the real part
    // files explicitly — the orphan .tmp is not parquet)
    val partialParts = new java.io.File(s"$out/batch=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(partialParts.nonEmpty)
    assert(spark.read.parquet(partialParts.toIndexedSeq: _*).count() === 2L)
    assert(new java.io.File(s"$out/batch=0/part-crash.c000.parquet.tmp").exists)
    assert(!new java.io.File(s"$cp/commits/0").exists,
      "a failed batch must not have a commit marker")

    // restart with the production sink: batch 0 replays, its overwrite
    // clobbers the partial files AND the orphan
    val q2 = stream().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => ForeachBatchSink.writeBatch(b.toDF(), out, id))
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(new java.io.File(s"$cp/commits/0").exists)
    assert(!new java.io.File(s"$out/batch=0/part-crash.c000.parquet.tmp").exists,
      "the idempotent overwrite must clear in-flight debris")
    val got = spark.read.parquet(out)
      .select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (1L to 6L).map(i => (i, s"v$i")).toSet,
      "replayed batch must be exactly-once: full rows, no duplicates")
  }
}

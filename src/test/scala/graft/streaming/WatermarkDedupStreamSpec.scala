package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The built-in watermark-bounded dedup (18th streaming op): stream ≡
  * batch on the q27 fingerprint contract, the within/after-watermark
  * duplicate dispositions via MemoryStream, and an AvailableNow
  * catch-up run through ForeachBatchSink proving exactly-once across a
  * restart (checkpointed dedup state survives the stop).
  */
class WatermarkDedupStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("staged run admits exactly the batch q27 fingerprint set, one row each") {
    val admitted = WatermarkDedupStream.runOnce(spark, sf0001).collect()
    val batchFps = graft.operators.DedupOps.exactDedup(spark, sf0001)
      .select(col("fp")).as[String].collect().toSet
    assert(admitted.map(_.getString(1)).toSet === batchFps)
    // one admit per fingerprint — no dup survived, no fp lost
    assert(admitted.length === batchFps.size)
  }

  test("dup within the delay drops; dup after state eviction re-admits (the bounded-state contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF.toDF("doc_id", "text", "ts")
    val q = WatermarkDedupStream.admitted(docs, "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("wm_dedup_disp").start()
    // batch 1: A admitted at 10:00:00; B at 10:00:03
    input.addData((1L, "A", t("2024-01-01 10:00:00")),
      (2L, "B", t("2024-01-01 10:00:03")))
    q.processAllAvailable()
    // batch 2: dup of A at 10:00:01 — watermark is 09:59:53, A's state
    // (evict at 10:00:10) is live ⇒ DROPPED. A 10:05 row pushes the
    // watermark to 10:04:50, far past every eviction time.
    input.addData((3L, "A", t("2024-01-01 10:00:01")),
      (4L, "C", t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // batch 3: dup of A again — state evicted ⇒ RE-ADMITTED (the
    // documented tradeoff vs DedupStream's permanent state)
    input.addData((5L, "A", t("2024-01-01 10:04:55")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wm_dedup_disp")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 4L, 5L),
      s"expected admit/admit/drop-dup/admit/re-admit, got rows $got")
  }

  test("AvailableNow catch-up through ForeachBatchSink: exactly-once across a restart") {
    val base = Files.createTempDirectory("graft-wmdedup-restart")
    val watch = Files.createDirectory(base.resolve("landing"))
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString

    def stage(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("wmstage").toString
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(Paths.get(part.toString), watch.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Unit = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(watch.toString)
        .withColumn("ts",
          timestamp_seconds(lit(1700000000L) + col("doc_id")))
      val q = WatermarkDedupStream.admitted(docs, "1 hour")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", chk)
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) => ForeachBatchSink.writeBatch(b.toDF(), out, id))
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // run 1: two distinct texts, one in-file duplicate
    stage("f1.parquet", Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
    run()
    val landed1 = spark.read.parquet(out)
    assert(landed1.count() === 2L)
    assert(landed1.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))

    // restart: a new file carries dups of ALREADY-ADMITTED texts plus
    // one genuinely new text — checkpointed state must drop the former
    stage("f2.parquet", Seq((4L, "alpha"), (5L, "beta"), (6L, "gamma")))
    run()
    val landed2 = spark.read.parquet(out)
    assert(landed2.count() === 3L, "restart re-admitted a checkpointed key")
    assert(landed2.select("doc_id").as[Long].collect().toSet ===
      Set(1L, 2L, 6L))

    // sink replay (crash between write and commit): rewriting a batch
    // with the same rows leaves the table unchanged (materialize the
    // rows first — the rewrite must not lazily read the files it
    // replaces)
    val b0 = spark.read.parquet(s"$out/batch=0")
    val b0Frozen = spark.createDataFrame(
      java.util.Arrays.asList(b0.collect(): _*), b0.schema)
    ForeachBatchSink.writeBatch(b0Frozen, out, 0L)
    assert(spark.read.parquet(out).count() === 3L)
  }
}

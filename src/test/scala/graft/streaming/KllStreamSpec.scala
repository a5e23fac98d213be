package graft.streaming

import graft.SparkSpecBase
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming KLL (round 16 breadth): per-batch sketch merge in a
  * stateful aggregation, envelope-gated like the batch A/B — the
  * stream's final panel must answer inside the k=200 rank-error
  * envelope on the exact ECDF of everything landed, across REAL
  * micro-batch boundaries (maxFilesPerTrigger=1 forces one batch per
  * landed file, so the state-store merge path genuinely runs).
  */
class KllStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def land(watch: String, df: DataFrame, n: Int): Unit = {
    val tmp = Files.createTempDirectory("graft-kll-stage").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(watch, f"staged-$n%03d.parquet"))
  }

  test("multi-batch stream panel lands inside the k=200 envelope of the exact ECDF; batch twin agrees") {
    val watch = Files.createTempDirectory("graft-kll-watch").toString
    val out = Files.createTempDirectory("graft-kll-out").toString
    val cp = Files.createTempDirectory("graft-kll-cp").toString
    // two files -> two micro-batches: 'a' spans both (the state-store
    // merge is load-bearing), 'b' lives in file 1 only
    val f1 = (0L until 10000L).map(i => ("a", i.toDouble)) ++
      (0L until 500L).map(i => ("b", (i * 3).toDouble))
    val f2 = (10000L until 20000L).map(i => ("a", i.toDouble))
    land(watch, f1.toDF("key", "v"), 0)
    land(watch, f2.toDF("key", "v"), 1)

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("v", DoubleType)))
    val stream = KllQuantileStream.kllPanels(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch)
        .as[(String, Double)])
    val q = stream.toDF().writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => ForeachBatchSink.writeBatch(b.toDF(), out, id))
      .start()
    q.processAllAvailable()
    q.stop()

    // the merge path genuinely ran: >= 2 micro-batches landed
    val batchDirs = new java.io.File(out).list().filter(_.startsWith("batch="))
    assert(batchDirs.length >= 2, s"expected >=2 micro-batches, got ${batchDirs.toSeq}")

    // final panel per key = the row from the LAST batch that refreshed it
    val panels = spark.read.parquet(out)
      .withColumn("b", regexp_extract(input_file_name(), "batch=(\\d+)", 1)
        .cast("long"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("key")).orderBy(col("b").desc)))
      .filter(col("rk") === 1)
      .collect().map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n"), r.getAs[Double]("p50"),
          r.getAs[Double]("p90"), r.getAs[Double]("p99"))).toMap

    val all = (f1 ++ f2).toDF("key", "v").localCheckpoint()
    for ((key, exact) <- Seq("a" -> 20000L, "b" -> 500L)) {
      val (n, p50, p90, p99) = panels(key)
      assert(n === exact, s"$key: sketched n")
      val vals = all.filter(col("key") === key)
      val envelope = math.max(1L, (0.033 * exact).toLong)
      for ((p, est) <- Seq(50 -> p50, 90 -> p90, 99 -> p99)) {
        val rank = vals.filter(col("v") <= est).count()
        val target = (p * exact + 99) / 100
        assert(math.abs(rank - target) <= envelope,
          s"$key p$p: stream rank error ${math.abs(rank - target)} > $envelope")
      }
    }

    // the batch twin on the identical rows answers inside the SAME
    // envelope — the stream/batch sketch matrix closes
    val batchQ = KllQuantileStream.batchPanel(
      all.filter(col("key") === "a").select(col("v")), "v")
    for ((p, est) <- batchQ) {
      val rank = all.filter(col("key") === "a" && col("v") <= est).count()
      val target = (p * 20000L + 99) / 100
      assert(math.abs(rank - target) <= (0.033 * 20000L).toLong,
        s"batch twin p$p out of envelope")
    }
  }
}

package graft.tools

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway: interleaved same-JVM A/B of string vs xxhash64 shingle keys
  * for the q28 postings pipeline (cross-JVM trials drift ±40% on this
  * machine, so alternate within one session and compare medians).
  */
object ScratchAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata parquet marks timestamps isAdjustedToUTC=false; read them as
      // TIMESTAMP (UTC session) like every engine-side consumer expects
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)

    def rawShingles(): DataFrame = {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(wDoc))
        .withColumn("t2", lead(col("tok"), 2).over(wDoc))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("tok"))
        .dropDuplicates("doc_id", "tok")
    }
    val capDf = docs.agg(expr(
      "least(200L, greatest(50L, (count(1) * 2 + 99) div 100)) AS cap"))

    def postings(raw: DataFrame, hashed: Boolean): DataFrame = {
      val keyed =
        if (hashed) raw.select(col("doc_id"), xxhash64(col("tok")).as("tok"))
        else raw
      val rare = keyed.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .join(broadcast(capDf), col("df") <= col("cap"))
        .select(col("tok"))
      keyed.join(rare, "tok")
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
        .persist()
    }

    def pairs(toks: DataFrame): DataFrame = {
      val l = toks.alias("l")
      val r = toks.alias("r")
      l.join(r, col("l.tok") === col("r.tok") && col("l.doc_id") < col("r.doc_id"))
        .groupBy(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
          col("l.n").as("n_a"), col("r.n").as("n_b"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }

    def timeOne(hashed: Boolean): Double = {
      val raw = rawShingles().persist()
      raw.count() // materialize input outside the timed section, same for both
      val t0 = System.nanoTime()
      val p = postings(raw, hashed)
      pairs(p).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      p.unpersist(blocking = true)
      raw.unpersist(blocking = true)
      dt
    }

    timeOne(hashed = false) // JVM/codegen warm-up, discarded
    timeOne(hashed = true)
    val (ss, hs) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double]())
    for (round <- 1 to 4) {
      // alternate order each round to cancel drift
      if (round % 2 == 1) { ss += timeOne(false); hs += timeOne(true) }
      else { hs += timeOne(true); ss += timeOne(false) }
      println(f"AB round $round string=${ss.last}%.2f hashed=${hs.last}%.2f")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"AB MEDIAN string=${med(ss.toSeq)}%.2f hashed=${med(hs.toSeq)}%.2f")
    spark.stop()
  }
}

package graft.tools

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway: stage-level profile of the q28 pipeline — where do the ~6
  * cold seconds go? Times raw-build/persist, postings-build/persist, and
  * the pairs join separately, plus a no-persist end-to-end variant.
  */
object ScratchProfile {
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
    def postings(raw: DataFrame, doPersist: Boolean): DataFrame = {
      val keyed = raw.select(col("doc_id"), xxhash64(col("tok")).as("tok"))
      val rare = keyed.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .join(broadcast(capDf), col("df") <= col("cap"))
        .select(col("tok"))
      val p = keyed.join(rare, "tok")
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      if (doPersist) p.persist() else p
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
        .orderBy(col("id_a"), col("id_b"))
    }
    def t(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROF $label ${dt}%.2f s")
      dt
    }

    // warm-up
    pairs(postings(rawShingles().persist(), doPersist = true))
      .write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    for (round <- 1 to 3) {
      println(s"PROF --- round $round: staged (persist both) ---")
      val raw = rawShingles().persist()
      t("raw build+persist+count") { raw.count() }
      val p = postings(raw, doPersist = true)
      t("postings build+persist+count") { p.count() }
      t("pairs join") { pairs(p).write.mode("overwrite").format("noop").save() }
      p.unpersist(blocking = true); raw.unpersist(blocking = true)

      println(s"PROF --- round $round: end-to-end no-persist ---")
      t("no-persist total") {
        pairs(postings(rawShingles(), doPersist = false))
          .write.mode("overwrite").format("noop").save()
      }
      println(s"PROF --- round $round: end-to-end persist (current shape) ---")
      t("persist total") {
        val r2 = rawShingles().persist()
        val p2 = postings(r2, doPersist = true)
        pairs(p2).write.mode("overwrite").format("noop").save()
        p2.unpersist(blocking = true); r2.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}

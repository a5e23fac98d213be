package graft.tools

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway: interleaved same-JVM A/B of the raw-shingle build shape —
  * posexplode + lead windows (shuffles every token row by doc_id) vs
  * array-side 3-gram construction (transform over the token array, one
  * explode, NO shuffle before dropDuplicates). The HOF trap the docstrings
  * warn about is re-evaluation under CollapseProject; a single
  * explode(expr) evaluates the lambda once per row.
  */
object ScratchShingle {
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

    def windowShingles(): DataFrame = {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      docs
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(wDoc))
        .withColumn("t2", lead(col("tok"), 2).over(wDoc))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("tok"))
        .dropDuplicates("doc_id", "tok")
    }

    def arrayShingles(): DataFrame = {
      val toks = Text.tokens(col("text"))
      docs
        .select(col("doc_id"),
          explode(when(size(toks) >= 3,
            array_distinct(transform(sequence(lit(0), size(toks) - 3),
              i => concat_ws(" ", element_at(toks, i + 1),
                element_at(toks, i + 2), element_at(toks, i + 3)))))
            .otherwise(array())).as("tok"))
    }

    def timeOne(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // equality check first (cheap corpus)
    val small = "/root/testdata/sf0.01"
    val docsSmall = Tables.documents(spark, small)
    locally {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val a = docsSmall
        .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(wDoc))
        .withColumn("t2", lead(col("tok"), 2).over(wDoc))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("tok"))
        .dropDuplicates("doc_id", "tok")
      val toks = Text.tokens(col("text"))
      val b = docsSmall.select(col("doc_id"),
        explode(when(size(toks) >= 3,
          array_distinct(transform(sequence(lit(0), size(toks) - 3),
            i => concat_ws(" ", element_at(toks, i + 1),
              element_at(toks, i + 2), element_at(toks, i + 3)))))
          .otherwise(array())).as("tok"))
      val onlyA = a.exceptAll(b).count()
      val onlyB = b.exceptAll(a).count()
      println(s"SHINGLE-EQ onlyWindow=$onlyA onlyArray=$onlyB")
    }

    timeOne(windowShingles _) // warm-up
    timeOne(arrayShingles _)
    val (ws, as) = (collection.mutable.ArrayBuffer[Double](),
      collection.mutable.ArrayBuffer[Double]())
    for (round <- 1 to 4) {
      if (round % 2 == 1) { ws += timeOne(windowShingles _); as += timeOne(arrayShingles _) }
      else { as += timeOne(arrayShingles _); ws += timeOne(windowShingles _) }
      println(f"SHINGLE round $round window=${ws.last}%.2f array=${as.last}%.2f")
    }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"SHINGLE MEDIAN window=${med(ws.toSeq)}%.2f array=${med(as.toSeq)}%.2f")
    spark.stop()
  }
}

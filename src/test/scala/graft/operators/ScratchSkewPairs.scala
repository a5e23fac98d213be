package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: the hot-user pair-expansion probe behind the round-8
  * `cappedUserItems` guard (q107 item-PMI / q113 PageRank edge build).
  *
  * Builds a synthetic skewed event log — `nUsers` normal users with
  * `normalItems` distinct items each, plus ONE bot with `botItems`
  * distinct items — and times the per-user pair self-join with the cap
  * off (cap ≥ botItems) vs on (cap = 500, the shipped default). The
  * uncapped bot alone emits C(botItems, 2) pairs inside one user_id
  * key; the capped run bounds it at C(500, 2) = 124,750. Results land
  * in SCALING.md.
  */
object ScratchSkewPairs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val nUsers = 20000
    val normalItems = 10
    val botItemCounts = Seq(2000, 8000, 32000)

    def evFrame(botItems: Int) = {
      val normals = spark.range(0, nUsers.toLong * normalItems)
        .select((col("id") / normalItems).cast("long").as("user_id"),
          concat(lit("""{"k": """), (col("id") % normalItems).cast("int"),
            lit("}")).as("props"))
      val bot = spark.range(0, botItems.toLong)
        .select(lit(-1L).as("user_id"),
          concat(lit("""{"k": """), col("id").cast("int"),
            lit("}")).as("props"))
      normals.unionByName(bot)
    }

    def pairCount(ev: org.apache.spark.sql.DataFrame, cap: Int): Long = {
      val ui = EventOps.cappedUserItems(ev, cap)
      ui.as("a").join(ui.as("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.item") < col("b.item"))
        .count()
    }

    for (botItems <- botItemCounts) {
      val ev = evFrame(botItems).persist()
      ev.count() // materialize outside the timed region
      for ((label, cap) <- Seq("uncapped" -> (botItems + 1),
          "cap500" -> EventOps.DefaultUserItemCap)) {
        val t0 = System.nanoTime()
        val n = pairCount(ev, cap)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SKEWPROF bot=$botItems%-6d $label%-9s pairs=$n%-12d $sec%.2f s")
      }
      ev.unpersist()
    }
    spark.stop()
  }
}

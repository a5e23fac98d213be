package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over relation-shaped graphs. The dedup family already
  * ships connected components (q53); this adds the other canonical
  * distributed graph computation — PageRank — over the item
  * co-occurrence graph the market-basket operator (q107) induces.
  */
object GraphOps {

  /** Fixed-point integer PageRank (q113): `iters` damped iterations over
    * the undirected item co-occurrence graph (edge when ≥ `minSupport`
    * users touched both items), with ALL arithmetic in integer
    * billionths — rank/degree contributions and the 15/85 damping split
    * use floor division, so every iteration is exact integer math,
    * identical under any join order, shuffle order, or engine. The
    * deliberate trade: floor division sheds ≤1 unit of mass per
    * division (documented, deterministic) in exchange for a gate that
    * is cell-exact rather than tolerance-based — the q95/q105 playbook
    * applied to an iterative graph kernel.
    *
    * Scale shape: the canonical distributed PageRank — ranks and
    * degrees are node-cardinality frames keyed by item, each iteration
    * is one ranks⋈edges join (co-partitioned on the same key every
    * round — one partitioning reused) plus a dst-keyed aggregate;
    * iterations are a FIXED count, no driver-side convergence loop, no
    * collect. At 100 TB the edges relation is the big side and is
    * hash-partitioned once; the per-iteration shuffle moves only
    * node-scale data. The edge BUILD shares q107's
    * [[graft.operators.EventOps.cappedUserItems]] guard: each user is
    * bounded to their top-`userItemCap` items before pairing, so no
    * single hot user can emit a quadratic pair blow-up inside one
    * task (lossless at test scale — cap 500 vs sf0.1 max activity 67;
    * the oracle replays the same cap).
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3,
      minSupport: Int = 5): DataFrame =
    pageRankOn(Tables.events(spark, dir), iters, minSupport)

  private val Unit9 = 1000000000L

  private[graft] def pageRankOn(ev: DataFrame, iters: Int = 3,
      minSupport: Int = 5,
      userItemCap: Int = EventOps.DefaultUserItemCap): DataFrame = {
    val ui = EventOps.cappedUserItems(ev, userItemCap)
    val pairs = ui.as("a")
      .join(ui.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("i"), col("b.item").as("j"))
      .agg(count(lit(1)).as("n_ij"))
      .filter(col("n_ij") >= minSupport)
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
    // the src out-degree rides ON the edge rows (one window over the
    // src partitioning), so the per-iteration plan is ONE ranks⋈edges
    // join — not ranks⋈edges⋈deg; persist: the edge relation is fed by
    // the expensive per-user pair expansion and is read every iteration
    // (the q30/q53 persist-the-iterated-relation rule)
    val edgesD = edges
      .withColumn("d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .persist()
    val nodes = edgesD.select(col("src").as("item")).distinct()
    val nNodes = nodes.crossJoin(broadcast(
      nodes.agg(count(lit(1)).as("n_nodes"))))
    // init: U/N each; teleport term: (15·(U/N)) div 100, both floor
    val init = nNodes.select(col("item"), col("n_nodes"),
      expr(s"CAST($Unit9 div n_nodes AS BIGINT)").as("r"))
    val ranks = (1 to iters).foldLeft(init) { (r, _) =>
      val contrib = edgesD
        .join(r.select(col("item").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("c"))
      r.select(col("item"), col("n_nodes"))
        .join(contrib, col("item") === col("dst"), "left")
        .select(col("item"), col("n_nodes"),
          (expr(s"(15 * ($Unit9 div n_nodes)) div 100") +
            expr("(85 * coalesce(c, 0L)) div 100")).as("r"))
    }
    val out = ranks
      .select(col("item"), col("r").as("rank_q"),
        round(col("r").cast("double") / lit(Unit9.toDouble), 6).as("rank"))
      .orderBy(col("rank_q").desc, col("item"))
      .localCheckpoint(eager = true)
    edgesD.unpersist()
    out
  }
}

package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 TPC-H breadth batch: market share (q158, Q8 shape), returned
  * revenue (q159, Q10 shape), promo share (q160, Q14 shape),
  * small-quantity revenue (q161, Q17 shape). Each query is checked
  * against an independent recompute on sf0.001 — different arithmetic
  * path (double, or a hand-rolled integer rule) over the same data.
  */
class TpchBreadthSpec extends SparkSpecBase {

  test("q158: shares in [0,1], years ascending, one year recomputed") {
    val out = CoreQueries.q158MarketShare(spark, sf0001).collect()
    assert(out.nonEmpty)
    val years = out.map(_.getInt(0))
    assert(years.sorted.sameElements(years))
    out.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // independent double-arithmetic recompute of one year's share
    val y = years.head
    val nat = graft.Tables.nation(spark, sf0001)
    val asiaCust = graft.Tables.customer(spark, sf0001)
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf0001)
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppN2 = graft.Tables.supplier(spark, sf0001)
      .join(nat.filter(col("n_name") === "NATION_2")
        .select(col("n_nationkey").as("nk2")),
        col("s_nationkey") === col("nk2"))
      .select(col("s_suppkey"))
    val base = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
        .filter(year(col("o_orderdate")) === y),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val total = base.agg(sum(col("rev"))).head().getDouble(0)
    val n2 = base.join(suppN2, col("l_suppkey") === col("s_suppkey"))
      .agg(sum(col("rev"))).head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
    val got = out.find(_.getInt(0) == y).get
    assert(math.abs(got.getDouble(1) - total) < 0.01)
    assert(math.abs(got.getDouble(2) - n2 / total) < 1e-5)
  }

  test("q159: top-20 desc with custkey tiebreak; top row recomputed") {
    val out = CoreQueries.q159ReturnedRevenue(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.sliding(2).foreach {
      case Array(a, b) =>
        val (ra, rb) = (a.getDouble(4), b.getDouble(4))
        assert(ra > rb || (ra == rb && a.getLong(0) < b.getLong(0)))
      case _ =>
    }
    val top = out.head
    val rev = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_returnflag") === "R")
      .join(graft.Tables.orders(spark, sf0001)
        .filter(col("o_orderdate") >= lit("1997-01-01") &&
          col("o_orderdate") < lit("1998-01-01") &&
          col("o_custkey") === top.getLong(0)),
        col("l_orderkey") === col("o_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(rev - top.getDouble(4)) < 0.01)
  }

  test("q160: promo pct in [0,100]; one month recomputed") {
    val out = CoreQueries.q160PromoShare(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 100.0))
    val m = out.head.getInt(0)
    val base = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        month(col("l_shipdate")) === m)
      .join(graft.Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .select((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"), col("p_type"))
    val total = base.agg(sum(col("rev"))).head().getDouble(0)
    val promo = base.filter(col("p_type") === "PROMO")
      .agg(sum(col("rev"))).head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
    assert(math.abs(out.head.getDouble(1) - 100.0 * promo / total) < 1e-3)
  }

  test("q161: integer threshold rule matches an independent recompute") {
    val out = CoreQueries.q161SmallQtyRevenue(spark, sf0001).collect()
    assert(out.nonEmpty)
    // independent recompute: per-part integer stats via a different
    // aggregation path (window instead of groupBy+join)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_partkey"))
    val flagged = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"),
        round(col("l_quantity"), 0).cast("long").as("qty_i"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .as("rev_cp"))
      .withColumn("sum_qty", sum(col("qty_i")).over(w))
      .withColumn("cnt_qty", count(lit(1)).over(w))
      .filter(col("qty_i") * lit(5L) * col("cnt_qty") < col("sum_qty"))
      .join(graft.Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("rev_cp")).as("cp"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1),
        BigDecimal(r.getLong(2)) / 10000)))
      .toMap
    out.foreach { r =>
      val (n, cp) = flagged(r.getString(0))
      assert(r.getLong(1) === n)
      assert((BigDecimal(r.getDouble(2)) - cp).abs < BigDecimal("0.01"))
    }
    assert(out.length === flagged.size)
  }

  test("q223: semi/anti multi-exists matches the order-tally recompute") {
    val out = CoreQueries.q223WaitSuppliers(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // independent path: per-order supplier tallies (n_supp > 1 = another
    // supplier exists; n_late = 1 = no OTHER late supplier) instead of
    // the semi/anti joins
    val flagged = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001)
        .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAY")).as("late"))
    val per = flagged.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
    val expect = flagged.filter(col("late"))
      .join(per, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy { case (k, n) => (-n, k) }.take(10)
    assert(out.nonEmpty)
    assert(out.toSeq === expect.toSeq)
  }

  test("q224: disjunctive revenue equals a double-arithmetic recompute") {
    // sf0.01: the three blocks are too selective for sf0.001's 200 parts
    val sf001 = "/root/testdata/sf0.01"
    val out = CoreQueries.q224DisjunctiveRevenue(spark, sf001).head()
    assert(out.getLong(0) > 0L)
    def blk(brand: String, sHi: Int, qLo: Double, qHi: Double) =
      col("p_brand") === brand && col("p_size").between(1, sHi) &&
        col("l_quantity").between(qLo, qHi)
    val rows = graft.Tables.lineitem(spark, sf001)
      .join(graft.Tables.part(spark, sf001),
        col("l_partkey") === col("p_partkey"))
      .filter(blk("Brand#12", 5, 1, 11) || blk("Brand#23", 10, 10, 20) ||
        blk("Brand#34", 15, 20, 30))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .head()
    assert(out.getLong(0) === rows.getLong(0))
    assert(math.abs(out.getDouble(1) - rows.getDouble(1)) < 0.5)
  }

  test("q227: EXISTS counts match a join+distinct recompute") {
    val out = CoreQueries.q227OrderPriority(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .join(graft.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .select(col("o_orderkey"), col("o_orderpriority")).distinct()
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    assert(out === expect)
  }

  test("q229: min-cost rejoin matches a window-min recompute, ties kept") {
    val out = CoreQueries.q229MinCostSupplier(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.nonEmpty)
    // independent path: window min per part instead of aggregate-rejoin
    import org.apache.spark.sql.expressions.Window
    val ps = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("cost_c"))
      .withColumn("mn", min(col("cost_c"))
        .over(Window.partitionBy(col("l_partkey"))))
    val expect = ps.filter(col("cost_c") === col("mn"))
      .join(graft.Tables.part(spark, sf0001)
        .filter(col("p_size") <= 10),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).take(25).toSeq
    assert(out === expect)
  }

  test("q230: threshold parts match a double-arithmetic recompute") {
    val out = CoreQueries.q230ImportantParts(spark, sf0001).collect()
    assert(out.nonEmpty)
    val pp = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("value_c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = pp.values.map(BigInt(_)).sum
    val expect = pp.filter { case (_, v) =>
      BigInt(v) * pp.size * 2 > total * 3 }
    out.foreach { r =>
      val (k, v) = (r.getLong(0), expect.get(r.getLong(0)))
      assert(v.isDefined, s"part $k not above threshold")
      assert(r.getDouble(1) === v.get.toDouble / 100.0)
      assert(r.getLong(2) === ((BigInt(v.get) * 10000) / total).toLong)
    }
    assert(out.length === math.min(expect.size, 25))
  }

  test("q231: one nation-pair cell recomputed in double arithmetic") {
    val out = CoreQueries.q231NationVolume(spark, sf0001).collect()
    assert(out.nonEmpty)
    // rows are cross-nation, bounded nations, inside the ship window
    out.foreach { r =>
      assert(r.getInt(0) != r.getInt(1))
      assert(r.getInt(0) < 5 && r.getInt(1) < 5)
      assert(r.getInt(2) === 1996 || r.getInt(2) === 1997)
    }
    val h = out.head
    val cust = graft.Tables.customer(spark, sf0001)
      .filter(col("c_nationkey") === h.getInt(1))
      .select(col("c_custkey"))
    val supp = graft.Tables.supplier(spark, sf0001)
      .filter(col("s_nationkey") === h.getInt(0))
      .select(col("s_suppkey"))
    val rev = graft.Tables.lineitem(spark, sf0001)
      .filter(year(col("l_shipdate")) === h.getInt(2))
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .head()
    assert(h.getLong(3) === rev.getLong(0))
    assert(math.abs(h.getDouble(4) - rev.getDouble(1)) < 0.5)
  }

  test("q236: dominance chain matches a window-total recompute") {
    val out = CoreQueries.q236DominantSuppliers(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    // independent path: window total per part instead of agg-rejoin
    import org.apache.spark.sql.expressions.Window
    val expect = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(graft.Tables.part(spark, sf0001)
        .filter(col("p_name").startsWith("small")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(round(col("l_quantity"), 0).cast("long")).as("qty"))
      .withColumn("total",
        sum(col("qty")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("qty") * 2L > col("total"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === expect)
  }

  test("q237: one nation-year profit cell recomputed in double arithmetic") {
    val out = CoreQueries.q237NationProfit(spark, sf0001).collect()
    assert(out.nonEmpty)
    // nation ascending, year descending within nation
    out.sliding(2).foreach {
      case Array(a, b) =>
        val (na, nb) = (a.getString(0), b.getString(0))
        assert(na < nb || (na == nb && a.getInt(1) > b.getInt(1)))
      case _ =>
    }
    val h = out.head
    val cell = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001)
        .filter(col("p_name").contains("red")),
        col("l_partkey") === col("p_partkey"))
      .join(graft.Tables.orders(spark, sf0001)
        .filter(year(col("o_orderdate")) === h.getInt(1)),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.supplier(spark, sf0001),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.nation(spark, sf0001)
        .filter(col("n_name") === h.getString(0)),
        col("s_nationkey") === col("n_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          round(col("l_quantity"), 0) * col("p_retailprice")).as("p"))
      .head()
    assert(h.getLong(2) === cell.getLong(0))
    assert(math.abs(h.getDouble(3) - cell.getDouble(1)) < 0.5)
  }

  test("q228: the two CASE branches partition the year's joined lines") {
    val out = CoreQueries.q228PriorityShipmix(spark, sf0001).collect()
    assert(out.nonEmpty)
    val joined = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
    val byFlag = joined.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val high = joined
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val f = r.getString(0)
      assert(r.getLong(1) === high.getOrElse(f, 0L))
      assert(r.getLong(1) + r.getLong(2) === byFlag(f))
    }
  }

  test("q241: scalar matches a double-arithmetic recompute; filters reach the scan") {
    val out = CoreQueries.q241DiscountRevenue(spark, sf0001).collect()
    assert(out.length === 1)
    // independent recompute in raw double arithmetic over collected rows
    val rows = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_shipdate").cast("date").cast("string"),
        col("l_extendedprice"), col("l_discount"), col("l_quantity"))
      .collect()
      .filter { r =>
        val d = r.getString(0)
        d >= "1997-01-01" && d < "1998-01-01" &&
          math.round(r.getDouble(2) * 100) >= 5 &&
          math.round(r.getDouble(2) * 100) <= 7 &&
          math.round(r.getDouble(3)) < 24
      }
    assert(out.head.getLong(0) === rows.length.toLong)
    val rev = rows.map(r => math.round(r.getDouble(1) * 100) *
      math.round(r.getDouble(2) * 100)).sum.toDouble / 10000.0
    assert(math.abs(out.head.getDouble(1) - rev) < 1e-6)
    // the Q6 contract is the scan path: the date range must be PUSHED
    // into the parquet scan (min/max pruning at 100 TB), not post-filtered
    val plan = CoreQueries.q241DiscountRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("l_shipdate"), s"ship-date filter not pushed:\n$plan")
  }

  test("q242: distinct-supplier rollup matches a set-based recompute; blocklist excluded") {
    val out = CoreQueries.q242SupplierDiversity(spark, sf0001).collect()
    assert(out.nonEmpty)
    val sizes = Set(1, 5, 9, 13, 17, 21, 25, 29)
    val parts = graft.Tables.part(spark, sf0001)
      .select(col("p_partkey"), col("p_brand"), col("p_size")).collect()
      .filter(r => sizes(r.getInt(2)) && r.getString(1) != "Brand#45")
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val blocked = graft.Tables.supplier(spark, sf0001)
      .select(col("s_suppkey"), col("s_acctbal")).collect()
      .filter(r => math.round(r.getDouble(1) * 100) < 0)
      .map(_.getLong(0)).toSet
    val expect = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .flatMap { r =>
        parts.get(r.getLong(0)).collect {
          case grp if !blocked(r.getLong(1)) => grp -> r.getLong(1)
        }
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    val got = out.map(r =>
      ((r.getString(0), r.getInt(1))) -> r.getLong(2).toInt).toMap
    assert(got === expect)
    // ranking column is the first sort key (desc)
    val cnts = out.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}

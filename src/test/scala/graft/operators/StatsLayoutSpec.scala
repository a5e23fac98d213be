package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 fifth batch: two-phase dense IDs (q130), exact-moment OLS
  * (q131), Z-order layout profile (q132).
  */
class StatsLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("denseIds: two-phase assignment equals the naive global window") {
    val naive = graft.Tables.embeddings(spark, sf0001)
      .select($"vec_id",
        (row_number().over(Window.orderBy($"vec_id")) - 1).cast("long")
          .as("dense_id"))
      .as[(Long, Long)].collect().toMap
    for (width <- Seq(7L, 256L)) { // non-power-of-two too
      val got = CoreQueries.q130DenseIds(spark, sf0001, width)
        .as[(Long, Long)].collect().toMap
      assert(got === naive)
    }
  }

  test("exactOls: matches a BigInt reference computation") {
    val rows = graft.Tables.lineitem(spark, sf0001)
      .select($"l_returnflag", round($"l_quantity" * 100, 0).cast("long"),
        round($"l_extendedprice" * 100, 0).cast("long"))
      .as[(String, Long, Long)].collect()
    val want = rows.groupBy(_._1).map { case (flag, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val syy = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val varX = (n * sxx - sx * sx).toDouble
      val varY = (n * syy - sy * sy).toDouble
      val cov = (n * sxy - sx * sy).toDouble
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      flag -> (rs.length.toLong, r6(cov / varX),
        r6((sy * sxx - sx * sxy).toDouble / varX),
        r6(cov / (math.sqrt(varX) * math.sqrt(varY))))
    }
    val got = CoreQueries.q131ExactOls(spark, sf0001)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got === want)
    // r must be a genuine correlation, not degenerate
    got.values.foreach { case (_, _, _, r) => assert(r.abs <= 1.0) }
  }

  test("zorder: interleave is exact and ranges are 2-D local") {
    def morton(p: Long, s: Long): Long =
      (0 until 31).map(i =>
        (((p >> i) & 1L) << (2 * i)) | (((s >> i) & 1L) << (2 * i + 1))).sum
    // keys above 16 bits must NOT alias (the 31-bit widening's point):
    // interleave some >65535 keys through the column expression and
    // compare bit-exactly against the reference fold
    val bigKeys = Seq((100000L, 70000L), (1L << 30, (1L << 30) - 1),
      (2147483647L, 2147483647L), (65536L, 0L), (0L, 65536L))
    val viaExpr = bigKeys.toDF("p", "s")
      .select(CoreQueries.mortonCol($"p", $"s").as("z"))
      .as[Long].collect()
    assert(viaExpr.toSeq === bigKeys.map { case (p, s) => morton(p, s) })
    assert(morton(65536L, 0L) != morton(0L, 0L)) // no 16-bit wraparound
    // spot-check the column expression against the reference interleave
    val sample = graft.Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_suppkey").limit(50)
      .as[(Long, Long)].collect()
    val viaOp = CoreQueries.q132ZorderLayout(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(viaOp.nonEmpty)
    viaOp.foreach { case (zr, n, minP, maxP, minS, maxS) =>
      assert(n > 0 && minP <= maxP && minS <= maxS)
      // a z-range (z div 2^14) fixes both keys' bits >= 7, so each
      // dimension varies within a 128-wide window — the pruning property
      assert(maxP - minP < 128 && maxS - minS < 128)
      // every sampled row's morton lands in its claimed range
      sample.foreach { case (p, s) =>
        val z = morton(p, s)
        if (z / 16384 == zr) {
          assert(p >= minP && p <= maxP && s >= minS && s <= maxS)
        }
      }
    }
  }
}

package graft.dq

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Planted-violation gates for the declarative expectation runner:
  * each check class catches exactly its planted row and nothing else.
  */
class DqSuiteSpec extends SparkSpecBase {
  import spark.implicits._

  private def panel(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(1) ->
      (r.getLong(2), r.getLong(3), r.getInt(4))).toMap

  test("row checks: null / enum / range violations are each counted once") {
    val df = Seq(
      (Some(1L), "F", 10.0), (Some(2L), "O", 20.0),
      (None, "F", 30.0),            // null key
      (Some(4L), "X", 40.0),        // bad enum
      (Some(5L), null, 50.0),       // NULL enum counts as violation
      (Some(6L), "P", -1.0),        // below range
      (Some(7L), "P", 2000000.0))   // above range
      .toDF("k", "status", "price")
    val got = panel(DqSuite.rowChecks("t", df, Seq(
      "not_null_k" -> col("k").isNull,
      "enum_status" -> (col("status").isNull ||
        !col("status").isin("F", "O", "P")),
      "range_price" -> (col("price") <= 0.0 || col("price") > 1000000.0))))
    assert(got === Map(
      "not_null_k" -> ((7L, 1L, 0)),
      "enum_status" -> ((7L, 2L, 0)),
      "range_price" -> ((7L, 2L, 0))))
  }

  test("uniqueness counts surplus copies; FK counts orphans including null keys") {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    val uq = panel(DqSuite.uniqueCheck("t", df, Seq("k")))
    assert(uq === Map("unique_k" -> ((3L, 2L, 0))))
    val clean = panel(DqSuite.uniqueCheck("t",
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k")))
    assert(clean === Map("unique_k" -> ((2L, 0L, 1))))

    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk").select(col("fk").as("k"))
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val fk = panel(DqSuite.fkCheck("t", child, "k", parent, "k"))
    // 9 (no parent) + null (cannot match) = 2 orphans of 4 checked
    assert(fk === Map("fk_k_to_k" -> ((4L, 2L, 0))))
  }

  test("the shipped suite reports the real lineitem uniqueness breakage and nothing else") {
    val got = panel(DqSuite.dqSuite(spark, sf0001))
    val failing = got.filter(_._2._3 == 0).keySet
    assert(failing === Set("unique_l_orderkey_l_linenumber"),
      s"unexpected failing checks: $failing")
    assert(got("unique_l_orderkey_l_linenumber")._2 > 0L)
    assert(got.size === 14)
    // the v2 expectation kinds ride the panel: accepted-values clean
    // on the real returnflag domain, per-type freshness within 24h
    assert(got("accepted_l_returnflag")._3 === 1)
    assert(got("fresh_event_type_ts") ===
      ((5L, 0L, 1))) // 5 event types, none stale
  }

  test("freshness: a stalled group is flagged, in-SLA lag is not, the freshest group anchors the proxy") {
    def ts(h: Long) = new java.sql.Timestamp(h * 3600000L)
    val df = Seq(
      ("a", ts(100)), ("a", ts(90)),   // freshest -> the now-proxy
      ("b", ts(80)),                   // 20h lag: inside the 24h SLA
      ("c", ts(40)), ("c", ts(10)))    // 60h lag: stalled
      .toDF("grp", "t")
    val got = panel(DqSuite.freshnessCheck("t", df, "t", "grp",
      maxLagHours = 24))
    assert(got === Map("fresh_grp_t" -> ((3L, 1L, 0))))
  }

  test("quarantine round-trip: failing rows land under __quarantine, invisible to table readers, recoverable with their check") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-dq-quarantine").toString
    val df = Seq(
      (Some(1L), "F", 10.0), (Some(2L), "O", 20.0),
      (None, "F", 30.0),          // fails not_null_k
      (Some(4L), "X", 40.0),      // fails enum_status
      (Some(5L), "F", -1.0))      // fails range_price
      .toDF("k", "status", "price")
    val spec = graft.etl.Sinks.TableSpec("dq_t", graft.etl.Sinks.Parquet)
    val (nClean, nBad) = DqSuite.quarantineWrite(df, Seq(
      "not_null_k" -> col("k").isNull,
      "enum_status" -> (col("status").isNull ||
        !col("status").isin("F", "O", "P")),
      "range_price" -> (col("price") <= 0.0 || col("price") > 1000000.0)),
      spec, out)
    assert(nClean === 2L && nBad === 3L)
    // table readers see ONLY clean rows — __quarantine is underscore-
    // hidden from the file index, the _SUCCESS rule
    val table = spark.read.parquet(s"$out/dq_t")
    assert(table.count() === 2L)
    assert(table.select(col("k")).as[Long].collect().toSet === Set(1L, 2L))
    // the quarantine read recovers every failing row with its check
    val q = spark.read.parquet(s"$out/dq_t/__quarantine")
    val byChk = q.collect()
      .map(r => r.getString(r.fieldIndex("__failed_chk")) ->
        r.getDouble(r.fieldIndex("price"))).toSet
    assert(byChk === Set(("not_null_k", 30.0), ("enum_status", 40.0),
      ("range_price", -1.0)))
    // re-running is idempotent at the file level (overwrite semantics)
    val again = DqSuite.quarantineWrite(df, Seq(
      "not_null_k" -> col("k").isNull,
      "enum_status" -> (col("status").isNull ||
        !col("status").isin("F", "O", "P")),
      "range_price" -> (col("price") <= 0.0 || col("price") > 1000000.0)),
      spec, out)
    assert(again === ((2L, 3L)))
    assert(spark.read.parquet(s"$out/dq_t").count() === 2L)
    assert(spark.read.parquet(s"$out/dq_t/__quarantine").count() === 3L)
  }
}

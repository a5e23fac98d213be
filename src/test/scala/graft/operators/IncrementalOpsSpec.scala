package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Snapshot diff (q91): status assignment per category, idempotence,
  * add/remove duality under snapshot swap, and the delta-only output
  * contract (unchanged mass never reaches the manifest).
  */
class IncrementalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("statuses: added / removed / changed classified, unchanged absent") {
    val v1 = df((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val v2 = df((1L, "alpha"), (2L, "beta prime"), (4L, "delta"))
    val out = IncrementalOps.snapshotDiff(v1, v2)
      .select("doc_id", "status").as[(Long, String)].collect().toSeq
    assert(out === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("n_chars reports the surviving side") {
    val v1 = df((1L, "aa"), (2L, "bbbb"))
    val v2 = df((1L, "cccccc"))
    val out = IncrementalOps.snapshotDiff(v1, v2)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 6L, 2L -> 4L)) // changed -> v2 len, removed -> v1 len
  }

  test("idempotence: diff of a snapshot with itself is empty") {
    val v = df((1L, "x"), (2L, "y"), (3L, "z"))
    assert(IncrementalOps.snapshotDiff(v, v).count() === 0)
  }

  test("duality: swapping snapshots flips added/removed, keeps changed") {
    val v1 = df((1L, "a"), (2L, "b"))
    val v2 = df((2L, "b2"), (3L, "c"))
    val fwd = IncrementalOps.snapshotDiff(v1, v2)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    val rev = IncrementalOps.snapshotDiff(v2, v1)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(fwd === Map(1L -> "removed", 2L -> "changed", 3L -> "added"))
    assert(rev === Map(1L -> "added", 2L -> "changed", 3L -> "removed"))
  }

  private def kdf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  private def recompute(v: org.apache.spark.sql.DataFrame) =
    v.groupBy("source").agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .orderBy("source")

  test("incrementalAggRefresh: delta fold lands exactly on the full recompute") {
    val v1 = kdf((1L, "a", "xx"), (2L, "a", "yyy"), (3L, "b", "zzzz"),
      (4L, "c", "w"))
    // changed 1 (a), removed 3 (b: group empties), added 5 (d: new group),
    // unchanged 2/4
    val v2 = kdf((1L, "a", "xxxxxx"), (2L, "a", "yyy"), (4L, "c", "w"),
      (5L, "d", "vv"))
    val incr = IncrementalOps.incrementalAggRefresh(v1, v2, "source")
      .as[(String, Long, Long)].collect().toSeq
    val full = recompute(v2).as[(String, Long, Long)].collect().toSeq
    assert(incr === full)
    assert(!incr.exists(_._1 == "b")) // emptied group left the aggregate
  }

  test("incrementalAggRefresh: key migrations fold as remove+add on both groups") {
    // doc 1 migrates a→b with identical text (the case a naive
    // fp-only delta filter drops entirely); doc 2 migrates a→c WITH a
    // text change; doc 3 stays put. Incremental must equal recompute.
    val v1 = kdf((1L, "a", "xx"), (2L, "a", "yyyy"), (3L, "b", "zzz"))
    val v2 = kdf((1L, "b", "xx"), (2L, "c", "yyyyyy"), (3L, "b", "zzz"))
    val incr = IncrementalOps.incrementalAggRefresh(v1, v2, "source")
      .as[(String, Long, Long)].collect().toSeq
    assert(incr === recompute(v2).as[(String, Long, Long)].collect().toSeq)
    assert(!incr.exists(_._1 == "a")) // group 'a' emptied by migrations
  }

  test("incrementalAggRefresh: empty delta returns the base aggregate unchanged") {
    val v = kdf((1L, "a", "xx"), (2L, "b", "yy"))
    val incr = IncrementalOps.incrementalAggRefresh(v, v, "source")
      .as[(String, Long, Long)].collect().toSeq
    assert(incr === recompute(v).as[(String, Long, Long)].collect().toSeq)
  }

  test("q93 on testdata: incremental refresh equals v2 recompute per source") {
    val v1 = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    val v2 = IncrementalOps.deriveV2(v1)
    val incr = IncrementalOps.q93IncrAggRefresh(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    assert(incr === recompute(v2).as[(String, Long, Long)].collect().toSeq)
  }

  test("q91 manifest on testdata: statuses partition the edit script") {
    val out = IncrementalOps.q91SnapshotDiff(spark, sf0001)
    val byStatus = out.groupBy("status").count()
      .as[(String, Long)].collect().toMap
    // edit script over doc_id 0..499: removed = %13 (39 ids), added =
    // %17 re-keyed (30 ids), changed = %10 minus the %13 overlap
    assert(byStatus("removed") === 39)
    assert(byStatus("added") === 30)
    assert(byStatus("changed") === 46)
    // re-keyed ids land beyond the v1 id space
    assert(out.where(col("status") === "added" && col("doc_id") < 1000000L)
      .count() === 0)
  }

  test("scd2Delta: constructed transition writes exactly the merge rows") {
    val v1 = Seq((1L, "keep"), (2L, "old"), (3L, "gone")).toDF("doc_id", "text")
    val v2 = Seq((1L, "keep"), (2L, "new"), (4L, "born")).toDF("doc_id", "text")
    val got = IncrementalOps.scd2Delta(v1, v2).collect()
      .map(r => (r.getLong(0), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getInt(4), r.getString(5)))
    // unchanged key 1 absent; changed 2 -> close+open; removed 3 ->
    // close; added 4 -> open
    assert(got.toSeq === Seq(
      (2L, 1, 2, 0, "close"), (2L, 2, -1, 1, "open"),
      (3L, 1, 2, 0, "close"),
      (4L, 2, -1, 1, "open")))
  }

  test("q111 on testdata: row counts tie to the q91 manifest") {
    val diff = IncrementalOps.q91SnapshotDiff(spark, sf0001)
      .groupBy("status").count().as[(String, Long)].collect().toMap
    val scd = IncrementalOps.q111Scd2(spark, sf0001)
    val byAction = scd.groupBy("action").count()
      .as[(String, Long)].collect().toMap
    assert(byAction("close") === diff("removed") + diff("changed"))
    assert(byAction("open") === diff("added") + diff("changed"))
    // open rows are current with null valid_to; close rows the inverse
    assert(scd.where(col("action") === "open" &&
      (col("valid_to").isNotNull || col("is_current") =!= 1)).count() === 0)
    assert(scd.where(col("action") === "close" &&
      (col("valid_to").isNull || col("is_current") =!= 0)).count() === 0)
  }
}

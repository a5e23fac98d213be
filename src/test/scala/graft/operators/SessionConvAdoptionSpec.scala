package graft.operators

import graft.SparkSpecBase

/** Round-8 batch O: in-session conversion (q201) and item-adoption age
  * profile (q202).
  */
class SessionConvAdoptionSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("sessionConversion: strict after-click rule inside one session") {
    // u1 s1: click@0, purchase@5           -> converted
    // u1 s2 (gap > 30m): purchase@100      -> no click, not counted
    // u2 s1: purchase@0, click@5           -> click but purchase BEFORE it
    // u3 s1: view only                     -> no click
    val ev = Seq(
      (1L, ts(0), "click"), (1L, ts(5), "purchase"),
      (1L, ts(100), "purchase"),
      (2L, ts(0), "purchase"), (2L, ts(5), "click"),
      (3L, ts(0), "view"))
      .toDF("user_id", "ts", "event_type")
    val r = EventOps.sessionConversionOn(ev).collect().head
    assert(r.getLong(0) === 4L) // u1 has two sessions
    assert(r.getLong(1) === 2L) // u1 s1 and u2 s1 contain clicks
    assert(r.getLong(2) === 1L) // only u1 s1 converted
    assert(r.getDouble(3) === 0.5)
  }

  test("itemAdoption: ages measured from each item's first week") {
    def ev(week: Int, item: Int, n: Int) = (1 to n).map(i =>
      (ts(week * 7L * 24 * 60 + i), s"""{"k": $item}"""))
    // item 1 first seen week 0 (3 events), again week 2 (2 events);
    // item 2 first seen week 2 (1 event)
    val df = (ev(0, 1, 3) ++ ev(2, 1, 2) ++ ev(2, 2, 1))
      .toDF("ts", "props").withColumn("user_id",
        org.apache.spark.sql.functions.lit(1L))
    val got = EventOps.itemAdoptionOn(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0, 4L, 2L), (2, 2L, 1L)))
  }
}

package graft.operators

import graft.SparkSpecBase

/** Arm semantics of the batch MERGE (q306 / Sinks.mergeInto twin):
  * every (matched?, op) cell of the decision table on one fixture.
  */
class MergeChangesetSpec extends SparkSpecBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "one", 10L), (2L, "two", 20L), (3L, "three", 30L),
    (4L, "four", 40L)).toDF("id", "name", "n")

  private def changes = Seq(
    (2L, "D", null.asInstanceOf[String], 0L),  // matched D  -> delete
    (3L, "U", "THREE", 33L),                   // matched U  -> update
    (4L, "I", "FOUR?", 44L),                   // matched I  -> no-op
    (5L, "D", null.asInstanceOf[String], 0L),  // unmatched D -> no-op
    (6L, "U", "six", 60L),                     // unmatched U -> insert
    (7L, "I", "seven", 70L)                    // unmatched I -> insert
  ).toDF("id", "op", "name", "n")

  test("all six decision-table cells") {
    val got = IncrementalOps.mergeChangeset(target, changes, Seq("id"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "one", 10L),     // untouched
      (3L, "THREE", 33L),   // updated
      (4L, "four", 40L),    // matched-I kept target payload
      (6L, "six", 60L),     // upserted
      (7L, "seven", 70L)))  // inserted; 2 deleted, 5 was a no-op
  }

  test("re-applying the same changeset is a fixpoint") {
    val once = IncrementalOps.mergeChangeset(target, changes, Seq("id"))
    val twice = IncrementalOps.mergeChangeset(once, changes, Seq("id"))
    assert(twice.as[(Long, String, Long)].collect().toSet ===
      once.as[(Long, String, Long)].collect().toSet)
  }

  test("composite keys and column-order independence") {
    val t = Seq((1L, "a", 5L), (1L, "b", 6L)).toDF("k1", "k2", "v")
    val c = Seq(("b", 1L, "U", 66L)).toDF("k2", "k1", "op", "v")
    val got = IncrementalOps.mergeChangeset(t, c, Seq("k1", "k2"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "a", 5L), (1L, "b", 66L)))
  }

  test("missing op/payload columns are a build error, not a silent arm") {
    intercept[IllegalArgumentException] {
      IncrementalOps.mergeChangeset(target,
        Seq((1L, "x")).toDF("id", "name"), Seq("id"))
    }
  }
}

package graft.streaming

import graft.SparkSpecBase

/** Stream ≡ batch gate for the live XOR table fingerprint: group-for-group
  * EQUALITY — XOR folds are order- and partition-independent, so
  * microbatch boundaries must not move a single bit.
  */
class FingerprintStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming fingerprint equals the batch q118 checksum per group") {
    val streamed = EventsStream.runToMemoryTable(spark,
      FingerprintStream.fingerprintStream(spark, sf0001),
      "fp_stream_test", "complete")
      .as[(String, Long, Long)].collect().toMap2
    val batch = graft.operators.IncrementalOps
      .tableFingerprint(spark, sf0001)
      .as[(String, Long, Long)].collect().toMap2
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    assert(streamed.values.exists(_._2 != 0L)) // fingerprints non-trivial
  }

  private implicit class Tuples3(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}

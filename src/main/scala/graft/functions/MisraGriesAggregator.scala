package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch buffer: at most `capacity` counters
  * plus the processed-element count (the bound's N).
  */
case class MGBuf(counters: Map[String, Long], processed: Long)

/** Typed Misra-Gries frequency sketch — the bounded-memory, mergeable
  * answer to "top tokens over 100 TB" where an exact groupBy would
  * shuffle every distinct token: each partial aggregation carries at most
  * `capacity` counters regardless of stream size, and merging is the
  * summed-then-trimmed combine of the mergeable-summaries literature
  * (Agarwal et al., TODS 2013), which preserves the deterministic MG
  * error envelope under ANY merge order:
  *
  *   true(x) − N/(capacity+1)  ≤  est(x)  ≤  true(x)
  *
  * and every x with true(x) > N/(capacity+1) is guaranteed present.
  * Individual ESTIMATES depend on partition/merge order (only the
  * envelope is deterministic), so library callers ([[graft.operators
  * .TextAnalysisOps.heavyHitters]]) emit exact re-counts of the sketch's
  * candidate set, never raw estimates — the q72-bloom contract:
  * approximate machinery, exact hashable output, structural guarantees
  * proven in specs.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, MGBuf, MGBuf] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    val c = b.counters
    val next =
      if (c.contains(tok)) c.updated(tok, c(tok) + 1L)
      else if (c.size < capacity) c.updated(tok, 1L)
      // full and unseen: the MG step — decrement every counter, drop zeros
      // (the arriving token's single count cancels against the decrement)
      else c.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    MGBuf(next, b.processed + 1L)
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator
      .map(k => k -> (a.counters.getOrElse(k, 0L) + b.counters.getOrElse(k, 0L)))
      .toMap
    val next =
      if (sum.size <= capacity) sum
      else {
        // subtract the (capacity+1)-th largest count from everything and
        // drop non-positives — at most `capacity` survive, and the
        // subtraction is exactly the decrement mass the error bound
        // accounts for
        val thr = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.collect { case (k, v) if v > thr => k -> (v - thr) }
      }
    MGBuf(next, a.processed + b.processed)
  }

  /** The whole buffer is the result: `processed` IS the bound's N, and
    * returning it spares callers a separate full-stream count pass just
    * to evaluate the error envelope.
    */
  override def finish(r: MGBuf): MGBuf = r

  override def bufferEncoder: Encoder[MGBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[MGBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

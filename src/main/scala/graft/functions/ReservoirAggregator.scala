package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One row of the q326 priority reservoir: the deterministic md5
  * priority, the row id, and its cent payload.
  */
case class PriEvent(pri: String, event_id: Long, v_c: Long)

/** Bounded min-k-by-priority accumulator — the aggregator form of the
  * q326 reservoir sampler. The buffer is the k smallest `(pri,
  * event_id)` pairs seen; `reduce`/`merge` both re-sort-and-take, so
  * the operator is a commutative, associative, idempotent-on-union
  * monoid: ANY partitioning, merge order, or micro-batch placement
  * yields the SAME final sample (the law q326 demonstrates
  * relationally; [[graft.streaming.ReservoirStream]] rides it to make
  * stream ≡ batch EXACT, the CMS argument from SketchStream applied to
  * sampling). Fixed memory: k rows per partial buffer.
  */
class ReservoirAggregator(k: Int)
    extends Aggregator[PriEvent, List[PriEvent], Seq[PriEvent]] {

  private val ord: Ordering[PriEvent] =
    Ordering.by[PriEvent, (String, Long)](e => (e.pri, e.event_id))

  override def zero: List[PriEvent] = Nil

  override def reduce(buf: List[PriEvent], a: PriEvent): List[PriEvent] =
    ((a :: buf).sorted(ord)).take(k)

  override def merge(b1: List[PriEvent], b2: List[PriEvent]): List[PriEvent] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: List[PriEvent]): Seq[PriEvent] = r.sorted(ord)

  override def bufferEncoder: Encoder[List[PriEvent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[PriEvent]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

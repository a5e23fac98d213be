package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-by-score accumulator (SURVEY.md §7.3): keeps the k best
  * (score desc, id asc) pairs in a bounded buffer, merging map-side —
  * the partial-aggregation-friendly alternative to a window sort for
  * per-group top-k at scale (no per-group full sort, fixed memory).
  */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by[ScoredId, (Double, Long)](s => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
    ((a :: buf).sorted(ord)).take(k)

  override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: List[ScoredId]): Seq[ScoredId] = r.sorted(ord)

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

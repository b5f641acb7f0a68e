package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (SURVEY §2.8 "aggregations →
  * Aggregator[IN,BUF,OUT]"; §7.3 optional bounded-heap top-k).
  *
  * The window formulation of per-group top-k (`row_number().over(...)`)
  * sorts every partition in full; this aggregator keeps only k elements per
  * group in the partial buffers, so the shuffle carries O(groups·k) instead
  * of O(rows) — the shape that wins when groups are huge (e.g. the CDC
  * last-k-images compaction over 100 TB of change history).
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `ORDER BY score DESC, id` window ordering, so results are deterministic
  * and oracle-comparable.
  */
final case class ScoredId(score: Double, id: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def ord(s: ScoredId): (Double, Long) = (-s.score, s.id)

  override def zero: Seq[ScoredId] = Nil

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    // buffers stay tiny (≤ k); insertion via resort is O(k log k) and keeps
    // the code obviously-correct — swap for a bounded heap if k grows
    ((a +: buf).sortBy(ord) take k)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    ((b1 ++ b2).sortBy(ord) take k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

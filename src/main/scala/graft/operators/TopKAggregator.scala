package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (id, score) pair flowing into a top-k aggregation. */
final case class ScoredId(id: Long, score: Double)

/** Bounded top-k buffer (kept ordered: score desc, id asc). */
final case class TopKBuf(items: Seq[ScoredId])

/** Exact distributed top-k as a typed `Aggregator` (SURVEY.md §2.11 X3's
  * optional custom piece): each partition folds its rows into a bounded
  * k-element buffer, partial buffers merge associatively, and only O(k)
  * rows per (group × partition) ever cross the shuffle.
  *
  * Contrast with the `row_number()` window top-k ([[Similarity.bruteTopK]]):
  * the window must materialize and sort EVERY candidate row of a group on
  * one partition; this aggregator's shuffle volume is k·partitions rows per
  * group regardless of candidate count — the difference between O(N log N)
  * on a hot partition and O(N) map-side work at 100 TB.
  *
  * Ordering: score desc, id asc (deterministic tie-break, matching the
  * harness oracle's `ORDER BY score DESC, id`).
  */
final class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {
  require(k > 0)

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf =
    TopKBuf(TopKAggregator.mergeOne(b.items, a, k, better))

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(b2.items.foldLeft(b1.items)((acc, a) => TopKAggregator.mergeOne(acc, a, k, better)))

  override def finish(r: TopKBuf): Seq[ScoredId] = r.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  private def mergeOne(
      items: Seq[ScoredId], a: ScoredId, k: Int,
      better: (ScoredId, ScoredId) => Boolean): Seq[ScoredId] =
    // at capacity, only a STRICTLY better element displaces the floor — a
    // duplicate of the floor must not grow the buffer to k+1
    if (items.size >= k && !better(a, items.last)) items
    else {
      val idx = items.indexWhere(x => better(a, x)) match {
        case -1 => items.size
        case i  => i
      }
      ((items.take(idx) :+ a) ++ items.drop(idx)).take(k)
    }
}

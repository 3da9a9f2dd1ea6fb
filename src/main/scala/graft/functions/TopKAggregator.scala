package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k `Aggregator` (SURVEY.md §2.8 U6 — the UDAF surface
  * the reference never used but the rebuild exposes).
  *
  * Scale rationale vs `orderBy.limit`-per-group or window `row_number`:
  * the buffer is capped at k rows, so the partial (map-side) aggregation
  * discards everything below each partition's running top-k BEFORE the
  * shuffle — the exchange carries ≤ k rows per (partition × group)
  * instead of every row, and no per-group full sort ever happens.
  *
  * Ordering: `score` descending, then the `tie` tuple ascending — total
  * and deterministic.
  */
object TopKAggregator {

  /** One ranked element: score + identifying payload. */
  case class Entry(score: Double, tie1: Long, tie2: Long)

  private val ord: Ordering[Entry] =
    Ordering.by((e: Entry) => (-e.score, e.tie1, e.tie2))

  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    override def zero: Seq[Entry] = Vector.empty

    override def reduce(buf: Seq[Entry], a: Entry): Seq[Entry] =
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
      else buf

    override def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
      (x ++ y).sorted(ord).take(k)

    override def finish(r: Seq[Entry]): Seq[Entry] = r

    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }
}

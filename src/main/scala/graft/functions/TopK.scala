package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a typed [[Aggregator]] (SURVEY.md §2.9): every
  * partition keeps a k-bounded sorted buffer, so only O(k·groups)
  * rows cross the shuffle — the partial-combine alternative to a
  * per-group window sort. At 100 TB the shuffle carries k rows per
  * (partition, group) instead of the whole fact table; the final
  * merge is a k-way bounded merge per group.
  *
  * Spark's own `WindowGroupLimit` rewrite gets close for
  * `row_number() <= k` filters (see q23), but an Aggregator bounds
  * the buffer earlier (inside the hash-aggregate map side) and
  * exposes top-k as a composable aggregate function. */
object TopKAgg {

  /** (score, id) pair; id breaks ties so results are deterministic. */
  case class Entry(score: Double, id: Long)

  /** Buffer kept sorted descending by (score, -id); insert is O(k). */
  class TopK(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def lt(a: Entry, b: Entry): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def insert(b: Seq[Entry], e: Entry): Seq[Entry] = {
      if (b.size >= k && lt(b.last, e)) return b
      val (before, after) = b.span(x => lt(x, e))
      (before :+ e) ++ after.take(k - before.size - 1)
    }
    def zero: Seq[Entry] = Vector.empty
    def reduce(b: Seq[Entry], a: Entry): Seq[Entry] = insert(b, a)
    def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] =
      b2.foldLeft(b1)(insert)
    def finish(r: Seq[Entry]): Seq[Entry] = r
    def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  def inputEncoder: Encoder[Entry] = Encoders.product[Entry]
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count + df-capped sorted id list in ONE aggregate (SURVEY.md §2.9
  * family; the [[TopKAgg]] bounded-buffer idea applied to dedup
  * grouping): every partition keeps at most `cap` smallest ids plus
  * an exact total count, so a group's aggregation buffer is bounded
  * by `cap` BY CONSTRUCTION — a gram that appears in 10⁶ documents
  * buffers `cap` longs, not 10⁶ (the ObjectHashAggregate
  * collect_list-then-filter shape buffers the full list before any
  * size filter can run, which is memory-bounded only by data luck at
  * 100 TB).
  *
  * Contract used by [[graft.operators.Dedup.dedupSubstring]]: when
  * `n <= cap` the capped list holds ALL the group's ids (sorted
  * ascending); when `n > cap` the caller discards the group anyway
  * (document-frequency cap), so the truncated list is never read.
  * One shuffle, partial-combining, deterministic. */
object BoundedCollect {

  /** Exact group count + the `cap` smallest ids, sorted ascending. */
  case class CountAndIds(n: Long, ids: Seq[Long])

  class MinIds(cap: Int) extends Aggregator[Long, CountAndIds, CountAndIds] {
    private def insert(b: CountAndIds, id: Long): CountAndIds = {
      val kept =
        if (b.ids.size < cap) {
          val (lo, hi) = b.ids.span(_ < id)
          (lo :+ id) ++ hi
        } else if (id >= b.ids.last) b.ids
        else {
          val (lo, hi) = b.ids.span(_ < id)
          ((lo :+ id) ++ hi).take(cap)
        }
      CountAndIds(b.n + 1, kept)
    }
    def zero: CountAndIds = CountAndIds(0L, Vector.empty)
    def reduce(b: CountAndIds, id: Long): CountAndIds = insert(b, id)
    def merge(b1: CountAndIds, b2: CountAndIds): CountAndIds = {
      val merged = b2.ids.foldLeft(CountAndIds(0L, b1.ids))(insert).ids
      CountAndIds(b1.n + b2.n, merged)
    }
    def finish(r: CountAndIds): CountAndIds = r
    def bufferEncoder: Encoder[CountAndIds] = ExpressionEncoder()
    def outputEncoder: Encoder[CountAndIds] = ExpressionEncoder()
  }

  def inputEncoder: Encoder[Long] = Encoders.scalaLong
}

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
  * Contract: when `n <= cap` the capped list holds ALL the group's
  * ids (sorted ascending); when `n > cap` a df-capped caller
  * discards the group anyway, so the truncated list is never read.
  * One shuffle, partial-combining, deterministic. LIBRARY STATUS:
  * [[graft.operators.Dedup.dedupSubstring]] used this through round
  * 12 but now takes a count→filter→self-join form (as a Scala
  * `Aggregator` this runs on ObjectHashAggregate, whose 128-key
  * sort-based fallback made the aggregation allocation-heavy at
  * millions of tiny groups — fine on a quiet host, 8× under memory
  * pressure). It remains the right tool when the BOUNDED ID LIST
  * itself must survive aggregation in one pass over few/fat groups —
  * the regime object aggregation was built for (HLL-style buffers),
  * not the many-tiny-groups regime dedup grouping turned out to be.
  * Property-spec'd against (count, sorted.take(cap)).
  *
  * The buffer is a MUTATED primitive array (the Aggregator contract
  * explicitly permits `reduce`/`merge` to modify and return their
  * buffer): the first, immutable-Vector formulation paid a span +
  * two-concat allocation per input row and measured +23% on the
  * sf0.1 bench line; binary search + `System.arraycopy` over a
  * pre-sized Array[Long] keeps the per-row cost at the memmove the
  * semantics actually require. */
object BoundedCollect {

  /** Exact group count + the `cap` smallest ids, sorted ascending. */
  case class CountAndIds(n: Long, ids: Seq[Long])

  /** Mutable accumulation buffer: the sorted live prefix is
    * [0, size) of `ids`, which grows geometrically up to `cap` (most
    * groups hold 1–2 ids, so shuffled partial buffers stay a few
    * longs wide instead of paying `cap` slots each). Fields are
    * vars/arrays so partial aggregation mutates in place; the
    * encoder reads them only at spill/shuffle boundaries. */
  case class Buf(var n: Long, var size: Int, var ids: Array[Long])

  class MinIds(cap: Int) extends Aggregator[Long, Buf, CountAndIds] {
    require(cap >= 1, s"cap must be >= 1, got $cap")

    /** Insert `id` into the sorted prefix, keeping at most `cap`
      * smallest; does not touch `n`. */
    private def insert(b: Buf, id: Long): Unit = {
      if (b.size >= cap && id >= b.ids(b.size - 1)) return
      if (b.size < cap && b.size == b.ids.length) {
        val grown = new Array[Long](math.min(cap, math.max(4, b.ids.length * 2)))
        System.arraycopy(b.ids, 0, grown, 0, b.size)
        b.ids = grown
      }
      var lo = 0
      var hi = b.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b.ids(mid) < id) lo = mid + 1 else hi = mid
      }
      if (b.size < cap) {
        System.arraycopy(b.ids, lo, b.ids, lo + 1, b.size - lo)
        b.ids(lo) = id
        b.size += 1
      } else {
        // full and id < current max (early return above): drop the max
        System.arraycopy(b.ids, lo, b.ids, lo + 1, cap - 1 - lo)
        b.ids(lo) = id
      }
    }

    def zero: Buf = Buf(0L, 0, Array.emptyLongArray)
    def reduce(b: Buf, id: Long): Buf = {
      b.n += 1
      insert(b, id)
      b
    }
    def merge(b1: Buf, b2: Buf): Buf = {
      b1.n += b2.n
      var i = 0
      while (i < b2.size) {
        insert(b1, b2.ids(i))
        i += 1
      }
      b1
    }
    def finish(b: Buf): CountAndIds =
      CountAndIds(b.n, b.ids.take(b.size).toSeq)
    def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
    def outputEncoder: Encoder[CountAndIds] = ExpressionEncoder()
  }

  def inputEncoder: Encoder[Long] = Encoders.scalaLong
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracks DataFrames persisted during operator plan construction so
  * the harness mains (Bench/Verify) can release them after each query
  * materializes. Operators persist subtrees that feed multiple
  * branches of one plan; without a release point, repeated
  * invocations stack CacheManager entries ("Asked to cache already
  * cached data" WARN spam) and hold executor memory across queries.
  */
object CacheRegistry {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** When true, [[cache]] is a no-op passthrough — the bench's
    * cache-cold mode (SPARK_GRAFT_BENCH_CACHE=cold): every operator
    * runs its pure recompute plan, so per-query timings and shuffle
    * bytes carry NO tracked-cache state and are hermetic w.r.t.
    * execution order and memory pressure. Warm (default) measures the
    * steady state a resident pipeline would see; cold is the
    * arbitration baseline when a drift flag's shuffle bytes moved at
    * identical code (round-15's recurring flag class). */
  @volatile var disabled: Boolean = false

  /** Persist (memory-and-disk) and remember for the next releaseAll. */
  def cache(df: DataFrame): DataFrame = synchronized {
    if (disabled) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      tracked += p
      p
    }
  }

  /** Number of frames currently tracked (bench cache-state probe). */
  def trackedCount: Int = synchronized { tracked.size }

  /** High-water mark for [[releaseSince]] — a resident loop (e.g. the
    * streaming span-cut ingest) brackets each micro-batch with
    * mark()/releaseSince() so the frames IT tracked are dropped per
    * batch without touching caches owned by a co-resident operator
    * (releaseAll would). */
  def mark(): Int = synchronized { tracked.size }

  /** Unpersist and forget every frame tracked after the given mark.
    * The registry holds strong references, so a long-running loop
    * that never releases accumulates MEMORY_AND_DISK blocks without
    * bound — this is the per-batch release point. */
  def releaseSince(mark: Int, blocking: Boolean = false): Unit = synchronized {
    val m = math.max(0, math.min(mark, tracked.size))
    tracked.view.slice(m, tracked.size)
      .foreach(df => try df.unpersist(blocking) catch { case _: Throwable => () })
    tracked.remove(m, tracked.size - m)
  }

  /** Unpersist everything cached since the last release. Double
    * unpersist (e.g. frames an iterative loop already dropped) is a
    * harmless no-op. Bench passes blocking=true so an async block drop
    * can never overlap — and get charged to — the next query's timed
    * run. */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(df => try df.unpersist(blocking) catch { case _: Throwable => () })
    tracked.clear()
  }

  /** `df.cacheTracked` — persist + register in one postfix call. */
  implicit class Cacheable(private val df: DataFrame) extends AnyVal {
    def cacheTracked: DataFrame = CacheRegistry.cache(df)
  }
}

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

  /** Persist (memory-and-disk) and remember for the next releaseAll. */
  def cache(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
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

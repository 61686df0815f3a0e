package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe full-table rewrite for the tiny compliance tables
  * (tombstone / suppression lists) — the write-ahead staging + commit
  * marker protocol that closes the one window in the mutation surface
  * where re-running did NOT repair a crash.
  *
  * The old reinstate path was `localCheckpoint(keep); TRUNCATE t;
  * append keep` — localCheckpoint storage dies with the session, so a
  * crash between the TRUNCATE and the append permanently lost ALL
  * remaining tombstone/suppression rows (not just the reinstated
  * ids), and re-running was a no-op because the left_semi guard saw
  * an empty table. Every compliance-deleted document would then be
  * silently resurrected by the next redelivered append — the exact
  * failure the suppression list exists to prevent.
  *
  * Protocol (every step durable, every crash window repaired by
  * [[recover]], which every reader and the next rewrite run first):
  *
  *   1. write the replacement rows to `<t>_rstage` (durable parquet —
  *      computed from `t` BEFORE `t` is touched, so no lineage cycle
  *      and no volatile checkpoint);
  *   2. write the empty commit marker `<t>_rcommit` — the staged data
  *      is now known COMPLETE;
  *   3. TRUNCATE `t`; append from the stage table;
  *   4. drop marker, then stage.
  *
  * Crash analysis: mid/after step 1 (stage partial or complete, no
  * marker) → recover drops the stage, `t` untouched, re-run
  * recomputes. After step 2 / mid step 3 (marker present) → the stage
  * is complete by construction, so recover replays TRUNCATE + append
  * — idempotent because TRUNCATE clears any partial append. After the
  * marker drop but before the stage drop → recover sees
  * stage-without-marker and drops it; `t` already holds the result.
  * Recovery itself re-enters the same branches, so a crash DURING
  * recovery is also repaired by the next call.
  *
  * Concurrency contract: SINGLE SESSION per managed table — for
  * READS as well as writes. [[recover]] is invoked from the read
  * accessors (a probe heals an interrupted swap before reading), so
  * any reader may become a writer: two concurrent sessions both
  * observing a pending marker could interleave the TRUNCATE+append
  * replay (one truncating after the other's append), duplicating or
  * losing rows. This matches the warehouse-wide single-session rule
  * the repo already operates under (concurrent fresh-catalog
  * sessions clobber each other's tables regardless of this
  * protocol); a multi-writer deployment needs a catalog-level lock
  * or an atomic-rename table format underneath.
  *
  * Cost: the rewrite double-writes the table (stage + re-append).
  * For the pending-deletions tables that is O(tombstones) — noise.
  * [[Similarity.knnGraphForget]]/[[Similarity.knnGraphAppend]] apply
  * it to the O(n·k) persisted graph artifact, where the double-write
  * IS the durability price and each method's contract says so. */
object StagedRewrite {
  private[graft] def stageTable(t: String): String = s"${t}_rstage"
  private[graft] def markerTable(t: String): String = s"${t}_rcommit"

  /** Heal an interrupted [[rewrite]] on `t`. No-op when no rewrite
    * was in flight (two catalog lookups). Safe to call even when `t`
    * itself does not exist yet (a stale stage is just dropped). */
  def recover(s: SparkSession, t: String): Unit = {
    val st = stageTable(t)
    val mk = markerTable(t)
    if (s.catalog.tableExists(mk)) {
      // marker present ⇒ stage is complete: replay the swap
      s.sql(s"TRUNCATE TABLE $t")
      s.table(st).write.mode("append").insertInto(t)
      s.sql(s"DROP TABLE IF EXISTS $mk")
      s.sql(s"DROP TABLE IF EXISTS $st")
    } else if (s.catalog.tableExists(st)) {
      // crash before the marker ⇒ `t` untouched, the stage is garbage
      s.sql(s"DROP TABLE IF EXISTS $st")
    }
  }

  /** Replace `t`'s contents with `rows` (which may read from `t` —
    * the stage write materializes them before `t` is touched).
    * `afterStage` / `afterTruncate` are test seams for crash
    * injection at the two distinct recovery branches. */
  def rewrite(s: SparkSession, t: String, rows: DataFrame,
              afterStage: () => Unit = () => (),
              afterTruncate: () => Unit = () => ()): Unit = {
    recover(s, t)
    val st = stageTable(t)
    val mk = markerTable(t)
    graft.sources.Sources.clearOrphanedLocation(s, st)
    rows.write.format("parquet").saveAsTable(st)
    afterStage() // test seam: stage durable, marker not yet written
    graft.sources.Sources.clearOrphanedLocation(s, mk)
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("committed",
          org.apache.spark.sql.types.BooleanType))))
      .write.format("parquet").saveAsTable(mk)
    s.sql(s"TRUNCATE TABLE $t")
    afterTruncate() // test seam: THE window that used to lose rows
    s.table(st).write.mode("append").insertInto(t)
    s.sql(s"DROP TABLE IF EXISTS $mk")
    s.sql(s"DROP TABLE IF EXISTS $st")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame

/** The lineage cut every iterative operator places at the end of a
  * round (NN-Descent, label propagation, Luby MIS, the
  * connected-components star loop): eager materialization that
  * TRUNCATES THE LOGICAL PLAN, because the lazy chain grows ~6× per
  * round and ANALYSIS time — not execution — comes to dominate
  * (measured at sf0.1: 36 s lazy vs 4.4 s flat; see
  * [[Similarity.simKnnGraph]]).
  *
  * TWO DURABILITY TIERS, selected by the session conf
  * `graft.reliableCheckpointDir`:
  *
  *   - unset (default): `localCheckpoint()` — blocks live on
  *     executors. Fastest, and correct on `local[n]` where executor
  *     loss means JVM loss. But on a REAL cluster losing one executor
  *     mid-loop fails the job unrecoverably: the lineage is severed
  *     and the blocks are gone, so nothing can be recomputed. Fine
  *     for short transient loops; an expected-event risk for a
  *     multi-hour descent over thousands of executors.
  *   - set to a durable path (HDFS/object store): reliable
  *     `checkpoint()` — blocks are written to the shared filesystem,
  *     so executor loss is a retry, not a job failure. The fixed
  *     per-round write cost is exactly what an ARTIFACT BUILD (the
  *     persisted k-NN graph, a components run feeding a dedup pass)
  *     can afford, and what a 100 TB deployment should set.
  *
  * Both forms are eager and both truncate lineage, so operator
  * OUTPUT is identical either way (spec-asserted end-to-end on the
  * descent); only the failure-recovery story differs. The checkpoint
  * dir is set lazily from the conf on first use and re-set when the
  * conf changes; files accumulate per run (Spark cleans them only on
  * context stop with `spark.cleaner.referenceTracking.cleanCheckpoints`)
  * — production points this at a TTL'd scratch prefix. */
object Lineage {
  /** Session-conf key: when set (non-empty), iterative loops cut
    * lineage with reliable `checkpoint()` into this directory
    * instead of executor-local `localCheckpoint()`. */
  val ReliableDirKey = "graft.reliableCheckpointDir"

  /** The (context, dir) most recently passed to `setCheckpointDir`.
    * Spark stores the fully-qualified `<dir>/<UUID>` path internally,
    * so comparing `getCheckpointDir` against the CONFIGURED dir never
    * matches — re-setting on every cut would mint a fresh UUID
    * subdirectory per lineage cut (directory proliferation plus an FS
    * round-trip per round on object stores). Track what we set
    * ourselves instead, KEYED ON THE CONTEXT: a restarted
    * SparkContext comes up with no checkpoint dir, so a dir-only
    * cache would skip the re-set and the next `checkpoint()` would
    * throw. The `getCheckpointDir.isEmpty` guard also heals the
    * exotic case of external code clearing/replacing the context's
    * setting between cuts. Held via WeakReference so the cache never
    * pins a STOPPED context (and its driver-side state) against GC in
    * a long-lived JVM that restarts contexts — a cleared reference
    * just means the next cut re-sets the dir, which is the safe
    * branch anyway. */
  @volatile private var lastSet: (java.lang.ref.WeakReference[org.apache.spark.SparkContext], String) = null

  /** `eager = false` keeps the checkpoint lazy (the connected-
    * components loop materializes through its own fingerprint probe
    * immediately after, so an eager job there would run twice). */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ReliableDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        val cached = lastSet
        val cachedSc = if (cached == null) null else cached._1.get()
        if (sc.getCheckpointDir.isEmpty ||
            cachedSc == null || !(cachedSc eq sc) || cached._2 != dir) {
          sc.setCheckpointDir(dir)
          lastSet = (new java.lang.ref.WeakReference(sc), dir)
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}

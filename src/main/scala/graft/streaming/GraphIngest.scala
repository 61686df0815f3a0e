package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the persisted k-NN graph artifact — the
  * daily-ingest loop for the similarity side, composing the pieces
  * the library already proves individually the way
  * [[StreamingIngest.dedupedIngest]] does for the text corpus: each
  * micro-batch of (vec_id, embedding) arrivals is appended into the
  * persisted VECTOR CORPUS table, then
  * [[Similarity.knnGraphAppend]] brings the graph artifact up to
  * date with the grown corpus. Every consumer of the graph
  * (components / label-prop / MIS / the recall dashboard) sees the
  * new vectors from the next read on — no full O(n·(2k)²) rebuild,
  * descent work bounded by the batch frontier.
  *
  * Exactly-once needs NO manifest here, unlike the deduped text
  * ingest: that loop's accepted set is a FUNCTION OF the state the
  * batch mutates (replay against mutated state computes a different
  * — empty — answer), so the committed sink partition must be
  * replayed as a manifest. This loop's two effects are each
  * IDEMPOTENT BY KEY in themselves: the corpus append anti-joins on
  * vec_id (a redelivered batch inserts nothing), and
  * `knnGraphAppend`'s new-id frontier is DERIVED as corpus ∖
  * graph-vertices (an integrated batch is the identity — the spec'd
  * contract). Every crash window follows: before the corpus append →
  * clean recompute; between append and graph update → replay no-ops
  * the corpus insert and integrates the frontier the first pass left
  * behind; inside the graph swap → [[graft.operators.StagedRewrite]]
  * heals on the next call's recover; after all effects but before
  * the commit log → the full replay is a no-op end to end.
  *
  * Within-batch duplicate vec_ids collapse DETERMINISTICALLY
  * (min embedding per id, array ordering) — a nondeterministic pick
  * would let a crash-replay integrate a different vector than the
  * first pass already published into the graph.
  *
  * Compliance composes natively: a
  * [[Similarity.knnGraphForget]]`(suppress = true)` records the ids
  * on the graph's `<table>_sup` suppression list, and the
  * `knnGraphAppend` inside this loop anti-joins that list — and the
  * CORPUS APPEND anti-joins it too, so a forgotten vector REDELIVERED
  * by an at-least-once upstream stays out of BOTH persisted artifacts
  * (re-inserting the embedding into the corpus would re-persist the
  * very data the compliance deletion removed) until an explicit
  * [[Similarity.knnGraphReinstate]]. The default
  * (physical-only forget) keeps "append equals rebuild", exactly as
  * the IVF side documents.
  *
  * At 100 TB: per batch this costs one vec_id anti-join against the
  * corpus (broadcast of the batch keys), one O(batch) corpus append,
  * and a descent whose per-round work is bounded by |batch|·k lists
  * — plus the graph swap's O(graph) double-write, the stated
  * StagedRewrite durability price. Nothing global, no growing
  * streaming state — the corpus + graph tables ARE the state.
  */
object GraphIngest {

  /** @param corpusTable persisted (vec_id, embedding) table the graph
    *   tracks; must exist (the base build creates it — this loop
    *   maintains an existing artifact, it does not cold-start one).
    * @param graphTable the persisted k-NN graph over `corpusTable`'s
    *   current rows ([[Similarity.knnGraphAppend]]'s contract).
    * @param seedTable optional [[Similarity.lshSeedTable]]-named
    *   seed-bucket artifact to keep fresh alongside corpus + graph —
    *   [[Similarity.lshSeedAppend]] per batch, which is
    *   rebuild-identical by construction (stateless buckets) and
    *   idempotent by key, so it adds no new crash window: a replay
    *   re-derives the same rows and the anti-join drops them. Append
    *   pins the table's plane count while the corpus grows — run
    *   [[Similarity.seedArtifactHealthRow]] on a rollout cadence
    *   (`stale` fires at >1 plane drift, BEFORE the measured
    *   0.289-recall occupancy cliff) and rebuild when it flags.
    *   The graph itself has the matching dashboard pair:
    *   [[Similarity.graphArtifactHealthRow]] (member/vertex coverage —
    *   an ingest loop that appends the corpus but crashes before the
    *   graph swap shows up as `n_missing` > 0) and, for per-segment
    *   graphs, [[Similarity.segmentServeRecallRow]].
    * @param afterBatch test seam fired after BOTH effects but before
    *   the commit log records the batch — throwing here simulates the
    *   worst crash window (all effects applied, nothing committed). */
  def knnGraphIngest(vecBatches: DataFrame, corpusTable: String,
                     graphTable: String, checkpoint: String,
                     k: Int = 10, maxIters: Int = 30, delta: Double = 0.001,
                     seedTable: Option[String] = None,
                     afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    vecBatches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        // per-batch cache scope: knnGraphAppend cacheTracks the grown
        // corpus frame inside each batch — a resident loop that never
        // releases accumulates one corpus-sized MEMORY_AND_DISK frame
        // PER BATCH (the SpanIngest lesson, identity snapshot so
        // frames tracked before the batch stay untouched)
        val cacheMark = graft.CacheRegistry.snapshot()
        try {
          // deterministic within-batch collapse, then idempotent append
          // via [[graft.operators.Dedup.probeCorpusKeys]] (map-only
          // corpus scan probed by the broadcast batch key set; the hot
          // set, ≤ batch size, broadcasts into the anti-join — one
          // shared helper, not a re-implementation, so the probe-shape
          // discipline BucketingSpec asserts covers this site too)
          val arrivals = batch.select(col("vec_id"), col("embedding"))
            .groupBy("vec_id").agg(min("embedding").as("embedding"))
          val hot = graft.operators.Dedup.probeCorpusKeys(s, corpusTable,
            arrivals.select("vec_id"), Seq("vec_id"))
          val fresh = arrivals.join(broadcast(hot), Seq("vec_id"), "left_anti")
          // Suppression covers BOTH persisted artifacts the loop
          // maintains: without this anti-join, a forgotten
          // (suppress = true) vector redelivered after corpus-side
          // deletion would be re-INSERTED into the corpus table —
          // re-persisting the embedding even though knnGraphAppend
          // keeps it out of the graph. O(tombstones) broadcast.
          // knnGraphAppend recovers this table again later in the batch;
          // the duplicate is deliberate — THIS read happens first, and a
          // crash mid-reinstate must never present a half-swapped
          // suppression list to the corpus admit decision. One metadata
          // probe per micro-batch is noise next to the descent.
          val supT = s"${graphTable}_sup"
          val admitted =
            if (s.catalog.tableExists(supT)) {
              graft.operators.StagedRewrite.recover(s, supT)
              // deletion requests arrive from another session — drop
              // this session's cached file listing or a mid-stream
              // forget stays invisible (the StreamingIngest tombstone
              // staleness class)
              s.catalog.refreshTable(supT)
              fresh.join(broadcast(s.table(supT).distinct()), Seq("vec_id"), "left_anti")
            } else fresh
          admitted.write.mode("append").insertInto(corpusTable)
          // bring the graph up to date with the grown corpus — the
          // identity when a replayed batch is already integrated
          Similarity.knnGraphAppend(s, graphTable, s.table(corpusTable),
            k = k, maxIters = maxIters, delta = delta)
          // keep the informed-serving entry points fresh too: stateless
          // buckets make this exactly the rebuild, batch-bounded.
          // Suppressed ids MAY land here (seed rows are inert pointers —
          // a deleted vector is absent from the corpus, so a stale seed
          // drops at the walk's scoring join; see lshSeedTable's
          // compliance note), but since `admitted` is already
          // suppression-filtered, they don't.
          seedTable.foreach(t =>
            Similarity.lshSeedAppend(s, t, s.table(corpusTable)))
        } finally graft.CacheRegistry.releaseSince(cacheMark, blocking = true)
        afterBatch(batchId)
      }
      .start()
}

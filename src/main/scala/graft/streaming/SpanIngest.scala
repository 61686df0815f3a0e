package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** STREAMING span-cut ingest — the Lee et al. 2021 intervention as a
  * resident loop (the [[StreamingIngest]]/[[GraphIngest]] discipline
  * applied to the span family): each arriving micro-batch of
  * documents is cut against the PERSISTED corpus gram index
  * ([[Dedup.spanDedupIncrementalCore]] — one map-only index probe,
  * never a corpus rescan), the cleaned documents land in an
  * exactly-once per-batch file sink with their cut evidence, and the
  * CLEANED text's windows are appended back into the index so every
  * later batch dedups against the corpus as actually retained.
  *
  * Indexing the RETAINED (cleaned) text is the deliberate semantics:
  * the corpus this loop maintains is the cleaned one, so a span that
  * was cut from batch N no longer exists in the corpus and must not
  * suppress batch N+1 on its own (it can still be cut there if it
  * repeats within N+1 or against surviving corpus text). The FIRST
  * batch against a fresh index is therefore bit-identical to the
  * batch operator (`pipe_span_incremental`'s contract); later
  * batches are retained-corpus-relative — spec-asserted both ways.
  *
  * Exactly-once under replay, the [[StreamingIngest]] shape: the
  * batch MUTATES the state it gates on (the index), so after a crash
  * between the index append and the commit-log record, a naive
  * replay would re-cut against an index that now contains the
  * batch's own windows — every within-batch span would self-match
  * and the whole batch would be cut to nothing. The committed sink
  * partition is the batch's durable manifest: on replay (`_SUCCESS`
  * present) the cut is NOT recomputed — the manifest's cleaned rows
  * are re-driven through the doc_id-IDEMPOTENT
  * [[Dedup.spanGramIndexAppend]], which no-ops if the append already
  * ran (and the append itself is one file-commit-protocol-atomic
  * job, so a crashed append committed nothing). Before the sink
  * commit → clean recompute against unmutated state. Genuine
  * upstream redeliveries in LATER batches are anti-joined out
  * against the index's doc_id column (already-ingested documents are
  * not re-cut or re-emitted).
  *
  * At 100 TB: per batch one column-pruned map-only index scan
  * (broadcast-probed by the batch's hash keys), O(batch) cut work ∝
  * duplicated text, one per-batch-directory write, one O(batch)
  * index append. Nothing global; the index IS the state.
  * Compliance: [[Dedup.spanGramIndexForget]] drops a document's
  * window rows crash-safely; this loop's probe recovers a
  * half-swapped index before reading.
  *
  * INVARIANT — outDir and checkpoint live and die TOGETHER: the
  * replay branch trusts a `batch_id=N/_SUCCESS` under outDir as "this
  * run's batch N already committed". A stale partition left from a
  * PREVIOUS run paired with a fresh checkpoint reuses batch ids from
  * 0, so a genuinely new batch N would be routed into the replay
  * branch — its arrivals silently dropped and the old manifest's
  * windows re-driven into the index. Create both directories
  * together, retire both together; never point a fresh checkpoint at
  * a populated outDir (same contract as [[StreamingIngest]]).
  */
object SpanIngest {

  /** @param docBatches streaming DataFrame of (doc_id, text) arrivals.
    * @param indexTable persisted gram index ([[Dedup.spanGramIndexFor]]
    *   naming/schema); must exist — this loop maintains an existing
    *   artifact, it does not cold-start one.
    * @param afterBatch test seam fired after BOTH effects but before
    *   the commit log records the batch — throwing here simulates the
    *   worst crash window (all effects applied, nothing committed). */
  def spanCutIngest(docBatches: DataFrame, indexTable: String,
                    outDir: String, checkpoint: String, n: Int = 50,
                    afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery = {
    // the replay branch keys on job-commit _SUCCESS markers (see
    // StreamingIngest): fail fast on a committer that disables them
    require(docBatches.sparkSession.sparkContext.hadoopConfiguration.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "spanCutIngest requires _SUCCESS job markers " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs=true): " +
        "the crash-replay manifest branch keys on them")
    docBatches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        // per-batch cache scope: spanDedupIncrementalCore tracks its
        // pos/idxHot persists in CacheRegistry; a resident loop must
        // drop THIS batch's frames once its actions complete or
        // MEMORY_AND_DISK blocks accumulate without bound across
        // batches (identity snapshot, not releaseAll — frames tracked
        // before the batch stay untouched)
        val cacheMark = graft.CacheRegistry.snapshot()
        try {
          // compliance forgets (spanGramIndexForget) may run from
          // another session — drop this session's cached file listing
          // so the probe sees them (the StreamingIngest tombstone
          // staleness class); cheap relist, the appends this loop
          // itself issues already invalidate in-session
          if (spark.catalog.tableExists(indexTable))
            spark.catalog.refreshTable(indexTable)
          val partDir = s"$outDir/batch_id=$batchId"
          val hPath = new org.apache.hadoop.fs.Path(partDir, "_SUCCESS")
          val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(hPath)) {
            // sink already committed: the partition IS the accepted set —
            // re-drive the idempotent index append from the retained
            // text instead of re-cutting against mutated state. Explicit
            // schema: an all-redelivered batch commits zero rows and
            // schema inference over an empty partition throws (the
            // StreamingIngest poison-pill lesson).
            // doc_id's type comes from the BATCH (an int-keyed stream
            // writes int32 parquet on the fresh path — a hardcoded
            // Long here would fail the read only in the crash-replay
            // window the manifest exists to heal)
            val manifestSchema = org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                batch.schema("doc_id").dataType),
              org.apache.spark.sql.types.StructField("is_ascii",
                org.apache.spark.sql.types.BooleanType),
              org.apache.spark.sql.types.StructField("lc_stable",
                org.apache.spark.sql.types.BooleanType),
              org.apache.spark.sql.types.StructField("n_spans_cut",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n_chars_cut",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("cut_ranges",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("clean_text",
                org.apache.spark.sql.types.StringType)))
            Dedup.spanGramIndexAppend(spark, indexTable,
              spark.read.schema(manifestSchema).parquet(partDir)
                .select(col("doc_id"), col("clean_text").as("text")), n)
          } else {
            // deterministic within-batch collapse, then drop documents
            // the index already holds (later-batch redeliveries)
            val arrivals = batch.select(col("doc_id"), col("text"))
              .groupBy("doc_id").agg(min("text").as("text"))
            val indexed = Dedup.probeCorpusKeys(spark, indexTable,
              arrivals.select("doc_id"), Seq("doc_id"))
            val fresh = arrivals.join(broadcast(indexed), Seq("doc_id"), "left_anti")
            // lc_stable rides the sink: the production consumer surface
            // must see WHICH docs skipped the intervention (U+0130
            // class), not discover them by absence of cuts
            val cut = Dedup.spanDedupIncrementalCore(spark, indexTable, fresh, n)
              .select(col("doc_id"), col("is_ascii"), col("lc_stable"), col("n_spans_cut"),
                col("n_chars_cut"), col("cut_ranges"), col("clean_text"))
              .cache()
            try {
              cut.write.mode("overwrite").parquet(partDir)
              // index the text as RETAINED — the corpus this loop keeps
              Dedup.spanGramIndexAppend(spark, indexTable,
                cut.select(col("doc_id"), col("clean_text").as("text")), n)
            } finally cut.unpersist()
          }
        } finally graft.CacheRegistry.releaseSince(cacheMark, blocking = true)
        afterBatch(batchId)
      }
      .start()
  }
}

package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** The complete production ingest loop, composed from the pieces the
  * library already proves individually: a document stream is deduped
  * per micro-batch against the PERSISTED corpus signature state
  * (bucketed tables, map-only probe), accepted documents land in an
  * exactly-once file sink, and their signatures are appended back
  * into the corpus state so every later batch — and tomorrow's batch
  * jobs — see them. One `foreachBatch` body IS the daily-ingest
  * pipeline, shrunk to micro-batch grain.
  *
  * Exactly-once under replay needs care beyond the idempotent sink,
  * because the batch MUTATES the very state it gates on: after a
  * crash between the corpus append and the commit-log record, a naive
  * replay would re-gate against a state that now contains the batch's
  * own documents, compute an empty accepted set, and overwrite the
  * batch partition with nothing — silent loss. The committed sink
  * partition is therefore the batch's durable manifest: on replay
  * (partition already job-committed, `_SUCCESS` present) the gate is
  * NOT recomputed — the partition's rows are re-driven through the
  * (doc_id-idempotent) state append, which no-ops if it already ran.
  * Every crash window is covered: before the sink commit → clean
  * recompute against unmutated state; after the sink commit → the
  * manifest replay. Genuine upstream re-deliveries (the same document
  * arriving again in a LATER batch) are a different phenomenon and
  * take the normal gate: by then the corpus state holds the doc's
  * signature, so it is rejected as the duplicate it is — and the
  * gate checks BOTH identity levels (doc_id membership, then text
  * hash), with the hash probe TOMBSTONE-AWARE: the id check uses the
  * same key the state append dedups on, so a redelivered id carrying
  * different text can never reach the sink while its signature is
  * dropped from state, and a text whose only corpus copies are
  * pending compliance deletion does not suppress a fresh arrival
  * (the dedupIncrementalForget never-ingested contract).
  *
  * At 100 TB: per batch this costs ONE map-only scan of the corpus
  * signature table computing both identity levels at once (two
  * broadcast-hash membership marks — doc_id and (h64,h128) — over a
  * single (doc_id, h64, h128) projection; neither key alone covers
  * the bucket layout, so one unpruned scan beats the earlier
  * two-scan form), one O(tombstones) broadcast, one
  * per-batch-directory write of the accepted rows, and one O(batch)
  * state append. Nothing global, no growing streaming state — the
  * corpus tables ARE the state.
  *
  * INVARIANT — outDir and checkpoint live and die TOGETHER: the
  * replay branch trusts `batch_id=N/_SUCCESS` under outDir as "this
  * run's batch N committed". A fresh checkpoint restarts batch ids at
  * 0, so pointing one at a POPULATED outDir from a previous run
  * routes genuinely new batches into the replay branch — arrivals
  * silently dropped, the stale manifest re-appended. Create both
  * directories together, retire both together (same contract as
  * [[SpanIngest]]). The markers themselves are a committer setting
  * (`mapreduce.fileoutputcommitter.marksuccessfuljobs`, default
  * true): the loop REQUIRES it at start rather than silently losing
  * every crash replay on a stack that disables them.
  */
object StreamingIngest {

  /** @param docBatches streaming DataFrame of (doc_id, text) arrivals;
    *   accepted docs must resolve in `dir`'s documents table (the
    *   corpus convention [[Dedup.appendShardToCorpus]] shares).
    * @param afterBatch test seam fired after the sink write AND state
    *   append but BEFORE the commit log records the batch — throwing
    *   here simulates the worst crash window (all effects applied,
    *   nothing committed). */
  def dedupedIngest(dir: String, docBatches: DataFrame,
                    outDir: String, checkpoint: String,
                    shardMod: Long = 10, numBuckets: Int = 8,
                    afterBatch: Long => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery = {
    // the replay branch keys on job-commit _SUCCESS markers — a
    // committer configured not to write them (some object-store
    // setups) would route every crash replay into the recompute
    // branch against already-mutated state, the exact silent-loss
    // window the manifest exists to close. Fail fast, not silently.
    require(docBatches.sparkSession.sparkContext.hadoopConfiguration.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
      "dedupedIngest requires _SUCCESS job markers " +
        "(mapreduce.fileoutputcommitter.marksuccessfuljobs=true): " +
        "the crash-replay manifest branch keys on them")
    docBatches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val (_, hashesT) = Dedup.corpusStateTables(spark, dir,
          shardMod = shardMod, numBuckets = numBuckets)
        val partDir = s"$outDir/batch_id=$batchId"
        val hPath = new org.apache.hadoop.fs.Path(partDir, "_SUCCESS")
        val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hPath)) {
          // replay of a batch whose sink write already committed: the
          // partition IS the accepted set — re-drive the idempotent
          // append from it instead of re-gating against mutated state.
          // Read with the batch's EXPLICIT schema: a fully-redelivered
          // batch commits an accepted set of zero rows, i.e. _SUCCESS
          // with no data files, and schema inference over that would
          // throw on every replay — a poison pill that wedges the
          // stream on a batch that only needs an empty no-op append.
          Dedup.appendShardDocs(spark, dir,
            spark.read.schema(batch.schema).parquet(partDir),
            shardMod = shardMod, numBuckets = numBuckets)
        } else {
          // within-batch dedup, deterministically and on BOTH identity
          // levels: first one text per doc_id (min(text) — the
          // SpanIngest convention; a same-id-different-text anomaly
          // resolves to one row instead of emitting twice), then min
          // doc_id per text hash (a nondeterministic pick would make
          // retried gate computations disagree). Cached: the frame
          // feeds the id probe, the hash probe, and the anti-joins —
          // uncached it was scanned and hashed twice per batch.
          val sigs = batch
            .select(col("doc_id"), col("text"))
            .groupBy("doc_id").agg(min("text").as("text"))
            .select(col("doc_id"), col("text"),
              xxhash64(col("text")).as("h64"), md5(col("text")).as("h128"))
            .groupBy("h64", "h128")
            .agg(min("doc_id").as("doc_id"), min("text").as("text"))
            .cache()
          try {
            // BOTH identity levels in ONE pass over the state table:
            // a single scan of hashesT projecting (doc_id, h64, h128)
            // with two broadcast-hash membership marks, instead of
            // the earlier two-scan form (a bucketed hash probe plus a
            // separate unbucketed doc_id probe) — at corpus scale the
            // scan dominates, so this halves the per-batch state I/O.
            // Neither key alone covers the scan's bucket layout for
            // pruning, but both joins stay map-only broadcasts.
            //
            // id level — the SAME key appendShardDocs dedups state
            // on, so sink and state cannot diverge when a doc_id
            // returns in a later batch carrying different text (the
            // hash check alone would emit it to the sink while the
            // state append silently dropped its signature). The id
            // mark is deliberately NOT tombstone-aware: a tombstoned
            // doc_id physically still in state stays suppressed until
            // purge — its id is not servable anyway (spec-pinned in
            // StreamingIngestSpec so an edit cannot silently flip it).
            //
            // content level — TOMBSTONE-AWARE like the batch
            // operator's forget probe (dedupIncrementalForget): a
            // text whose only corpus copies are pending deletion must
            // not suppress a fresh arrival (never-ingested contract).
            // REFRESH the tombstones first: deletion requests arrive
            // from ANOTHER session (a compliance job), and the
            // micro-batch session's table-relation cache would
            // otherwise serve the file listing from when the stream
            // first resolved the table — a tombstone written
            // mid-stream would stay invisible to every later batch
            // (found by the spec's mid-stream forget)
            val tombsT = Dedup.corpusTombstonesTable(spark, dir,
              shardMod = shardMod, numBuckets = numBuckets)
            spark.catalog.refreshTable(tombsT)
            val tombs = spark.table(tombsT)
            // hashesT too: this loop's own appends invalidate the
            // relation cache in-session, but a cross-session PURGE
            // (purgeCorpusTombstones physically rewrites the state
            // tables) would otherwise leave a stale file listing —
            // the FileNotFoundException class the serving tiers
            // already guard against
            spark.catalog.refreshTable(hashesT)
            // rows ∝ batch-key matches in state, so the cache is
            // batch-scale (id hits ≤ batch ids; hash hits ∝ corpus
            // copies of batch texts — the same bound the old hash
            // probe's distinct() carried)
            val touched = spark.table(hashesT)
              .select("doc_id", "h64", "h128")
              .join(broadcast(sigs.select("doc_id").withColumn("idhit", lit(true))),
                Seq("doc_id"), "left")
              .join(broadcast(sigs.select("h64", "h128").withColumn("hhit", lit(true))),
                Seq("h64", "h128"), "left")
              .filter(coalesce(col("idhit"), lit(false)) ||
                coalesce(col("hhit"), lit(false)))
              .cache()
            try {
            val indexedIds = touched.filter(col("idhit"))
              .select("doc_id").distinct()
            val hot = touched.filter(col("hhit"))
              .join(broadcast(tombs.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
              .select("h64", "h128")
              .distinct()
            val accepted = sigs
              .join(broadcast(indexedIds), Seq("doc_id"), "left_anti")
              .join(broadcast(hot), Seq("h64", "h128"), "left_anti")
              .select(col("doc_id"), col("text"))
              .cache()
            try {
              accepted.write.mode("overwrite").parquet(partDir)
              // accepted already carries text — the text-carrying
              // append skips the per-batch documents-table recovery
              // scans
              Dedup.appendShardDocs(spark, dir, accepted,
                shardMod = shardMod, numBuckets = numBuckets)
            } finally accepted.unpersist()
            } finally touched.unpersist()
          } finally sigs.unpersist()
        }
        afterBatch(batchId)
      }
      .start()
  }
}

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
  * At 100 TB: per batch this costs one map-only bucketed corpus scan
  * (broadcast-probed by the batch's signature set), one
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
            // id-level redelivery drop — the SAME key appendShardDocs
            // dedups state on, so sink and state cannot diverge when a
            // doc_id returns in a later batch carrying different text
            // (the gate's hash check alone would emit it to the sink
            // while the state append silently dropped its signature).
            // A tombstoned doc_id physically still in state stays
            // suppressed until purge — its id is not servable anyway.
            val indexedIds = Dedup.probeCorpusKeys(spark, hashesT,
              sigs.select("doc_id"), Seq("doc_id"))
            // content-level gate, TOMBSTONE-AWARE like the batch
            // operator's forget probe (dedupIncrementalForget): a text
            // whose only corpus copies are pending deletion must not
            // suppress a fresh arrival — the never-ingested contract.
            // O(tombstones) broadcast on a bucketed map-only scan.
            // REFRESH first: deletion requests arrive from ANOTHER
            // session (a compliance job), and the micro-batch
            // session's table-relation cache would otherwise serve
            // the file listing from when the stream first resolved
            // the table — a tombstone written mid-stream would stay
            // invisible to every later batch (found by the spec's
            // mid-stream forget)
            val tombsT = Dedup.corpusTombstonesTable(spark, dir,
              shardMod = shardMod, numBuckets = numBuckets)
            spark.catalog.refreshTable(tombsT)
            val tombs = spark.table(tombsT)
            val hot = spark.table(hashesT)
              .join(broadcast(tombs.select("doc_id").distinct()), Seq("doc_id"), "left_anti")
              .select("h64", "h128")
              .join(broadcast(sigs.select("h64", "h128")), Seq("h64", "h128"), "left_semi")
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
          } finally sigs.unpersist()
        }
        afterBatch(batchId)
      }
      .start()
  }
}

package graft.streaming

import graft.operators.{IvfCodebook, Similarity}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** The vector database's QUERY-side runtime (SURVEY.md §2.6 ∩ §2.4):
  * a stream of query vectors served micro-batch by micro-batch
  * against the PERSISTED cell-partitioned IVF index. The static side
  * is the index table ([[Similarity.ivfIndexTable]] — built once,
  * offline, mutated only through the append/forget lifecycle); the
  * stream side is tiny per batch, so each batch runs the SAME plan
  * the batch operator runs ([[Similarity.serveQueryFrame]]: broadcast
  * probe rows against a partition-pruned scan of only the probed
  * cells, exact cosine re-rank, per-query top-k).
  *
  * Exactly-once is the cheap case here — serving mutates nothing, and
  * the serve is a deterministic function of (index content, batch),
  * so each batch's results land in their own `batch_id=N` partition
  * with overwrite semantics: a post-crash replay rewrites the same
  * partition with identical rows instead of appending duplicates.
  *
  * At 100 TB: per batch this costs one broadcast of |batch|·nprobe
  * probe rows and a scan of only the probed cells' partitions —
  * serving cost tracks the query rate, never the corpus. */
object VectorServe {

  /** @param queryBatches streaming DataFrame of (vec_id, v) query
    *   vectors (v: array of double, the [[Similarity.serveQueryFrame]]
    *   contract). Results stream to `outDir/batch_id=N` partitions. */
  def serveStream(dir: String, queryBatches: DataFrame,
                  outDir: String, checkpoint: String,
                  k: Int = 10, nprobe: Int = 4,
                  codebook: Array[Array[Double]] = IvfCodebook.centroids)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryBatches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val table = Similarity.ivfIndexTable(spark, dir, codebook)
        // the index is mutated out-of-band (ivfIndexAppend/Forget from
        // an ingest or compliance session) — drop this session's
        // cached file listing per batch, or a mid-serve forget keeps
        // SERVING the deleted vectors from the stale listing (and a
        // compacted rewrite crashes the scan on vanished files): the
        // StreamingIngest tombstone staleness class, on the read path
        spark.catalog.refreshTable(table)
        Similarity.serveQueryFrame(spark, table,
            batch.select(col("vec_id"), col("v")), k, nprobe, codebook)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()

  /** [[serveStream]]'s GRAPH-tier twin — the same stream-static
    * micro-batch discipline over the persisted k-NN graph instead of
    * the IVF index, completing streaming serving parity across both
    * index families: each batch of (vec_id, v) query vectors runs the
    * IDENTICAL bounded beam walk the batch operator runs
    * ([[Similarity.graphSearchCore]] — per hop one join against the
    * O(n·k) edge table, per-query state `beam` ids), so a stream
    * query and a batch query over the same graph content return the
    * same rows. Exactly-once by the same argument as the IVF side:
    * serving mutates nothing and the walk is a deterministic function
    * of (graph content, batch), so each batch overwrites its own
    * `batch_id=N` partition idempotently. `informed` selects LSH
    * bucket-mate entry points (the production seeding); the default
    * keeps the LCG contract the batch registry queries replay.
    * `informedFromTable` is the 100 TB informed form: bucket-mates
    * AND the fallback sample both come from the persisted
    * [[Similarity.lshSeedTable]] artifact, so each micro-batch's seed
    * derivation hashes only its own query vectors and reads the
    * artifact — no corpus-sized input anywhere on the seed path
    * (row-identical to inline informed seeding, the batch-side spec).
    *
    * At 100 TB: per batch this costs hops·(batch-keyed joins against
    * the graph and corpus tables) — cost tracks the query rate and
    * the O(n·k) artifact, never a corpus scan. */
  def graphServeStream(dir: String, queryBatches: DataFrame,
                       outDir: String, checkpoint: String,
                       k: Int = 10, beam: Int = 20, hops: Int = 3,
                       graphK: Int = 10, graphIters: Int = 3,
                       informed: Boolean = false,
                       informedFromTable: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queryBatches.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val table = Similarity.knnGraphTable(spark, dir, graphK, graphIters)
        // same cross-session staleness discipline as the IVF tier: a
        // knnGraphForget/Append from another session must be visible
        // to the NEXT micro-batch, not whenever this session happens
        // to re-resolve the table
        spark.catalog.refreshTable(table)
        val graph = spark.table(table)
          .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
        val corpus = graft.Tables.embeddings(spark, dir)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("v"))
        val queries = batch.select(col("vec_id").as("qid"), col("v").as("qv"))
        val mates = if (informedFromTable) {
          spark.catalog.refreshTable(Similarity.lshSeedTable(spark, dir))
          Some(Similarity.informedSeedMates(spark, dir, queries))
        } else None
        val sample = if (informedFromTable)
          Some(Similarity.informedSeedSample(spark, dir, beam)) else None
        Similarity.graphSearchCore(graph, corpus, queries, k, beam, hops,
            informedSeeds = informed || informedFromTable,
            seedMates = mates, seedSample = sample)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
}

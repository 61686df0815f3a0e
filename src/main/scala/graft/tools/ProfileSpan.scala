package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for the span-cut family (dev tool — the
  * ProfileGraphServe discipline): run each variant on a dir, report
  * wall time, docs-with-cuts, and the cut-character fraction. The
  * 10×-replica is the WORST CASE by construction: every document's
  * text repeats across ten replicas (modulo the per-replica suffix),
  * so hit volume ≈ the whole corpus — the "hits ∝ duplicated text"
  * bound with duplicated-text ≈ 100%. The natural twin is the
  * opposite pole (near-zero duplication).
  *
  * Three rows per dir:
  *   - `remove-all` — [[graft.operators.Dedup.pipeSpanDedup]]'s
  *     broadcast-probe shape (the below-threshold default);
  *   - `remove-all/forced-shuffle` — the past-broadcast fallback
  *     (forceGramShuffle: one explicit gram exchange both consumers
  *     reuse), measured on the SAME data so the crossover between
  *     the two shapes is a number, not a guess;
  *   - `keep-first` — the boundary sweep at its worst case
  *     (maximal keepers + maximal hits on the replica);
  *   - `incremental` — the persisted-index arrival cut
  *     ([[graft.operators.Dedup.spanDedupIncrementalCore]]): the
  *     doc_id % 10 == 0 shard probed against the index over the
  *     rest (warm pass includes the one-time index build). */
object ProfileSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame
    def docs: DataFrame = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    def run(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val agg = df
        .agg(count(lit(1)).as("docs"),
          sum((col("n_spans_cut") > 0).cast("long")).as("docs_cut"),
          sum(col("n_chars_cut")).as("chars_cut"),
          sum(length(col("clean_text")).cast("long") + col("n_chars_cut")).as("chars_total"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      graft.CacheRegistry.releaseAll(blocking = true)
      println(f"[span] $label%-26s $sfDir%s: ${agg.getLong(0)}%d docs, " +
        f"${agg.getLong(1)}%d with cuts, " +
        f"${agg.getLong(2).toDouble / agg.getLong(3)}%.3f of chars cut, " +
        f"$dt%.2f s")
    }
    val cacheGrams = graft.Tables.rowCount(spark, sfDir, "documents") <= 20000
    // warm pass (JIT + codegen + footers), then one timed pass each
    for (pass <- Seq("warm", "timed")) {
      run(s"remove-all/$pass",
        graft.operators.Dedup.spanDedupCore(docs, 50, cacheGrams))
      run(s"remove-all/forced/$pass",
        graft.operators.Dedup.spanDedupCore(docs, 50, cacheGrams,
          forceGramShuffle = true))
      run(s"keep-first/$pass",
        graft.operators.Dedup.spanDedupKeepFirstCore(docs, 50, cacheGrams))
      run(s"incremental/$pass",
        graft.operators.Dedup.spanDedupIncrementalCore(spark,
          graft.operators.Dedup.spanGramIndexFor(spark, sfDir),
          graft.Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("text")), 50))
      // the regime the incremental operator EXISTS for: a daily-sized
      // arrival (50 docs) against the persisted index — the 10%-shard
      // row above deliberately measures the saturation edge instead
      // (at natural 10x it comes out SLOWER than the batch cut: a
      // corpus-fraction arrival should take the batch operator, per
      // the operator's documented regime bound)
      run(s"incremental-daily50/$pass",
        graft.operators.Dedup.spanDedupIncrementalCore(spark,
          graft.operators.Dedup.spanGramIndexFor(spark, sfDir),
          graft.Tables.documents(spark, sfDir)
            .filter(col("doc_id") % 10 === 0)
            .orderBy("doc_id").limit(50)
            .select(col("doc_id"), col("text")), 50))
    }
    spark.stop()
  }
}

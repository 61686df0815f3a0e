package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale measurement for [[graft.operators.Dedup.pipeSpanDedup]]
  * (dev tool — the ProfileGraphServe discipline for the span cutter):
  * run the cut on a dir, report wall time, docs-with-cuts, and the
  * cut-character fraction. The 10×-replica is the WORST CASE by
  * construction: every document's text repeats across ten replicas
  * (modulo the per-replica suffix), so hit volume ≈ the whole corpus
  * — the "hits ∝ duplicated text" bound with duplicated-text ≈ 100%.
  * The natural twin is the opposite pole (near-zero duplication). */
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
    def run(): Unit = {
      val t0 = System.nanoTime()
      val agg = graft.operators.Dedup.pipeSpanDedup(spark, sfDir)
        .agg(count(lit(1)).as("docs"),
          sum((col("n_spans_cut") > 0).cast("long")).as("docs_cut"),
          sum(col("n_chars_cut")).as("chars_cut"),
          sum(col("clean_len") + col("n_chars_cut")).as("chars_total"))
        .collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[span] $sfDir%s: ${agg.getLong(0)}%d docs, " +
        f"${agg.getLong(1)}%d with cuts, " +
        f"${agg.getLong(2).toDouble / agg.getLong(3)}%.3f of chars cut, " +
        f"$dt%.2f s")
    }
    run() // warm: JIT + codegen + footers
    run()
    spark.stop()
  }
}

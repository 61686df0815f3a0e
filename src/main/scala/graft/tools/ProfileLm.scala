package graft.tools

import graft.{CacheRegistry, Tables}
import graft.CacheRegistry.Cacheable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off profiler for pipe_lm_score's 0.8 s plateau (round-4 verdict
  * item #5): times the shipped formulation against (a) the same plan
  * without the docTok cache and (b) a broadcast-hinted frequency join,
  * isolating whether the cache's rebuild-and-scan cost is what the
  * pre-aggregation saved. Not part of the library surface. */
object ProfileLm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docTok(cached: Boolean): DataFrame = {
      val dt = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      if (cached) dt.cacheTracked else dt
    }
    def score(dt: DataFrame, bcastFreqs: Boolean): DataFrame = {
      val freqs0 = dt.groupBy("t").agg(sum("c").as("tf"))
      val freqs = if (bcastFreqs) broadcast(freqs0) else freqs0
      val total = dt.agg(sum("c").as("total"))
      dt.join(freqs, "t").crossJoin(total)
        .groupBy("doc_id", "total")
        .agg(sum("c").as("n_tok"), sum(col("c") * log10(col("tf"))).as("slt"))
        .select(col("doc_id"), col("n_tok"),
          round(col("slt") / col("n_tok") - log10(col("total")), 4).as("lm_score"))
        .orderBy("doc_id")
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "shipped_cached" -> (() => score(docTok(cached = true), bcastFreqs = false)),
      "no_cache" -> (() => score(docTok(cached = false), bcastFreqs = false)),
      "no_cache_bcast" -> (() => score(docTok(cached = false), bcastFreqs = true)),
      "cached_bcast" -> (() => score(docTok(cached = true), bcastFreqs = true)))
    // bench protocol: warmup once, min of 2 timed, release caches after
    variants.foreach { case (name, mk) =>
      def run(): Unit = mk().write.mode("overwrite").format("noop").save()
      run()
      val dt = Seq.fill(2) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }.min
      CacheRegistry.releaseAll(blocking = true)
      println(f"$name%-16s $dt%.3f s")
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Stage timing for dedup_clusters: pairs vs CC loop vs final join —
  * run at sf0.1 to see where the wall-clock goes. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.dedupClusters(spark, sfDir).count()
    graft.CacheRegistry.releaseAll()
    time("pairs (ngram jaccard)") { Dedup.dedupNgramJaccard(spark, sfDir).count() }
    graft.CacheRegistry.releaseAll()
    time("clusters end-to-end") { Dedup.dedupClusters(spark, sfDir).count() }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timing for [[graft.operators.Similarity.simKnnGraph]] (dev
  * tool): reports per-round wall time so regressions in the iterative
  * shape (lazy-DAG re-evaluation, lost caching, broadcast misses)
  * show up as a phase number instead of a bench mystery. */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[knn] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    time("warm")(graft.operators.Similarity.simKnnGraph(spark, sfDir).collect())
    graft.CacheRegistry.releaseAll(blocking = true)
    time("steady")(graft.operators.Similarity.simKnnGraph(spark, sfDir).collect())
    spark.stop()
  }
}

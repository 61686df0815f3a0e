package graft.tools
import org.apache.spark.sql.SparkSession
object NgramPairCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Dedup.dedupNgramJaccard(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"[pairs] run $i (noop): ${(System.nanoTime()-t0)/1e9}%.1f s")
    }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }
}

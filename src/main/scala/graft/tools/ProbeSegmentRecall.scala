package graft.tools

import org.apache.spark.sql.SparkSession

/** Beam/graph-quality sweep for the SEGMENT serving tier (dev tool):
  * the round-18 dashboard's first sf0.1 run surfaced recall 0.76 at
  * the (beam=20, hops=3, graphK=10) defaults that measure 0.98 on the
  * sf0.01 segment — fixed walk parameters over a 3.7× larger segment
  * (218 → 808 members). This tool separates the two candidate causes:
  *
  *   - WALK budget: beam/hops too small for the segment size → recall
  *     recovers as beam grows with the same graph;
  *   - GRAPH quality: the NN-Descent (k=10, 3 iters) neighborhoods
  *     themselves degraded at this size → recall plateaus below 1.0
  *     no matter the beam, and only graphK/iters moves it.
  *
  * Usage: `runMain graft.tools.ProbeSegmentRecall [sfDir]`. */
object ProbeSegmentRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    import graft.operators.Similarity
    // more query vectors than the dashboard row for a tighter recall
    // estimate (200 query-neighbor pairs per cell instead of 50)
    val nQ = 20
    for {
      (gk, gi) <- Seq((10, 3), (20, 3))
      (beam, hops) <- Seq((20, 3), (32, 3), (48, 3), (64, 3), (32, 4))
    } {
      val row = Similarity.segmentServeRecallRow(spark, sfDir, "en",
          nQueries = nQ, k = 10, beam = beam, hops = hops,
          graphK = gk, graphIters = gi)
        .toJSON.collect()(0)
      println(s"""{"beam":$beam,"hops":$hops,"graphK":$gk,"graphIters":$gi,"row":$row}""")
      graft.CacheRegistry.releaseAll(blocking = true)
    }
    spark.stop()
  }
}

package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Distribution-drift check for the frozen IVF codebook (dev tool,
  * round-4 verdict stretch #8): the coarse quantizer was trained once
  * on sf0.01 embeddings and shipped as constants — does its recall
  * survive a 100×-larger corpus whose content drifted? Measures
  * recall@10 of `sim_ivf_ann` (and `sim_lsh_ann` for reference)
  * against the brute-force exact top-k at each given sf dir. Run
  * `MakeSf1` first for the sf1-like replica (its per-replica
  * first-dim delta IS the distribution drift being tested). */
object IvfRecallEval {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
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
    dirs.foreach { dir =>
      val exact = Similarity.simBruteforceTopK(spark, dir).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      require(exact.nonEmpty, s"brute-force top-k returned no rows for $dir — bad input dir?")
      val ivf = Similarity.simIvfAnn(spark, dir, nprobe = 8).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      val lsh = Similarity.simLshAnn(spark, dir).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      val rIvf = (exact & ivf).size.toDouble / exact.size
      val rLsh = (exact & lsh).size.toDouble / exact.size
      println(f"[recall] $dir%s  exact_pairs=${exact.size}%d  ivf@10=$rIvf%.3f  lsh@10=$rLsh%.3f")
    }
    spark.stop()
  }
}

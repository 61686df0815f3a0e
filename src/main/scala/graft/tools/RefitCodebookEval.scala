package graft.tools

import graft.operators.{IvfCodebook, Similarity}
import org.apache.spark.sql.SparkSession

/** End-to-end exercise of the RE-FIT-codebook path (dev tool): the
  * frozen sf0.01 codebook's recall is the shipped operating point,
  * and the documented remedy for live distribution drift is "re-fit
  * on a fresh sample and rebuild" — this main actually runs that
  * remedy. It fits a NEW codebook on the given (drifted) corpus via
  * [[FitIvfCodebook.fit]], builds a persisted index through the same
  * [[Similarity.ivfIndexTable]] entry point (whose name embeds a
  * CONTENT hash of the codebook, so the re-fit build can never alias
  * the frozen-codebook index — the aliasing hazard closed in round
  * 9), serves through the same plan, and prints recall@10 of frozen
  * vs re-fit against the exact brute force. Run `MakeSf1` first for
  * the sf1-like replica dir. */
object RefitCodebookEval {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
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
    val frozen = IvfCodebook.centroids
    val refit = FitIvfCodebook.fit(spark, dir)
    val tFrozen = Similarity.ivfIndexTable(spark, dir, frozen)
    val tRefit = Similarity.ivfIndexTable(spark, dir, refit)
    require(tFrozen != tRefit,
      "content hash failed to separate the re-fit codebook's index from the frozen one")
    val exact = Similarity.simBruteforceTopK(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    require(exact.nonEmpty, s"brute-force top-k returned no rows for $dir — bad input dir?")
    def recall(table: String, cb: Array[Array[Double]]): Double = {
      val got = Similarity.serveFromIndex(spark, dir, table,
        nQueries = 5, k = 10, nprobe = 8, cb).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val rFrozen = recall(tFrozen, frozen)
    val rRefit = recall(tRefit, refit)
    println(f"[refit] $dir%s  exact_pairs=${exact.size}%d  frozen@10=$rFrozen%.3f  refit@10=$rRefit%.3f  tables=($tFrozen, $tRefit)")
    spark.stop()
  }
}

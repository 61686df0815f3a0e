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
      multiTableRow(spark, dir, exact)
      knnGraphRow(spark, dir)
    }
    spark.stop()
  }

  /** NN-Descent graph quality at scale (round 11): edge recall vs the
    * exact top-k for a 100-vertex deterministic sample (vec_id < 100
    * — exact truth for the sample costs 100·n cosines, tractable at
    * any measured scale, and the sample estimate is what the WWW'11
    * paper reports too). */
  private def knnGraphRow(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val k = 10
    val got = Similarity.simKnnGraph(spark, dir).filter(col("vec_id") < 100)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotConv = Similarity.simKnnGraphConverged(spark, dir)
      .filter(col("vec_id") < 100)
      .select("vec_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("a"), col("v").as("va"))
    val exact = q.join(e.select(col("vec_id").as("b"), col("v").as("vb")),
        col("a") =!= col("b"))
      .select(col("a"), col("b"),
        graft.functions.VectorFunctions.cosine_similarity(col("va"), col("vb")).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col("c").desc, col("b"))))
      .filter(col("rn") <= k)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    val recallConv = (exact & gotConv).size.toDouble / exact.size
    println(f"[knngraph] $dir%s  sample=100  fixedT_recall@$k%d=$recall%.3f" +
      f"  converged_recall@$k%d=$recallConv%.3f")
  }

  /** The multitable-LSH scale row (round-11 verdict #5): planted-truth
    * recall (cos ≈ 0.996 — the production near-dup regime the
    * DedupSimilaritySpec gates at test scale), weak-neighbor recall
    * (this corpus's cos ≈ 0.3 true top-10 — reported for
    * transparency, inherently near-zero for any sign-LSH without
    * full-scan candidate mass), and the candidate-mass pair — union
    * of 8 radius-0 tables vs radius-2 multi-probe — per corpus size,
    * so the linear-in-n radius-0 trade is a measured number at 10×,
    * not an extrapolation. */
  private def multiTableRow(spark: SparkSession, dir: String,
                            exact: Set[(Long, Long)]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.Tables
    val multi = Similarity.simLshMultiTable(spark, dir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val rWeak = (exact & multi).size.toDouble / exact.size
    val planted = Similarity.simLshMultiTable(spark, dir, augmentPlanted = true)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val nPlantedHit = (0L until 5L).count(q => planted.contains((q, q + 1000000L)))
    val n = Tables.embeddings(spark, dir).count()
    def vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    // union-of-8-tables radius-0 candidate pairs for the 5 queries
    val sets = Similarity.lshTablePlanes()
    val eT = vecs.withColumn("buckets", array(sets.map(p =>
        graft.functions.VectorFunctions.lsh_bucket(col("v"), p)): _*))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("t", "bucket")))
    val qT = eT.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("t"), col("bucket"))
    val candMulti = eT.join(qT, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct().count()
    // radius-2 multi-probe candidate pairs for the same queries
    val planes = Similarity.lshPlanes()
    val eP = vecs.withColumn("bucket",
      graft.functions.VectorFunctions.lsh_bucket(col("v"), planes))
    val masks = Similarity.lshProbeMasks()
    val qP = eP.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    val candProbe = eP.join(qP, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct().count()
    println(f"[multitable] $dir%s  n=$n%d  planted_hit=$nPlantedHit/5  weak@10=$rWeak%.3f  " +
      f"cand_multitable=$candMulti%d (${candMulti / 5.0 / n}%.3f n/query)  " +
      f"cand_multiprobe=$candProbe%d (${candProbe / 5.0 / n}%.3f n/query)")
  }
}

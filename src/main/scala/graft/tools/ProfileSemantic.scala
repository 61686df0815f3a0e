package graft.tools

import graft.Tables
import graft.operators.{Dedup, IvfCodebook}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the `dedup_semantic` nlist lever at the 10× replica scale
  * (dev tool): within-cell compare volume Σ n_c·(n_c−1)/2 and wall
  * time under (a) the frozen shipped nlist=16 codebook, (b) re-fit
  * codebooks at larger nlist up to ≈√n — the offline re-fit
  * [[FitIvfCodebook]] performs, here run in-process per nlist. The
  * numbers behind the README's "grow nlist ~√n" scale claim: at fixed
  * nlist the compare volume is n²/nlist (quadratic), at nlist=√n it
  * is n^1.5 with balanced cells. Run [[MakeSf1]] first.
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val n = Tables.rowCount(spark, dir, "embeddings")
    println(s"[sem] corpus n=$n  sqrt(n)=${math.sqrt(n.toDouble).toInt}")

    def fit(nlist: Int): Array[Array[Double]] = {
      val e = Tables.embeddings(spark, dir)
        .select(transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("nv", transform(col("v"), x => x / sqrt(aggregate(col("v"), lit(0.0), (a, y) => a + y * y))))
        .withColumn("fv", array_to_vector(col("nv")))
      new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
        .setFeaturesCol("fv").setPredictionCol("bucket")
        .fit(e).clusterCenters.map(_.toArray)
    }

    def measure(label: String, cb: Array[Array[Double]]): Unit = {
      val assigned = Dedup.augmentedEmbeddings(spark, dir)
        .withColumn("cell", graft.operators.Similarity.ivfCell(col("v"), cb))
      val vol = assigned.groupBy("cell").agg(count(lit(1)).as("nc"))
        .agg(sum(col("nc") * (col("nc") - 1) / 2).as("pairs"),
          max("nc").as("max_cell"), count(lit(1)).as("cells"))
        .collect()(0)
      // warm + timed, matching Bench's steady-state discipline
      def once(): Double = {
        val t0 = System.nanoTime()
        Dedup.dedupSemantic(spark, dir, codebook = cb, augmentPlanted = true)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val t = Seq.fill(2)(once()).min
      println(f"[sem] $label: cells=${vol.getLong(2)} within-cell pairs=${vol.getDouble(0)}%.3e " +
        f"max-cell=${vol.getLong(1)} time=$t%.2f s")
    }

    measure(s"nlist=16 (frozen shipped codebook)", IvfCodebook.centroids)
    for (k <- args.drop(1).map(_.toInt) match {
      case Array() => Seq(64, math.sqrt(n.toDouble).toInt)
      case xs => xs.toSeq
    }) {
      val t0 = System.nanoTime()
      val cb = fit(k)
      println(f"[sem] fit nlist=$k: ${(System.nanoTime() - t0) / 1e9}%.1f s (offline cost)")
      measure(s"nlist=$k (re-fit)", cb)
    }
    spark.stop()
  }
}

package graft.tools

import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level telemetry for dedup_embedding_ann at a given SF dir:
  * candidate volume out of the margin-guided probe join, verified-pair
  * volume, and wall time per stage — the numbers behind the scaling
  * table's "candidates stay linear" claim. Dev tool, not a library
  * surface. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val n = Tables.rowCount(spark, dir, "embeddings") + 64
    val nP = math.max(12, math.ceil(math.log(n / 2.0) / math.log(2.0)).toInt)
    println(s"[ann] corpus=$n planes=$nP")
    val planes = Similarity.lshPlanes(nP, 64)
    val all = Dedup.augmentedEmbeddings(spark, dir)
    val ids = all.withColumn("bucket", graft.functions.VectorFunctions.lsh_bucket(col("v"), planes))
      .select("id", "bucket")
    val probes = all.select(col("id").as("id_a"),
      explode(graft.functions.VectorFunctions.lsh_probe_buckets(col("v"), planes, 6)).as("bucket"))
    val cands = probes
      .join(ids.select(col("id").as("id_b"), col("bucket")), Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    val nc = timed("candidates (probe join + distinct)")(cands.count())
    println(s"[ann] candidate pairs: $nc")
    val out = timed("full query")(Dedup.dedupEmbeddingAnn(spark, dir, augmentPlanted = true).count())
    println(s"[ann] verified pairs: $out")
    val out2 = timed("full query (2nd run)")(Dedup.dedupEmbeddingAnn(spark, dir, augmentPlanted = true).count())
    println(s"[ann] verified pairs: $out2")
    spark.stop()
  }
}

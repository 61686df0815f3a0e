package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the ngram-jaccard pipeline (dev tool). */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 12; val tau = 0.8

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$r)")
      r
    }

    // warmup scan
    Tables.documents(spark, dir).count()

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sort_array(expr(Dedup.shingleExprPublic(n))).as("shingles"))
      .withColumn("sz", size(col("shingles")))
    time("1 shingle+sort")(docs.count())
    docs.cache().count()

    val occ = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("2 explode occ")(occ.count())

    val dfreq = occ.groupBy("sh").agg(count(lit(1)).as("dfreq"))
    time("3 dfreq")(dfreq.count())

    val ordered = occ.join(dfreq, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("sh")))).as("ord"))
      .select(col("doc_id"), transform(col("ord"), x => x.getField("sh")).as("by_rarity"),
        size(col("ord")).as("sz"))
    time("4 df-order")(ordered.count())
    ordered.cache().count()

    val ex = ordered
      .select(col("doc_id"), col("sz"),
        posexplode(slice(col("by_rarity"), lit(1), (col("sz") - ceil(col("sz") * tau) + 1).cast("int"))))
      .select(col("doc_id"), col("sz"), (col("pos") + 1).as("rk"), col("col").as("sh"))
    time("5 prefix explode")(ex.count())

    val joined = ex.select(col("doc_id").as("id_a"), col("sz").as("pa"), col("rk").as("ra"), col("sh"))
      .join(ex.select(col("doc_id").as("id_b"), col("sz").as("pb"), col("rk").as("rb"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b") &&
        col("pa") >= ceil(col("pb") * tau) && col("pb") >= ceil(col("pa") * tau))
      .groupBy("id_a", "id_b")
      .agg(min("ra").as("ia"), min("rb").as("ib"),
        first("pa").as("pa"), first("pb").as("pb"))
    time("6a length-filtered pairs")(joined.count())
    val tFrac = tau / (1.0 + tau)
    val cands = joined
      .filter(lit(1) + least(col("pa") - col("ia"), col("pb") - col("ib")) >=
        lit(tFrac) * (col("pa") + col("pb")) - lit(1e-9))
      .select("id_a", "id_b")
    time("6b positional filter")(cands.count())
    cands.cache().count()

    val withSets = cands
      .join(docs.select(col("doc_id").as("id_a"), col("shingles").as("sa"), col("sz").as("sz_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("shingles").as("sb"), col("sz").as("sz_b")), "id_b")
      .withColumn("common",
        graft.functions.VectorFunctions.sorted_intersect_count(col("sa"), col("sb")))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= tau)
    time("7 verify")(withSets.count())

    time("full pipeline")(Dedup.dedupNgramJaccard(spark, dir).count())
    spark.stop()
  }
}

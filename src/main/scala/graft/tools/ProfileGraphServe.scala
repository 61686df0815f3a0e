package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batched-serving VOLUME evidence for
  * [[graft.operators.Similarity.graphSearchCore]] (dev tool — the
  * [[StreamThroughput]] discipline for the graph tier): drive EVERY
  * corpus vector as a concurrent query through ONE beam walk and
  * report queries/second. This is the number behind the operator's
  * "a hop is one bounded distributed join over a million concurrent
  * queries, not a pointer chase per query" claim: the per-hop join
  * cost amortizes over the whole query batch, so q/s should rise
  * with batch size while per-query latency stays the 3-hop plan.
  * Run at sf0.1 (5,000 queries × 5,000-vertex graph) and on the 10×
  * sets to see the amortization hold. */
object ProfileGraphServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables
    import graft.operators.Similarity
    val k = 10
    // artifact build is offline cost — exclude it (first touch builds)
    val table = Similarity.knnGraphTable(spark, sfDir, k, 3)
    val graph = spark.table(table)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = corpus.select(col("vec_id").as("qid"), col("v").as("qv"))
    val nQ = queries.count()
    def serve(): Long = {
      val t0 = System.nanoTime()
      val n = Similarity.graphSearchCore(graph, corpus, queries, k,
        beam = 20, hops = 3).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[graphserve] $nQ%d queries -> $n%d picks in $dt%.2f s = ${nQ / dt}%.0f q/s")
      n
    }
    serve() // warm: JIT + codegen + parquet footers
    val n = serve()
    if (n != nQ * k) {
      // diagnose WHICH queries came up short before failing — on a
      // sparse/non-contiguous id space (post-forget corpora) LCG
      // seeds mod (max+1) can miss the membership filter and a query
      // can accumulate < k candidates; a bare total-row inequality
      // hides that
      val short = Similarity.graphSearchCore(graph, corpus, queries, k,
          beam = 20, hops = 3)
        .groupBy("qid").count().filter(col("count") < k)
        .orderBy("qid").limit(20).collect()
      val detail = short.map(r => s"qid=${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
      require(n == nQ * k,
        s"served $n rows for $nQ queries — want exactly $nQ x $k; " +
          s"short queries (first 20): $detail")
    }
    spark.stop()
  }
}

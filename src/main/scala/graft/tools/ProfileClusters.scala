package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Stage timing for dedup_clusters: pairs vs CC loop vs final join —
  * run at sf0.1 to see where the wall-clock goes.
  *
  * `ProfileClusters <dir> loop` instead exercises the DISTRIBUTED
  * star-contraction path at scale (the >100k-edge story that the
  * driver union-find fast path normally shadows): the replica ANN
  * pair graph (~90k edges in 10-cliques) and a 2M-node chain
  * (diameter 2M — the shape min-label propagation could not finish),
  * reporting rounds and wall for each, plus a clique-graph equality
  * check against driver union-find. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.length > 1 && args(1) == "loop") { runLoopProfile(sfDir); return }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Dedup.dedupClusters(spark, sfDir).count()
    graft.CacheRegistry.releaseAll()
    time("pairs (ngram jaccard)") { Dedup.dedupNgramJaccard(spark, sfDir).count() }
    graft.CacheRegistry.releaseAll()
    time("clusters end-to-end") { Dedup.dedupClusters(spark, sfDir).count() }
    graft.CacheRegistry.releaseAll()
    spark.stop()
  }

  private def runLoopProfile(replicaDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc-loop] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // 1) the replica ANN near-dup graph: ~90k edges in 10-cliques —
    //    the realistic above-cap shape (many shallow components)
    val pairs = timed("replica ANN pairs build") {
      Dedup.dedupEmbeddingAnn(spark, replicaDir, augmentPlanted = true)
        .select("id_a", "id_b").cache()
    }
    val ne = pairs.count()
    println(s"[cc-loop] ANN graph edges: $ne")
    val viaLoop = timed(s"star loop on $ne-edge ANN graph") {
      Dedup.connectedComponents(pairs, driverEdgeCap = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val viaUf = timed("driver union-find (same graph)") {
      Dedup.connectedComponents(pairs, driverEdgeCap = Long.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"[cc-loop] equality vs union-find: ${viaLoop == viaUf} " +
      s"(components: ${viaLoop.map(_._2).size} labels over ${viaLoop.size} nodes)")
    pairs.unpersist()
    graft.CacheRegistry.releaseAll()
    // 2) a 2M-node chain: diameter-2M, the adversarial deep shape —
    //    min-label propagation needed 2M rounds here; star contraction
    //    must finish in O(log) alternations
    val n = 2000000L
    val chain = spark.range(0, n - 1)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val chainLabels = timed(s"star loop on $n-node chain") {
      Dedup.connectedComponentsLoop(chain.toDF)
    }
    val wrong = chainLabels.filter(col("label") =!= 0L).count()
    println(s"[cc-loop] chain mislabels: $wrong of $n")
    spark.stop()
  }
}

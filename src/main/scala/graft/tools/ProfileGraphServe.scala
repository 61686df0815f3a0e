package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batched-serving VOLUME + QUALITY evidence for
  * [[graft.operators.Similarity.graphSearchCore]] (dev tool — the
  * [[StreamThroughput]] discipline for the graph tier).
  *
  * Two modes (`args: [sfDir] [mode] [seeds]`):
  *
  *   - `fixed` (default): drive EVERY corpus vector as a concurrent
  *     query through ONE beam walk over the fixed-T harness graph and
  *     report queries/second — the number behind the operator's "a
  *     hop is one bounded distributed join over a million concurrent
  *     queries, not a pointer chase per query" claim: the per-hop
  *     join cost amortizes over the whole query batch, so q/s rises
  *     with batch size while per-query latency stays the 3-hop plan.
  *   - `converged`: the PRODUCTION-side measurement the fixed mode
  *     cannot give (fixed-T edge recall collapses with n — 0.78 →
  *     0.45 → 0.00 at n=500/2000/20000): walk ALL held-out vectors
  *     (vec_id % 10 == 0, never seen by the build) over the CONVERGED
  *     base graph and report q/s NEXT TO recall@k vs exact brute
  *     force over the base corpus — throughput over a graph whose
  *     quality at this n is established, not assumed. NOTE the
  *     %10 held-out split is DEGENERATE on the key-shifted replica
  *     twin: the shifts are multiples of 10, so every copy of a
  *     held-out original is held out with it and the base corpus
  *     contains NO planted twin for any query — use `member` there.
  *   - `member`: all corpus vectors re-queried against the converged
  *     FULL-corpus graph (self excluded — serving returns NEIGHBORS),
  *     q/s over the full batch, recall vs exact brute force on the
  *     deterministic vec_id % 10 == 0 query subset. This is the bulk
  *     re-query shape behind the volume rows, now over the graph
  *     whose at-scale quality is established.
  *
  * `seeds` = `lcg` (default, the replayable-contract entry points;
  * assumes the dense registry id spaces) or `informed` (LSH
  * bucket-mate seeding with a hash-sample-of-existing-ids fallback —
  * the production entry-point discipline, immune to id-space shape;
  * run both to see the gap). Run at sf0.1 and on the 10× sets
  * (/tmp/graft_sf1, /tmp/graft_sf1n) to see amortization and
  * at-scale quality together. */
object ProfileGraphServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val mode = if (args.length > 1) args(1) else "fixed"
    val seedArg = if (args.length > 2) args(2) else "lcg"
    val informed = seedArg.startsWith("informed")
    // informed-table: member-mode twin fed from the PERSISTED
    // lshSeedTable artifact (build-time corpus hashing) instead of
    // hashing the corpus per batch — the 100 TB informed form
    val fromTable = seedArg == "informed-table"
    require(Set("fixed", "converged", "member", "latency")(mode), s"unknown mode $mode")
    require(!fromTable || mode == "member" || mode == "latency",
      "informed-table seeds apply to member/latency modes (the artifact is full-corpus)")
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
    val all = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    // artifact build is offline cost — exclude it (first touch builds)
    val (graph, corpus, queries) = mode match {
      case "fixed" =>
        val t = Similarity.knnGraphTable(spark, sfDir, k, 3)
        (spark.table(t), all,
          all.select(col("vec_id").as("qid"), col("v").as("qv")))
      case "member" | "latency" =>
        val t = Similarity.knnGraphTableConverged(spark, sfDir, k)
        (spark.table(t), all,
          all.select(col("vec_id").as("qid"), col("v").as("qv")))
      case _ =>
        val t = Similarity.knnGraphTableBaseConverged(spark, sfDir, k)
        (spark.table(t), all.filter(col("vec_id") % 10 =!= 0),
          all.filter(col("vec_id") % 10 === 0)
            .select(col("vec_id").as("qid"), col("v").as("qv")))
    }
    val edges = graph.select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val nQ = queries.count()
    // artifact build is offline cost, same as the graph tables above
    def mates(qs: org.apache.spark.sql.DataFrame) =
      if (fromTable) Some(Similarity.informedSeedMates(spark, sfDir, qs)) else None
    // the fallback sample too: with both fed, seed derivation reads
    // only the artifact (no per-batch corpus touch)
    def sample() =
      if (fromTable) Some(Similarity.informedSeedSample(spark, sfDir, beam = 20))
      else None
    if (fromTable) {
      val seedT = Similarity.lshSeedTable(spark, sfDir)
      // the staleness alarm rides with every artifact-fed measurement:
      // plane drift / occupancy / sample size next to the q/s rows
      val health = Similarity.seedArtifactHealthRow(spark, seedT,
        Tables.embeddings(spark, sfDir)).collect()(0)
      println(s"[graphserve] seed-health $health")
    }
    if (mode == "latency") {
      // the per-batch FIXED-COST floor the bulk rows amortize away:
      // one warm pass, then best-of-3 per batch size — at batch = 1
      // the time is almost entirely per-JOB overhead (plan + schedule
      // + the hops' bounded joins on near-empty frames), which is the
      // number an interactive caller sees. Batch sizes are tiny, so
      // seconds/batch ~ the floor and q/s shows the amortization
      // climbing toward the bulk rows.
      Similarity.graphSearchCore(edges, corpus,
        queries.orderBy("qid").limit(100), k, beam = 20, hops = 3,
        informedSeeds = informed, seedMates = mates(queries.orderBy("qid").limit(100)),
        seedSample = sample()).count() // warm: JIT + codegen + footers
      for (b <- Seq(1, 10, 100)) {
        val qb = queries.orderBy("qid").limit(b)
          .localCheckpoint() // freeze the batch; exclude its derivation
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          Similarity.graphSearchCore(edges, corpus, qb, k, beam = 20,
            hops = 3, informedSeeds = informed, seedMates = mates(qb),
            seedSample = sample()).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[graphserve] latency seeds=$seedArg%s batch=$b%d: " +
          f"best ${times.min}%.3f s (${times.map(t => f"$t%.3f").mkString(", ")}) " +
          f"= ${b / times.min}%.1f q/s")
      }
      spark.stop()
      return
    }
    def serve(): Long = {
      val t0 = System.nanoTime()
      val n = Similarity.graphSearchCore(edges, corpus, queries, k,
        beam = 20, hops = 3, informedSeeds = informed,
        seedMates = mates(queries), seedSample = sample()).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[graphserve] mode=$mode%s seeds=$seedArg%s: " +
        f"$nQ%d queries -> $n%d picks in $dt%.2f s = ${nQ / dt}%.0f q/s")
      n
    }
    serve() // warm: JIT + codegen + parquet footers
    val n = serve()
    if (mode != "fixed") {
      // recall vs exact brute force over the servable corpus — the
      // quality number that must ride NEXT TO the q/s row. In member
      // mode the exact side is sampled on the deterministic
      // vec_id % 10 == 0 subset (all-pairs over the full batch would
      // be n² for a number a sample pins just as well).
      val recallQs =
        if (mode == "member") queries.filter(col("qid") % 10 === 0)
        else queries
      val served = Similarity.graphSearchCore(edges, corpus, recallQs, k,
        beam = 20, hops = 3, informedSeeds = informed,
        seedMates = mates(recallQs), seedSample = sample())
      val exact = recallQs.join(corpus, col("qid") =!= col("vec_id"))
        .withColumn("c", graft.functions.VectorFunctions
          .cosine_similarity(col("qv"), col("v")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("c").desc, col("vec_id"))))
        .filter(col("rn") <= k).select("qid", "vec_id")
      val nExact = exact.count()
      val nHit = served.select("qid", "vec_id")
        .join(exact, Seq("qid", "vec_id"), "left_semi").count()
      println(f"[graphserve] recall@$k%d mode=$mode%s seeds=$seedArg%s: " +
        f"${nHit.toDouble / nExact}%.3f ($nHit%d/$nExact%d, n_corpus=${corpus.count()}%d)")
    }
    if (n != nQ * k) {
      // diagnose WHICH queries came up short — on a sparse/
      // non-contiguous id space (key-shifted shards, post-forget
      // corpora) LCG seeds mod (max+1) can miss the membership filter
      // and a query can accumulate < k (or ZERO) candidates; a bare
      // total-row inequality hides both. Left-join from the query
      // frame so fully-empty result sets are counted, not invisible.
      val served = Similarity.graphSearchCore(edges, corpus, queries, k,
        beam = 20, hops = 3, informedSeeds = informed,
        seedMates = mates(queries), seedSample = sample())
      val perQ = queries.select("qid").join(
          served.groupBy("qid").count(), Seq("qid"), "left")
        .select(col("qid"), coalesce(col("count"), lit(0L)).as("cnt"))
        .filter(col("cnt") < k)
      val nShort = perQ.count()
      val detail = perQ.orderBy("qid").limit(20).collect()
        .map(r => s"qid=${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
      val msg = s"served $n rows for $nQ queries — want exactly $nQ x $k; " +
        s"$nShort short queries (first 20): $detail"
      // the fixed mode is the dense-id registry contract — a short
      // result set there is a bug. The converged mode measures
      // arbitrary corpora (sparse-id twins included), where shortfall
      // is the FINDING — report it and let the recall row stand.
      if (mode == "fixed") require(n == nQ * k, msg)
      else println(s"[graphserve] SHORTFALL: $msg")
    }
    spark.stop()
  }
}

package graft.operators

import graft.Tables
import graft.CacheRegistry.Cacheable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.4).
  *
  * Scale design: the query set is broadcast (it is small by
  * definition); the corpus is NEVER shuffled for brute force — each
  * corpus partition scores its rows against the broadcast queries and
  * only (qid, vec_id, score) triples move for the final per-query
  * top-k. The LSH path buckets the corpus once (one narrow shuffle of
  * (bucket, id, vec)) and probes only matching buckets.
  */
object Similarity {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Codegen'd native expression — see graft.functions.CosineSimilarity. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_similarity(a, b)

  // --- primitive kernel ----------------------------------------------

  private[operators] def l2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private[operators] def dotp(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (vec_id, vector-as-double[]) Dataset view of `embeddings`. */
  private[operators] def vectors(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(col("vec_id").cast("long"), asDouble(col("embedding")))
      .as[(Long, Array[Double])]
  }

  /** Exact cosine top-k per query vector (queries = vec_id < nQueries).
    * The tiny query side is collected and broadcast; each corpus
    * partition scores its rows in a JIT'd primitive loop and keeps a
    * bounded per-query heap, so only P×Q×k candidate triples ever
    * move — the corpus itself is never shuffled. Final exact rank via
    * a window over that small candidate set. */
  def simBruteforceTopK(s: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10): DataFrame = {
    import s.implicits._
    val e = vectors(s, dir)
    val qs = e.filter(_._1 < nQueries).collect()
      .map { case (id, v) => (id, v, l2(v)) }.sortBy(_._1)
    val qb = s.sparkContext.broadcast(qs)
    // heap max = current WORST kept candidate (smallest cos, then largest id)
    val worstFirst: Ordering[(Double, Long)] = Ordering.by { case (c, id) => (-c, id) }
    val partTop = e.mapPartitions { rows =>
      val queries = qb.value
      val heaps = Array.fill(queries.length)(
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
      rows.foreach { case (id, v) =>
        val nrm = l2(v)
        var qi = 0
        while (qi < queries.length) {
          val (qid, qv, qn) = queries(qi)
          if (id != qid) {
            val cos = dotp(qv, v) / (qn * nrm)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((cos, id))
            else {
              val (wc, wid) = h.head
              if (cos > wc || (cos == wc && id < wid)) { h.dequeue(); h.enqueue((cos, id)) }
            }
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (c, id) => (queries(qi)._1, id, c) }
      }
    }
    partTop.toDF("qid", "vec_id", "cos")
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cosine"),
        col("rn").cast("long").as("rank"))
      .orderBy("qid", "rank")
  }

  /** Deterministic random hyperplanes for sign-LSH, seeded from a
    * splitmix stream so driver and any future re-run agree. */
  private[operators] def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var x = seed
    def next(): Double = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // uniform in [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
    Array.fill(numPlanes)(Array.fill(dim)(next()))
  }

  /** The deterministic hyperplanes, exposed so the oracle SQL can
    * inline the exact same constants. */
  def lshPlanes(numPlanes: Int = 6, dim: Int = 64): Array[Array[Double]] =
    hyperplanes(numPlanes, dim)

  /** The multi-probe XOR masks (own bucket + all 1-bit and 2-bit
    * flips), exposed for the same reason. */
  def lshProbeMasks(numPlanes: Int = 6): Seq[Long] =
    0L +: ((0 until numPlanes).map(i => 1L << i) ++
      (for (i <- 0 until numPlanes; j <- (i + 1) until numPlanes) yield (1L << i) | (1L << j)))

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    * product — equivalently of the cosine), packed into a long — a
    * pure codegen'd expression over the vector column. */
  private[operators] def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(cosine(v, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via IVF (inverted-file) coarse quantization: k-means
    * on L2-normalized vectors partitions the corpus into `nlist`
    * cells; each query scores only the `nprobe` cells whose centroids
    * are nearest. The 100 TB shape: one clustering pass (on a sample
    * in production), one narrow (bucket, id, vec) shuffle to build the
    * inverted file, then probes touch nprobe/nlist of the corpus.
    * Approximate by design → rows-only check; spec asserts recall. */
  def simIvfAnn(s: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10,
                nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      // normalize so L2 k-means approximates cosine cells (spherical k-means)
      .withColumn("nv", transform(col("v"), x => x / sqrt(aggregate(col("v"), lit(0.0), (a, y) => a + y * y))))
      .withColumn("fv", array_to_vector(col("nv")))
      .cacheTracked
    val km = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("bucket")
    val model = km.fit(e)
    val assigned = model.transform(e).select(col("vec_id"), col("v"), col("bucket"))
    val centroids = model.clusterCenters.map(_.toArray)
    // per query: the nprobe nearest centroids (tiny driver-side math on
    // the collected query set — the corpus never moves)
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probeRows = queries.flatMap { case (qid, qv) =>
      val qn = l2(qv)
      centroids.zipWithIndex
        .map { case (c, i) => (i, dotp(qv, c) / (qn * l2(c))) }
        .sortBy(-_._2).take(nprobe)
        .map { case (bucket, _) => (qid, qv, bucket) }
    }
    import s.implicits._
    val probes = s.createDataset(probeRows.toSeq).toDF("qid", "qv", "bucket")
    assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cosine"),
        col("rn").cast("long").as("rank"))
      .orderBy("qid", "rank")
  }

  /** ANN top-k via random-hyperplane LSH with radius-2 multi-probe
    * (the query probes its own bucket plus all 1-bit and 2-bit flip
    * neighbors — cheap recall without extra tables). Approximate by
    * design → rows-only check; DedupSimilaritySpec asserts recall vs
    * the exact top-k at test scale. */
  def simLshAnn(s: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10,
                numPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val flips: Seq[Long] =
      (0 until numPlanes).map(i => 1L << i) ++
        (for (i <- 0 until numPlanes; j <- (i + 1) until numPlanes) yield (1L << i) | (1L << j))
    val probes: Seq[Column] = col("bucket") +:
      flips.map(m => col("bucket").bitwiseXOR(lit(m)))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        explode(array(probes: _*)).as("bucket"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", cosine(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cosine"),
        col("rn").cast("long").as("rank"))
      .orderBy("qid", "rank")
  }

  /** Per-vector symmetric int8 quantization (the embedding-storage
    * reduction step): scale = max|x|/127, q = round(x/scale), reported
    * as the scale plus max/mean reconstruction error. Pure map-only
    * higher-order expressions over the 64-dim arrays — no shuffle, no
    * UDF; at 100 TB this is a single scan. */
  def embQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("scale", expr("array_max(transform(v, x -> abs(x))) / 127"))
      .withColumn("errs", expr("transform(v, x -> abs(x - round(x / scale) * scale))"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        round(expr("array_max(errs)"), 6).as("max_err"),
        round(expr("aggregate(errs, cast(0.0 as double), (a, x) -> a + x) / size(errs)"), 6)
          .as("mean_err"))
      .orderBy("vec_id")

  /** Per-label pooled centroid (the class-centroid / cluster-stats
    * primitive): posexplode each vector once, then ONE partial-
    * aggregated shuffle keyed (label, dim) — map-side combine reduces
    * every partition to ≤ |labels|·dim rows regardless of corpus
    * size, so this scales to 100 TB with a constant-size shuffle.
    * Output is scalar (label, i, c, n) rows, driver-comparable. */
  def embCentroids(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"), posexplode(col("embedding")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("i"))
      .agg(round(avg(col("col").cast("double")), 4).as("c"), count(lit(1)).as("n"))
      .orderBy("label", "i")
}

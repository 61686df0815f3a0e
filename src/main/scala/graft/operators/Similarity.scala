package graft.operators

import graft.Tables
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

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact cosine top-k per query vector (queries = vec_id < nQueries).
    * Broadcast-hash on nothing to join — it is a broadcast nested loop
    * over the tiny query side; scoring is a codegen'd higher-order
    * expression; the row_number window shuffles only Q×N score rows. */
  def simBruteforceTopK(s: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    scored
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

  /** Sign-LSH bucket id: one bit per hyperplane (sign of dot product),
    * packed into a long — a pure expression over the vector column. */
  private[operators] def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k via random-hyperplane LSH with multi-probe (the query
    * probes its own bucket plus all 1-bit-flip neighbors). Recall is
    * approximate by design → rows-only check; BruteForceSpec asserts
    * recall ≥ 0.6 against the exact top-k at test scale. */
  def simLshAnn(s: SparkSession, dir: String, nQueries: Int = 5, k: Int = 10,
                numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val probes: Seq[Column] = col("bucket") +:
      (0 until numPlanes).map(i => col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(array(probes: _*)).as("bucket"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("cos"), 4).as("cosine"),
        col("rn").cast("long").as("rank"))
      .orderBy("qid", "rank")
  }
}

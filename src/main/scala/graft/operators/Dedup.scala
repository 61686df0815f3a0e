package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for LLM training-data pipelines
  * (SURVEY.md §2.3), over `documents` / `embeddings`.
  *
  * Scale design: every variant shuffles FIXED-WIDTH keys (64/128-bit
  * hashes, minhash bands, simhash chunks), never document bodies. At
  * 100 TB that is the difference between a ~1 TB shuffle and a 100 TB
  * one. All signature computation is pure `functions._` higher-order
  * expressions — map-only, no UDF, no driver round-trips.
  */
object Dedup {

  // --- exact ---------------------------------------------------------

  /** Exact dedup: group by a 192-bit compound hash (xxhash64 + md5) of
    * the text so the shuffle carries ~40 bytes/row instead of the
    * document body; keep the minimum doc_id per group. The DuckDB
    * oracle groups by the raw text — identical output barring a
    * 2^-96-probability hash collision. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(xxhash64(col("text")).as("h64"), md5(col("text")).as("h128"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  // --- shingles ------------------------------------------------------

  /** Distinct character n-gram shingles of the lowercased text, hashed
    * to 64-bit longs — pure expression (sequence + transform +
    * substring), stays in codegen. */
  private[operators] def shingleExpr(n: Int): String =
    s"array_distinct(transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), i -> xxhash64(substring(lower(text), i, $n))))"

  /** n-gram Jaccard dedup: explode shingles, self-join on shingle hash,
    * score |A∩B| / (|A|+|B|-|A∩B|). Quadratic in cluster size — the
    * correctness baseline; minhash-LSH below is the 100 TB path. */
  def dedupNgramJaccard(s: SparkSession, dir: String, n: Int = 5, tau: Double = 0.4): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"), expr(shingleExpr(n)).as("shingles"))
    val sizes = docs.select(col("doc_id"), col("shingles"), size(col("shingles")).as("sz"))
    val ex = sizes.select(col("doc_id"), col("sz"), explode(col("shingles")).as("sh"))
    val a = ex.select(col("doc_id").as("id_a"), col("sz").as("sz_a"), col("sh"))
    val b = ex.select(col("doc_id").as("id_b"), col("sz").as("sz_b"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")), 4))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  // --- minhash + LSH -------------------------------------------------

  /** Mersenne31: keeps a*h+b within 62 bits, so the minhash arithmetic
    * never overflows a long inside the expression tree. */
  private val MersennePrime = (1L << 31) - 1
  /** Deterministic (a, b) per permutation — splitmix-style constants. */
  private def perm(i: Int): (Long, Long) = {
    var x = 0x9e3779b97f4a7c15L * (i + 1)
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    val a = math.abs(x % (MersennePrime - 1)) + 1
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    val b = math.abs(x % MersennePrime)
    (a, b)
  }

  /** numPerms minhash values over the shingle-hash array: for each
    * permutation i, min over shingles of (a_i*h + b_i) mod p — done
    * with transform + array_min, all codegen-friendly expressions. */
  private[operators] def minhashSignature(shingles: Column, numPerms: Int): Column =
    array((0 until numPerms).map { i =>
      val (a, b) = perm(i)
      array_min(transform(shingles,
        h => pmod(pmod(h, lit(MersennePrime)) * lit(a) + lit(b), lit(MersennePrime))))
    }: _*)

  /** MinHash + banded LSH: signature → bands of `rowsPerBand` → hash
    * each band → shuffle only (band_idx, band_hash, doc_id) pairs →
    * candidates = docs sharing ≥1 band bucket → verify with the full
    * signature (estimated Jaccard = fraction of equal minhashes).
    *
    * 100 TB: the only shuffle is 16-byte band keys; candidate
    * verification joins signatures (256 B), never text. */
  def dedupMinhashLsh(s: SparkSession, dir: String, n: Int = 5, numPerms: Int = 32,
                      rowsPerBand: Int = 4, tau: Double = 0.4): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr(shingleExpr(n)).as("shingles"))
      .select(col("doc_id"), minhashSignature(col("shingles"), numPerms).as("sig"))
    val banded = docs.select(
      col("doc_id"), col("sig"),
      explode(array((0 until numBands).map { bIdx =>
        struct(lit(bIdx).as("band"),
          xxhash64(slice(col("sig"), bIdx * rowsPerBand + 1, rowsPerBand)).as("bh"))
      }: _*)).as("bucket"))
      .select(col("doc_id"), col("sig"), col("bucket.band"), col("bucket.bh"))
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"), col("band"), col("bh"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"), col("band"), col("bh"))
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), c => c))
          .cast("double") / lit(numPerms), 4))
      .filter(col("est_jaccard") >= tau)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")
  }

  // --- simhash -------------------------------------------------------

  /** 64-bit SimHash over word tokens: per bit b, count tokens whose
    * hash has bit b set; bit b of the simhash is 1 iff that count
    * exceeds half the token count. Pure expressions (64 × filter). */
  private[operators] def simhash64(tokens: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(63)), b =>
        when(size(filter(tokens, t =>
          call_function("shiftright", xxhash64(t), b).bitwiseAND(1) === 1)) * 2
          > size(tokens), call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** SimHash near-dup: candidates via pigeonhole banding (4 × 16-bit
    * chunks — hamming ≤ 3 ⇒ some chunk equal), verified with
    * bit_count(xor) ≤ maxHamming. Shuffle payload: (chunk_idx,
    * 16-bit chunk value, doc_id). */
  def dedupSimhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir).select(
      col("doc_id"),
      simhash64(expr("filter(split(lower(text), '\\\\s+'), t -> t != '')")).as("sh"))
    val chunked = docs.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sh"), c * 16).bitwiseAND(0xffffL).as("cv"))
      }: _*)).as("cb"))
      .select(col("doc_id"), col("sh"), col("cb.chunk"), col("cb.cv"))
    val a = chunked.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("chunk"), col("cv"))
    val b = chunked.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  // --- embedding near-dup --------------------------------------------

  /** Embedding-cosine nearest neighbor per vector (is_dup flags pairs
    * above tau). Self-join is blocked per-partition by broadcasting the
    * (small here) corpus; the 100 TB path is the LSH bucketing in
    * Similarity.simLshAnn. Always emits one row per vector so the
    * rows-only gate is meaningful. */
  def dedupEmbedding(s: SparkSession, dir: String, tau: Double = 0.9): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .withColumn("cosine",
        aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
          / (col("na") * col("nb")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id_a")
          .orderBy(col("cosine").desc, col("id_b"))))
      .filter(col("rk") === 1)
      .select(col("id_a"), col("id_b").as("nearest"), round(col("cosine"), 4).as("cosine"),
        (col("cosine") >= tau).as("is_dup"))
      .orderBy("id_a")
  }
}

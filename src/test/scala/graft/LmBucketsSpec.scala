package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** CCNet head/middle/tail buckets (`pipe_lm_buckets`): per-language
  * populations must land near the configured thirds, and the buckets
  * must be score-ordered partitions (head strictly above middle,
  * middle strictly above tail). */
class LmBucketsSpec extends SparkSpec {

  test("per-language bucket populations approximate thirds") {
    val out = TextAnalysis.pipeLmBuckets(spark, Sf).cache()
    try {
      val byLang = out.groupBy("lang").pivot("bucket",
        Seq("head", "middle", "tail")).count().na.fill(0L).collect()
      assert(byLang.nonEmpty)
      byLang.foreach { r =>
        val lang = r.getString(0)
        val h = r.getLong(1); val m = r.getLong(2); val t = r.getLong(3)
        val n = h + m + t
        // interpolated-percentile cuts put each bucket within one doc
        // of n/3 (ties push exact-threshold docs down a bucket)
        val lo = n / 3 - 2; val hi = n / 3 + 2
        Seq("head" -> h, "middle" -> m, "tail" -> t).foreach { case (b, c) =>
          assert(c >= lo && c <= hi, s"$lang/$b: $c not within [$lo,$hi] of n=$n")
        }
      }
    } finally out.unpersist()
  }

  test("buckets are score-ordered partitions per language") {
    val out = TextAnalysis.pipeLmBuckets(spark, Sf).cache()
    try {
      val stats = out.groupBy("lang").agg(
        min(when(col("bucket") === "head", col("lmb_score"))).as("min_h"),
        max(when(col("bucket") === "middle", col("lmb_score"))).as("max_m"),
        min(when(col("bucket") === "middle", col("lmb_score"))).as("min_m"),
        max(when(col("bucket") === "tail", col("lmb_score"))).as("max_t")).collect()
      stats.foreach { r =>
        val lang = r.getString(0)
        if (!r.isNullAt(1) && !r.isNullAt(2))
          assert(r.getDouble(1) > r.getDouble(2), s"$lang: head overlaps middle")
        if (!r.isNullAt(3) && !r.isNullAt(4))
          assert(r.getDouble(3) > r.getDouble(4), s"$lang: middle overlaps tail")
      }
      // docs with < 2 tokens have no bigram score and are absent —
      // same contract as pipe_lm_bigram
      val scored = out.count()
      val eligible = Tables.documents(spark, Sf)
        .filter(size(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')")) >= 2)
        .count()
      assert(scored == eligible)
    } finally out.unpersist()
  }
}

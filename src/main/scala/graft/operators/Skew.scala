package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY.md §4).
  *
  * AQE's runtime skew-join splitting (enabled in graft sessions)
  * covers most cases; explicit salting remains the tool when one side
  * has a FEW dominant keys known to dwarf every partition — e.g. the
  * null/default key of a 100 TB fact table. Salting fans each skewed
  * left row out to one of `saltFactor` sub-keys and replicates the
  * matching right rows across all sub-keys, so a single hot key
  * spreads over `saltFactor` reducers.
  */
object Skew {

  /** Inner equi-join with the left side's `key` salted. `saltFactor`
    * should be ~ the ratio of the hottest key's row count to a healthy
    * partition size. Correctness: every (left, right) key match meets
    * exactly once because the right side is replicated across all
    * salt values. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("__salt", explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Rough skew diagnostic: rows per key for the heaviest keys —
    * feed its output into the saltFactor choice. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc)
      .limit(topN)
}

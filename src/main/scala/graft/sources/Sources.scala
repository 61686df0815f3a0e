package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.8). The reference ingests CDAP
  * StructuredRecords from any pipeline source; the Spark-native
  * equivalents are the built-in DataSource V2 readers, which keep
  * split planning, predicate pushdown and column pruning with Catalyst.
  *
  * CSV/JSON readers require an explicit schema: schema inference
  * means an extra full pass over 100 TB, so it is deliberately not
  * exposed here.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Header-less CSV with an explicit schema (the reference's test
    * corpus format — e.g. trainData.csv). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = false): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines with an explicit schema; corrupt records are routed to
    * `_corrupt_record` (PERMISSIVE) rather than failing the 100 TB job. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** Parquet sink with explicit partition columns — the layout knob
    * that decides downstream scan pruning at scale. */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** ORC read/write — second columnar format, same Catalyst pushdown
    * and pruning path as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Bucketed managed table: rows are hash-bucketed (and sorted) by
    * the join key at write time, so later equi-joins between tables
    * bucketed the same way run WITHOUT a shuffle — the decisive layout
    * choice for repeatedly-joined 100 TB fact tables.
    * BucketingSpec asserts the no-Exchange plan. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), numBuckets)

  /** Multi-column variant: hash-bucketed AND sorted on the same key
    * tuple, so downstream joins/aggregates clustered on those columns
    * read the table with zero Exchange (the bucketed scan's
    * HashPartitioning satisfies their distribution requirement).
    * `mode` "append" adds files in the same bucket layout (the
    * incremental-ingest write path); "overwrite" replaces the table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int,
                    mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}

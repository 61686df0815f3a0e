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

  /** Delete a managed-table directory left behind by a previous JVM:
    * the in-memory catalog forgot the table but saveAsTable refuses to
    * create over the orphaned location. Purely-derived state only. */
  private[graft] def clearOrphanedLocation(s: SparkSession, table: String): Unit = {
    val wh = java.net.URI.create(s.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  /** Compact a bucketed table's accumulated append files. Every append
    * lays down one file per (writing task × bucket), so a
    * daily-ingest table accretes small files until scan planning and
    * footer reads dominate. The rewrite reads the table through its
    * bucketed scan — whose HashPartitioning already satisfies the
    * identically-bucketed write's distribution requirement, so the
    * pass is ZERO-Exchange: each task drains exactly one bucket's
    * accumulated files into one sorted output file (numBuckets files
    * total, asserted in BucketingSpec), a per-bucket map-side file
    * merge that never materializes the table anywhere. The fresh
    * table then swaps in under the original name via the catalog
    * rename, preserving the bucket spec — probe plans stay
    * zero-Exchange and results are byte-identical (both spec'd).
    * Peak extra storage is one copy of the table being compacted;
    * compact per-table (the corpus state pair is two independent
    * tables) to halve that bound. */
  def compactBucketed(s: SparkSession, table: String, bucketCols: Seq[String],
                      numBuckets: Int,
                      transform: DataFrame => DataFrame = identity): Unit = {
    restoreInterruptedCompaction(s, table)
    val tmp = s"${table}_compacting"
    s.sql(s"DROP TABLE IF EXISTS $tmp")
    clearOrphanedLocation(s, tmp)
    // A write does not REQUIRE hash distribution (FileFormatWriter keys
    // output files by bucket id), so the planner's auto-bucketed-scan
    // heuristic would drop the bucket-aligned read and the one-file-
    // per-bucket guarantee with it — each task would emit one file per
    // bucket it happens to hold. Pin the bucketed scan for the rewrite:
    // one task per bucket, one sorted output file per bucket.
    // `transform` lets a caller fold a row filter into the same
    // zero-Exchange pass (tombstone purges) — it must preserve the
    // scan's partitioning (broadcast joins/filters do).
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    // getAll = explicitly-set entries only; getOption would report the
    // default and the restore would pin it, leaking a conf change
    val saved = s.conf.getAll.get(k)
    s.conf.set(k, "false")
    try writeBucketed(transform(s.table(table)), tmp, bucketCols, numBuckets)
    finally saved match {
      case Some(v) => s.conf.set(k, v)
      case None => s.conf.unset(k)
    }
    // Swap via rename-aside, never DROP-then-RENAME: a crash between a
    // drop and the rename-in would leave the live name absent, and the
    // next state-table lookup would silently rebuild from base data —
    // losing every appended shard signature and re-admitting documents
    // the dedup gate had already accepted. With rename-aside, every
    // crash window leaves the data recoverable: before the first rename
    // the live table is untouched; between the renames the old copy
    // survives under `_compacting_old` (restoreInterruptedCompaction
    // renames it back); after the second rename the fresh table is live
    // and only the obsolete copy remains to be dropped.
    val old = s"${table}_compacting_old"
    s.sql(s"DROP TABLE IF EXISTS $old") // stale only if `table` is live (restored above)
    clearOrphanedLocation(s, old)
    s.sql(s"ALTER TABLE $table RENAME TO $old")
    s.sql(s"ALTER TABLE $tmp RENAME TO $table")
    s.sql(s"DROP TABLE $old")
  }

  /** Recovery half of [[compactBucketed]]'s rename-aside swap: if a
    * previous compaction crashed after renaming the live table aside
    * but before renaming the fresh copy in, the only complete copy
    * sits under `<table>_compacting_old`. Rename it back BEFORE any
    * exists-check decides to rebuild the table from scratch (state
    * tables rebuild from base data only — appended shards would be
    * silently lost). Call sites: compactBucketed itself and
    * [[graft.operators.Dedup.corpusStateTables]]'s rebuild gate. */
  private[graft] def restoreInterruptedCompaction(s: SparkSession, table: String): Unit = {
    val old = s"${table}_compacting_old"
    if (!s.catalog.tableExists(table) && s.catalog.tableExists(old))
      s.sql(s"ALTER TABLE $old RENAME TO $table")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the round-17 span-gram-index layout work
  * (dev tool, the ProfileSpan discipline). Two reports:
  *
  *  1. FOOTPRINT — the same corpus indexed in the retired v3 shape
  *     (raw 50-char lowercased window stored per row) and the v4
  *     shape (16-byte md5 digest, pb-partitioned), with on-disk
  *     parquet bytes divided by corpus positions (Σ df over real
  *     rows). This is the measured number behind the README/SURVEY
  *     "bytes per position" claim — not an estimate.
  *
  *  2. PRUNING DECADE — tool-local v4 indexes over sf0.01 and sf0.1
  *     with the partition count SCALED with the corpus (the
  *     production sizing rule: bounded rows per partition), probed
  *     by the SAME single-document arrival. Evidence that probe I/O
  *     is bounded by the batch's gram set, not the index size: the
  *     index grows ~10×, partitions-read and files-read bytes stay
  *     ~flat, so probe cost is sublinear in index size (the
  *     dynamicpruningexpression path PlanSpec asserts, here with
  *     scan metrics at both scales).
  */
object ProfileSpanIndex {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def tableBytes(t: String): Long = {
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t)).location
      val root = java.nio.file.Paths.get(loc.getPath)
      val sum = new java.util.concurrent.atomic.AtomicLong(0L)
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p) &&
            !p.getFileName.toString.startsWith("_")) sum.addAndGet(java.nio.file.Files.size(p))
      }
      sum.get()
    }

    // ---- 1. footprint: v3-style raw-window rows vs v4 digest rows ----
    val sfBig = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = 50
    val corpus = graft.Tables.documents(spark, sfBig)
      .filter(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
    val eligible = corpus.filter(length(col("text")) >= n &&
      length(lower(col("text"))) === length(col("text")))
    // the retired v3 row shape, reproduced here for the measurement
    val v3Rows = eligible
      .select(col("doc_id"), col("text"), posexplode(
        graft.functions.VectorFunctions.ngram_hashes_chars(lower(col("text")), n))
        .as(Seq("p", "g")))
      .select(col("doc_id"), col("g"), col("p"),
        lower(col("text")).substr(col("p") + 1, lit(n)).as("sub"))
      .groupBy("doc_id", "g", "sub")
      .agg(count(lit(1)).as("df"), min(col("p")).cast("long").as("mp"))
    val t3 = "graft_span_profile_v3_style"
    spark.sql(s"DROP TABLE IF EXISTS $t3")
    graft.sources.Sources.clearOrphanedLocation(spark, t3)
    v3Rows.repartition(col("g")).write.format("parquet").saveAsTable(t3)
    val t4 = "graft_span_profile_v4_style"
    Dedup.spanGramIndexCreateEmpty(spark, t4,
      Dedup.spanIndexPartitionsFor(graft.Tables.rowCount(spark, sfBig, "documents")))
    Dedup.spanGramIndexAppend(spark, t4, corpus, n)
    val positions = spark.table(t4).filter(col("df") > 0)
      .agg(sum("df")).collect()(0).getLong(0)
    val (b3, b4) = (tableBytes(t3), tableBytes(t4))
    println(f"""{"metric":"span_index_bytes_per_position","v3_raw_window":${b3.toDouble / positions}%.1f,"v4_digest":${b4.toDouble / positions}%.1f,"positions":$positions,"v3_bytes":$b3,"v4_bytes":$b4,"ratio":${b3.toDouble / b4}%.2f,"sf":"$sfBig"}""")
    // compression-independence check: the v3 on-disk number leans on
    // snappy+dictionary finding structure in overlapping window text
    // (high-entropy corpora compress worse); rewrite both UNCOMPRESSED
    // to report the guaranteed widths
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    val t3u = "graft_span_profile_v3_unc"
    val t4u = "graft_span_profile_v4_unc"
    Seq(t3u, t4u).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    spark.table(t3).repartition(col("g")).write.format("parquet").saveAsTable(t3u)
    spark.table(t4).write.format("parquet").saveAsTable(t4u)
    val (b3u, b4u) = (tableBytes(t3u), tableBytes(t4u))
    println(f"""{"metric":"span_index_bytes_per_position_uncompressed","v3_raw_window":${b3u.toDouble / positions}%.1f,"v4_digest":${b4u.toDouble / positions}%.1f,"ratio":${b3u.toDouble / b4u}%.2f,"sf":"$sfBig"}""")
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    Seq(t3u, t4u).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.sql(s"DROP TABLE IF EXISTS $t3")
    spark.sql(s"DROP TABLE IF EXISTS $t4")

    // ---- 2. pruning decade: same probe, 10× index, scaled P ----
    graft.CacheRegistry.disabled = true // hermetic probe plans, scans visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def decadeRow(dir: String, p: Int): Unit = {
      val t = s"graft_span_profile_decade_p$p"
      Dedup.spanGramIndexCreateEmpty(spark, t, p)
      Dedup.spanGramIndexAppend(spark, t,
        graft.Tables.documents(spark, dir).filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text")), n)
      val idxBytes = tableBytes(t)
      // the SAME single-document arrival at both scales: 100 chars →
      // 51 grams → at most 51 partitions can match
      val tiny = graft.Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
        .orderBy("doc_id").limit(1)
        .select(col("doc_id"), substring(col("text"), 1, 100).as("text"))
      def once(): (Double, Long, Long, Long) = {
        val probe = Dedup.spanDedupIncrementalCore(spark, t, tiny, n)
        val t0 = System.nanoTime()
        probe.collect() // materialize THIS plan so its scan metrics fill
        val dt = (System.nanoTime() - t0) / 1e9
        val scans = probe.queryExecution.executedPlan.collect {
          case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.tableIdentifier.exists(_.table == t) => sc
        }
        // the tool exists to EVIDENCE the pruning — if the scan shape
        // regresses (no scan node found, or DPP gone so the static
        // metrics are absent), report that as the measurement rather
        // than dying on empty.max/missing-key
        require(scans.nonEmpty,
          s"no FileSourceScan of $t in the probe plan — index read shape changed:\n" +
            probe.queryExecution.executedPlan.toString.take(4000))
        def metric(name: String): Long =
          scans.map(_.metrics.get(name).map(_.value).getOrElse(-1L)).max
        (dt, metric("numPartitions"), metric("filesSize"), metric("staticFilesSize"))
      }
      once() // JIT/footer warmup
      val (dt, parts, bytes, stat) = once()
      println(f"""{"metric":"span_index_probe_decade","sf":"$dir","P":$p,"index_bytes":$idxBytes,"probe_sec":$dt%.2f,"partitions_read":$parts,"files_bytes_read":$bytes,"files_bytes_total":$stat}""")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    decadeRow("/root/testdata/sf0.01", 256)
    decadeRow("/root/testdata/sf0.1", 2560)
    spark.stop()
  }
}

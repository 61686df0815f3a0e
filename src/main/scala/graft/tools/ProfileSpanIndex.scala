package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the span-gram-index layout work (dev
  * tool, the ProfileSpan discipline). Three reports:
  *
  *  1. FOOTPRINT — the same corpus indexed in the retired v3 shape
  *     (raw 50-char lowercased window stored per row), the retired
  *     v4 shape (16-byte md5 digest, BIGINT df/mp), and the live v5
  *     shape (digest + INT df/mp, the real builder), with on-disk
  *     parquet bytes divided by corpus positions (Σ df over real
  *     rows). This is the measured number behind the README/SURVEY
  *     "bytes per position" claim — not an estimate. Both compressed
  *     and uncompressed (the raw-window shape leans on snappy finding
  *     structure in overlapping window text; the digest shapes don't).
  *
  *  2. PRUNING DECADE — tool-local v5 indexes over sf0.01 and sf0.1
  *     with the partition count SCALED with the corpus (the
  *     production sizing rule: bounded rows per partition), probed
  *     by the SAME single-document arrival. Evidence that micro-probe
  *     I/O is bounded by the batch's gram set, not the index size:
  *     the index grows ~10×, partitions-read and files-read bytes
  *     stay ~flat (the dynamicpruningexpression path PlanSpec
  *     asserts, here with scan metrics at both scales).
  *
  *  3. PROBE-SIZE CURVE — the regime BETWEEN the measured extremes
  *     (micro-batch DPP vs the full-duplication replica): arrivals of
  *     1 → 4 → 16 → 64 docs and the full doc_id%10 shard against the
  *     same index. The expected shape is the coupon-collector bound —
  *     partitions read ≈ P·(1 − e^(−grams/P)), i.e. probe I/O ∝
  *     min(batch grams, P) × partition size: DPP wins while the gram
  *     set undershoots P and saturates at one full column-pruned
  *     digest scan once a daily-shard-sized arrival covers every
  *     partition (row-group g-min/max skipping cannot engage there
  *     either: gram hashes are uniform over the key space, so every
  *     row group's range intersects any corpus-covering probe set).
  *     The curve turns that sentence into scan-metric numbers at two
  *     index scales.
  *
  * The micro-probe inline `g IN (...)` row-group pushdown
  * ([[graft.operators.Dedup.SpanProbeInlineGramMax]]) is measured in
  * the dedicated [[ProbeRowGroupSkip]] harness instead of here: at
  * sf-scale the span index's partitions are single-row-group (KBs)
  * and the probe's surrounding plan drowns the signal, and local
  * parquet data-page reads bypass both task inputMetrics and Hadoop
  * FS statistics, so the isolated decode-bound harness (wall-clock
  * over hundreds of 128 KiB row groups) is the honest instrument.
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

    // ---- 1. footprint: v3 raw-window vs v4 digest-BIGINT vs v5 digest-INT ----
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
    // the retired v4 row shape (digest, BIGINT df/mp) with its real
    // physical layout (pb-partitioned, sorted by g, sentinels included)
    val pIdx = Dedup.spanIndexPartitionsFor(graft.Tables.rowCount(spark, sfBig, "documents"))
    val v4Rows = eligible
      .select(col("doc_id"), col("text"), posexplode(
        graft.functions.VectorFunctions.ngram_hashes_chars(lower(col("text")), n))
        .as(Seq("p", "g")))
      .select(col("doc_id"), col("g"), col("p"),
        unhex(md5(lower(col("text")).substr(col("p") + 1, lit(n)))).as("sh"))
      .groupBy("doc_id", "g", "sh")
      .agg(count(lit(1)).as("df"), min(col("p")).cast("long").as("mp"))
      .union(corpus.join(eligible.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("g"), unhex(md5(lit(""))).as("sh"),
          lit(0L).as("df"), lit(0L).as("mp")))
      .withColumn("pb", pmod(col("g"), lit(pIdx.toLong)).cast("int"))
    val t4 = "graft_span_profile_v4_style"
    spark.sql(s"DROP TABLE IF EXISTS $t4")
    graft.sources.Sources.clearOrphanedLocation(spark, t4)
    v4Rows.repartition(col("pb")).sortWithinPartitions("pb", "g")
      .write.partitionBy("pb").format("parquet").saveAsTable(t4)
    // the LIVE v5 shape through the real builder (INT df/mp)
    val t5 = "graft_span_profile_v5_style"
    Dedup.spanGramIndexCreateEmpty(spark, t5, pIdx)
    Dedup.spanGramIndexAppend(spark, t5, corpus, n)
    val positions = spark.table(t5).filter(col("df") > 0)
      .agg(sum("df")).collect()(0).getLong(0)
    val (b3, b4, b5) = (tableBytes(t3), tableBytes(t4), tableBytes(t5))
    println(f"""{"metric":"span_index_bytes_per_position","v3_raw_window":${b3.toDouble / positions}%.1f,"v4_digest_bigint":${b4.toDouble / positions}%.1f,"v5_digest_int":${b5.toDouble / positions}%.1f,"positions":$positions,"v3_bytes":$b3,"v4_bytes":$b4,"v5_bytes":$b5,"v3_over_v5":${b3.toDouble / b5}%.2f,"v4_over_v5":${b4.toDouble / b5}%.2f,"sf":"$sfBig"}""")
    // compression-independence check: report the guaranteed widths too
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    val (t3u, t4u, t5u) = ("graft_span_profile_v3_unc", "graft_span_profile_v4_unc",
      "graft_span_profile_v5_unc")
    Seq(t3u, t4u, t5u).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    spark.table(t3).repartition(col("g")).write.format("parquet").saveAsTable(t3u)
    spark.table(t4).write.format("parquet").saveAsTable(t4u)
    spark.table(t5).write.format("parquet").saveAsTable(t5u)
    val (b3u, b4u, b5u) = (tableBytes(t3u), tableBytes(t4u), tableBytes(t5u))
    println(f"""{"metric":"span_index_bytes_per_position_uncompressed","v3_raw_window":${b3u.toDouble / positions}%.1f,"v4_digest_bigint":${b4u.toDouble / positions}%.1f,"v5_digest_int":${b5u.toDouble / positions}%.1f,"v3_over_v5":${b3u.toDouble / b5u}%.2f,"v4_over_v5":${b4u.toDouble / b5u}%.2f,"sf":"$sfBig"}""")
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    Seq(t3u, t4u, t5u, t3, t4, t5).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // ---- 2 + 3. pruning decade and probe-size curve ----
    graft.CacheRegistry.disabled = true // hermetic probe plans, scans visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def probeOnce(t: String, batch: DataFrame): (Double, Long, Long, Long) = {
      // the clock starts BEFORE core construction: the inline-gram
      // pushdown runs a driver-side distinct-gram collect inside the
      // call, and a probe-cost tool that excluded the cost its own
      // feature adds would be lying (review catch, r18)
      val t0 = System.nanoTime()
      val probe = Dedup.spanDedupIncrementalCore(spark, t, batch, n)
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
    def scaleRows(dir: String, p: Int): Unit = {
      val t = s"graft_span_profile_decade_p$p"
      Dedup.spanGramIndexCreateEmpty(spark, t, p)
      Dedup.spanGramIndexAppend(spark, t,
        graft.Tables.documents(spark, dir).filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text")), n)
      val idxBytes = tableBytes(t)
      val shard = graft.Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
        .orderBy("doc_id")
      // decade row — the SAME single-document arrival at both scales:
      // 100 chars → 51 grams → at most 51 partitions can match
      val tiny = shard.limit(1)
        .select(col("doc_id"), substring(col("text"), 1, 100).as("text"))
      probeOnce(t, tiny) // JIT/footer warmup
      val (dt, parts, bytes, stat) = probeOnce(t, tiny)
      println(f"""{"metric":"span_index_probe_decade","sf":"$dir","P":$p,"index_bytes":$idxBytes,"probe_sec":$dt%.2f,"partitions_read":$parts,"files_bytes_read":$bytes,"files_bytes_total":$stat}""")
      // probe-size curve: micro → daily shard (full-text arrivals)
      val shardN = shard.count().toInt
      for (nb <- Seq(1, 4, 16, 64, shardN).distinct.filter(_ <= shardN)) {
        val batch = shard.limit(nb).select(col("doc_id"), col("text"))
        val grams = batch
          .filter(length(col("text")) >= n &&
            length(lower(col("text"))) === length(col("text")))
          .select(explode(graft.functions.VectorFunctions.ngram_hashes_chars(
            lower(col("text")), n)).as("g"))
          .agg(countDistinct(col("g"))).collect()(0).getLong(0)
        val (cdt, cparts, cbytes, _) = probeOnce(t, batch)
        // coupon-collector expectation for partitions hit by a
        // uniform gram set (the documented cost formula)
        val expParts = (p * (1 - math.exp(-grams.toDouble / p))).round
        println(f"""{"metric":"span_index_probe_curve","sf":"$dir","P":$p,"batch_docs":$nb,"batch_grams":$grams,"partitions_read":$cparts,"partitions_expected":$expParts,"files_bytes_read":$cbytes,"index_bytes":$idxBytes,"probe_sec":$cdt%.2f}""")
      }
      // ---- probe AFTER FORGET: the forget rewrite touches every
      // partition (TRUNCATE + re-insert through the stage table), so
      // this is where the pruning economics could silently erode —
      // the rewrite must preserve the pb directory layout (DPP
      // partitions-read unchanged for the same gram set) and keep
      // per-partition bytes ∝ surviving rows. ~1/7 of indexed docs
      // forgotten, then the SAME single-document micro probe re-run.
      val victims = graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 10 =!= 0)
        .filter(pmod(col("doc_id"), lit(7L)) === 1L).select("doc_id")
      Dedup.spanGramIndexForget(spark, t, victims)
      val postBytes = tableBytes(t)
      // first probe after the rewrite pays a one-time P-directory
      // re-list (TRUNCATE + insertInto invalidates the file-status
      // cache); the second shows the steady-state wall — report both
      // so the cost is attributed, not mistaken for a pruning loss
      val (fdt, fparts, fbytes, _) = probeOnce(t, tiny)
      val (fdt2, _, _, _) = probeOnce(t, tiny)
      println(f"""{"metric":"span_index_probe_after_forget","sf":"$dir","P":$p,"partitions_read_before":$parts,"partitions_read_after":$fparts,"files_bytes_read_before":$bytes,"files_bytes_read_after":$fbytes,"index_bytes_before":$idxBytes,"index_bytes_after":$postBytes,"probe_sec_before":$dt%.2f,"probe_sec_after_relist":$fdt%.2f,"probe_sec_after_warm":$fdt2%.2f}""")
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
    scaleRows("/root/testdata/sf0.01", 256)
    scaleRows("/root/testdata/sf0.1", 2560)

    spark.stop()
  }
}

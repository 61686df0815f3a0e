package graft.tools

import graft.Tables
import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming throughput probe (not part of the library surface):
  * drives a §2.6 streaming transform through a real rate-limited FILE
  * source at a full scale factor and reports rows/sec — evidence the
  * streaming paths handle volume, not just the MemoryStream semantics
  * the specs pin.
  *
  * Modes (first CLI arg, default `dedup`):
  *   - `dedup`      — the watermarked `dropDuplicates` twin of
  *                    `dedup_exact`; state is the watermark-bounded
  *                    set of seen event_ids.
  *   - `sessionize` — the `flatMapGroupsWithState` gap sessionizer
  *                    (30 min gap); state is O(active users), the
  *                    typed-state hot path.
  *   - `stats`      — the `transformWithState` running per-user stats
  *                    processor on the RocksDB state store provider.
  *
  * The events table is staged as a multi-file parquet directory;
  * `maxFilesPerTrigger` paces micro-batches the way a production
  * object-store listing would.
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("dedup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // transformWithState requires the RocksDB provider (multi-column-
    // family state); the default HDFS-backed provider can't host it.
    if (mode == "stats")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val events = Tables.events(spark, sfDir)
    val nRows = events.count()
    val src = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    events.repartition(16).write.mode("overwrite").parquet(src)
    val staged = spark.read.parquet(src)

    val stream = spark.readStream
      .schema(staged.schema)
      .option("maxFilesPerTrigger", sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "2"))
      .parquet(src)
    val typed = stream
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.Event]
    val (metric, out, outputMode) = mode match {
      case "dedup" =>
        ("stream_dedup_rows_per_sec",
          stream.withWatermark("ts", "1 day").dropDuplicates("event_id"),
          "append")
      case "sessionize" =>
        ("stream_sessionize_rows_per_sec",
          EventStream.sessionize(typed, gapMs = 30L * 60 * 1000).toDF(),
          "append")
      case "stats" =>
        ("stream_user_stats_rows_per_sec",
          EventStream.runningUserStats(typed).toDF(),
          "update")
      case other => sys.error(s"unknown mode: $other (dedup|sessionize|stats)")
    }
    val query = out.writeStream
      .format("noop")
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .start()
    val t0 = System.nanoTime()
    query.processAllAvailable()
    val dt = (System.nanoTime() - t0) / 1e9
    val total = query.recentProgress.map(_.numInputRows).sum
    query.stop()
    spark.stop()
    println(f"""{"metric":"$metric%s","value":${nRows / dt}%.0f,"rows":$nRows,"input_rows":$total,"sec":$dt%.2f,"sf":"$sfDir"}""")
  }
}

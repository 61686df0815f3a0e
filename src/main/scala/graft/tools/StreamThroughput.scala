package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Streaming-dedup throughput probe (not part of the library surface):
  * drives the §2.6 watermarked `dropDuplicates` twin of `dedup_exact`
  * through a real rate-limited FILE source at a full scale factor and
  * reports rows/sec — evidence the streaming path handles volume, not
  * just the MemoryStream semantics the specs pin.
  *
  * The events table is staged as a multi-file parquet directory;
  * `maxFilesPerTrigger` paces micro-batches the way a production
  * object-store listing would. State is the watermark-bounded set of
  * seen event_ids — O(ids within the watermark), evicted as event time
  * advances, the only state shape that survives an unbounded stream.
  */
object StreamThroughput {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, sfDir)
    val nRows = events.count()
    val src = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    events.repartition(16).write.mode("overwrite").parquet(src)
    val staged = spark.read.parquet(src)

    val deduped = spark.readStream
      .schema(staged.schema)
      .option("maxFilesPerTrigger", sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "2"))
      .parquet(src)
      .withWatermark("ts", "1 day")
      .dropDuplicates("event_id")
    val query = deduped.writeStream
      .format("noop")
      .option("checkpointLocation", ckpt)
      .start()
    val t0 = System.nanoTime()
    query.processAllAvailable()
    val dt = (System.nanoTime() - t0) / 1e9
    val total = query.recentProgress.map(_.numInputRows).sum
    query.stop()
    spark.stop()
    println(f"""{"metric":"stream_dedup_rows_per_sec","value":${nRows / dt}%.0f,"rows":$nRows,"input_rows":$total,"sec":$dt%.2f,"sf":"$sfDir"}""")
  }
}

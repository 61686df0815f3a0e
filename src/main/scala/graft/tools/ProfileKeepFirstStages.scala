package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Stage-level attribution for the keep-first replica band (dev
  * tool, the r17 verdict's optional #8): runs `spanDedupKeepFirstCore`
  * and the remove-all twin on the same dir and prints per-stage
  * executor time + shuffle bytes with the stage's callsite, so the
  * keep-first premium (windowed per-sh confirmation + keeper argmin +
  * boundary sweep vs remove-all's groupBy confirmation) is attributed
  * to named stages instead of guessed at. Usage:
  * `runMain graft.tools.ProfileKeepFirstStages [dir]`. */
object ProfileKeepFirstStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val capture = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (capture.get) {
          val i = e.stageInfo
          val m = i.taskMetrics
          rows.add(f"${m.executorRunTime / 1000.0}%8.2f s  " +
            f"shufW ${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB  " +
            f"shufR ${m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead}%.0f B  " +
            s"tasks ${i.numTasks}  ${i.name.takeWhile(_ != '\n').take(90)}")
        }
    })
    def docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").format("noop").save() // warm
      graft.CacheRegistry.releaseAll(blocking = true)
      // the listener bus is async: drain warm-run stage events before
      // arming capture, and drain the timed run's tail before
      // disarming — otherwise stages bleed across runs or drop from
      // the attribution this tool exists to produce
      Thread.sleep(800)
      rows.clear(); capture.set(true)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      capture.set(false)
      graft.CacheRegistry.releaseAll(blocking = true)
      println(f"==== $label%s: $dt%.2f s wall ====")
      rows.forEach(r => println(r))
    }
    run("remove-all", graft.operators.Dedup.spanDedupCore(docs, 50))
    run("keep-first", graft.operators.Dedup.spanDedupKeepFirstCore(docs, 50))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round SERVING-HEALTH dashboard — materializes the segment
  * serving rows ([[graft.operators.Similarity.segmentServeRecallRow]],
  * [[graft.operators.Similarity.graphArtifactHealthRow]],
  * [[graft.operators.Similarity.seedArtifactHealthRow]]) into one
  * committed JSON artifact (`dashboard_out.json`, the
  * README-throughput-table discipline): the rows existed and were
  * spec-driven since round 16, but nothing RECORDED them per round,
  * so a staleness/recall drift between rounds would only surface if
  * a spec happened to cross it. Run at the oracle SF per round and
  * commit; a diff in `recall`, `stale`, or `filter_leak` between two
  * rounds' artifacts is the drift alarm.
  *
  * Usage: `runMain graft.tools.Dashboard [sfDir] [outFile]`. */
object Dashboard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("dashboard_out.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val lang = "en"
    def oneRowJson(df: org.apache.spark.sql.DataFrame): String = {
      val rows = df.toJSON.collect()
      require(rows.length == 1,
        s"dashboard row builder returned ${rows.length} rows (expected 1) — " +
          s"is '$sfDir' missing the '$lang' segment?")
      rows(0)
    }
    // sfDir is interpolated into the artifact — escape rather than
    // trust the argument (a quote would poison the committed JSON)
    def jstr(v: String): String =
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // per-segment serving recall vs the exact in-segment brute force
    val recall = oneRowJson(Similarity.segmentServeRecallRow(spark, sfDir, lang))
    graft.CacheRegistry.releaseAll(blocking = true)
    // coverage health of the SAME segment graph the recall row served
    val members = Similarity.segmentMembers(spark, sfDir, lang)
    val segTable = Similarity.knnGraphSegmentTableFor(spark, sfDir, lang, members)
    val health = oneRowJson(Similarity.graphArtifactHealthRow(spark, segTable,
      members.select("vec_id")))
    graft.CacheRegistry.releaseAll(blocking = true)
    // seed-artifact health for the corpus seed table (plane pinning,
    // occupancy, sample size — the pre-recall-cliff alarms)
    val seedTable = Similarity.lshSeedTable(spark, sfDir)
    val seed = oneRowJson(Similarity.seedArtifactHealthRow(spark, seedTable,
      graft.Tables.embeddings(spark, sfDir)))
    graft.CacheRegistry.releaseAll(blocking = true)
    val json =
      s"""{"metric":"serving_dashboard","sf":${jstr(sfDir)},"segment":${jstr(lang)},
         |"segment_serve_recall":$recall,
         |"graph_artifact_health":$health,
         |"seed_artifact_health":$seed}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

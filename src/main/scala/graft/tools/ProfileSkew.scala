package graft.tools

import graft.Tables
import graft.operators.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement (dev tool, backs SURVEY.md §4 claims).
  *
  * Builds a deliberately skewed fact from sf0.1 lineitem — 99% of
  * rows collapse onto one join key — joins it to a synthetic dim, and
  * times three plans end-to-end (noop sink, min of 2 after warmup):
  *
  *   1. baseline: AQE skew-join splitting OFF, plain join
  *   2. aqe:      AQE skew-join splitting ON, plain join
  *   3. salted:   AQE off, Skew.saltedJoin
  *
  * Prints one line per variant plus the speedup margins; README
  * records the numbers.
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // keep the hot key from being broadcast away: the dim is sized
      // over the broadcast threshold by replication below
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Skewed fact: lineitem replicated 16x (~9.6M rows at sf0.1), 99%
    // of rows collapsing onto key 0, the rest spread over 10k keys —
    // the hot key's partition alone is ~3000x a balanced one. Dim: one
    // row per key with a payload.
    // materialized to parquet so the timed runs measure the join, not
    // the replication scan
    val factPath = "/tmp/graft_skew_fact"
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        explode(sequence(lit(0), lit(15))).as("rep"))
      .select(when(pmod(col("l_orderkey") + col("rep"), lit(100)) < 99, lit(0L))
        .otherwise(pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), col("rep")), lit(10000L)))
        .as("k"), col("l_extendedprice"))
      // 32 files: AQE's skew split subdivides a hot reduce partition
      // BY MAPPER RANGES — from a single-file scan (one mapper) there
      // is nothing to split and the rule silently no-ops. Real 100 TB
      // inputs have thousands of files; mirror that here.
      .repartition(32)
      .write.mode("overwrite").parquet(factPath)
    val fact = spark.read.parquet(factPath)
    val dim = spark.range(10000).select(col("id").as("k"),
      (col("id") * 7 % 1000).as("payload"))

    def time(label: String)(f: => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val dt = Seq.fill(2)(once()).min
      println(f"[skew] $label%-8s ${dt}%.2f s")
      dt
    }

    // Sink the join output itself (no post-aggregate): the measured
    // stage is the skewed shuffle join, end to end.
    def joined(): DataFrame = fact.join(dim, "k")
      .select(col("k"), (col("l_extendedprice") * col("payload")).as("v"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val base = time("baseline")(joined())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // AQE splits skewed partitions only when they dwarf the median:
    // lower the factor so the synthetic 90%-key qualifies at sf0.1
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val aqe = time("aqe")(joined())
    val planDf = joined()
    // materialize THIS QueryExecution (a write would plan its own) so
    // executedPlan shows the AQE final plan
    planDf.queryExecution.toRdd.foreachPartition(_ => ())
    planDf.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("skew"))
      .take(4).foreach(l => println("[skew] plan: " + l.trim.take(140)))
    // restore the AQE tuning the aqe phase set, so the salted run is
    // measured under the SAME config as the baseline — otherwise the
    // 2MB advisory partition size (not salting) changes parallelism
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
    val salted = time("salted")(Skew.saltedJoin(fact, dim, "k", saltFactor = 32)
      .select(col("k"), (col("l_extendedprice") * col("payload")).as("v")))

    println(f"[skew] margins: aqe ${base / aqe}%.2fx, salted ${base / salted}%.2fx vs unsalted baseline")
    spark.stop()
  }
}

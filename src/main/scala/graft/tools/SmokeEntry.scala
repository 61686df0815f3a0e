package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: `SparkEntry.entry` must
  * return rows. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"ENTRY ROWS = ${rows.length}")
    rows.foreach(r => println(s"ENTRY: $r"))
    spark.stop()
    assert(rows.nonEmpty, "entry() returned no rows")
  }
}

package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Prints, per SF dir, whether the PQ-served top-k equals the
  * float-served [[Similarity.simIvfAnn]] output after exact re-rank,
  * and the pre-rerank approx recall@k that sizes the over-fetch
  * margin — margin telemetry for sim_ivf_pq, not a library surface. */
object ProbePqMargin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rerank = args.headOption.map(_.toInt).getOrElse(8)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = Similarity.simIvfAnn(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      val pq = Similarity.simIvfPq(spark, dir, rerank = rerank)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      val truth = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val approx = Similarity.simIvfPq(spark, dir, rerank = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recalls = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      val mean = recalls.sum / recalls.size
      println(f"[pq] $sf: rerank-equal=${pq == exact} preRerankRecall=$mean%.3f " +
        s"diverging=${pq.diff(exact).size}")
    }
    spark.stop()
  }
}

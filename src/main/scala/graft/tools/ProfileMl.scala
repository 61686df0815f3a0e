package graft.tools
import graft.Tables
import graft.ml.{DecisionTree, FeatureSpec}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileMl {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ml] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_extendedprice")
    li.count() // warm scan
    val spec = FeatureSpec(include = Some(Seq("l_quantity", "l_discount", "l_tax")), labelField = "l_extendedprice")
    (1 to 2).foreach { round =>
      println(s"[ml] --- round $round ---")
      val mp = java.nio.file.Files.createTempDirectory("prof").toString
      val model = time("fit")(DecisionTree.train(li, spec, mp))
      val reloaded = time("save+load")(DecisionTree.load(spark, mp))
      val scored = DecisionTree.predict(li, reloaded, spec.copy(labelField = "unused"), "p")
      time("score+rmse")(scored.agg(sqrt(avg(pow(col("p") - col("l_extendedprice"), 2)))).collect())
      time("score+sort+noop")(scored.select("l_orderkey", "l_linenumber", "p")
        .orderBy("l_orderkey", "l_linenumber").write.mode("overwrite").format("noop").save())
      for (np <- Seq(4, 8, 16)) {
        val mp2 = java.nio.file.Files.createTempDirectory("prof").toString
        time(s"fit(repartition $np)")(
          DecisionTree.train(li.repartition(np), spec, mp2))
      }
    }
    spark.stop()
  }
}

package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {

  test("cosine_similarity matches a naive Scala computation") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 0.0)),
      (Array(1.0, 1.0), Array(1.0, 1.0)),
      (Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine_similarity(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    def naive(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val dn = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (dn == 0) 0.0 else d / dn
    }
    assert(math.abs(got(0) - naive(Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 0.0))) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(got(2) == 0.0) // zero vector → 0, not NaN
  }

  test("cosine_similarity is registered for SQL and null-safe") {
    VectorFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").collect().head
    assert(row.getDouble(0) == 1.0)
    assert(row.isNullAt(1))
  }

  test("cosine_similarity participates in whole-stage codegen over a real scan") {
    val df = Tables.embeddings(spark, Sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .select(VectorFunctions.cosine_similarity(col("v"), col("v")).as("c"))
    val got = df.collect()
    assert(got.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"fell out of codegen:\n$plan")
  }
}

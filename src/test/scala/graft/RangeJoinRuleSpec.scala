package graft

import graft.plans.BinnedRangeJoinRule
import org.apache.spark.sql.functions._

/** The optimizer rule must flip a literal-band BETWEEN join from
  * BroadcastNestedLoopJoin to a hash join without changing results. */
class RangeJoinRuleSpec extends SparkSpec {

  private def bandJoin() = {
    import spark.implicits._
    val bands = Seq((1L, 1.0, 9.0), (2L, 10.0, 24.0), (3L, 25.0, 39.0), (4L, 40.0, 50.0))
      .toDF("band_id", "lo", "hi")
    Tables.lineitem(spark, Sf).select("l_quantity", "l_extendedprice")
      .join(bands, col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("band_id")
  }

  test("BinnedRangeJoinRule turns the NL range join into a hash join, same results") {
    val naive = bandJoin().collect()
    val naivePlan = bandJoin().queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should be a nested-loop plan:\n$naivePlan")

    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try {
      val rewritten = bandJoin()
      val rows = rewritten.collect()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
        s"no hash join after rewrite:\n$plan")
      assert(rows.toSeq == naive.toSeq)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule bails on reversed bands and survives NaN fact values") {
    import spark.implicits._
    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try {
      // reversed band (typo'd lo > hi): rewrite must bail, result = naive
      val reversed = Seq((1L, 1.0, 9.0), (2L, 1e9, 0.0)).toDF("band_id", "lo", "hi")
      val facts = Seq(1.0, 5.0, Double.NaN, 42.0).toDF("v")
      val q = facts.join(reversed, col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy("band_id").agg(count(lit(1)).as("cnt"))
      assert(q.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))

      // well-formed bands + NaN/extreme fact values: rewrite fires and
      // must not throw under ANSI (NaN is mapped to a sentinel bin)
      val bands = Seq((1L, 1.0, 9.0), (2L, 10.0, 20.0)).toDF("band_id", "lo", "hi")
      val hardFacts = Seq(1.0, 15.0, Double.NaN, Double.PositiveInfinity, -1e308, 1e308)
        .toDF("v")
      val q2 = hardFacts.join(bands, col("v") >= col("lo") && col("v") <= col("hi"))
        .groupBy("band_id").agg(count(lit(1)).as("cnt")).orderBy("band_id")
      val plan2 = { q2.collect(); q2.queryExecution.executedPlan.toString }
      assert(!plan2.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan2")
      assert(q2.collect().toSeq.map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((1L, 1L), (2L, 1L)))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-literal band tables untouched") {
    spark.experimental.extraOptimizations = Seq(BinnedRangeJoinRule)
    try {
      // band table derived from a parquet scan — no LocalRelation, no
      // plan-time bounds, rule must bail
      val bands = Tables.part(spark, Sf)
        .select(col("p_partkey").as("band_id"),
          (col("p_partkey") % 10).cast("double").as("lo"),
          (col("p_partkey") % 10 + 5.0).cast("double").as("hi"))
        .limit(4)
      val q = Tables.lineitem(spark, Sf).select("l_quantity")
        .join(bands, col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), s"rule fired where it must not:\n$plan")
    } finally spark.experimental.extraOptimizations = Nil
  }
}

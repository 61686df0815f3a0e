package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Proof of the co-located-join layout: two tables bucketed on the
  * join key join with zero Exchange operators in the plan. */
class BucketingSpec extends SparkSpec {

  test("equi-join of co-bucketed tables plans without a shuffle") {
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_totalprice")
    val l = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Sources.writeBucketed(o, "graft_orders_b", "o_orderkey", 8)
    Sources.writeBucketed(l, "graft_lineitem_b", "o_orderkey", 8)

    val joined = spark.table("graft_orders_b")
      .join(spark.table("graft_lineitem_b"), "o_orderkey")
      .groupBy()
      .agg(round(sum(col("o_totalprice") * col("l_quantity")), 2).as("weighted"))
    // disable broadcast so the join strategy itself is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}

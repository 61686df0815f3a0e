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

  test("persisted corpus probe: bucketed scan + broadcast semi-join + distinct, zero shuffle") {
    import graft.operators.Dedup
    val (bandsT, _) = Dedup.corpusStateTables(spark, Sf)
    val bandKeys = Dedup.bandKeyCols(4)
    val keyCols = bandKeys.map(org.apache.spark.sql.functions.col)
    val shardKeys = spark.table(bandsT).select(keyCols: _*).limit(50).distinct()
      .collect() // freeze a small key set so the probe plan is self-contained
    val keysDf = spark.createDataFrame(
      spark.sparkContext.parallelize(shardKeys.toSeq, 1),
      spark.table(bandsT).select(keyCols: _*).schema)
    val probe = Dedup.probeCorpusKeys(spark, bandsT, keysDf, bandKeys)
    assert(probe.count() > 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), s"probe does not read the bucketed table:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"shard keys not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus probe shuffles — bucketing not satisfying the distinct:\n$plan")
  }

  test("appendShardToCorpus closes the ingest loop: re-probed shard is all flagged dup") {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    // distinct params from other tests → a private pair of state tables
    val shardMod = 7L
    val before = Dedup.dedupIncrementalPersisted(spark, Sf, shardMod = shardMod).collect()
    assert(before.nonEmpty)
    val shardIds = Tables.documents(spark, Sf)
      .filter(col("doc_id") % shardMod === 0).select("doc_id")
    Dedup.appendShardToCorpus(spark, Sf, shardIds, shardMod = shardMod)
    // after ingesting the shard into the corpus state, every shard doc
    // collides with itself: exact_dup and near_dup all true
    val after = Dedup.dedupIncrementalPersisted(spark, Sf, shardMod = shardMod).collect()
    assert(after.length == before.length)
    after.foreach { r =>
      assert(r.getAs[Boolean]("exact_dup"), s"doc ${r.get(0)} not exact after append")
      assert(r.getAs[Boolean]("near_dup"), s"doc ${r.get(0)} not near after append")
    }
  }

  test("dedup_incremental_persisted matches the recompute formulation row-for-row") {
    import graft.operators.Dedup
    val persisted = Dedup.dedupIncrementalPersisted(spark, Sf).collect()
    val recomputed = Dedup.dedupIncremental(spark, Sf).collect()
    assert(persisted.length == recomputed.length)
    persisted.zip(recomputed).foreach { case (p, r) => assert(p == r, s"$p != $r") }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val base = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    // fact partitioned on pkey (10 directories)
    Sources.writeParquet(
      Tables.orders(spark, Sf).withColumn("pkey", pmod(col("o_custkey"), lit(10))),
      s"$base/fact", partitionBy = Seq("pkey"))
    // dim: (pkey, grp) — the selective filter is on grp, NOT pkey, so
    // static pruning can't apply and the pkey set is only known at run
    // time, exactly the 100 TB star-join shape DPP exists for.
    Sources.writeParquet(
      spark.range(10).select(col("id").as("pkey"), (col("id") % 5).as("grp")),
      s"$base/dim")
    val fact = Sources.parquet(spark, s"$base/fact")
    val dim = Sources.parquet(spark, s"$base/dim").filter(col("grp") === 0)
    val joined = fact.join(dim, "pkey").groupBy()
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a runtime partition-pruning subquery in the fact scan:\n$plan")
  }
}

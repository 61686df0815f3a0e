package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("q1_agg groups on the 6 returnflag×linestatus combinations") {
    val rows = Relational.q1Agg(spark, Sf).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
    // counts sum to table size
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == Tables.lineitem(spark, Sf).count())
  }

  test("q3_join_agg returns at most 10 rows ordered by revenue desc") {
    val rows = Relational.q3JoinAgg(spark, Sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q7_window running sum is monotone within a partition") {
    val rows = Relational.q7Window(spark, Sf).collect()
    rows.groupBy(_.getAs[Long]("l_suppkey")).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_.getAs[Long]("rn"))
      val running = sorted.map(_.getAs[Double]("running"))
      assert(running.zip(running.tail).forall { case (a, b) => b >= a })
    }
  }

  test("q8_topk equals a full sort-take") {
    val topk = Relational.q8TopK(spark, Sf).collect().map(_.getAs[Long]("o_orderkey"))
    val full = Tables.orders(spark, Sf)
      .collect()
      .sortBy(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
      .take(100).map(_.getAs[Long]("o_orderkey"))
    assert(topk.sameElements(full))
  }

  test("q10_rollup contains the grand-total row") {
    val rows = Relational.q10Rollup(spark, Sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("cnt") == Tables.orders(spark, Sf).count())
  }
}

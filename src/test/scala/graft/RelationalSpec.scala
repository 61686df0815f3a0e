package graft

import graft.operators.Relational

case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)

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

  test("q26_asof_join matches a naive latest-click-before-purchase scan") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
    val clicksByUser = ev.filter(_.getAs[String]("event_type") == "click")
      .groupBy(_.getAs[Long]("user_id"))
    val expected = ev.filter(_.getAs[String]("event_type") == "purchase").flatMap { p =>
      clicksByUser.getOrElse(p.getAs[Long]("user_id"), Array.empty)
        .filter(_.getAs[Long]("us") <= p.getAs[Long]("us"))
        .sortBy(c => (c.getAs[Long]("us"), c.getAs[Long]("event_id")))
        .lastOption
        .map(c => p.getAs[Long]("event_id") ->
          (p.getAs[Long]("us") - c.getAs[Long]("us")) / 1000000L)
    }.toMap
    val got = Relational.q26AsofJoin(spark, Sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("gap_s")).toMap
    assert(got == expected)
  }

  test("q27_range_join equals the plain BETWEEN join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bands = Seq((1L, 1.0, 9.0), (2L, 10.0, 24.0), (3L, 25.0, 39.0), (4L, 40.0, 50.0))
      .toDF("band_id", "lo", "hi")
    val naive = Tables.lineitem(spark, Sf)
      .join(bands, col("l_quantity").between(col("lo"), col("hi")))
      .groupBy("band_id")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("band_id").collect()
    val got = Relational.q27RangeJoin(spark, Sf).collect()
    assert(got.toSeq == naive.toSeq)
  }

  test("typed Dataset API: case-class encoder round-trip agrees with the DataFrame path") {
    import spark.implicits._
    val ds = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[OrderRow]
    val typed = ds.filter(_.o_totalprice > 300000.0).map(_.o_custkey).distinct().count()
    val untyped = Tables.orders(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000.0)
      .select("o_custkey").distinct().count()
    assert(typed == untyped && typed > 0)
  }

  test("TopK aggregator matches sort-take under arbitrary reduce/merge order") {
    import graft.functions.TopKAgg
    val rnd = new scala.util.Random(7)
    val agg = new TopKAgg.TopK(5)
    val entries = Seq.fill(200)(TopKAgg.Entry(rnd.nextInt(50).toDouble, rnd.nextLong().abs))
    val (l, r) = entries.splitAt(120)
    val b = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val expected = entries.sortBy(e => (-e.score, e.id)).take(5)
    assert(agg.finish(b) == expected)
  }

  test("q49_time_rolling matches a naive per-user scan on the trailing 7-day frame") {
    val rows = operators.Relational.q49TimeRolling(spark, Sf).collect()
    val events = Tables.events(spark, Sf)
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime / 1000, r.getDouble(3)))
    val byUser = events.groupBy(_._2)
    rows.foreach { r =>
      val (id, uid) = (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"))
      val me = events.find(_._1 == id).get
      val frame = byUser(uid).filter(e => e._3 >= me._3 - 604800 && e._3 <= me._3)
      assert(r.getAs[Long]("trail7d_events") == frame.length, s"event $id count")
      assert(math.abs(r.getAs[Double]("trail7d_value") -
        BigDecimal(frame.map(_._4).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6,
        s"event $id sum")
    }
  }

  test("q28_sessionize: session count and totals match a naive per-user walk") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
    val gapUs = 30L * 60 * 1000000
    var expectedSessions = 0L
    var expectedEvents = 0L
    ev.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ts = rows.map(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id"))).sorted
      expectedEvents += ts.length
      val t = ts.map(_._1)
      expectedSessions += 1L + t.zip(t.drop(1)).count { case (a, b) => b - a > gapUs }
    }
    val got = Relational.q28Sessionize(spark, Sf).collect()
    assert(got.length == expectedSessions)
    assert(got.map(_.getAs[Long]("n_events")).sum == expectedEvents)
    // every session's duration is consistent with its event count
    assert(got.forall(r => r.getAs[Long]("n_events") >= 1 && r.getAs[Long]("duration_us") >= 0))
  }

  test("q17_percentile distributed rank equals the percentile aggregate, without its unbounded buffer") {
    import org.apache.spark.sql.functions._
    val expected = Tables.lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95_price"))
      .orderBy("l_returnflag").collect()
    val df = Relational.q17Percentile(spark, Sf)
    val got = df.collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getAs[String]("l_returnflag") == e.getAs[String]("l_returnflag"))
      for (c <- Seq("p50_qty", "p25_price", "p95_price"))
        assert(math.abs(g.getAs[Double](c) - e.getAs[Double](c)) < 1e-9, s"$c differs")
    }
    // scale shape: no Percentile aggregate (per-group value buffer) in
    // the plan; ranks come from range partitioning + bounded windows
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), s"percentile aggregate planned:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"no range partitioning:\n$plan")
    CacheRegistry.releaseAll() // exactPercentiles persists its ranked frame
  }
}

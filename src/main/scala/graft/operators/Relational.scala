package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.2), declared with the
  * DataFrame API so Catalyst owns physical planning.
  *
  * Scale notes (100 TB / 1000 executors):
  *  - every aggregate here gets map-side partial aggregation for free;
  *  - dimension tables (region, nation, supplier, part, and customer at
  *    small SF) are joined with an explicit `broadcast()` hint so the
  *    fact side never shuffles for them;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE
  *    (enabled in the session) splits skewed partitions at runtime;
  *  - all doubles surfaced to the correctness oracle are rounded so the
  *    DuckDB comparison is insensitive to summation order.
  */
object Relational {

  /** TPC-H Q1 shape: multi-key aggregate with 8 aggregates. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2)
          .as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6 shape: selective scan; filters reach the parquet reader
    * as PushedFilters (asserted in PlanSpec). */
  def q2Filter(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 25)
      .agg(
        round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("cnt"))

  /** TPC-H Q3 shape: 3-way join, agg, deterministic top-10.
    * customer is broadcast (small per-segment dim side); orders ⋈
    * lineitem is the one genuine shuffle. */
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-01-01"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1996-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Small-dim star join: region ⋈ nation ⋈ customer, both dims broadcast. */
  def q4BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("r_name", "n_name")

  /** EXISTS via left-semi join (no row multiplication, early-out probe). */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir).filter(col("l_quantity") >= 48),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** NOT EXISTS via left-anti join (customers with no urgent order —
    * non-degenerate at every SF). */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")

  /** Partitioned window: row_number + running sum, deterministic order
    * key (shipdate, orderkey, linenumber is unique). One shuffle on
    * l_suppkey; the per-partition sort feeds both window functions. */
  def q7Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    Tables.lineitem(s, dir)
      .filter(col("l_suppkey") <= 10)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).cast("long").as("rn"),
        round(sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running"))
      .orderBy("l_suppkey", "rn")
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition
    * heap then a single k-row reduce, no full sort at scale. */
  def q8TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Exact multi-column distinct counts (expand + two-phase agg). */
  /** Three SEPARATE single-distinct branches crossJoined, not one
    * agg with three countDistincts: multiple distinct aggregates plan
    * an Expand that triples the scan through the shuffle, while each
    * single-distinct branch partial-distincts map-side and scans only
    * its own (pruned) parquet column — the decade-scaling tail this
    * query had disappears (4.4× → ~2× per 10× data). */
  def q9Distinct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    def branch(c: String, as: String) =
      li.select(c).agg(countDistinct(col(c)).as(as))
    branch("l_partkey", "n_parts")
      .crossJoin(branch("l_suppkey", "n_supps"))
      .crossJoin(branch("l_orderkey", "n_orders"))
  }

  /** Hierarchical ROLLUP aggregate. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** TPC-H Q12 shape: conditional aggregation over a fact-fact join.
    * count(CASE…) (not sum) so both engines produce int64. */
  def q11CaseAgg(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        count(when(high, 1)).as("high_cnt"),
        count(when(!high, 1)).as("low_cnt"))
      .orderBy("l_linestatus")
  }

  /** Post-aggregation filter (HAVING). */
  def q12Having(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .filter(col("cnt") > 500)
      .orderBy("l_suppkey")

  /** Tumbling-day event aggregation (batch twin of the Structured
    * Streaming pipeline in graft.streaming). */
  def q13EventsWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"))
      .orderBy("day", "event_type")

  /** Union of two filtered branches + re-aggregation. */
  def q14Union(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_totalprice") > 200000).select("o_orderstatus")
      .unionAll(o.filter(col("o_orderpriority") === "1-URGENT").select("o_orderstatus"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")
  }

  /** HLL approximate distinct vs exact. The HLL estimate itself is
    * engine-specific, so the hard signal is `within_2pct`: the oracle
    * checks the exact count AND that the estimate landed within 2% of
    * it (rsd is configured at 1%). At 100 TB the approx path avoids
    * the expand+shuffle that exact distinct needs. */
  def q15ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    // distinct() first, then BOTH aggregates over the distinct frame:
    // HLL is duplicate-insensitive, so the estimate is unchanged, the
    // exact count becomes a plain count (no Expand plan from mixing
    // distinct and non-distinct aggregates), and no scalar join is
    // needed. One shuffle on l_partkey with map-side partial distinct.
    Tables.lineitem(s, dir).select("l_partkey").distinct()
      .agg(count(lit(1)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"))
      .select(col("exact_parts"),
        (abs(col("approx") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.02).as("within_2pct"))
  }

  /** Pivot (crosstab): order counts by priority × status. Missing
    * combinations coalesce to 0 to match SQL conditional counts. */
  def q16Pivot(s: SparkSession, dir: String): DataFrame = {
    val statuses = Seq("F", "O", "P")
    val p = Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", statuses)
      .agg(count(lit(1)))
    statuses.foldLeft(p)((df, st) => df.withColumn(st, coalesce(col(st), lit(0L))))
      .orderBy("o_orderpriority")
  }

  /** Exact interpolated percentiles per group (≡ Spark `percentile` /
    * DuckDB `quantile_cont`), computed by distributed rank instead of
    * the `percentile` aggregate: that aggregate buffers EVERY value of
    * a group in one executor's memory (OOM at 100 TB), and a plain
    * per-group window sort serializes each group into a single task.
    * Here each value column is range-partitioned on (group, value) so
    * a group spans many ordered partitions, ranked locally
    * (row_number per (partition, group) — sort is spillable), and
    * offset by broadcast per-partition prefix counts; the boundary
    * ranks lo/hi = interpolation neighbors of 1+(n-1)p are picked by
    * an ordinary partial-aggregating groupBy. No stage holds more
    * than a partition in memory and parallelism stays at the
    * partition count regardless of group cardinality. Columns are
    * assumed non-null (TPC-H); `percentile` ignores nulls, so a
    * nullable input would need a filter first. */
  def q17Percentile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val grp = "l_returnflag"
    exactPercentiles(li, grp, "l_quantity", Seq((0.5, "p50_qty")))
      .join(exactPercentiles(li, grp, "l_extendedprice",
        Seq((0.25, "p25_price"), (0.95, "p95_price"))), grp)
      .orderBy(grp)
  }

  /** Exact interpolated per-group percentiles (≡ `percentile` /
    * `quantile_cont`) by distributed rank — the scale-safe kernel
    * behind q17/q24, see the q17 scaladoc for the mechanics. Returns
    * one row per group with a `round(…, 4)` column per requested
    * (p, name). */
  private[graft] def exactPercentiles(df: DataFrame, grp: String, valueCol: String,
                                          ps: Seq[(Double, String)]): DataFrame = {
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // cacheTracked pins ONE materialization of the range exchange:
    // repartitionByRange samples boundaries nondeterministically, and
    // both the offs and global branches below must see the SAME pid
    // assignment — without the persist that only holds while exchange
    // reuse is on (spark.sql.exchange.reuse=false would silently
    // mis-attribute offsets). The persisted projection is narrow
    // (grp, v, pid, lrn) and spills to disk.
    import graft.CacheRegistry.Cacheable
    val ranked = df
      .select(col(grp), col(valueCol).cast("double").as("v"))
      .repartitionByRange(nPart, col(grp), col("v"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(
        Window.partitionBy("pid", grp).orderBy("v")))
      .cacheTracked
    // per-(partition, group) counts are tiny (≤ nPart × |groups| rows):
    // exclusive prefix sum over pid gives each partition's global offset
    val offs = ranked.groupBy("pid", grp).agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum("c").over(
        Window.partitionBy(grp).orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("c").over(Window.partitionBy(grp)))
      .select("pid", grp, "off", "n")
    val global = ranked.join(broadcast(offs), Seq("pid", grp))
      .withColumn("rn", col("lrn") + col("off"))
    val aggs = ps.flatMap { case (p, name) =>
      val pos = lit(1.0) + (col("n") - 1).cast("double") * lit(p)
      Seq(
        max(when(col("rn") === floor(pos).cast("long"), col("v"))).as(s"${name}_lo"),
        max(when(col("rn") === ceil(pos).cast("long"), col("v"))).as(s"${name}_hi"))
    } :+ max(col("n")).as("n_rows")
    val g = global.groupBy(grp).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(g) { case (df2, (p, name)) =>
      val pos = lit(1.0) + (col("n_rows") - 1).cast("double") * lit(p)
      val frac = pos - floor(pos)
      df2.withColumn(name,
          round(col(s"${name}_lo") + frac * (col(s"${name}_hi") - col(s"${name}_lo")), 4))
        .drop(s"${name}_lo", s"${name}_hi")
    }.drop("n_rows")
  }

  /** Statistical aggregates: sample stddev/variance, correlation,
    * covariance. */
  def q18Stats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qty_price"))
      .orderBy("l_returnflag")

  /** String expression surface: case mapping, substring, concat —
    * codegen'd, map-only. */
  def q19Strings(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("head10"),
        concat(col("lang"), lit("-"), col("source")).as("tag"),
        length(regexp_replace(col("text"), "[aeiou]", "")).cast("long").as("consonant_chars"))
      .orderBy("doc_id")

  /** Full CUBE aggregate (every grouping-set combination). */
  def q20Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** Deterministic systematic sample: every key ≡ 0 (mod 37) — the
    * reproducible subset-selection shape (a training-data pipeline
    * needs samples that are stable across reruns and engines, which
    * random() is not). Pushes to the scan as a filter. */
  def q22Sample(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(pmod(col("l_orderkey"), lit(37)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Deterministic stratified sample: first `perStratum` rows per
    * returnflag under a total (unique-key) order — one window shuffle,
    * bounded output per stratum. */
  def q23Stratified(s: SparkSession, dir: String, perStratum: Int = 100): DataFrame = {
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    Tables.lineitem(s, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"), col("rn"))
      .orderBy("l_returnflag", "rn")
  }

  /** As-of-style lookup: each user's latest event strictly before the
    * cutoff — one window over the (user, time desc) order, the
    * Spark-native shape of an as-of join against a constant time. */
  def q21AsofLatest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .filter(col("ts") < lit("2024-01-15"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"))
      .orderBy("user_id")
  }

  /** Approx-percentile twin of q17: the mergeable-sketch estimate
    * next to the exact percentile, with a hard signal for the oracle
    * (within 1% of the exact value per group). At 100 TB the approx
    * path is one pass with mergeable per-partition sketches instead
    * of the exact percentile's per-group full materialization. */
  def q24ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // exact reference via the distributed-rank kernel (the sketch's
    // companion must not reintroduce the unbounded per-group buffer)
    val exact = exactPercentiles(li, "l_returnflag", "l_extendedprice",
      Seq((0.5, "p50_price")))
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx"))
    exact.join(approx, "l_returnflag")
      .select(col("l_returnflag"), col("p50_price"),
        (abs(col("approx") - col("p50_price")) <= col("p50_price") * 0.01).as("within_1pct"))
      .orderBy("l_returnflag")
  }

  /** Join on a deliberately hot key (l_quantity: ~50 distinct values
    * across the whole fact table, so every key is a hot key) routed
    * through [[Skew.saltedJoin]], then aggregated. The oracle is the
    * PLAIN join's result: salting must be invisible in the output.
    * This is the measurable evidence for the 100-TB skew story —
    * the hot key fans out over saltFactor reducers instead of
    * serializing on one. */
  def q25SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("qty"), col("l_extendedprice"))
    val dim = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("qty")).distinct()
      .withColumn("qty_tier", when(col("qty") >= 25, "high").otherwise("low"))
    Skew.saltedJoin(li, dim, "qty", saltFactor = 8)
      .groupBy("qty_tier")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("qty_tier")
  }

  /** As-of join, Spark-first: instead of a per-row lookup join (which
    * Spark would plan as a range/NL join), tag both sides, UNION, and
    * run ONE window per user ordered by time — each purchase row picks
    * up the latest prior click via a running `last(click, ignoreNulls)`.
    * One shuffle + one sort, no join explosion; at 100 TB this is the
    * only as-of formulation that scales (cost = sort of the union,
    * not |left|x|right|). Clicks sort before purchases at equal ts,
    * matching ASOF's `>=` semantics. */
  def q26AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val us = unix_micros(col("ts"))
    val tagged = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), us.as("ts_us"), col("value"), lit(1).as("side"))
      .unionAll(e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), us.as("ts_us"), col("value"), lit(0).as("side")))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click",
        last(when(col("side") === 0, struct(col("ts_us"), col("value"))), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("last_click").isNotNull)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("purchase_value"),
        round(col("last_click.value"), 2).as("last_click_value"),
        ((col("ts_us") - col("last_click.ts_us")) / 1000000L).cast("long").as("gap_s"))
      .orderBy("event_id")
  }

  /** Generic binned range join: a `value BETWEEN lo AND hi` predicate
    * re-expressed as an equi-join — the fact side keys on
    * floor(value/binWidth), each dim range explodes into the bins it
    * covers, and a residual BETWEEN filter removes bin-edge false
    * positives. Turns Spark's BroadcastNestedLoop/Cartesian range
    * plan into a hash join: at 100 TB the fact table hashes on a
    * fixed-width key instead of probing every range per row. */
  def rangeJoinBinned(fact: DataFrame, value: Column, dim: DataFrame,
                      lo: Column, hi: Column, binWidth: Double): DataFrame = {
    val f = fact.withColumn("__bin", floor(value / binWidth).cast("long"))
    val d = dim.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"), floor(hi / binWidth).cast("long"))))
    f.join(broadcast(d), Seq("__bin")).filter(value.between(lo, hi)).drop("__bin")
  }

  /** Range join demo over unequal-width quantity bands, aggregated per
    * band; oracle = the plain BETWEEN join. */
  def q27RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq((1L, 1.0, 9.0), (2L, 10.0, 24.0), (3L, 25.0, 39.0), (4L, 40.0, 50.0))
      .toDF("band_id", "lo", "hi")
    rangeJoinBinned(Tables.lineitem(s, dir).select("l_quantity", "l_extendedprice"),
      col("l_quantity"), bands, col("lo"), col("hi"), binWidth = 8.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
      .orderBy("band_id")
  }

  /** Semi-structured JSON extraction: `get_json_object` stays inside
    * whole-stage codegen, so at 100 TB this is a map-only scan + one
    * partial-aggregated shuffle on event_type — the JSON parse never
    * forces a UDF or a second pass. */
  def q29Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Analytic-function surface: lag/lead/ntile/percent_rank/cume_dist
    * in ONE window spec — Spark plans a single sort per partition for
    * all five. Deterministic: the window order includes the unique
    * key. */
  def q30WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice"), 2).as("price"),
        lag("o_orderkey", 1).over(w).as("prev_key"),
        lead("o_orderkey", 1).over(w).as("next_key"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"))
      .orderBy("o_orderpriority", "price", "o_orderkey")
  }

  /** Calendar aggregation + month-over-month delta: date_trunc month
    * rollup, then a lag window over the (tiny) month series. The
    * single-partition window is safe by construction — its input is
    * one row per month, not the fact table. */
  def q31MonthTrend(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))
    val w = Window.orderBy("month")
    m.select(col("month").cast("date").as("month"), col("cnt"), col("revenue"))
      .withColumn("mom_delta",
        round(col("revenue") - coalesce(lag("revenue", 1).over(w), lit(0.0)), 2))
      .orderBy("month")
  }

  /** Grouped top-k via the typed TopK Aggregator (graft.functions):
    * k-bounded partial buffers shuffle O(k·groups) rows instead of
    * the fact table — the aggregate-shaped alternative to the
    * WindowGroupLimit plan q23 uses. */
  def q32GroupedTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg.TopK(k), graft.functions.TopKAgg.inputEncoder)
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("o_orderkey"), round(col("col.score"), 2).as("price"))
      .orderBy("o_orderpriority", "rank")
  }

  /** Pure-SQL surface (TPC-H Q5 shape): users can hand graft ANSI SQL
    * over registered views and get the same Catalyst plan the
    * DataFrame API produces — 6-way join with dim broadcasts and one
    * partial-aggregated shuffle. */
  def q33SqlJoin(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql("""
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  }

  /** Correlated-subquery surface: EXISTS decorrelates to a left-semi
    * join, the scalar COUNT subquery to a left-outer aggregate join —
    * both rewrites are Catalyst's, no manual denormalization. */
  def q34ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    s.sql("""
      SELECT c_custkey, c_name,
        (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer c
      WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""")
  }

  /** Set-operation surface: INTERSECT and EXCEPT (both DISTINCT
    * semantics) between the customer sets of two order priorities —
    * planned as left-semi/anti aggregates, one shuffle each. */
  def q35IntersectExcept(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def custs(prio: String) =
      o.filter(col("o_orderpriority") === prio).select("o_custkey")
    val both = custs("1-URGENT").intersect(custs("2-HIGH"))
      .agg(count(lit(1)).as("n")).select(lit("both").as("set_op"), col("n"))
    val onlyUrgent = custs("1-URGENT").except(custs("2-HIGH"))
      .agg(count(lit(1)).as("n")).select(lit("only_urgent").as("set_op"), col("n"))
    both.unionAll(onlyUrgent).orderBy("set_op")
  }

  /** Explicit GROUPING SETS (not the rollup/cube specializations):
    * two independent groupings in one pass over the fact table, with
    * grouping_id disambiguating the output rows. */
  def q36GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""")
  }

  /** Full-outer join surface: per-customer order counts in two
    * priority classes, keeping customers present in either side —
    * the reconciliation-report shape. One shuffle per side on the
    * join key. */
  def q37OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    def cnts(prio: String, out: String) =
      o.filter(col("o_orderpriority") === prio)
        .groupBy("o_custkey").agg(count(lit(1)).as(out))
    cnts("1-URGENT", "n_urgent")
      .join(cnts("5-LOW", "n_low"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
        coalesce(col("n_low"), lit(0L)).as("n_low"))
      .orderBy("o_custkey")
  }

  /** Time-range rolling aggregate: 7-day trailing revenue via a RANGE
    * window over day numbers — the range frame includes absent days
    * correctly (unlike a ROWS frame). The window input is the tiny
    * per-day aggregate, not the fact table, so the global ordering is
    * safe by construction. */
  def q38RollingWindow(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
      .withColumn("day_num", datediff(col("day"), to_date(lit("1970-01-01"))))
    val w = Window.orderBy("day_num").rangeBetween(-6, 0)
    daily
      .withColumn("rev_7d", round(sum("revenue").over(w), 2))
      .select("day", "revenue", "rev_7d")
      .orderBy("day")
  }

  /** Daily active users + event volume — the product-analytics
    * heartbeat query. Two separate aggregations joined on day (~30
    * rows): mixing countDistinct with count(*) in one agg would plan
    * an Expand that doubles the scan rows through the shuffle (same
    * pitfall q15 avoids). */
  def q39DailyActive(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(to_date(col("ts")).as("day"), col("user_id"))
    val dau = e.distinct().groupBy("day").agg(count(lit(1)).as("dau"))
    val vol = e.groupBy("day").agg(count(lit(1)).as("n_events"))
    dau.join(vol, "day").orderBy("day")
  }

  /** Next-day retention: of the users active on day d, the fraction
    * also active on d+1. The (day, user) set self-joins on user_id —
    * the join shuffles the deduplicated activity set, not raw
    * events. */
  def q40Retention(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val ret = daily.alias("a")
      .join(daily.alias("b"),
        col("a.user_id") === col("b.user_id") && col("b.day") === date_add(col("a.day"), 1))
      .groupBy(col("a.day").as("day")).agg(count(lit(1)).as("retained"))
    daily.groupBy("day").agg(count(lit(1)).as("dau"))
      .join(ret, Seq("day"), "left")
      .select(col("day"), col("dau"),
        coalesce(col("retained"), lit(0L)).as("retained"),
        round(coalesce(col("retained"), lit(0L)) / col("dau"), 4).as("retention_rate"))
      .orderBy("day")
  }

  /** Cross-modal join: text table ⋈ embedding table on document id,
    * aggregated per embedding label — the "join modalities" shape a
    * training pipeline runs to correlate text statistics with
    * embedding clusters. Equi-join on the id; the norm is a map-side
    * higher-order expression. */
  def q41CrossModal(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .withColumn("nrm", sqrt(aggregate(
        expr("transform(embedding, x -> cast(x as double))"),
        lit(0.0), (a, x) => a + x * x)))
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 4).as("avg_chars"),
        round(avg(col("nrm")), 4).as("avg_norm"))
      .orderBy("label")

  /** Ordered conversion funnel (view → later click → later purchase):
    * per-stage first-event times chain through min-aggregates +
    * equi-joins on user_id, so each stage shuffles only (user, ts)
    * pairs — never raw events twice. The classic event-analytics
    * funnel shape. */
  def q42Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("v_us"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("us") > col("v_us"))
      .groupBy("user_id").agg(min("us").as("c_us"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("us") > col("c_us"))
      .groupBy("user_id").agg(min("us").as("p_us"))
    def stage(df: DataFrame, n: Long, name: String) =
      df.agg(count(lit(1)).as("users"))
        .select(lit(n).as("stage"), lit(name).as("name"), col("users"))
    stage(v, 1, "view")
      .unionAll(stage(c, 2, "view_click"))
      .unionAll(stage(p, 3, "view_click_purchase"))
      .orderBy("stage")
  }

  /** Null-semantics surface: count(col) vs count(*), null-skipping
    * avg, and explicit null tallies over a synthesized nullable
    * column — the SQL null contract an engine must honor exactly. */
  def q43NullAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("d", expr("nullif(l_discount, 0.0)"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        count(col("d")).as("n_nonnull"),
        sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_null"),
        round(avg("d"), 4).as("avg_nonnull"))
      .orderBy("l_returnflag")

  /** Ordered string aggregation (LISTAGG): collect_list + sort_array
    * + concat_ws gives a deterministic per-group concatenation —
    * collect_list alone is partition-order-dependent, so the sort is
    * what makes the result reproducible across engines and runs. */
  def q44StringAgg(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir)
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_nations"),
        concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"))
      .orderBy("r_name")

  /** Recursive CTE (Spark 4 `WITH RECURSIVE`): a 90-day date spine
    * gap-fills the daily order series — days with no orders emit a
    * zero row, the pattern windows and joins alone can't express
    * without a generated sequence. The spine is 90 rows (bounded
    * recursion, under Spark's default 100-level limit); the orders
    * side is one filtered partial-aggregated scan whose 90-row daily
    * result broadcasts as the build side of the left-outer join (the
    * preserved spine side cannot be the build side). */
  def q45RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_rc")
    s.sql("""
      WITH RECURSIVE days(d) AS (
        SELECT CAST('1995-01-01' AS DATE)
        UNION ALL SELECT date_add(d, 1) FROM days WHERE d < CAST('1995-03-31' AS DATE)
      ),
      daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n, sum(o_totalprice) AS rev
        FROM orders_rc
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
        GROUP BY 1
      )
      SELECT CAST(days.d AS TIMESTAMP) AS day,
             coalesce(n, 0L) AS n_orders,
             round(coalesce(rev, 0.0), 2) AS revenue
      FROM days LEFT JOIN daily ON days.d = daily.d
      ORDER BY day""")
  }

  /** VARIANT (Spark 4 semi-structured type): parse each JSON props
    * payload ONCE into a variant, then make typed extractions from the
    * parsed value — the scale advantage over q29's get_json_object is
    * one parse per row feeding any number of paths instead of one
    * parse per path. Map-only until the final aggregate. */
  def q46Variant(s: SparkSession, dir: String): DataFrame = {
    val k = Tables.events(s, dir)
      .select(col("event_type"), expr("parse_json(props)").as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"))
    // distinct first, then join the distinct-count to the plain
    // aggregates: mixing countDistinct into the same agg would plan an
    // Expand doubling the scan rows through the shuffle (the q15/q39
    // pitfall)
    val distinctK = k.select("event_type", "k").distinct()
      .groupBy("event_type").agg(count(col("k")).as("n_distinct_k"))
    k.groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"), round(avg("k"), 4).as("avg_k"))
      .join(distinctK, "event_type")
      .select(col("event_type"), col("n_with_k"), col("n_distinct_k"), col("avg_k"))
      .orderBy("event_type")
  }

  /** UNPIVOT (wide → long melt): the three lineitem measure columns
    * fold into (measure, value) rows through Dataset.unpivot — ONE
    * scan with an Expand, where the UNION-ALL formulation the oracle
    * uses would scan three times; the aggregate then partial-combines
    * per measure. The inverse of q16's pivot, completing the
    * reshaping pair. */
  def q47Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select("l_quantity", "l_discount", "l_tax")
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total"),
        round(avg("value"), 6).as("mean"))
      .orderBy("measure")

  /** Gap-fill / forward-fill: every event carries the value of the
    * user's most recent PURCHASE at-or-before it, via
    * last_value(..., ignoreNulls) over the per-user time order — the
    * canonical as-of forward-fill that joins can't express without a
    * range join. One window sort per user partition, null before the
    * first purchase. */
  def q48Gapfill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("pv", when(col("event_type") === "purchase", col("value")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(last("pv", ignoreNulls = true).over(w), 2).as("last_purchase_value"))
      .orderBy("event_id")
  }

  /** Time-based trailing window (RANGE frame): per event, the
    * user's event count and value total over the preceding 7 days —
    * the rolling-feature shape (fraud velocity, engagement decay)
    * that ROWS frames can't express because the lookback is a time
    * span, not a row count. The frame is defined over FLOOR-SECOND
    * epoch values on both engines (the parquet carries nanosecond
    * timestamps; Spark truncates to micros on read, so whole seconds
    * are the largest precision both engines agree on exactly), and
    * RANGE includes order-value ties identically in both. One shuffle
    * on user_id; the per-partition sort is spillable. */
  def q49TimeRolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("tss"))
      .rangeBetween(-7L * 86400, 0)
    Tables.events(s, dir)
      .withColumn("tss", col("ts").cast("long"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("trail7d_events"),
        round(sum("value").over(w), 2).as("trail7d_value"))
      .orderBy("event_id")
  }

  /** Batch sessionization (gaps-and-islands): a new session starts
    * after a >30 min silence; one window pass marks boundaries, a
    * running sum numbers sessions, then a per-session aggregate.
    * Shuffles once on user_id; the streaming twin lives in
    * graft.streaming.EventStream. */
  def q28Sessionize(s: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag("us", 1).over(w).isNull || col("us") - lag("us", 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sess_value"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "sess_seq")
  }
}

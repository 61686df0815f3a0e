package graft

import graft.functions.{TopKAgg, VectorFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (scalacheck generators, fixed seeds for
  * reproducibility): the custom kernels and the optimizer rule must
  * hold for arbitrary inputs, not just the fixtures. */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("exactPercentiles equals the percentile aggregate on random grouped data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    // adversarial shapes: heavy ties, singleton groups, skewed sizes
    val rows = (
      (0 until 500).map(_ => ("a", rnd.nextInt(10).toDouble)) ++        // heavy ties
      (0 until 97).map(_ => ("b", rnd.nextDouble() * 1000)) ++          // continuous
      Seq(("c", 5.0)) ++                                                // singleton group
      (0 until 3).map(i => ("d", i.toDouble))                           // tiny group
    )
    val df = spark.createDataFrame(rows).toDF("g", "x")
      .repartition(7) // scatter groups across partitions
    val ps = Seq((0.0, "p0"), (0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (1.0, "p100"))
    val got = graft.operators.Relational.exactPercentiles(df, "g", "x", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val aggCols = ps.map { case (p, name) => round(expr(s"percentile(x, $p)"), 4).as(name) }
    val expected = df.groupBy("g").agg(aggCols.head, aggCols.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == expected.keySet)
    for (g <- got.keySet; (_, name) <- ps)
      assert(math.abs(got(g).getAs[Double](name) - expected(g).getAs[Double](name)) < 1e-9,
        s"group $g $name: got ${got(g).getAs[Double](name)}, expected ${expected(g).getAs[Double](name)}")
    CacheRegistry.releaseAll() // exactPercentiles persists its ranked frame
  }

  test("sorted_intersect_count equals Set.intersect on random sorted arrays") {
    import spark.implicits._
    val gArr = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    val pairs = samples(Gen.zip(gArr, gArr), 200, 7L)
    val got = pairs.toDF("a", "b")
      .select(VectorFunctions.sorted_intersect_count(col("a"), col("b")).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val want = pairs.map { case (a, b) => (a.toSet & b.toSet).size.toLong }
    assert(got == want)
  }

  test("cosine_similarity equals the naive formula on random vectors") {
    import spark.implicits._
    val gVec = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0))
    val pairs = samples(Gen.zip(gVec, gVec), 100, 11L)
      .filter { case (a, b) => a.exists(_ != 0.0) && b.exists(_ != 0.0) }
    val got = pairs.toDF("a", "b")
      .select(VectorFunctions.cosine_similarity(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    val want = pairs.map { case (a, b) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9, s"$g vs $w") }
  }

  test("minhash_signature equals the explode + min-aggregate formulation") {
    import graft.operators.Dedup
    import spark.implicits._
    val numPerms = 32
    // random hash arrays covering the real domain (nonneg md5-60) plus
    // negative values to pin the pmod semantics
    val gArr = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4))
    val arrays = samples(gArr, 100, 23L).zipWithIndex.map { case (a, i) => (i.toLong, a) }
    val df = arrays.toDF("id", "hs")
    val got = df.select(col("id"),
        VectorFunctions.minhash_signature(col("hs"), numPerms).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = df.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(Dedup.minhashAggs(col("h"), numPerms).head,
        Dedup.minhashAggs(col("h"), numPerms).tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to numPerms).map(r.getLong(_)).toSeq).toMap
    assert(got == want)
  }

  test("simhash64 kernel equals the explode + bit-count aggregate formulation") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, Sf).select(
      col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("toks"))
    val got = Dedup.simhashFromTokensAgg(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), VectorFunctions.simhash64(col("toks")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("TopK aggregator is exact under random data and random merge splits") {
    val gEntry = Gen.zip(Gen.chooseNum(0.0, 20.0), Gen.chooseNum(0L, 1000L))
      .map { case (s, i) => TopKAgg.Entry(s, i) }
    val gCase = for {
      n <- Gen.chooseNum(0, 60)
      entries <- Gen.listOfN(n, gEntry)
      k <- Gen.chooseNum(1, 8)
      split <- Gen.chooseNum(0, n)
    } yield (entries, k, split)
    samples(gCase, 300, 13L).foreach { case (entries, k, split) =>
      val agg = new TopKAgg.TopK(k)
      val (l, r) = entries.splitAt(split)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val want = entries.sortBy(e => (-e.score, e.id)).take(k)
      assert(agg.finish(merged) == want, s"k=$k split=$split entries=$entries")
    }
  }

  test("ngram_hashes: equal windows hash equal, shifted windows roll, all n") {
    import spark.implicits._
    val gStr = Gen.chooseNum(0, 40).flatMap(m =>
      Gen.listOfN(m, Gen.alphaLowerChar).map(_.mkString))
    (1 to 8).foreach { n =>
      val strs = samples(gStr, 40, 23L + n)
      val got = strs.toDF("s")
        .select(VectorFunctions.ngram_hashes(col("s"), n).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      strs.zip(got).foreach { case (s, hs) =>
        val want =
          if (s.length <= n) Seq(s)
          else (0 to s.length - n).map(i => s.substring(i, i + n))
        assert(hs.length == want.length, s"'$s' n=$n")
        // equal substrings must hash equal; distinct ones distinct
        for { (sub, i) <- want.zipWithIndex; (sub2, j) <- want.zipWithIndex } {
          if (sub == sub2) assert(hs(i) == hs(j), s"'$s' n=$n pos $i/$j")
          else assert(hs(i) != hs(j), s"rolling-hash collision in '$s' n=$n pos $i/$j")
        }
      }
    }
  }

  test("BinnedRangeJoinRule matches the naive join on random band tables") {
    import spark.implicits._
    val li = Tables.lineitem(spark, Sf).select("l_quantity", "l_extendedprice")
    val gBand = for {
      lo <- Gen.chooseNum(0.0, 55.0)
      w <- Gen.chooseNum(0.0, 30.0)
    } yield (lo, lo + w)
    val gBands = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, gBand))
    samples(gBands, 5, 17L).foreach { bands =>
      val bandsDf = bands.zipWithIndex
        .map { case ((lo, hi), i) => (i.toLong, lo, hi) }.toDF("band_id", "lo", "hi")
      def q = li.join(bandsDf,
          col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("total"))
        .orderBy("band_id")
      val naive = q.collect().toSeq
      spark.experimental.extraOptimizations = Seq(graft.plans.BinnedRangeJoinRule)
      val rewritten = try q.collect().toSeq
      finally spark.experimental.extraOptimizations = Nil
      assert(rewritten == naive, s"bands=$bands")
    }
  }

  test("BoundedCollect.MinIds equals (count, sorted.take(cap)) on random grouped longs") {
    import spark.implicits._
    // adversarial shapes: groups far beyond cap (truncation path),
    // exactly at cap, below cap, duplicates, negatives, and enough
    // partitions that merge() runs on partially-filled buffers
    val rnd = new scala.util.Random(11)
    val cap = 5
    val rows = (0 until 40).flatMap { g =>
      val sz = rnd.nextInt(20) // 0..19 vs cap 5
      (0 until sz).map(_ => (g.toLong, rnd.nextInt(30).toLong - 15L))
    }
    val agg = udaf(new graft.functions.BoundedCollect.MinIds(cap),
      graft.functions.BoundedCollect.inputEncoder)
    val got = rows.toDF("g", "id").repartition(7)
      .groupBy("g").agg(agg(col("id")).as("b"))
      .select(col("g"), col("b.n"), col("b.ids"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Long](2).toList)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> (vs.size.toLong, vs.map(_._2).sorted.take(cap).toList)
    }
    assert(got.keySet == want.keySet)
    for (g <- want.keySet)
      assert(got(g) == want(g), s"group $g: got ${got(g)}, want ${want(g)}")
  }
}

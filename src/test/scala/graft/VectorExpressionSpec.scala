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

  test("sorted_intersect_count equals size(array_intersect) on sorted distinct arrays") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L))).toDF("a", "b")
    val got = df.select(
      VectorFunctions.sorted_intersect_count(col("a"), col("b")).as("merge"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 0L, 0L))
  }

  test("GraftExtensions registers both functions without error") {
    // spark.sql.extensions is a STATIC conf read from the SparkContext
    // at first creation, so full-session injection can't be exercised
    // against the suite's shared context; the SQL resolution path is
    // covered by the register() test above. Here: the extension class
    // instantiates reflectively (as Spark would) and populates an
    // extensions object.
    val cls = Class.forName("graft.GraftExtensions")
    val instance = cls.getConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    instance(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("minhash_signature and simhash64 skip null array slots (SQL-reachable inputs)") {
    VectorFunctions.register(spark)
    // min ignores nulls in the explode+aggregate twin, so a null slot
    // must not perturb the signature — and must not NPE or hash as 0.
    val mh = spark.sql(
      "SELECT minhash_signature(array(7L, NULL, 42L), 4) AS withNull, " +
        "minhash_signature(array(7L, 42L), 4) AS without").collect().head
    assert(mh.getSeq[Long](0) == mh.getSeq[Long](1))
    // A null token must not vote nor count in the majority denominator:
    // counted, a lone real token is 1-of-2 (no majority → simhash 0);
    // skipped, it is 1-of-1 and its bits carry through.
    val sh = spark.sql(
      "SELECT simhash64(array('alpha', NULL)) AS withNull, " +
        "simhash64(array('alpha')) AS without").collect().head
    assert(sh.getLong(0) == sh.getLong(1))
    assert(sh.getLong(1) != 0L)
    // No voters at all → NULL, matching the explode+min twin (whose
    // aggregate has no surviving row), not a sentinel signature.
    val empty = spark.sql(
      "SELECT minhash_signature(CAST(array() AS ARRAY<BIGINT>), 4) AS e, " +
        "minhash_signature(array(CAST(NULL AS BIGINT)), 4) AS allNull").collect().head
    assert(empty.isNullAt(0) && empty.isNullAt(1))
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

  test("lsh_bucket matches the per-plane cosine-sign formulation") {
    import spark.implicits._
    val planes = graft.operators.Similarity.lshPlanes(12, 8)
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(50)(Array.fill(8)(rnd.nextGaussian())).toDF("v")
    val got = df.select(col("v"), VectorFunctions.lsh_bucket(col("v"), planes).as("b"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      var expect = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        val dot = v.zip(p).map { case (x, y) => x * y }.sum
        if (dot >= 0) expect |= 1L << i
      }
      assert(r.getLong(1) == expect)
    }
  }

  test("lsh_probe_buckets: home bucket first, constant fan-out, low-margin flips only") {
    import spark.implicits._
    val nP = 16
    val flip = 6
    val planes = graft.operators.Similarity.lshPlanes(nP, 8)
    def invNorm(p: Array[Double]) = 1.0 / math.sqrt(p.map(x => x * x).sum)
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(40)(Array.fill(8)(rnd.nextGaussian())).toDF("v")
    val got = df.select(col("v"),
      VectorFunctions.lsh_bucket(col("v"), planes).as("home"),
      VectorFunctions.lsh_probe_buckets(col("v"), planes, flip).as("probes"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val home = r.getLong(1)
      val probes = r.getSeq[Long](2)
      // shape: 1 + flip + C(flip,2) buckets, home first, all distinct
      assert(probes.length == 1 + flip + flip * (flip - 1) / 2)
      assert(probes.head == home)
      assert(probes.distinct.length == probes.length)
      // every probe flips a subset (size <= 2) of the `flip` lowest-|margin| planes
      val margins = planes.map(p => math.abs(v.zip(p).map { case (x, y) => x * y }.sum) * invNorm(p))
      val lowSet = margins.zipWithIndex.sortBy { case (m, i) => (m, i) }.take(flip).map(_._2).toSet
      probes.tail.foreach { b =>
        val flipped = (0 until nP).filter(i => ((b ^ home) >> i & 1L) == 1L)
        assert(flipped.nonEmpty && flipped.size <= 2 && flipped.forall(lowSet))
      }
    }
  }

  test("top_bigram_count matches the explode+groupBy formulation it replaced, on real docs") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("w"))
    val kernel = toks.select(col("doc_id"),
      VectorFunctions.top_bigram_count(col("w")).as("max_c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffled = toks
      .select(col("doc_id"), explode(expr(
        "if(size(w) >= 2, transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1])), array())")).as("bigram"))
      .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("max_c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled.nonEmpty && shuffled.forall { case (d, c) => kernel(d) == c })
    // degenerate shapes + a pair that concat-based bigrams would
    // conflate if tokens could contain the separator
    import spark.implicits._
    val edge = Seq(
      (1L, Seq[String]()), (2L, Seq("a")), (3L, Seq("a", "a", "a")),
      (4L, Seq("x", "y", "x", "y", "x"))).toDF("id", "w")
      .select(col("id"), VectorFunctions.top_bigram_count(col("w")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(edge == Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 2L))
  }

  test("token_entropy: closed-form values and agreement with the count-table formulation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hand-checked shapes: uniform over k types = log2(k); constant = 0
    val known = Seq(
      (1L, Seq[String]()), (2L, Seq("a", "a", "a")),
      (3L, Seq("a", "b")), (4L, Seq("a", "b", "c", "d")),
      (5L, Seq("a", "a", "b", "b"))).toDF("id", "w")
      .select(col("id"), VectorFunctions.token_entropy(col("w")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(known(1L) == 0.0 && known(2L) == 0.0)
    assert(math.abs(known(3L) - 1.0) < 1e-12)
    assert(math.abs(known(4L) - 2.0) < 1e-12)
    assert(math.abs(known(5L) - 1.0) < 1e-12)
    // real docs: kernel equals the explode + count-table formulation
    val toks = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("w"))
    val kernel = toks.select(col("doc_id"),
      VectorFunctions.token_entropy(col("w")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val table = toks.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n"),
        sum(col("c") * log2(col("c"))).as("clc"))
      // -Σ(c/n)log2(c/n) = log2(n) − Σ c·log2(c) / n
      .select(col("doc_id"), (log2(col("n")) - col("clc") / col("n")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(table.nonEmpty &&
      table.forall { case (d, h) => math.abs(kernel(d) - h) < 1e-9 })
  }

  test("lsh_probe_buckets covers every bucket within hamming radius 2 of the low-margin planes when flip >= numPlanes") {
    import spark.implicits._
    val nP = 5
    val planes = graft.operators.Similarity.lshPlanes(nP, 8)
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(10)(Array.fill(8)(rnd.nextGaussian())).toDF("v")
    // flip beyond numPlanes clamps to numPlanes → exhaustive radius-2 family
    val got = df.select(
      VectorFunctions.lsh_bucket(col("v"), planes).as("home"),
      VectorFunctions.lsh_probe_buckets(col("v"), planes, 32).as("probes"))
      .collect()
    got.foreach { r =>
      val home = r.getLong(0)
      val probes = r.getSeq[Long](1).toSet
      val expect = (Seq(home)
        ++ (0 until nP).map(i => home ^ (1L << i))
        ++ (for (i <- 0 until nP; j <- (i + 1) until nP) yield home ^ (1L << i) ^ (1L << j))).toSet
      assert(probes == expect)
    }
  }
}

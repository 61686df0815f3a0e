package graft

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  test("dedup_exact: one group per distinct text, ids preserved") {
    val rows = Dedup.dedupExact(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf)
    assert(rows.map(_.getAs[Long]("n_copies")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("keep_id")).distinct.length == rows.length)
  }

  test("ngram jaccard pairs are symmetric-free and above threshold") {
    val rows = Dedup.dedupNgramJaccard(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
  }

  test("minhash-LSH candidates cover the exact high-jaccard pairs") {
    val exact = Dedup.dedupNgramJaccard(spark, Sf, tau = 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = Dedup.dedupMinhashLsh(spark, Sf, tau = 0.5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // banded LSH with 8 bands of 4 at J≥0.9 has recall ≈ 1 - (1-0.9^4)^8 ≈ 0.97;
    // require full recall on this small corpus
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed exact pairs: $missed")
  }

  test("dedup_eval: one summary row whose counts equal the recomputed pair sets") {
    val row = Dedup.dedupEval(spark, Sf).collect() match {
      case Array(r) => r
      case other => fail(s"expected one summary row, got ${other.length}")
    }
    val nTrue = row.getAs[Long]("n_true")
    val nPred = row.getAs[Long]("n_pred")
    val nHit = row.getAs[Long]("n_hit")
    assert(nTrue > 0, "eval corpus has no true near-dup pairs — eval is vacuous")
    assert(nHit <= math.min(nTrue, nPred))
    assert(row.getAs[Double]("precision") >= 0.0 && row.getAs[Double]("precision") <= 1.0)
    assert(row.getAs[Double]("recall") >= 0.0 && row.getAs[Double]("recall") <= 1.0)
    // counts equal an independent recomputation from the two operators
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val truth = pairs(Dedup.dedupNgramJaccard(spark, Sf, n = 9))
    val pred = pairs(Dedup.dedupMinhashLsh(spark, Sf))
    assert(nTrue == truth.size && nPred == pred.size && nHit == (truth & pred).size)
  }

  test("simhash near-dup pairs have small hamming distance") {
    val rows = Dedup.dedupSimhash(spark, Sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
  }

  test("dedup_embedding_ann equals the exact all-pairs scan on the augmented corpus") {
    import org.apache.spark.sql.functions._
    // Exact twin: brute-force all-pairs τ-join over the SAME augmented
    // corpus (originals + 64 planted perturbed copies) — the candidate
    // stage of the ANN path must prune without losing a single pair.
    val all = Dedup.augmentedEmbeddings(spark, Sf)
    val exact = all.select(col("id").as("id_a"), col("v").as("va"))
      .crossJoin(all.select(col("id").as("id_b"), col("v").as("vb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosine_similarity(col("va"), col("vb")), 4))
      .filter(col("cosine") >= 0.9)
      .select("id_a", "id_b", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ann = Dedup.dedupEmbeddingAnn(spark, Sf, augmentPlanted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "augmentation must plant near-dup pairs")
    assert(ann == exact,
      s"ANN missed ${(exact -- ann).size}, extra ${(ann -- exact).size}")
    // every planted copy found its source at near-unity cosine
    assert(exact.size >= 64 && exact.forall(_._3 >= 0.99))
  }

  test("dedup_embedding_ann recall holds when the ADAPTIVE plane count engages (nP > 12)") {
    import org.apache.spark.sql.functions._
    // The corpus-adaptive plane count only exceeds the oracle-verified
    // 12 beyond the driver SFs (n/2 > 4096), where the all-pairs DuckDB
    // oracle can't follow — so correctness there needs its own gate.
    // Build a 10k-vector deterministic corpus: ids 5000..5199 are
    // eps-perturbed copies of 0..199 (in-base true pairs at cos≈0.9998,
    // sitting at arbitrary bucket margins), everything else i.i.d.
    // gaussian (cross cosines concentrate in ±0.125·k, so τ=0.9 keeps
    // exactly the planted families). Assert: ANN output restricted to a
    // sampled slice EQUALS the exact scan of that slice vs the whole
    // corpus — candidate recall 1.0 with more planes than the spec'd
    // SFs ever use.
    val n = 10000
    val dim = 64
    assert(math.ceil(math.log((n + 64) / 2.0) / math.log(2.0)).toInt > 12,
      "test corpus too small to engage the adaptive plane count")
    val dir = java.nio.file.Files.createTempDirectory("graft-annadapt").toString
    def gauss(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextGaussian())
    }
    val vecs: Array[Array[Double]] = (0 until n).map { i =>
      if (i >= 5000 && i < 5200) {
        val src = gauss(i - 5000); val p = gauss(i)
        src.zip(p).map { case (x, e) => x + 0.02 * e }
      } else gauss(i)
    }.toArray
    import spark.implicits._
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }.toSeq
      .toDF("vec_id", "embedding")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val ann = Dedup.dedupEmbeddingAnn(spark, dir, augmentPlanted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sampled slice: both planted families, their augmented copies, and
    // a spread of arbitrary ids
    val slice = ((0 until 200) ++ (5000 until 5200) ++ (0 until n by 251))
      .map(_.toLong).toSet ++ (1000000L until 1000064L)
    val all = Dedup.augmentedEmbeddings(spark, dir)
    val sliceDf = all.filter(col("id").isInCollection(slice))
      .select(col("id").as("id_a"), col("v").as("va"))
    val exact = sliceDf.crossJoin(all.select(col("id").as("id_b"), col("v").as("vb")))
      .filter(col("id_a") =!= col("id_b"))
      .filter(round(graft.functions.VectorFunctions.cosine_similarity(col("va"), col("vb")), 4) >= 0.9)
      .select(least(col("id_a"), col("id_b")).as("a"), greatest(col("id_a"), col("id_b")).as("b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both planted families must be non-trivially present
    assert(exact.size >= 264, s"expected >=264 true slice pairs, got ${exact.size}")
    val annSlice = ann.filter { case (a, b) => slice(a) || slice(b) }
    assert(exact == annSlice,
      s"adaptive-plane ANN missed ${(exact -- annSlice).size}, extra ${(annSlice -- exact).size}")
  }

  test("dedup_semantic drops exactly the higher-id members of within-cell near-dup pairs") {
    import org.apache.spark.sql.functions._
    val out = Dedup.dedupSemantic(spark, Sf, augmentPlanted = true).collect()
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dropped = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // reconstruct the expected drop set from the operator's own cell
    // assignment + the exact cosine over the same augmented corpus
    val vecs = Dedup.augmentedEmbeddings(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toArray.sorted
    val expected = (for {
      bi <- ids.indices.iterator
      ai <- 0 until bi
      if cellOf(ids(ai)) == cellOf(ids(bi))
      if BigDecimal(cos(vecs(ids(ai)), vecs(ids(bi)))).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.9
    } yield ids(bi)).toSet
    assert(dropped == expected,
      s"missing ${(expected -- dropped).size}, extra ${(dropped -- expected).size}")
    // the planted copies make the drop set non-trivial: a planted copy
    // sharing its source's cell must always be dropped
    val plantedSameCell = ids.filter(id => id >= 1000000L &&
      cellOf.get(id - 1000000L).contains(cellOf(id)))
    assert(plantedSameCell.nonEmpty && plantedSameCell.forall(dropped))
  }

  test("dedup_cross_corpus equals the exact corpus × reference scan") {
    import org.apache.spark.sql.functions._
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id").cast("long").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val refs = corpus.filter(col("id") < 64)
      .select((col("id") + 1000000L).as("ref_id"),
        expr("transform(v, (x, i) -> x + 0.02 * ((((id * 64 + i) * 2654435761) % 2001) - 1000) / 1000.0)").as("rv"))
    val exact = corpus.crossJoin(refs)
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosine_similarity(col("v"), col("rv")), 4))
      .filter(col("cosine") >= 0.9)
      .select("id", "ref_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.dedupCrossCorpus(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.size >= 64, "each reference vector must hit its source")
    assert(lsh == exact, s"missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
  }

  test("dedup_cross_corpus accepts an arbitrary caller-supplied reference set") {
    import org.apache.spark.sql.functions._
    // a production-shaped reference set unrelated to the planted
    // construction: exact copies of three corpus vectors (must hit at
    // cosine 1.0) plus one scaled copy (cosine-invariant, must also
    // hit) — verified against the exact cross-scan
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id").cast("long").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val refs = corpus.filter(col("id").isin(7L, 19L, 42L))
      .select((col("id") + 500L).as("ref_id"), col("v").as("rv"))
      .unionAll(corpus.filter(col("id") === 42L)
        .select(lit(999L).as("ref_id"),
          expr("transform(v, x -> x * 3.0)").as("rv")))
    val exact = corpus.crossJoin(refs)
      .withColumn("cosine",
        round(graft.functions.VectorFunctions.cosine_similarity(col("v"), col("rv")), 4))
      .filter(col("cosine") >= 0.9)
      .select("id", "ref_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.dedupCrossCorpusRefs(spark, Sf, refs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.exists { case (id, rid, c) => id == 42L && rid == 999L && c == 1.0 },
      "scaled copy must match its source at cosine 1.0")
    assert(got == exact, s"missed ${(exact -- got).size}, extra ${(got -- exact).size}")
  }

  test("distributed star-contraction components equal driver union-find on the same graph") {
    // force BOTH paths over the identical real pair list: driverEdgeCap=0
    // routes through the iterative large-star/small-star loop,
    // Long.MaxValue through the driver union-find fast path
    val pairs = Dedup.dedupNgramJaccard(spark, Sf).cache()
    val viaLoop = Dedup.connectedComponents(pairs, driverEdgeCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaUf = Dedup.connectedComponents(pairs, driverEdgeCap = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLoop.nonEmpty && viaLoop == viaUf,
      s"loop-only ${(viaLoop -- viaUf).size}, uf-only ${(viaUf -- viaLoop).size}")
    pairs.unpersist()
  }

  test("star contraction labels a deep chain correctly in logarithmic rounds") {
    // a 4000-hop path (diameter 4000) — the old min-label propagation
    // needed one round per hop and SILENTLY split this into ~200
    // clusters at maxIter=20; star contraction must label all nodes 0
    // within its default round budget, and convergence failure throws
    import org.apache.spark.sql.functions.col
    val n = 4000L
    val chain = spark.range(0, n - 1).select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val labels = Dedup.connectedComponents(chain.toDF, driverEdgeCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L),
      s"${labels.count(_._2 != 0L)} of $n chain nodes not labeled with the component min")
  }

  test("dedup clusters: every pair lands in one cluster, keepers are cluster minima") {
    val pairs = Dedup.dedupNgramJaccard(spark, Sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val clusters = Dedup.dedupClusters(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // paired docs share a cluster
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b), s"pair ($a,$b) split") }
    // cluster id is the minimum member id
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid min is ${members.keys.min}")
    }
    // row count = corpus size (singletons included)
    assert(clusters.size == Tables.documents(spark, Sf).count())
  }

  test("connected components: driver union-find and distributed loop agree") {
    import spark.implicits._
    // random-ish multi-component graph incl. a chain (worst case for
    // label propagation rounds) and isolated pairs
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (20L, 21L), (21L, 20L)) ++
      (0 until 50).map(i => (100L + i, 100L + (i * 7) % 50))).toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.connectedComponentsLoop(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop, s"paths disagree: fast=$fast loop=$loop")
    // the chain collapses to its minimum
    assert(fast(5L) == 1L)
  }

  test("embedding nearest-neighbor matches a naive scan") {
    val rows = Dedup.dedupEmbedding(spark, Sf).collect()
    val vecs = Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // spot-check 10 vectors
    rows.take(10).foreach { r =>
      val id = r.getAs[Long]("id_a")
      val v = vecs.find(_._1 == id).get._2
      val best = vecs.filter(_._1 != id).maxBy(o => cos(v, o._2))
      assert(r.getAs[Long]("nearest") == best._1,
        s"vec $id: got ${r.getAs[Long]("nearest")}, naive ${best._1}")
    }
  }

  test("brute-force top-k is exact and ordered") {
    val rows = Similarity.simBruteforceTopK(spark, Sf, nQueries = 3, k = 5).collect()
    assert(rows.length == 15)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, grp) =>
      val cosines = grp.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sim_ivf_sq8: exact re-rank recovers sim_ivf_ann's output; approx recall measured") {
    import org.apache.spark.sql.functions._
    val exactServe = Similarity.simIvfAnn(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val sq8Serve = Similarity.simIvfSq8(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(sq8Serve == exactServe,
      s"SQ8-served top-k diverges from float-served: ${sq8Serve.diff(exactServe).take(3)}")
    // pre-rerank candidate quality: the approximate (int8) top-k per
    // query must already contain nearly all of the true top-k — the
    // number that justifies the 4x over-fetch margin
    val truth = exactServe.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.simIvfSq8(spark, Sf, rerank = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"pre-rerank approx recall@10 (rerank=1): $mean%.3f")
    assert(mean >= 0.9, f"int8 approximate ranking degraded: recall $mean%.3f")
  }

  test("sim_ivf_pq: exact re-rank recovers sim_ivf_ann's output; approx recall measured") {
    val exactServe = Similarity.simIvfAnn(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val pqServe = Similarity.simIvfPq(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(pqServe == exactServe,
      s"PQ-served top-k diverges from float-served: ${pqServe.diff(exactServe).take(3)}")
    // pre-rerank candidate quality: how much of the true top-k the
    // 8-byte codes alone rank into the top k — the number that sizes
    // the 32x over-fetch margin (well below SQ8's ≥0.9: a 256-centroid
    // 8-dim subspace is a far coarser reconstruction, and the measured
    // unseen-vector equality threshold is rerank=24 at sf0.1)
    val truth = exactServe.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.simIvfPq(spark, Sf, rerank = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"pre-rerank approx recall@10 (rerank=1): $mean%.3f")
    assert(mean >= 0.4, f"PQ approximate ranking degraded: recall $mean%.3f")
  }

  test("ivf index append: idempotent, and accretes to exactly the one-shot index") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val delta = Tables.embeddings(spark, Sf).filter(col("vec_id") % 10 === 0)
    // builds base (vec_id % 10 != 0), appends the held-out delta once
    val served = Similarity.simIvfAnnIncremental(spark, Sf).collect()
    val table = Similarity.ivfIndexTableIncremental(spark, Sf)
    val nAfterFirst = spark.table(table).count()
    // redelivered batch → anti-join no-op
    Similarity.ivfIndexAppend(spark, table, delta)
    assert(spark.table(table).count() == nAfterFirst)
    // accreted (vec_id, bucket) content equals the one-shot index
    val oneShot = spark.table(Similarity.ivfIndexTable(spark, Sf))
      .select("vec_id", "bucket")
    val accreted = spark.table(table).select("vec_id", "bucket")
    assert(accreted.except(oneShot).isEmpty && oneShot.except(accreted).isEmpty)
    // serving from the accreted index equals the inline operator
    val inline = Similarity.simIvfAnn(spark, Sf).collect()
    assert(served.map(_.toString).toSeq == inline.map(_.toString).toSeq)
  }

  test("corpus forget: tombstones flip flags immediately; purge makes it physical") {
    import org.apache.spark.sql.functions._
    // clean slate for this JVM's parameterization (derived state only)
    val (bandsT, hashesT) = Dedup.corpusStateTables(spark, Sf)
    val tombsT = Dedup.corpusTombstonesTable(spark, Sf)
    spark.sql(s"TRUNCATE TABLE $tombsT")
    val plain = Dedup.dedupIncrementalPersisted(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    val got = Dedup.pipeCorpusForget(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    assert(got.keySet == plain.keySet)
    // forgetting can only REMOVE flags, never add them; and on this
    // corpus it provably flips at least one (non-vacuous)
    val changed = got.filter { case (d, f) => f != plain(d) }
    assert(changed.nonEmpty, "forgetting half the corpus flipped nothing — vacuous")
    changed.foreach { case (d, (e, nd)) =>
      assert((!e || plain(d)._1) && (!nd || plain(d)._2), s"forget ADDED a flag for $d")
    }
    // redelivered deletion request: tombstone append is a no-op
    val nTombs = spark.table(tombsT).count()
    Dedup.forgetFromCorpus(spark, Sf,
      Tables.documents(spark, Sf).filter(col("doc_id") % 2 === 1).select("doc_id"))
    assert(spark.table(tombsT).count() == nTombs)
    // physical purge: state rows for tombstoned docs disappear, the
    // tombstone table empties, and the PLAIN probe now agrees with
    // the tombstone-aware one — deletion became permanent
    Dedup.purgeCorpusTombstones(spark, Sf)
    assert(spark.table(tombsT).isEmpty)
    assert(spark.table(bandsT).filter(col("doc_id") % 2 === 1).isEmpty)
    assert(spark.table(hashesT).filter(col("doc_id") % 2 === 1).isEmpty)
    val plainAfter = Dedup.dedupIncrementalPersisted(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    assert(plainAfter == got)
    // restore: drop the purged derived state so later suites rebuild
    // the full corpus state from scratch
    Seq(bandsT, hashesT, tombsT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("corpus forget: redelivery stays dead (suppression list); reinstate restores instantly") {
    import org.apache.spark.sql.functions._
    val (bandsT, hashesT) = Dedup.corpusStateTables(spark, Sf)
    val tombsT = Dedup.corpusTombstonesTable(spark, Sf)
    spark.sql(s"TRUNCATE TABLE $tombsT")
    val docs = Tables.documents(spark, Sf)
    val odd = docs.filter(col("doc_id") % 2 === 1).select("doc_id")
    Dedup.forgetFromCorpus(spark, Sf, odd)
    def probe(): Map[Long, (Boolean, Boolean)] =
      Dedup.dedupIncrementalForget(spark, Sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    val afterForget = probe()
    // an at-least-once upstream REDELIVERS forgotten documents: the
    // append must swallow them (suppression-list semantics) — probes
    // unchanged, tombstones unchanged
    val nTombs = spark.table(tombsT).count()
    Dedup.appendShardToCorpus(spark, Sf, odd.limit(20))
    assert(spark.table(tombsT).count() == nTombs)
    assert(probe() == afterForget,
      "redelivered forgotten docs resurfaced without an explicit reinstate")
    // explicit re-consent: reinstating ALL forgotten ids empties the
    // tombstones and the tombstone-aware probe must equal the plain
    // one again — instantly, no purge, no re-ingest (signatures never
    // physically left)
    Dedup.reinstateInCorpus(spark, Sf, odd)
    assert(spark.table(tombsT).isEmpty)
    val plain = Dedup.dedupIncrementalPersisted(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    assert(probe() == plain,
      "reinstated corpus diverges from the never-forgotten probe")
    // reinstating ids that are not tombstoned is a no-op
    Dedup.reinstateInCorpus(spark, Sf, odd.limit(3))
    assert(spark.table(tombsT).isEmpty)
    CacheRegistry.releaseAll()
  }

  test("ivf index forget: surgical partition rewrite — untouched cells byte-identical") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val table = Similarity.ivfIndexTableForget(spark, Sf)
    // (re)build from scratch so this spec owns the mutation sequence
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.ivfIndexTableForget(spark, Sf)
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(wh, table.toLowerCase)
    def fileState(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => loc.relativize(p).toString ->
          (java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
      finally walk.close()
    }
    val before = fileState()
    val ids = Tables.embeddings(spark, Sf).filter(col("vec_id") % 10 === 0).select("vec_id")
    val touched = spark.table(table).join(ids, Seq("vec_id"), "left_semi")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(touched.nonEmpty)
    Similarity.ivfIndexForget(spark, table, ids)
    val after = fileState()
    // forgotten rows are gone; survivors intact
    val left = spark.table(table)
    assert(left.join(ids, Seq("vec_id"), "left_semi").isEmpty)
    val expect = Tables.embeddings(spark, Sf).filter(col("vec_id") % 10 =!= 0).count()
    assert(left.count() == expect)
    // every file in an UNTOUCHED cell is byte-identical (same path,
    // size, mtime) — the deletion never rewrote them
    def cellOf(rel: String): Option[Int] =
      "bucket=(\\d+)".r.findFirstMatchIn(rel).map(_.group(1).toInt)
    before.foreach { case (rel, st) =>
      cellOf(rel).foreach { c =>
        if (!touched(c))
          assert(after.get(rel).contains(st), s"untouched cell $c file $rel changed")
      }
    }
    // idempotent: forgetting the same ids again changes nothing
    val snap = fileState()
    Similarity.ivfIndexForget(spark, table, ids)
    assert(fileState() == snap)
  }

  test("ivf index lifecycle: interleaved append→forget→append on ONE table equals set algebra") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    // the production sequence the dedicated-table specs above never
    // compose: one index, mutated repeatedly, re-adding previously
    // forgotten ids — must end indistinguishable from an index built
    // once over exactly the surviving id set
    val table = Similarity.ivfIndexTableForget(spark, Sf)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.ivfIndexTableForget(spark, Sf) // full-corpus build
    val emb = Tables.embeddings(spark, Sf)
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    // keep the query ids (vec_id < 5) live throughout so serving
    // compares like-for-like
    val f1 = all.filter(id => id % 10 == 0 && id >= 5)
    val a1 = f1.filter(_ % 20 == 0)  // re-add HALF the forgotten ids
    val f2 = all.filter(id => id % 7 == 3 && id >= 5)
    val a2 = f2.filter(_ % 14 == 3)  // and again, different partition
    def idsDf(s: Set[Long]) = {
      import spark.implicits._
      s.toSeq.sorted.toDF("vec_id")
    }
    def vecsOf(s: Set[Long]) = emb.join(idsDf(s), Seq("vec_id"), "left_semi")
    Similarity.ivfIndexForget(spark, table, idsDf(f1))
    Similarity.ivfIndexAppend(spark, table, vecsOf(a1))
    Similarity.ivfIndexForget(spark, table, idsDf(f2))
    Similarity.ivfIndexAppend(spark, table, vecsOf(a2))
    val live = ((all -- f1) ++ a1 -- f2) ++ a2
    val got = spark.table(table).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == live, s"table ids diverge from set algebra: " +
      s"extra=${(got -- live).take(5)} missing=${(live -- got).take(5)}")
    val servedInterleaved = Similarity.serveFromIndex(
      spark, Sf, table, nQueries = 5, k = 10, nprobe = 4,
      graft.operators.IvfCodebook.centroids).collect().map(_.toString).toSeq
    // canonical twin: rebuild from scratch, ONE forget of (all \ live)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.ivfIndexTableForget(spark, Sf)
    Similarity.ivfIndexForget(spark, table, idsDf(all -- live))
    val servedCanonical = Similarity.serveFromIndex(
      spark, Sf, table, nQueries = 5, k = 10, nprobe = 4,
      graft.operators.IvfCodebook.centroids).collect().map(_.toString).toSeq
    assert(servedInterleaved == servedCanonical,
      "serving after interleaved mutations diverges from the one-forget twin")
    assert(servedInterleaved.nonEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $table") // later suites own a fresh build
  }

  test("re-fit codebook builds a DISTINCT index table (content hash, not size)") {
    import graft.operators.{IvfCodebook, Similarity}
    // the aliasing hazard: a re-fit codebook has the same nlist as the
    // frozen one, so a size-keyed name would silently serve stale cells
    val frozen = IvfCodebook.centroids
    val perturbed = frozen.map(_.clone())
    perturbed(0)(0) += 1e-3
    val t1 = Similarity.ivfIndexTable(spark, Sf, frozen)
    val t2 = Similarity.ivfIndexTable(spark, Sf, perturbed)
    assert(t1 != t2, "content hash failed to separate two same-size codebooks")
    assert(spark.catalog.tableExists(t1) && spark.catalog.tableExists(t2))
    // same ids indexed in both, but assignment follows each codebook
    assert(spark.table(t1).count() == spark.table(t2).count())
    spark.sql(s"DROP TABLE IF EXISTS $t2") // the perturbed twin is spec-only
  }

  test("ivf index suppressed forget: redelivered vectors stay dead until reinstate") {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val table = Similarity.ivfIndexTableForget(spark, Sf)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_sup")
    Similarity.ivfIndexTableForget(spark, Sf) // full-corpus build
    val emb = Tables.embeddings(spark, Sf)
    val gone = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
    val nGone = gone.count()
    Similarity.ivfIndexForget(spark, table, gone, suppress = true)
    val nAfter = spark.table(table).count()
    assert(spark.table(table).join(gone, Seq("vec_id"), "left_semi").isEmpty)
    // an at-least-once upstream redelivers the deleted vectors: the
    // suppressed append must swallow them entirely
    Similarity.ivfIndexAppend(spark, table, emb.filter(col("vec_id") % 10 === 0))
    assert(spark.table(table).count() == nAfter,
      "suppressed vectors resurfaced through a redelivered append")
    // suppressed forget is idempotent (no duplicate suppression rows)
    Similarity.ivfIndexForget(spark, table, gone, suppress = true)
    assert(spark.table(s"${table}_sup").count() == nGone)
    // explicit re-consent: reinstate half, redeliver all — only the
    // reinstated half is accepted
    val back = emb.filter(col("vec_id") % 20 === 0).select("vec_id")
    Similarity.ivfIndexReinstate(spark, table, back)
    Similarity.ivfIndexAppend(spark, table, emb.filter(col("vec_id") % 10 === 0))
    val ids = spark.table(table).select("vec_id").collect().map(_.getLong(0)).toSet
    val backIds = back.collect().map(_.getLong(0)).toSet
    val stillGone = gone.collect().map(_.getLong(0)).toSet -- backIds
    assert(backIds.subsetOf(ids), "reinstated vectors not re-accepted")
    assert(ids.intersect(stillGone).isEmpty, "non-reinstated vectors resurfaced")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_sup")
  }

  test("reinstate crash windows: staged rewrite never loses another user's suppression") {
    import org.apache.spark.sql.functions._
    import graft.operators.StagedRewrite
    val tombsT = Dedup.corpusTombstonesTable(spark, Sf)
    spark.sql(s"TRUNCATE TABLE $tombsT")
    val docs = Tables.documents(spark, Sf)
    val forgotten = docs.filter(col("doc_id") % 2 === 1).select("doc_id")
    Dedup.forgetFromCorpus(spark, Sf, forgotten)
    val all = spark.table(tombsT).collect().map(_.getLong(0)).toSet
    assert(all.size > 5)
    val backIds = all.toSeq.sorted.take(5)
    val expectedKeep = all -- backIds
    import spark.implicits._
    val back = backIds.toDF("doc_id")
    // window 1: crash AFTER the durable stage write, BEFORE the commit
    // marker — the target must be untouched and the garbage stage dropped
    intercept[RuntimeException] {
      Dedup.reinstateInCorpus(spark, Sf, back,
        afterStage = () => throw new RuntimeException("injected crash after stage"))
    }
    assert(spark.table(Dedup.corpusTombstonesTable(spark, Sf)).count() == all.size,
      "pre-commit crash mutated the tombstone table")
    assert(!spark.catalog.tableExists(StagedRewrite.stageTable(tombsT)),
      "garbage stage not cleaned by recover")
    // window 2: THE old data-loss window — crash between the TRUNCATE
    // and the re-append (the localCheckpoint era lost EVERY remaining
    // suppression here, and re-running was a no-op)
    intercept[RuntimeException] {
      Dedup.reinstateInCorpus(spark, Sf, back,
        afterTruncate = () => throw new RuntimeException("injected crash after truncate"))
    }
    // raw read: the table IS mid-swap empty — the window is real...
    assert(spark.table(tombsT).isEmpty, "crash window not reached")
    // ...but every consumer routes through the accessor, which heals
    // from the durable stage before reading
    val healed = spark.table(Dedup.corpusTombstonesTable(spark, Sf))
      .collect().map(_.getLong(0)).toSet
    assert(healed == expectedKeep, "a non-reinstated suppression entry was lost")
    // re-running the interrupted reinstate is a clean no-op and leaves
    // no protocol residue behind
    Dedup.reinstateInCorpus(spark, Sf, back)
    assert(spark.table(tombsT).collect().map(_.getLong(0)).toSet == expectedKeep)
    assert(!spark.catalog.tableExists(StagedRewrite.stageTable(tombsT)) &&
      !spark.catalog.tableExists(StagedRewrite.markerTable(tombsT)))
    spark.sql(s"TRUNCATE TABLE $tombsT")
    CacheRegistry.releaseAll()
  }

  test("ivf reinstate crash window: suppression survives mid-swap; redelivery stays dead") {
    import org.apache.spark.sql.functions._
    val table = Similarity.ivfIndexTableForget(spark, Sf)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_sup")
    Similarity.ivfIndexTableForget(spark, Sf) // full-corpus build
    val emb = Tables.embeddings(spark, Sf)
    val gone = emb.filter(col("vec_id") % 10 === 0).select("vec_id")
    Similarity.ivfIndexForget(spark, table, gone, suppress = true)
    val supT = s"${table}_sup"
    val allSup = spark.table(supT).collect().map(_.getLong(0)).toSet
    val back = emb.filter(col("vec_id") % 20 === 0).select("vec_id")
    val backIds = back.collect().map(_.getLong(0)).toSet
    val expectedKeep = allSup -- backIds
    assert(expectedKeep.nonEmpty)
    intercept[RuntimeException] {
      Similarity.ivfIndexReinstate(spark, table, back,
        afterTruncate = () => throw new RuntimeException("injected crash after truncate"))
    }
    assert(spark.table(supT).isEmpty, "crash window not reached") // raw mid-swap read
    // the next redelivered append heals FIRST (recover hook), then
    // admits exactly the reinstated half — no suppression entry lost,
    // no suppressed vector resurrected
    Similarity.ivfIndexAppend(spark, table, emb.filter(col("vec_id") % 10 === 0))
    assert(spark.table(supT).collect().map(_.getLong(0)).toSet == expectedKeep,
      "a suppression entry was lost to the mid-swap crash")
    val ids = spark.table(table).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(backIds.subsetOf(ids), "reinstated vectors not re-accepted after heal")
    assert(ids.intersect(expectedKeep).isEmpty,
      "suppressed vectors resurfaced after the crash")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $supT")
  }

  test("sim_knn_graph: well-formed NN-Descent graph; edge recall vs exact knn above floor") {
    import org.apache.spark.sql.functions._
    val k = 10
    val g = Similarity.simKnnGraph(spark, Sf).collect()
    val n = Tables.embeddings(spark, Sf).count()
    val byV = g.groupBy(_.getAs[Long]("vec_id"))
    assert(byV.size == n, "every vertex must carry a neighbor list")
    byV.foreach { case (v, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length.toLong), s"ranks not dense for $v")
      assert(rows.forall(_.getAs[Long]("nbr_id") != v), s"self edge at $v")
      assert(rows.map(_.getAs[Long]("nbr_id")).distinct.length == rows.length,
        s"duplicate neighbor at $v")
      assert(rows.length == k, s"vertex $v has ${rows.length} != $k neighbors")
    }
    // graph quality: fraction of the TRUE top-k edges (exact all-pairs
    // per vertex) present after 3 descent rounds — the number the
    // WWW'11 paper tracks
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val ex = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        graft.functions.VectorFunctions.cosine_similarity(col("x.v"), col("y.v")).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("a")
          .orderBy(col("c").desc, col("b"))))
      .filter(col("rn") <= k)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = g.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
    val recall = (ex & got).size.toDouble / ex.size
    info(f"knn-graph edge recall vs exact: $recall%.3f (n=$n)")
    // measured 0.779 at n=500 with the reverse-degree cap (0.831
    // uncapped) — floor set with margin under the measured value
    assert(recall >= 0.7, f"NN-Descent recall $recall%.3f below floor after 3 rounds")
  }

  test("sim_knn_graph converged production form: terminates, well-formed, at/above fixed-T recall") {
    import org.apache.spark.sql.functions._
    val k = 10
    val conv = Similarity.simKnnGraphConverged(spark, Sf).collect()
    val n = Tables.embeddings(spark, Sf).count()
    val byV = conv.groupBy(_.getAs[Long]("vec_id"))
    assert(byV.size == n)
    byV.foreach { case (v, rows) =>
      assert(rows.length == k && rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to k.toLong), s"malformed neighbor list at $v")
    }
    val e = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val exact = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        graft.functions.VectorFunctions.cosine_similarity(col("x.v"), col("y.v")).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("a")
          .orderBy(col("c").desc, col("b"))))
      .filter(col("rn") <= k)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val convEdges = conv.map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
    val fixedEdges = Similarity.simKnnGraph(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
    val rConv = (exact & convEdges).size.toDouble / exact.size
    val rFixed = (exact & fixedEdges).size.toDouble / exact.size
    info(f"converged recall $rConv%.3f vs fixed-T harness $rFixed%.3f")
    // running to convergence with LSH-seeded init must never lose to
    // the fixed-T contract harness (at 10x the gap is 0.96-vs-0.00 on
    // the replica — tools.IvfRecallEval's measured rows)
    assert(rConv >= rFixed,
      f"converged form ($rConv%.3f) below the fixed-T harness ($rFixed%.3f)")
    CacheRegistry.releaseAll()
  }

  test("knn graph forget: deleted vectors vanish from BOTH sides; survivors untouched; crash-safe") {
    import org.apache.spark.sql.functions._
    val table = Similarity.knnGraphTable(spark, Sf)
    // rebuild fresh so this spec owns the table's mutation sequence
    spark.sql(s"DROP TABLE IF EXISTS $table")
    Similarity.knnGraphTable(spark, Sf)
    val before = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
    import spark.implicits._
    val delIds = Set(1L, 7L, 42L)
    val del = delIds.toSeq.toDF("vec_id")
    Similarity.knnGraphForget(spark, table, del)
    val after = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
    // gone from both sides
    assert(!after.exists(r => delIds(r._1) || delIds(r._3)),
      "a deleted vector survived in the graph")
    // survivors byte-equal: exactly the before-rows not touching del,
    // original ranks preserved (gaps are the auditable deletion trace)
    val expect = before.filterNot(r => delIds(r._1) || delIds(r._3)).toSet
    assert(after.toSet == expect, "forget disturbed surviving rows")
    // idempotent re-run is a no-op
    Similarity.knnGraphForget(spark, table, del)
    assert(spark.table(table).collect().length == after.length)
    // crash between TRUNCATE and re-append: the durable stage heals
    // via recover-on-next-mutation, losing nothing
    val del2 = Seq(3L).toDF("vec_id")
    intercept[RuntimeException] {
      graft.operators.StagedRewrite.rewrite(spark, table,
        spark.table(table)
          .join(broadcast(del2.select(col("vec_id"))), Seq("vec_id"), "left_anti"),
        afterTruncate = () => throw new RuntimeException("injected crash"))
    }
    assert(spark.table(table).isEmpty, "crash window not reached") // raw mid-swap
    Similarity.knnGraphForget(spark, table, del2) // heals, then applies
    val healed = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    assert(healed.nonEmpty && !healed.exists(p => p._1 == 3L || p._2 == 3L))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("knn graph suppression: suppressing forget blocks re-append until reinstate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 10
    val full = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    val table = "graft_knn_graph_sup_spec"
    val supT = s"${table}_sup"
    Seq(table, supT).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    Similarity.knnDescentConverged(spark, full, k)
      .write.format("parquet").saveAsTable(table)
    val delIds = Set(20L, 40L)
    val del = delIds.toSeq.toDF("vec_id")
    // compliance mode: physical removal AND the suppression record
    Similarity.knnGraphForget(spark, table, del, suppress = true)
    assert(spark.table(supT).collect().map(_.getLong(0)).toSet == delIds)
    val afterForget = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"))).toSet
    assert(!afterForget.exists(r => delIds(r._1) || delIds(r._3)))
    // an at-least-once upstream redelivers the whole corpus: the
    // append's suppression anti-join must keep the forgotten vectors
    // out — graph unchanged row for row (empty frontier, early return)
    Similarity.knnGraphAppend(spark, table, full, k)
    val afterApp = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"))).toSet
    assert(afterApp == afterForget, "suppressed redelivery mutated the graph")
    // suppress re-run is idempotent (no duplicate list entries)
    Similarity.knnGraphForget(spark, table, del, suppress = true)
    assert(spark.table(supT).count() == delIds.size)
    // reinstate (user re-consents): list empties, the next append
    // re-admits the vectors with well-formed 1..k lists
    Similarity.knnGraphReinstate(spark, table, del)
    assert(spark.table(supT).isEmpty)
    Similarity.knnGraphAppend(spark, table, full, k)
    val back = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id")))
    val byV = back.groupBy(_._1)
    assert(byV.size == full.count(), "reinstated vectors missing from the graph")
    delIds.foreach { id =>
      val rows = byV(id)
      assert(rows.length == k && rows.map(_._2).sorted.toSeq == (1L to k.toLong),
        s"malformed neighbor list at reinstated $id")
    }
    Seq(table, supT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CacheRegistry.releaseAll()
  }

  test("sim_knn_components: labels equal union-find over the thresholded graph edges") {
    val tau = 0.4
    val comp = Similarity.simKnnComponents(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_rep"))).toMap
    val n = Tables.embeddings(spark, Sf).count()
    assert(comp.size == n, "every vector must carry a cluster row")
    // independent recomputation: thresholded graph edges → driver
    // union-find (the same truth the oracle derives by path doubling)
    val pairs = Similarity.simKnnGraph(spark, Sf).collect()
      .filter(_.getAs[Double]("cosine") >= tau)
      .map(r => (math.min(r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")),
        math.max(r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))).distinct
    assert(pairs.nonEmpty, "threshold leaves no edges — spec is vacuous")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    comp.foreach { case (v, (label, isRep)) =>
      assert(label == find(v), s"vector $v labeled $label, union-find says ${find(v)}")
      assert(isRep == (label == v))
    }
    // non-vacuous: at least one multi-member cluster exists
    val sizes = comp.values.groupBy(_._1).map(_._2.size)
    assert(sizes.exists(_ > 1), "no multi-member cluster — threshold too high")
    CacheRegistry.releaseAll()
  }

  test("sim_knn_label_prop: labels confined to components, deterministic, non-trivial") {
    // NOTE the embeddings' `label` column is NOT geometric ground
    // truth — measured: knn edges connect same-label pairs at the
    // 0.10 random rate — so there is no purity-vs-truth contract any
    // community algorithm could meet. The spec pins LPA's actual
    // invariants instead; correctness of every round is already
    // hash-verified by the DuckDB replay.
    val lp = Similarity.simKnnLabelProp(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    val n = Tables.embeddings(spark, Sf).count()
    assert(lp.size == n, "every vector must carry a community label")
    // labels are vertex ids (fixpoint of propagation seeds)
    assert(lp.values.forall(lp.keySet.contains), "a label escaped the vertex id space")
    // INVARIANT: labels only travel along edges, so two vertices
    // sharing an LPA label must share a connected component of the
    // undirected graph
    val edges = Similarity.simKnnGraph(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    lp.foreach { case (v, lbl) =>
      assert(find(v) == find(lbl),
        s"vertex $v labeled $lbl from a different component")
    }
    // non-trivial: propagation actually merged vertices
    val nComm = lp.values.toSet.size
    info(s"label-prop: $nComm communities over $n vertices")
    assert(nComm < n / 2, "propagation barely merged anything")
    assert(nComm > 1, "propagation collapsed to one community")
    // deterministic: a second run (fresh plan, same persisted graph)
    // reproduces the labeling bit for bit
    val again = Similarity.simKnnLabelProp(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    assert(again == lp, "label propagation is not deterministic")
    CacheRegistry.releaseAll()
  }

  test("sim_knn_diversity: independence and coverage of the maximal independent set") {
    val tau = 0.4
    val sel = Similarity.simKnnDiversity(spark, Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("selected")).toMap
    val n = Tables.embeddings(spark, Sf).count()
    assert(sel.size == n, "every vector must carry a selection row")
    val edges = Similarity.simKnnGraph(spark, Sf).collect()
      .filter(_.getAs[Double]("cosine") >= tau)
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    assert(edges.nonEmpty, "threshold leaves no edges — spec is vacuous")
    // INDEPENDENCE: no two selected documents are ≥τ-similar
    edges.foreach { case (a, b) =>
      assert(!(sel(a) && sel(b)), s"τ-similar pair ($a,$b) both selected")
    }
    // COVERAGE (maximality): every unselected document is ≥τ-similar
    // to a selected one — this also proves zero vertices were left
    // undecided by the fixed round count (an undecided vertex would
    // be unselected with no selected neighbor)
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    sel.foreach { case (v, isSel) =>
      if (!isSel) {
        val nb = nbrs.getOrElse(v, Set.empty[Long])
        assert(nb.exists(sel), s"unselected $v has no selected τ-neighbor")
      }
    }
    // at this τ most vertices are isolated → selected (sanity scale)
    assert(sel.values.count(identity) > n / 2)
    CacheRegistry.releaseAll()
  }

  test("sim_eval tier sweep: every serving tier gets a recall row; none below the IVF floor") {
    import graft.operators.Similarity
    def recallOf(ann: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = Similarity.simEvalAgainst(spark, Sf, ann).collect().head
      (r.getAs[Double]("recall"), r.getAs[Long]("n_ann"))
    }
    val (ivf, _) = recallOf(Similarity.simIvfAnn(spark, Sf))
    val (sq8, nSq8) = recallOf(Similarity.simIvfSq8(spark, Sf))
    val (pq, nPq) = recallOf(Similarity.simIvfPq(spark, Sf))
    val (multi, nMulti) = recallOf(Similarity.simLshMultiTable(spark, Sf))
    val graphRow = Similarity.knnGraphRecallRow(spark, Sf).collect().head
    val (graph, nGraph) =
      (graphRow.getAs[Double]("recall"), graphRow.getAs[Long]("n_ann"))
    val (search, nSearch) = recallOf(Similarity.simGraphSearch(spark, Sf))
    info(s"recall@10 — ivf=$ivf sq8=$sq8 pq=$pq lsh_multitable=$multi " +
      s"knn_graph=$graph graph_search=$search")
    // SQ8/PQ re-rank exactly from the over-fetched candidate set and
    // recover the IVF output bit-for-bit WHILE the margin holds; a
    // quantization regression that eats the margin shows up here as a
    // recall drop the bit-identity specs cannot see
    assert(sq8 == ivf, s"SQ8 recall $sq8 fell below the IVF floor $ivf")
    assert(pq == ivf, s"PQ recall $pq fell below the IVF floor $ivf")
    // multitable LSH is an independent family (not IVF-derived): its
    // floor is its own planted-truth spec; here it must stay a real
    // server — full k picks per query and nonzero overlap with exact
    assert(nMulti > 0 && multi > 0.0,
      s"multitable LSH produced no exact-overlapping picks (recall=$multi)")
    assert(nSq8 == nPq, "SQ8 and PQ pick counts diverged")
    // the GRAPH tier's row — the family whose fixed-T quality
    // collapsed silently at scale (0.78→0.45→0.00), so the dashboard
    // is the thing that must catch it: a full k picks per query and
    // a floor under the measured isotropic-corpus value (the planted
    // replica measures 0.955; this corpus's near-flat cosine band is
    // the harder case and its measured value is pinned here)
    assert(nGraph == 50, s"graph tier served ${nGraph} picks, want 5 queries x k=10")
    assert(graph >= 0.5,
      s"knn-graph recall $graph fell below the measured isotropic floor")
    // the graph-SEARCH tier (beam walk + true-cosine re-rank over the
    // same artifact): the re-rank lifts it above the raw graph row's
    // restriction — measured 0.74 at sf0.001 / 0.86 at sf0.01, and
    // the dashboard must catch a regression in EITHER the artifact
    // build or the walk, so both rows stay
    assert(nSearch == 50, s"graph search served ${nSearch} picks, want 5 queries x k=10")
    assert(search >= 0.7,
      s"graph-search recall $search fell below the measured 0.74 floor")
    CacheRegistry.releaseAll()
  }

  test("sim_eval: summary row equals recomputation from the two serving operators") {
    import graft.operators.Similarity
    val row = Similarity.simEval(spark, Sf).collect()
    assert(row.length == 1)
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.simIvfAnn(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val r = row.head
    assert(r.getAs[Long]("n_exact") == exact.size)
    assert(r.getAs[Long]("n_ann") == ann.size)
    assert(r.getAs[Long]("n_hit") == (exact & ann).size)
    val want = BigDecimal((exact & ann).size.toDouble / exact.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("recall") == want)
    CacheRegistry.releaseAll()
  }

  test("sim_range_search: exactly the vectors inside the radius, none outside") {
    val tau = 0.25
    val rows = Similarity.simRangeSearch(spark, Sf, tau = tau).collect()
    assert(rows.nonEmpty, "radius query returned nothing at test scale")
    rows.foreach(r => assert(r.getAs[Double]("cosine") >= tau))
    // brute-force twin on one query
    val vecs = Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q0 = vecs.find(_._1 == 0L).get._2
    val expected = vecs.filter(_._1 != 0L).filter { case (_, v) =>
      BigDecimal(cos(q0, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau
    }.map(_._1).toSet
    val got = rows.filter(_.getAs[Long]("qid") == 0L).map(_.getAs[Long]("vec_id")).toSet
    assert(got == expected, s"q0 membership differs: extra=${got -- expected} missing=${expected -- got}")
  }

  test("emb_project: JL distance preservation measured on sampled pairs") {
    val m = Similarity.jlProjection()
    val vecs = Tables.embeddings(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray))
      .sortBy(_._1).take(40)
    def proj(v: Array[Double]): Array[Double] = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // the JL guarantee is on squared distances in expectation; with
    // k=16 the measured per-pair ratio spread is wide but the MEAN
    // ratio over many pairs must sit near 1
    val ratios = for (i <- vecs.indices; j <- (i + 1) until vecs.length) yield {
      val d0 = dist(vecs(i)._2, vecs(j)._2)
      val d1 = dist(proj(vecs(i)._2), proj(vecs(j)._2))
      (d1 * d1) / (d0 * d0)
    }
    val mean = ratios.sum / ratios.size
    info(f"mean squared-distance ratio over ${ratios.size} pairs: $mean%.3f")
    assert(mean > 0.8 && mean < 1.2, f"projection distorts distances: mean ratio $mean%.3f")
    // and the operator output matches the driver-side projection
    val out = Similarity.embProject(spark, Sf).collect()
      .filter(_.getAs[Long]("vec_id") == vecs.head._1)
      .sortBy(_.getAs[Long]("j")).map(_.getAs[Double]("y"))
    val expect = proj(vecs.head._2).map(d =>
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.length == 16 && out.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("dedup_substring: pairs equal brute-force shared-50-gram sets") {
    val rows = Dedup.dedupSubstring(spark, Sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Long]("n_shared")).toMap
    assert(rows.nonEmpty, "no shared-substring pairs found at test scale")
    // brute force on the raw text, same df cap
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").toLowerCase)
    val gramsOf = docs.map { case (id, t) =>
      id -> (if (t.length <= 50) Set(t) else t.sliding(50).toSet)
    }.toMap
    val byGram = gramsOf.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .filter { case (_, ids) => ids.length >= 2 && ids.length <= 50 }
    val expected = byGram.values.toSeq
      .flatMap(ids => for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows == expected,
      s"pair sets differ: spark-only=${(rows.keySet -- expected.keySet).take(3)} " +
        s"brute-only=${(expected.keySet -- rows.keySet).take(3)}")
  }

  test("IVF ANN recall vs brute force at k=10") {
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.simIvfAnn(spark, Sf, nprobe = 8).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("LSH ANN recall ≥ 0.6 vs brute force at k=10") {
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.simLshAnn(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("multi-table LSH: planted-neighbor recall 1.0 at a fraction of multi-probe's candidates") {
    import org.apache.spark.sql.functions._
    val multi = Similarity.simLshMultiTable(spark, Sf).collect()
    // well-formed: dense ranks per query, no duplicate pairs (the
    // cross-table union must dedup before ranking)
    multi.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length.toLong))
      assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    }
    // the production regime: every query's planted near-copy
    // (cos ≈ 0.996 — the τ=0.9 territory a near-dup/serving pass
    // actually targets) must surface in its top-k; per-table
    // collision ≈ 0.86 at that angle, so 8-table miss ≈ 0.14^8
    val planted = Similarity.simLshMultiTable(spark, Sf, augmentPlanted = true)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    (0L until 5L).foreach { q =>
      assert(planted.contains((q, q + 1000000L)),
        s"query $q missed its planted near-copy (cos≈0.996)")
    }
    // transparency on the weak-neighbor regime: the synthetic
    // corpus's true top-10 sit at cos ≈ 0.3 (θ≈73°), where any
    // sign-LSH needs near-full-scan candidates — report, don't gate
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val got = multi.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    info(f"weak-neighbor (cos≈0.3) recall@10: ${(exact & got).size.toDouble / exact.size}%.3f")
    // probe-volume claim: union-of-L-tables candidate mass is BELOW
    // the radius-2 multi-probe mass (22/64 buckets per query)
    def planeCand(): Long = {
      val planes = Similarity.lshPlanes()
      val e = Tables.embeddings(spark, Sf)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("bucket",
          graft.functions.VectorFunctions.lsh_bucket(col("v"), planes))
      val masks = Similarity.lshProbeMasks()
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"),
          explode(array(masks.map(m =>
            col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
      e.join(q, Seq("bucket")).filter(col("vec_id") =!= col("qid")).count()
    }
    def tableCand(): Long = {
      val sets = Similarity.lshTablePlanes()
      val e = Tables.embeddings(spark, Sf)
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("v"))
        .withColumn("buckets", array(sets.map(p =>
          graft.functions.VectorFunctions.lsh_bucket(col("v"), p)): _*))
        .select(col("vec_id"), posexplode(col("buckets")).as(Seq("t", "bucket")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("t"), col("bucket"))
      e.join(q, Seq("t", "bucket")).filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct().count()
    }
    val (probeMass, tableMass) = (planeCand(), tableCand())
    info(s"candidates: multi-probe=$probeMass multi-table=$tableMass")
    assert(tableMass < probeMass,
      s"multi-table scanned MORE candidates ($tableMass) than multi-probe ($probeMass)")
  }

  test("knnGraphAppend: incremental growth holds rebuild quality; idempotent; untouched rows stable") {
    import org.apache.spark.sql.functions._
    val k = 10
    val full = Tables.embeddings(spark, Sf)
    val base = full.filter(col("vec_id") % 10 =!= 0)
    val table = "graft_knn_graph_append_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.sources.Sources.clearOrphanedLocation(spark, table)
    Similarity.knnDescentConverged(spark, base, k)
      .write.format("parquet").saveAsTable(table)
    val baseRows = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
    Similarity.knnGraphAppend(spark, table, full, k)
    val after = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
    val n = full.count()
    // every vector — old and new — carries a well-formed 1..k list
    val byV = after.groupBy(_._1)
    assert(byV.size == n, s"expected $n vertices, got ${byV.size}")
    byV.foreach { case (v, rows) =>
      assert(rows.length == k && rows.map(_._2).sorted.toSeq == (1L to k.toLong),
        s"malformed neighbor list at $v after append")
    }
    // untouched old vertices: rows byte-identical to the base build
    val touched = after.filter(r => r._3 % 10 == 0).map(_._1).toSet
    val untouchedBefore = baseRows.filter(r => !touched(r._1)).toSet
    val untouchedAfter = after.filter(r => r._1 % 10 != 0 && !touched(r._1)).toSet
    assert(untouchedAfter == untouchedBefore, "append disturbed untouched old rows")
    // quality: append-grown edge recall vs exact must hold the
    // built-with-everything recall within tolerance — the
    // append-equals-rebuild framing the IVF side has, measured
    // rather than assumed because descent is approximate
    val e = full.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val exact = e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        graft.functions.VectorFunctions.cosine_similarity(col("x.v"), col("y.v")).as("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("a")
          .orderBy(col("c").desc, col("b"))))
      .filter(col("rn") <= k)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val appendEdges = after.map(r => (r._1, r._3)).toSet
    val rebuiltEdges = Similarity.knnDescentConverged(spark, full, k).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"))).toSet
    val rAppend = (exact & appendEdges).size.toDouble / exact.size
    val rRebuild = (exact & rebuiltEdges).size.toDouble / exact.size
    info(f"edge recall: append-grown $rAppend%.3f vs full rebuild $rRebuild%.3f")
    // measured 0.831 append-grown vs 0.864 rebuilt at n=500/10% delta:
    // the gap is the frozen old-old boundary (append never revisits
    // settled old pairs) — tolerance set just above the measured gap
    assert(rAppend >= rRebuild - 0.05,
      f"append-grown recall $rAppend%.3f more than 0.05 below rebuild $rRebuild%.3f")
    // idempotent: the batch is already integrated, so re-append is a no-op
    Similarity.knnGraphAppend(spark, table, full, k)
    val again = spark.table(table).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("nbr_id"), r.getAs[Double]("cosine")))
    assert(again.toSet == after.toSet, "re-appending an integrated batch changed the graph")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    CacheRegistry.releaseAll()
  }

  test("incremental graph slug migration preserves compliance tombstones; base build shared") {
    import org.apache.spark.sql.functions._
    // replicate the accessor's naming so the spec can plant a LEGACY
    // (pre-appendIters-slug) artifact with a suppression twin and
    // verify the migration copies the tombstones before dropping it —
    // dropped tombstones would re-admit a compliance-deleted id
    val k = 10; val iters = 3
    val slug = Sf.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
    val dirTag = (scala.util.hashing.MurmurHash3.stringHash(Sf) & 0x7fffffff).toHexString
    val legacy = s"graft_knn_graph_incr_${slug}_${dirTag}_k${k}_t${iters}_v1"
    val current = s"graft_knn_graph_incr_${slug}_${dirTag}_k${k}_t${iters}_a3_v1"
    Seq(legacy, s"${legacy}_sup", current, s"${current}_sup").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    spark.range(1).select(col("id").as("vec_id"), lit(1L).as("rank"),
        lit(2L).as("nbr_id"), lit(0.5).as("cosine"))
      .write.format("parquet").saveAsTable(legacy)
    spark.range(42, 44).select(col("id").as("vec_id"))
      .write.format("parquet").saveAsTable(s"${legacy}_sup")
    val table = Similarity.knnGraphTableIncremental(spark, Sf, k, iters)
    assert(table == current, s"unexpected table name $table")
    assert(!spark.catalog.tableExists(legacy) &&
      !spark.catalog.tableExists(s"${legacy}_sup"),
      "legacy artifact not dropped after migration")
    val migrated = spark.table(s"${table}_sup")
      .collect().map(_.getLong(0)).toSet
    assert(migrated == Set(42L, 43L),
      s"legacy suppression rows not migrated: got $migrated")
    // the initial incremental content is a COPY of the read-only base
    // artifact MINUS rows touching suppressed ids on either endpoint —
    // one descent build shared between the two tables, and a rebuild
    // must not re-admit a compliance-forgotten id's content (the
    // tombstones block appends; this asserts they also gate the copy)
    val baseName = s"graft_knn_graph_base_${slug}_${dirTag}_k${k}_t${iters}_v1"
    assert(spark.catalog.tableExists(baseName),
      "base graph table missing after incremental build")
    val expected = spark.table(baseName)
      .filter(!col("vec_id").isin(42L, 43L) && !col("nbr_id").isin(42L, 43L))
    assert(spark.table(table).collect().toSet == expected.collect().toSet,
      "incremental initial content != base artifact minus suppressed rows")
    val leaked = spark.table(table)
      .filter(col("vec_id").isin(42L, 43L) || col("nbr_id").isin(42L, 43L))
      .count()
    assert(leaked == 0L,
      s"suppressed ids re-entered the rebuilt incremental graph ($leaked rows)")
    Seq(current, s"${current}_sup").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CacheRegistry.releaseAll()
  }

  test("reliable-checkpoint knob: identical output on the durable lineage-cut path") {
    // the iterative family's cluster-grade durability form: with
    // graft.reliableCheckpointDir set, every Lineage.cut becomes a
    // reliable checkpoint() (executor loss = retry, not job failure);
    // output must be IDENTICAL to the localCheckpoint default, and
    // checkpoint data must actually land in the directory.
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    val baseGraph = Similarity.simKnnGraph(spark, Sf, k = 4, iters = 2).collect().toSeq
    val baseClusters = Dedup.dedupClusters(spark, Sf).collect().toSeq
    val (relGraph, relClusters) =
      withConf(graft.operators.Lineage.ReliableDirKey -> ckpt.getAbsolutePath) {
        (Similarity.simKnnGraph(spark, Sf, k = 4, iters = 2).collect().toSeq,
          // exercises the LAZY cut variant (the CC star loop)
          Dedup.dedupClusters(spark, Sf).collect().toSeq)
      }
    assert(relGraph == baseGraph, "descent output differs on the reliable-checkpoint path")
    assert(relClusters == baseClusters, "CC output differs on the reliable-checkpoint path")
    def files(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(files).sum else 1L
    assert(files(ckpt) > 0, "no checkpoint data written to the reliable dir")
  }

  test("sim_graph_search: beam recall vs brute force; held-out queries serve identically") {
    import org.apache.spark.sql.functions._
    // registry form: member queries against the shared persisted graph
    val got = Similarity.simGraphSearch(spark, Sf).collect()
    assert(got.length == 50, s"expected 5 queries x k=10, got ${got.length}")
    assert(got.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")),
      "search returned a query as its own neighbor")
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val pred = got.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & pred).size.toDouble / exact.size
    // measured 0.74 at sf0.001 / 0.86 at sf0.01 on the isotropic
    // corpus (beam=20, hops=3 over the fixed-T=3 graph) — the
    // true-cosine re-rank lifts the beam well above the raw graph's
    // per-query edge recall; floor pinned under the measurement
    assert(recall >= 0.7, s"member-query beam-search recall $recall below 0.7 floor")

    // the SERVING shape: graph built on 90% of the corpus, held-out
    // vectors searched against it — nothing reads a query's graph row
    val allRows = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val baseCorpus = allRows.filter(col("vec_id") % 10 =!= 0)
    val graph = Similarity.knnDescentFixed(spark,
      Tables.embeddings(spark, Sf).filter(col("vec_id") % 10 =!= 0), k = 10, iters = 3)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
      .localCheckpoint()
    val queries = allRows.filter(col("vec_id") % 10 === 0 && col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val served = Similarity.graphSearchCore(graph, baseCorpus, queries,
      k = 10, beam = 20, hops = 3).collect()
    // held-out ids are NOT graph vertices: results only from the base corpus
    assert(served.forall(_.getAs[Long]("vec_id") % 10 != 0),
      "held-out search returned a non-member id")
    assert(served.map(_.getAs[Long]("qid")).distinct.length == 5)
    // exact truth per held-out query over the base corpus, in-scala
    val base = baseCorpus.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
    val qs = queries.collect()
      .map(r => r.getAs[Long]("qid") -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exactHeld = qs.flatMap { case (qid, qv) =>
      base.map { case (vid, v) => (qid, vid, cos(qv, v)) }
        .sortBy { case (_, vid, c) => (-c, vid) }.take(10).map(t => (t._1, t._2))
    }.toSet
    val servedSet = served.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val heldRecall = (exactHeld & servedSet).size.toDouble / exactHeld.size
    assert(heldRecall >= 0.7, s"held-out serving recall $heldRecall below 0.7 floor")
    CacheRegistry.releaseAll()
  }

  test("sim_graph_search_filtered: picks satisfy the filter; recall vs filtered brute force") {
    import org.apache.spark.sql.functions._
    val got = Similarity.simGraphSearchFiltered(spark, Sf).collect()
    assert(got.length == 50, s"expected 5 queries x k=10 allowed picks, got ${got.length}")
    val en = Tables.documents(spark, Sf).filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => en(r.getAs[Long]("vec_id"))),
      "filtered search returned a pick outside the allow-list")
    assert(got.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")),
      "filtered search returned a query as its own neighbor")
    // exact truth: brute-force top-10 among allowed ids per query
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.filter(_._1 < 5).flatMap { case (qid, qv) =>
      vecs.filter { case (vid, _) => vid != qid && en(vid) }
        .map { case (vid, v) => (qid, vid, cos(qv, v)) }
        .sortBy { case (_, vid, c) => (-c, vid) }.take(10).map(t => (t._1, t._2))
    }.toSet
    val pred = got.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & pred).size.toDouble / exact.size
    // measured 0.70 at sf0.001 / 0.74 at sf0.01 — the unfiltered walk
    // visits enough allowed candidates that post-filtering holds
    // near the unfiltered operating point; floor pinned underneath
    assert(recall >= 0.65, s"filtered-search recall $recall below 0.65 floor")
    CacheRegistry.releaseAll()
  }

  test("sim_hard_negatives: every pick in the band, ranks contiguous, band recall vs brute force") {
    import org.apache.spark.sql.functions._
    val (lo, hi) = (0.3, 0.6)
    val got = Similarity.simHardNegatives(spark, Sf).collect()
    assert(got.nonEmpty, "no hard negatives mined at spec scale")
    assert(got.forall { r =>
      val c = r.getAs[Double]("cosine"); c >= lo && c < hi
    }, "a mined negative falls outside the [lo, hi) band")
    assert(got.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    // ranks are 1..n per query with no gaps (the band filters BEFORE
    // ranking — gaps would mean post-rank filtering, a different op)
    got.groupBy(_.getAs[Long]("qid")).foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq, s"rank gap for qid=$q: $ranks")
    }
    // band recall vs exact in-band truth (brute force, same rounding)
    val vecs = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def rnd(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exact = vecs.filter(_._1 < 5).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (vid, v) => (qid, vid, cos(qv, v)) }
        .filter { case (_, _, c) => rnd(c) >= lo && rnd(c) < hi }
        .sortBy { case (_, vid, c) => (-c, vid) }.take(10).map(t => (t._1, t._2))
    }.toSet
    val pred = got.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & pred).size.toDouble / exact.size
    // measured 0.75 at sf0.001 / 0.94 at sf0.01: the walk concentrates
    // on TOP cosine, so band coverage rides the visited pool — honest
    // floor pinned under the small-scale measurement
    assert(recall >= 0.7, s"band recall $recall below 0.7 floor")

    // constraints COMPOSE: allow-list + band together (a lang-scoped
    // hard-negative mine) — every pick must satisfy BOTH, and the
    // composed set is exactly the band set restricted to allowed ids
    // re-ranked (subset of the band picks' candidate space)
    val graph = spark.table(Similarity.knnGraphTable(spark, Sf))
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val en = Tables.documents(spark, Sf).filter(col("lang") === "en")
      .select(col("doc_id").as("b"))
    val composed = Similarity.graphSearchCore(graph, corpus, queries,
      k = 10, beam = 20, hops = 3,
      allowed = Some(en), band = Some((lo, hi))).collect()
    val enIds = en.collect().map(_.getLong(0)).toSet
    assert(composed.forall { r =>
      val c = r.getAs[Double]("cosine")
      enIds(r.getAs[Long]("vec_id")) && c >= lo && c < hi
    }, "composed allow+band pick violates one of its constraints")
    // the registry query IS this composition (lang-scoped negative
    // mine, hash-verified at all three decades) — row-identical
    val registry = Similarity.simHardNegativesFiltered(spark, Sf).collect()
    assert(registry.map(_.toSeq).toSeq == composed.map(_.toSeq).toSeq,
      "sim_hard_negatives_filtered diverges from the composed core walk")
    CacheRegistry.releaseAll()
  }

  test("graph serving freshness: a just-appended delta is reachable through the accreted graph") {
    import org.apache.spark.sql.functions._
    val k = 10
    val full = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    val base = full.filter(col("vec_id") % 10 =!= 0)
    val table = "graft_serve_fresh_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.sources.Sources.clearOrphanedLocation(spark, table)
    Similarity.knnDescentConverged(spark, base, k)
      .write.format("parquet").saveAsTable(table)
    // grow the corpus; the graph follows through the append path
    Similarity.knnGraphAppend(spark, table, full, k)
    val graph = spark.table(table)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val corpus = full
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val served = Similarity.graphSearchCore(graph, corpus, queries,
      k = k, beam = 20, hops = 3).collect()
    assert(served.length == 50)
    // the appended 10% must be SERVABLE: the walk's answers include
    // delta vectors wherever they belong (no stale-index blind spot —
    // the failure mode an IVF index without append would have)
    val deltaPicks = served.count(_.getAs[Long]("vec_id") % 10 == 0)
    assert(deltaPicks > 0,
      "no appended vector ever served — the accreted graph is invisible to the walk")
    // and quality holds against brute force over the FULL grown corpus
    val exact = Similarity.simBruteforceTopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val pred = served.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & pred).size.toDouble / exact.size
    assert(recall >= 0.6,
      s"post-append serving recall $recall below 0.6 floor (converged-graph quality)")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    CacheRegistry.releaseAll()
  }

  test("informed entry points: LSH bucket-mate seeding beats random seeds on clustered data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The at-scale seeding argument, reproduced at spec scale: 100
    // isolated cliques of 6 near-identical vectors (random 64-dim
    // clique centers are near-orthogonal, members at cos≈0.998). Hold
    // out member j=0 of each clique; its true top-5 in the base are
    // exactly its 5 clique-mates. A random-LCG-seeded fixed-hop walk
    // must stumble into the right 1-of-100 clique through near-flat
    // stranger edges — at 10⁹ vertices it reaches a vanishing
    // fraction; bucket-mate seeds start INSIDE the clique (sign-LSH
    // puts cos≈0.998 pairs in one bucket w.h.p.), which is the whole
    // design.
    val nCliques = 100; val size = 6; val dim = 64
    def gauss(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextGaussian())
    }
    val rows = (0 until nCliques).flatMap { c =>
      val center = gauss(c)
      (0 until size).map { j =>
        val noise = gauss(100000 + c * size + j)
        val v = center.zip(noise).map { case (x, e) => x + 0.02 * e }
        val nrm = math.sqrt(v.map(x => x * x).sum)
        ((c * size + j).toLong, v.map(x => (x / nrm).toFloat))
      }
    }
    val all = rows.toDF("vec_id", "embedding")
    val base = all.filter(col("vec_id") % size =!= 0)
    val corpus = base.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v")).cache()
    val queries = all.filter(col("vec_id") % size === 0)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), _.cast("double")).as("qv")).cache()
    val graph = Similarity.knnDescentConverged(spark, base, k = 10)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb")).cache()
    val k = 5 // truth = exactly the 5 clique-mates, far above the stranger band
    def recallOf(informed: Boolean): Double = {
      val served = Similarity.graphSearchCore(graph, corpus, queries, k,
        beam = 20, hops = 3, informedSeeds = informed).collect()
      val hits = served.count { r =>
        r.getAs[Long]("qid") / size == r.getAs[Long]("vec_id") / size
      }
      hits.toDouble / (nCliques * k)
    }
    val rRandom = recallOf(informed = false)
    val rInformed = recallOf(informed = true)
    info(f"clique recall@$k: random-seed $rRandom%.3f vs informed $rInformed%.3f")
    assert(rInformed >= 0.9,
      f"informed seeding should find the clique ($rInformed%.3f < 0.9)")
    assert(rInformed >= rRandom + 0.2,
      f"informed ($rInformed%.3f) must clearly beat random seeds ($rRandom%.3f) on clustered data")
    CacheRegistry.releaseAll()
  }

  test("graphServeRecallRow: held-out serve quality over the converged base graph holds a floor") {
    // the production serving graph's walk-quality dashboard row —
    // held-out queries, converged base graph, exact truth over the
    // base corpus (the number a rollout watches; the fixed-T graph's
    // edge recall collapses with n, so this row is measured over the
    // artifact that would actually serve)
    val lcgRow = Similarity.graphServeRecallRow(spark, Sf).collect()(0)
    val lcg = lcgRow.getAs[Double]("recall")
    assert(lcgRow.getAs[Long]("n_exact") == 50L, "expected 5 held-out queries x k=10 truth")
    val informed = Similarity.graphServeRecallRow(spark, Sf, informed = true)
      .collect()(0).getAs[Double]("recall")
    info(f"held-out converged-graph serve recall@10: lcg $lcg%.3f, informed $informed%.3f")
    // measured 0.80/0.86 (lcg/informed) over the 450-vector base
    assert(lcg >= 0.6, f"lcg held-out serve recall $lcg%.3f below 0.6 floor")
    assert(informed >= lcg - 0.05,
      f"informed seeding ($informed%.3f) fell measurably below lcg ($lcg%.3f)")
    CacheRegistry.releaseAll()
  }

  test("persisted LSH seed artifact: table-fed informed serving equals the inline path") {
    import org.apache.spark.sql.functions._
    // the 100 TB form of informed seeding: corpus-side bucket hashing
    // is a build-time artifact (lshSeedTable), the serve batch hashes
    // only its queries and joins on (t, bk) — results must be
    // ROW-IDENTICAL to the inline path (same planes, cap, fallback)
    val seedT = Similarity.lshSeedTable(spark, Sf)
    assert(spark.catalog.tableExists(seedT))
    val graph = spark.table(Similarity.knnGraphTable(spark, Sf, 10, 3))
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val queries = corpus.filter(col("vec_id") < 25)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSet
    val inline = rows(Similarity.graphSearchCore(graph, corpus, queries,
      k = 10, beam = 20, hops = 3, informedSeeds = true))
    val tableFed = rows(Similarity.graphSearchCore(graph, corpus, queries,
      k = 10, beam = 20, hops = 3, informedSeeds = true,
      seedMates = Some(Similarity.informedSeedMates(spark, Sf, queries))))
    assert(inline == tableFed,
      s"table-fed informed serving diverges from inline: " +
        s"extra=${(tableFed -- inline).take(3)} missing=${(inline -- tableFed).take(3)}")
    // FULLY table-fed: the fallback sample too comes from the persisted
    // artifact (t = -1 rows) — seed derivation then reads only the
    // artifact, and the results must still be row-identical
    val tableFedFull = rows(Similarity.graphSearchCore(graph, corpus, queries,
      k = 10, beam = 20, hops = 3, informedSeeds = true,
      seedMates = Some(Similarity.informedSeedMates(spark, Sf, queries)),
      seedSample = Some(Similarity.informedSeedSample(spark, Sf, beam = 20))))
    assert(inline == tableFedFull,
      s"fully-table-fed informed serving diverges from inline: " +
        s"extra=${(tableFedFull -- inline).take(3)} missing=${(inline -- tableFedFull).take(3)}")
    assert(inline.nonEmpty)
    // a beam the persisted sample cannot cover is rejected loudly
    intercept[IllegalArgumentException] {
      Similarity.informedSeedSample(spark, Sf, beam = Similarity.SeedSampleCap)
    }
    spark.sql(s"DROP TABLE IF EXISTS $seedT")
    CacheRegistry.releaseAll()
  }

  test("per-segment seed artifact: table-fed informed segment serving equals inline, seeds artifact-only") {
    import org.apache.spark.sql.functions._
    // the round-15 full-corpus discipline applied to the segment
    // path: informed per-segment walks previously re-hashed every
    // segment member per serve batch; with lshSeedTableSegment the
    // mates and the fallback sample both come from the persisted
    // per-(dir, segKey) artifact, row-identical by construction
    val memberRows = Tables.embeddings(spark, Sf).join(
      Tables.documents(spark, Sf).filter(col("lang") === "en")
        .select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    val members = memberRows
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val segGraphT = Similarity.knnGraphSegmentTableFor(spark, Sf, "en",
      memberRows, 10, 3)
    val graph = spark.table(segGraphT)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val queries = Tables.embeddings(spark, Sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), _.cast("double")).as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cosine"))).toSet
    val inline = rows(Similarity.graphSearchCore(graph, members, queries,
      k = 10, beam = 20, hops = 3, informedSeeds = true))
    // the public entry now takes the table-fed path for informed mode
    val tableFed = rows(Similarity.simGraphSearchSegment(spark, Sf, "en",
      informedSeeds = true))
    assert(inline == tableFed && inline.nonEmpty,
      s"table-fed informed segment serving diverges from inline: " +
        s"extra=${(tableFed -- inline).take(3)} missing=${(inline -- tableFed).take(3)}")
    // serve-time seed derivation reads ONLY the artifact: with the
    // query batch as a LOCAL frame (arrived vectors, not a corpus
    // read), neither the mates frame nor the sample frame may scan
    // the embeddings parquet
    val seedT = Similarity.lshSeedTableSegment(spark, Sf, "en", memberRows)
    val localQueries = {
      import spark.implicits._
      queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
        .toSeq.toDF("qid", "qv")
    }
    for ((label, df) <- Seq(
        "mates" -> Similarity.seedMatesFromTable(spark, seedT, localQueries),
        "sample" -> Similarity.seedSampleRead(spark.table(seedT), 20))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("embeddings"),
        s"segment seed $label still scans the corpus parquet:\n$plan")
      assert(plan.contains("graft_lsh_seed_seg"),
        s"segment seed $label does not read the segment artifact:\n$plan")
    }
    // lifecycle carries over verbatim: health row takes the segment
    // seed table; fresh artifact is not stale
    val health = Similarity.seedArtifactHealthRow(spark, seedT, members)
      .collect()(0)
    assert(!health.getAs[Boolean]("stale") && health.getAs[Int]("plane_drift") == 0,
      s"fresh segment seed artifact reported stale: $health")
    Seq(seedT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CacheRegistry.releaseAll()
  }

  test("lshSeedAppend: growth is rebuild-identical (stateless buckets); idempotent") {
    import org.apache.spark.sql.functions._
    // bucket ids are a pure function of the vector, so appending the
    // base then the delta must reproduce the one-shot full build
    // row-for-row — the strongest freshness contract in the artifact
    // family (IVF append is rebuild-identical only in SERVING results;
    // graph append only within a recall tolerance)
    val fullT = Similarity.lshSeedTable(spark, Sf)
    val specT = fullT.replace("graft_lsh_seed_", "graft_lsh_seed_spec_")
    spark.sql(s"DROP TABLE IF EXISTS $specT")
    graft.sources.Sources.clearOrphanedLocation(spark, specT)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType))))
      .write.format("parquet").saveAsTable(specT)
    val full = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    // append-from-empty IS the build: base batch, then the delta
    Similarity.lshSeedAppend(spark, specT, full.filter(col("vec_id") % 10 =!= 0))
    Similarity.lshSeedAppend(spark, specT, full)
    def rows(t: String) = spark.table(t).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val grown = rows(specT)
    assert(grown == rows(fullT),
      "append-grown seed table differs from the one-shot full build")
    // idempotent: every id already present, re-append is a no-op
    Similarity.lshSeedAppend(spark, specT, full)
    assert(rows(specT) == grown, "re-appending integrated vectors changed the table")
    // malformed table names are rejected, not silently mis-haloed
    intercept[IllegalArgumentException] {
      Similarity.lshSeedAppend(spark, "not_a_seed_table", full)
    }
    Seq(specT, fullT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CacheRegistry.releaseAll()
  }

  test("persisted fallback sample: superset maintenance prunes to the exact inline sample past capacity") {
    import org.apache.spark.sql.functions._
    // a synthetic 1000-id corpus (> SeedSampleCap = 512) grown in two
    // appends from empty: the kept t = -1 rows are only a SUPERSET of
    // the true bottom-hash set (append admits any id whose hash could
    // enter it), and the read-time prune must restore EXACTLY the
    // inline sample — bottom-(4·beam) of ALL corpus ids by
    // (xxhash64(id), id) — at every beam the cap covers
    val base = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    val synth = base.union(
      base.select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))).cache()
    val specT = "graft_lsh_seed_spec_super_p9_v2"
    spark.sql(s"DROP TABLE IF EXISTS $specT")
    graft.sources.Sources.clearOrphanedLocation(spark, specT)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType))))
      .write.format("parquet").saveAsTable(specT)
    Similarity.lshSeedAppend(spark, specT, synth.filter(col("vec_id") % 3 =!= 0))
    // admissions are capped PER APPEND: the first batch (~667 ids,
    // > cap) into an empty under-capacity store must not balloon the
    // t = -1 set past SeedSampleCap — only the batch's bottom-(bk, b)
    // rows are admitted (they contain every true-bottom candidate)
    val keptAfterFirst = spark.table(specT).filter(col("t") === -1).count()
    assert(keptAfterFirst <= Similarity.SeedSampleCap,
      s"single oversized append admitted $keptAfterFirst sample rows — per-append cap broken")
    Similarity.lshSeedAppend(spark, specT, synth)
    val kept = spark.table(specT).filter(col("t") === -1)
    // superset of the true bottom set, never a miss
    for (beam <- Seq(5, 20, Similarity.SeedSampleCap / 4)) {
      val inline = synth.select(col("vec_id"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4 * beam)
        .collect().map(_.getLong(0)).toSeq
      val pruned = Similarity.seedSampleRead(spark.table(specT), beam)
        .collect().map(_.getLong(0)).toSeq
      assert(pruned == inline,
        s"beam=$beam: pruned sample diverges from the inline bottom set " +
          s"(pruned=${pruned.take(5)}... inline=${inline.take(5)}...)")
    }
    // the stored bk really is the sort hash — recomputing it matches
    val mismatch = kept.filter(col("bk") =!= xxhash64(col("b"))).count()
    assert(mismatch == 0L, s"$mismatch sample rows carry a stale hash key")
    spark.sql(s"DROP TABLE IF EXISTS $specT")
    synth.unpersist()
    CacheRegistry.releaseAll()
  }

  test("pipe_span_dedup: repeated-span cuts match an independent string replay; idempotent; never silent") {
    import org.apache.spark.sql.functions._
    val n = 50
    val out = Dedup.pipeSpanDedup(spark, Sf, n).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("is_ascii"), r.getAs[Long]("n_spans_cut"),
          r.getAs[Long]("n_chars_cut"), r.getAs[String]("cut_ranges"),
          r.getAs[Long]("clean_len"), r.getAs[String]("clean_md5")))).toMap
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == docs.size, "every document must emit a row")
    // independent replay with RAW lowercased substrings (no rolling
    // hashes): occurrence count >= 2 marks every covered position
    def asciiOf(t: String) = t.forall(_ < 128)
    val occ = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, t) <- docs if asciiOf(t) && t.length >= n) {
      val lt = t.toLowerCase
      var p = 0
      while (p + n <= lt.length) {
        val g = lt.substring(p, p + n)
        occ.update(g, occ.getOrElse(g, 0) + 1); p += 1
      }
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var anyCut = false
    for ((id, t) <- docs) {
      val ascii = asciiOf(t)
      val (spans, chars, ranges, clean) =
        if (!ascii || t.length < n) (0L, 0L, "", t)
        else {
          val lt = t.toLowerCase
          val cut = new Array[Boolean](t.length)
          var p = 0
          while (p + n <= lt.length) {
            if (occ(lt.substring(p, p + n)) >= 2)
              (p until p + n).foreach(cut(_) = true)
            p += 1
          }
          val kept = t.zipWithIndex.collect { case (c, i) if !cut(i) => c }.mkString
          val starts = (0 until t.length).filter(i => cut(i) && (i == 0 || !cut(i - 1)))
          val rs = starts.map { s0 =>
            val e0 = (s0 until t.length).takeWhile(cut).last + 1
            s"$s0-$e0"
          }.mkString(";")
          (starts.length.toLong, cut.count(identity).toLong, rs, kept)
        }
      if (spans > 0) anyCut = true
      val got = out(id)
      assert(got == ((ascii, spans, chars, ranges, clean.length.toLong, md5hex(clean))),
        s"doc $id: got $got, replay says ($ascii, $spans, $chars, $ranges, ${clean.length}, ${md5hex(clean)})")
      // never silent: the kept length plus the cut length is the doc
      assert(got._5 + got._3 == t.length.toLong, s"doc $id: cut accounting leaks")
    }
    assert(anyCut, "testdata has repeated spans (dedup_substring finds pairs) — none were cut")
    // idempotence on real data: the cleaned corpus has no df>=2 span
    // left, so a second pass cuts nothing
    val docsDf = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val cleaned = Dedup.spanDedupCore(docsDf, n)
      .select(col("doc_id"), col("clean_text").as("text"))
    val second = Dedup.spanDedupCore(cleaned, n)
      .agg(sum(col("n_spans_cut")).as("cuts")).collect()(0).getLong(0)
    assert(second == 0L, s"second pass still cut $second spans — not idempotent on this corpus")
    CacheRegistry.releaseAll()
  }

  test("pipe_span_incremental: persisted-index cut equals the batch form; append equals rebuild; map-only probe") {
    import org.apache.spark.sql.functions._
    val n = 50
    val inc = Dedup.pipeSpanIncremental(spark, Sf, n)
    def keyed(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_spans_cut"),
        r.getAs[Long]("n_chars_cut"), r.getAs[String]("cut_ranges"),
        r.getAs[String]("clean_md5"))).toSet
    val incRows = keyed(inc.collect())
    // EXACT semantic equality with the batch form over (corpus ∪
    // batch), restricted to the arriving shard — the contract that
    // lets a pipeline switch forms without a semantic diff
    val batchForm = keyed(Dedup.spanDedupCore(
        Tables.documents(spark, Sf).select(col("doc_id"), col("text")), n)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("is_ascii"), col("n_spans_cut"),
        col("n_chars_cut"), col("cut_ranges"),
        md5(col("clean_text")).as("clean_md5"))
      .collect())
    assert(incRows == batchForm,
      s"incremental cut diverges from the batch form: " +
        s"extra=${(incRows -- batchForm).take(3)} missing=${(batchForm -- incRows).take(3)}")
    assert(incRows.exists(_._2 > 0), "no shard doc cut — the incremental regime is vacuous here")
    // probe shape: the index is read, never crossed
    val plan = inc.queryExecution.executedPlan.toString
    assert(plan.contains("graft_span_gram"),
      s"incremental cut does not read the persisted gram index:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // append ≡ rebuild: the same corpus indexed in two appended halves
    // must probe identically (partial df rows summed at probe time)
    val corpusDocs = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val t2 = "graft_span_gram_spec_parts_v5"
    Dedup.spanGramIndexCreateEmpty(spark, t2, 8)
    Dedup.spanGramIndexAppend(spark, t2, corpusDocs.filter(col("doc_id") % 2 === 0), n)
    Dedup.spanGramIndexAppend(spark, t2, corpusDocs.filter(col("doc_id") % 2 =!= 0), n)
    val shardDocs = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val viaParts = keyed(Dedup.spanDedupIncrementalCore(spark, t2, shardDocs, n)
      .select(col("doc_id"), col("n_spans_cut"), col("n_chars_cut"),
        col("cut_ranges"), md5(col("clean_text")).as("clean_md5"),
        col("is_ascii"))
      .collect())
    assert(viaParts == incRows,
      "two-append index probes differently from the one-shot build")
    // the KEEP-FIRST incremental form: equals the batch keep-first
    // over (corpus ∪ batch) restricted to the shard — keeper election
    // uses the index's per-doc min-position column, so the global
    // (doc_id, p) argmin is reproduced without a corpus rescan
    val kfInc = keyed(Dedup.pipeSpanKeepFirstIncremental(spark, Sf, n).collect())
    val kfBatch = keyed(Dedup.spanDedupKeepFirstCore(
        Tables.documents(spark, Sf).select(col("doc_id"), col("text")), n)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("is_ascii"), col("n_spans_cut"),
        col("n_chars_cut"), col("cut_ranges"),
        md5(col("clean_text")).as("clean_md5"))
      .collect())
    assert(kfInc == kfBatch,
      s"keep-first incremental diverges from the batch form: " +
        s"extra=${(kfInc -- kfBatch).take(3)} missing=${(kfBatch -- kfInc).take(3)}")
    // keep-first cuts are a subset of remove-all cuts, here too
    val removeAll = incRows.map(r => r._1 -> r._3).toMap
    kfInc.foreach { r =>
      assert(r._3 <= removeAll(r._1),
        s"doc ${r._1}: keep-first incremental cut more than remove-all")
    }
    spark.sql(s"DROP TABLE IF EXISTS $t2")
    // layout-property heal: a build that crashed between saveAsTable
    // and the ALTER leaves the table without graft.span.pb — the
    // accessor must re-stamp EXACTLY the P baked into the name
    // instead of throwing on a table every probe consults
    val healT = Dedup.spanGramIndexFor(spark, Sf, n)
    val pb0 = Dedup.spanIndexPb(spark, healT)
    spark.sql(s"ALTER TABLE $healT UNSET TBLPROPERTIES ('${Dedup.SpanIndexPbProp}')")
    assert(Dedup.spanGramIndexFor(spark, Sf, n) == healT,
      "property-less registry index must resolve, not rebuild")
    assert(Dedup.spanIndexPb(spark, healT) == pb0,
      "healed partition count diverges from the build-time value")
    CacheRegistry.releaseAll()
  }

  test("span index lifecycle hardening: cross-n sweep anchoring; stale forget stage cannot resurrect") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 1. the generation sweep is anchored at the _p/_v segment —
    // building an index for an n that is a DECIMAL PREFIX of another
    // n (5 vs 50) must not drop the other n's live index (the
    // unanchored startsWith would have)
    val t50 = Dedup.spanGramIndexFor(spark, Sf, 50)
    val t5 = Dedup.spanGramIndexFor(spark, Sf, 5)
    assert(t5 != t50)
    assert(spark.catalog.tableExists(t50),
      "building the n=5 index swept away the live n=50 index")
    assert(spark.catalog.tableExists(t5))
    spark.sql(s"DROP TABLE IF EXISTS $t5")
    // 2. a forget() crash in its marker-present window leaves
    // <t>_rstage/<t>_rcommit; recreating the table afresh must clear
    // them, or the next recover() resurrects the pre-drop rows into
    // the brand-new empty index
    val tz = "graft_span_gram_stale_stage_spec_v5"
    Dedup.spanGramIndexCreateEmpty(spark, tz, 8)
    Dedup.spanGramIndexAppend(spark, tz,
      Seq((1L, "a document long enough to index: " + ("x" * 60)))
        .toDF("doc_id", "text"))
    assert(spark.table(tz).count() > 0)
    // simulate the crash window: stage = current rows, marker present
    Seq(s"${tz}_rstage", s"${tz}_rcommit").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    spark.table(tz).write.format("parquet").saveAsTable(s"${tz}_rstage")
    Seq(true).toDF("committed").write.format("parquet").saveAsTable(s"${tz}_rcommit")
    Dedup.spanGramIndexCreateEmpty(spark, tz, 8) // retire + recreate
    graft.operators.StagedRewrite.recover(spark, tz)
    assert(spark.table(tz).count() == 0,
      "stale forget stage resurrected pre-drop rows into the recreated index")
    spark.sql(s"DROP TABLE IF EXISTS $tz")
    CacheRegistry.releaseAll()
  }

  test("span index REBUILD branch clears stale forget markers (no resurrection)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same corpus → same P → same deterministic registry name: a
    // forget() crash in its marker-present window followed by a
    // drop/retire of the index table must not let the REBUILT table's
    // first recover() truncate it and resurrect the pre-forget rows —
    // the symmetric twin of the create-empty guard above
    val t = Dedup.spanGramIndexFor(spark, Sf, 50)
    val realCount = spark.table(t).count()
    assert(realCount > 0)
    // simulate the crash: stage = one distinguishable poison row
    // (schema-exact copy of a live row), marker present
    Seq(s"${t}_rstage", s"${t}_rcommit").foreach { st =>
      spark.sql(s"DROP TABLE IF EXISTS $st")
      graft.sources.Sources.clearOrphanedLocation(spark, st)
    }
    spark.table(t).limit(1).withColumn("doc_id", lit(-999L))
      .write.format("parquet").saveAsTable(s"${t}_rstage")
    Seq(true).toDF("committed").write.format("parquet").saveAsTable(s"${t}_rcommit")
    spark.sql(s"DROP TABLE $t")
    val t2 = Dedup.spanGramIndexFor(spark, Sf, 50) // rebuild branch
    assert(t2 == t, "rebuild must land on the same deterministic name")
    graft.operators.StagedRewrite.recover(spark, t2) // what every probe/append runs first
    assert(spark.table(t2).filter(col("doc_id") === -999L).head(1).isEmpty,
      "stale forget stage resurrected rows into the rebuilt index")
    assert(spark.table(t2).count() == realCount,
      "rebuilt index content diverged after recover()")
    CacheRegistry.releaseAll()
  }

  test("span index growth-drift guard: docs property advances idempotently; oversize predicate") {
    import spark.implicits._
    val tz = "graft_span_gram_drift_guard_spec_v5"
    Dedup.spanGramIndexCreateEmpty(spark, tz, 8)
    assert(Dedup.spanIndexDocs(spark, tz) == 0L)
    assert(!Dedup.spanIndexOversized(spark, tz))
    val batch = (1L to 3L).map(i => (i, s"doc $i body: " + ("x" * 60))).toDF("doc_id", "text")
    Dedup.spanGramIndexAppend(spark, tz, batch)
    assert(Dedup.spanIndexDocs(spark, tz) == 3L)
    // an at-least-once redelivery no-ops the insert AND the counter
    Dedup.spanGramIndexAppend(spark, tz, batch)
    assert(Dedup.spanIndexDocs(spark, tz) == 3L,
      "redelivered append advanced the indexed-docs counter")
    Dedup.spanGramIndexAppend(spark, tz,
      Seq((4L, "fresh doc: " + ("y" * 60))).toDF("doc_id", "text"))
    assert(Dedup.spanIndexDocs(spark, tz) == 4L)
    assert(!Dedup.spanIndexOversized(spark, tz))
    // forget decrements by docs ACTUALLY removed (id 99 not indexed),
    // so forget+re-append lifecycles cannot inflate the counter
    Dedup.spanGramIndexForget(spark, tz, Seq(2L, 3L, 99L).toDF("doc_id"))
    assert(Dedup.spanIndexDocs(spark, tz) == 2L,
      "forget must decrement the indexed-docs counter by removed docs only")
    Dedup.spanGramIndexAppend(spark, tz,
      Seq((2L, s"doc 2 body: " + ("x" * 60))).toDF("doc_id", "text"))
    assert(Dedup.spanIndexDocs(spark, tz) == 3L)
    // P=8 → target 8×2000 docs; the guard trips past the 4× factor
    spark.sql(s"ALTER TABLE $tz SET TBLPROPERTIES " +
      s"('${Dedup.SpanIndexDocsProp}' = '${4L * 8 * 2000 + 1}')")
    assert(Dedup.spanIndexOversized(spark, tz),
      "oversize predicate must trip past driftFactor × P × sizing target")
    spark.sql(s"DROP TABLE IF EXISTS $tz")
    CacheRegistry.releaseAll()
  }

  test("span index build stamps the INDEXED count; forget pins ids via Lineage.cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // build stamp = docs actually indexed (the % 10 != 0 registry
    // convention), not the full corpus row count — append advances /
    // forget decrements by exact indexed counts, so a full-corpus
    // stamp would sit permanently ~10% high (ADVICE r18)
    val t = Dedup.spanGramIndexFor(spark, Sf, 50)
    val expected = Tables.documents(spark, Sf)
      .filter(col("doc_id") % 10 =!= 0).count()
    assert(Dedup.spanIndexDocs(spark, t) == expected,
      s"build must stamp the indexed count ($expected), got ${Dedup.spanIndexDocs(spark, t)}")
    // forget's one-evaluation id pin routes through Lineage.cut: on
    // the durable tier the pin is a reliable checkpoint (files land in
    // the configured dir) and the forget semantics are unchanged
    val tz = "graft_span_gram_reliable_forget_spec_v5"
    spark.sql(s"DROP TABLE IF EXISTS $tz")
    Dedup.spanGramIndexCreateEmpty(spark, tz, 8)
    val batch = (1L to 3L).map(i => (i, s"doc $i body: " + ("x" * 60))).toDF("doc_id", "text")
    Dedup.spanGramIndexAppend(spark, tz, batch)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_forget").toFile
    withConf(graft.operators.Lineage.ReliableDirKey -> ckpt.getAbsolutePath) {
      Dedup.spanGramIndexForget(spark, tz, Seq(2L).toDF("doc_id"))
    }
    assert(spark.table(tz).filter(col("doc_id") === 2L).head(1).isEmpty,
      "durable-tier forget left the victim's rows behind")
    assert(Dedup.spanIndexDocs(spark, tz) == 2L)
    def files(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(files).sum else 1L
    assert(files(ckpt) > 0, "forget id pin wrote nothing to the reliable dir")
    spark.sql(s"DROP TABLE IF EXISTS $tz")
    CacheRegistry.releaseAll()
  }

  test("pipe_span_dedup_keep_first: keeper occurrences survive verbatim; cuts are a subset of remove-all") {
    import org.apache.spark.sql.functions._
    val n = 50
    val kf = Dedup.pipeSpanDedupKeepFirst(spark, Sf, n).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val all = Dedup.pipeSpanDedup(spark, Sf, n).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kf.keySet == docs.keySet)
    // independent char-level replay of the keeper rule
    def asciiOf(t: String) = t.forall(_ < 128)
    val occ = scala.collection.mutable.HashMap.empty[String, List[(Long, Int)]]
    for ((id, t) <- docs.toSeq.sortBy(_._1) if asciiOf(t) && t.length >= n) {
      val lt = t.toLowerCase
      for (p <- 0 to lt.length - n)
        occ.updateWith(lt.substring(p, p + n))(v => Some((id, p) :: v.getOrElse(Nil)))
    }
    val repOcc = occ.filter(_._2.length >= 2).map { case (g, os) =>
      g -> (os.sortBy(identity), os.min) } // (all occurrences, keeper)
    var anyKept = false
    for ((id, t) <- docs) {
      val r = kf(id)
      if (asciiOf(t) && t.length >= n) {
        val cutC = new Array[Boolean](t.length)
        val keepC = new Array[Boolean](t.length)
        for ((_, (os, keeper)) <- repOcc; (d, p) <- os if d == id) {
          val m = if ((d, p) == keeper) keepC else cutC
          (p until p + n).foreach(m(_) = true)
        }
        val cut = (0 until t.length).map(i => cutC(i) && !keepC(i))
        val expChars = cut.count(identity).toLong
        assert(r.getAs[Long]("n_chars_cut") == expChars,
          s"doc $id: keep-first cut ${r.getAs[Long]("n_chars_cut")} chars, replay says $expChars")
        val kept = t.zipWithIndex.collect { case (c, i) if !cut(i) => c }.mkString
        assert(r.getAs[Long]("clean_len") == kept.length.toLong, s"doc $id: clean_len mismatch")
      }
      // subset: anything keep-first cuts, remove-all also cuts
      assert(r.getAs[Long]("n_chars_cut") <= all(id).getAs[Long]("n_chars_cut"),
        s"doc $id: keep-first cut more than remove-all")
      if (r.getAs[Long]("n_chars_cut") < all(id).getAs[Long]("n_chars_cut")) anyKept = true
    }
    assert(anyKept, "keep-first never preserved anything remove-all cut — keeper rule vacuous")
    // retention: every repeated gram still exists in its keeper doc's
    // cleaned text (keeper coverage is never cut and the fold keeps
    // contiguity)
    val cleaned = Dedup.spanDedupKeepFirstCore(
        Tables.documents(spark, Sf).select(col("doc_id"), col("text")), n)
      .select(col("doc_id"), col("clean_text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase).toMap
    for ((g, (_, (kd, _))) <- repOcc)
      assert(cleaned(kd).contains(g),
        s"repeated gram lost from the corpus: keeper doc $kd no longer contains it")
    CacheRegistry.releaseAll()
  }

  test("span cutting is code-point exact on multi-byte text (BMP and supplementary planes)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = 50
    // the repeated span carries 2-byte (é, ø), 3-byte (→) and 4-byte
    // (U+1F600, TWO UTF-16 units but ONE code point) characters — the
    // exact population the round-15 implementation passed through
    // uncut, and the supplementary-plane char is the case where
    // UTF-16 indexing and code-point indexing genuinely diverge
    val emoji = new String(Character.toChars(0x1f600))
    val rBase = s"déjà vu $emoji shared bøilerplate footer → across docs!" * 3
    // exactly 60 code points of it
    val rEnd = rBase.offsetByCodePoints(0, 60)
    val r = rBase.substring(0, rEnd)
    assert(r.codePointCount(0, r.length) == 60 && r.length > 60,
      "planted span must be 60 code points and multi-byte")
    // distinct trailing characters: a shared final char would extend
    // the repeated region one code point left of the planted span
    val fillerA = "unique preamble for document alpha 123:"
    val fillerB = "and a different lead-in for doc beta xyz-"
    val tailA = " trailing unique alpha content 9"
    val docA = fillerA + r + tailA
    val docB = fillerB + r
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    def cp(s: String) = s.codePointCount(0, s.length)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // remove-all: each doc loses exactly the 60-code-point span
    // (windows fully inside it repeat across the pair; nothing else
    // repeats given the distinct fillers)
    val out = Dedup.spanDedupCore(docs, n).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    for ((id, filler, doc) <- Seq((1L, fillerA, docA), (2L, fillerB, docB))) {
      val s0 = cp(filler); val e0 = s0 + 60
      val o = out(id)
      assert(!o.getAs[Boolean]("is_ascii"), s"doc $id should be flagged non-ascii")
      assert(o.getAs[Long]("n_spans_cut") == 1L && o.getAs[Long]("n_chars_cut") == 60L,
        s"doc $id: expected one 60-code-point cut, got " +
          s"${o.getAs[Long]("n_spans_cut")} spans / ${o.getAs[Long]("n_chars_cut")} chars")
      assert(o.getAs[String]("cut_ranges") == s"$s0-$e0",
        s"doc $id: cut at ${o.getAs[String]("cut_ranges")}, expected $s0-$e0")
      // replay the cut with code-point-aware indexing on the JVM side
      val expected = doc.substring(0, doc.offsetByCodePoints(0, s0)) +
        doc.substring(doc.offsetByCodePoints(0, e0))
      assert(o.getAs[String]("clean_text") == expected,
        s"doc $id: cleaned text diverges from the code-point replay")
      assert(md5hex(expected) == md5hex(o.getAs[String]("clean_text")))
    }
    // keep-first: doc 1 holds the globally-first occurrence — its
    // span survives verbatim; doc 2 loses it
    val kf = Dedup.spanDedupKeepFirstCore(docs, n).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(kf(1L).getAs[Long]("n_chars_cut") == 0L,
      "keeper doc lost protected text")
    assert(kf(1L).getAs[String]("clean_text") == docA)
    assert(kf(2L).getAs[Long]("n_chars_cut") == 60L &&
      kf(2L).getAs[String]("cut_ranges") == s"${cp(fillerB)}-${cp(fillerB) + 60}",
      "non-keeper doc must lose exactly the unprotected span")
    CacheRegistry.releaseAll()
  }

  test("lowercase-unstable documents (U+0130 class) pass through uncut and FLAGGED lc_stable=false") {
    import spark.implicits._
    val n = 50
    // U+0130 İ lowercases to TWO code points ('i' + combining dot) in
    // Java/Spark full case mapping, so gram offsets computed on
    // lower(text) no longer align with text — these docs must be
    // excluded from cutting, and since round 17 the exclusion is
    // VISIBLE: lc_stable = false rides the output next to is_ascii
    // (a Turkish crawl shard skipping the intervention silently was
    // the r16 verdict's residual #3)
    val unstableSpan = "İstanbul boilerplate repeated across both docs!!!!" * 2
    assert(unstableSpan.length >= n && unstableSpan.contains('İ'))
    assert(unstableSpan.toLowerCase.codePointCount(0, unstableSpan.toLowerCase.length) >
      unstableSpan.codePointCount(0, unstableSpan.length),
      "test premise: lowercasing must change the code-point count")
    val stableSpan = "perfectly ordinary shared footer text for the pair....."
    assert(stableSpan.length >= n)
    val docs = Seq(
      (1L, "unique lead-in one/" + unstableSpan + "_tail one"),
      (2L, "other lead-in two=" + unstableSpan + "-tail two"),
      (3L, "stable doc three+" + stableSpan + "~tail three"),
      (4L, "stable doc four<" + stableSpan + ">tail four")).toDF("doc_id", "text")
    for (out <- Seq(Dedup.spanDedupCore(docs, n), Dedup.spanDedupKeepFirstCore(docs, n))) {
      val rows = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      for (id <- Seq(1L, 2L)) {
        assert(!rows(id).getAs[Boolean]("lc_stable"), s"doc $id must flag lc_stable=false")
        assert(rows(id).getAs[Long]("n_spans_cut") == 0L,
          s"lc-unstable doc $id must pass through uncut (offsets would misalign)")
      }
      // the stable pair in the SAME corpus still gets the intervention
      assert(rows(3L).getAs[Boolean]("lc_stable") && rows(4L).getAs[Boolean]("lc_stable"))
      assert(rows(3L).getAs[Long]("n_chars_cut") > 0L || rows(4L).getAs[Long]("n_chars_cut") > 0L,
        "stable pair lost the intervention — exclusion leaked past the unstable docs")
    }
    CacheRegistry.releaseAll()
  }

  test("64-bit gram-hash collisions never cut: raw-window confirmation rejects colliding singletons") {
    import spark.implicits._
    val n = 50
    // constructed collision for the base-1000003 rolling hash: bump
    // position 48 by one (+B) and drop position 49 by B (valid code
    // points: U+100000 → U+BDBD differ by exactly 1000003), so the
    // two 50-code-point windows hash identically while being
    // different text — each occurs ONCE, so cutting either would
    // destroy unique data
    val w1 = "a" * 48 + "b" + new String(Character.toChars(0x100000))
    val w2 = "a" * 48 + "c" + new String(Character.toChars(0xbdbd))
    assert(w1 != w2)
    val h1 = graft.functions.NgramHashesChars.hashes(w1.getBytes("UTF-8"), n)
    val h2 = graft.functions.NgramHashesChars.hashes(w2.getBytes("UTF-8"), n)
    assert(h1.length == 1 && h2.length == 1 && h1(0) == h2(0),
      "planted windows no longer collide — the kernel's hash changed, rebuild the pair")
    val docs = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
    for ((label, res) <- Seq(
        "remove-all" -> Dedup.spanDedupCore(docs, n).collect(),
        "keep-first" -> Dedup.spanDedupKeepFirstCore(docs, n).collect())) {
      res.foreach { o =>
        assert(o.getAs[Long]("n_spans_cut") == 0L &&
          o.getAs[String]("clean_text") == (if (o.getAs[Long]("doc_id") == 1L) w1 else w2),
          s"$label: hash-collision singleton was cut — confirmation pass broken")
      }
    }
    CacheRegistry.releaseAll()
  }

  test("keep-first packed-argmin envelope violations raise instead of electing a wrong keeper") {
    import spark.implicits._
    val span = "this exact sentence repeats across both documents!" // 50 chars
    assert(span.length == 50)
    val docs = Seq((1L << 39, "lead-in one " + span), ((1L << 39) + 1, span + " trailer"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.spanDedupKeepFirstCore(docs, 50).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("envelope"),
      s"expected the packed-argmin envelope error, got: ${messages(e).take(400)}")
    CacheRegistry.releaseAll()
  }

  test("lshSeedTable build sweeps stale generations (old plane counts, pre-sample _v1 schema)") {
    import org.apache.spark.sql.functions._
    // plant two stale generations of THIS dir's artifact family —
    // an old plane count and a pre-sample _v1 schema — and verify the
    // accessor's build drops both (orphaned derived state an ingest
    // loop would otherwise keep maintaining while nothing serves
    // from it), then returns the current generation
    val slug = Sf.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
    val dirTag = (scala.util.hashing.MurmurHash3.stringHash(Sf) & 0x7fffffff).toHexString
    val staleA = s"graft_lsh_seed_${slug}_${dirTag}_p7_v1"
    val staleB = s"graft_lsh_seed_${slug}_${dirTag}_p12_v2"
    val current = s"graft_lsh_seed_${slug}_${dirTag}_p9_v2" // adaptive count at n=500
    Seq(staleA, staleB, current).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.sources.Sources.clearOrphanedLocation(spark, t)
    }
    Seq(staleA, staleB).foreach { t =>
      spark.range(1).select(lit(0).as("t"), lit(0L).as("bk"), col("id").as("b"))
        .write.format("parquet").saveAsTable(t)
    }
    val table = Similarity.lshSeedTable(spark, Sf)
    assert(table == current, s"unexpected current generation $table")
    assert(!spark.catalog.tableExists(staleA) && !spark.catalog.tableExists(staleB),
      "stale seed-table generations not dropped by the build sweep")
    assert(spark.catalog.tableExists(current))
    spark.sql(s"DROP TABLE IF EXISTS $current")
    CacheRegistry.releaseAll()
  }

  test("seed-artifact staleness alarm: plane drift past one boundary fires before recall collapses") {
    import org.apache.spark.sql.functions._
    // the 0.289-recall cliff made visible as a dashboard flag: a table
    // pinned at the build's plane count, grown 8x past it, must report
    // stale (plane_drift > 1) and show the fattened buckets directly
    val base = Tables.embeddings(spark, Sf).select("vec_id", "embedding")
    val specT = "graft_lsh_seed_spec_health_p9_v2" // 9 = adaptive count at n=500
    spark.sql(s"DROP TABLE IF EXISTS $specT")
    graft.sources.Sources.clearOrphanedLocation(spark, specT)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("b",
            org.apache.spark.sql.types.LongType))))
      .write.format("parquet").saveAsTable(specT)
    Similarity.lshSeedAppend(spark, specT, base)
    val healthy = Similarity.seedArtifactHealthRow(spark, specT, base).collect()(0)
    assert(healthy.getAs[Int]("plane_drift") == 0 && !healthy.getAs[Boolean]("stale"),
      s"fresh artifact reported stale: $healthy")
    // grow the corpus 8x (two plane boundaries: adaptive 9 -> 11) while
    // the artifact stays pinned at 9 — the silent-degradation scenario
    val grown = (1 to 7).foldLeft(base) { (acc, i) =>
      acc.union(base.select((col("vec_id") + i * 10000L).as("vec_id"),
        col("embedding")))
    }.cache()
    Similarity.lshSeedAppend(spark, specT, grown)
    val row = Similarity.seedArtifactHealthRow(spark, specT, grown).collect()(0)
    assert(row.getAs[Int]("adaptive_planes") == 11,
      s"adaptive plane count at n=4000 should be 11: $row")
    assert(row.getAs[Int]("plane_drift") == 2 && row.getAs[Boolean]("stale"),
      s"two-boundary drift did not fire the staleness flag: $row")
    assert(row.getAs[Double]("mean_bucket") > 2.0,
      s"occupancy should show fattened buckets past the ~2 basin target: $row")
    // per-append admission cap: even built under capacity then grown
    // 8x, the t = -1 superset stays O(cap) per append (two appends
    // here) — the r15 balloon scenario is structurally impossible now
    assert(row.getAs[Long]("sample_rows") <= 2L * Similarity.SeedSampleCap &&
      !row.getAs[Boolean]("sample_over_cap"),
      s"bounded admissions should keep the sample under 2x cap: $row")
    // the over-cap flag still guards LEGACY/externally-written
    // artifacts: plant a raw oversized t = -1 set and it must fire
    spark.range(4L * Similarity.SeedSampleCap + 1)
      .select(lit(-1).as("t"), xxhash64(col("id") + 90000L).as("bk"),
        (col("id") + 90000L).as("b"))
      .write.mode("append").insertInto(specT)
    val legacy = Similarity.seedArtifactHealthRow(spark, specT, grown).collect()(0)
    assert(legacy.getAs[Boolean]("sample_over_cap"),
      s"oversized legacy sample not flagged: $legacy")
    spark.sql(s"DROP TABLE IF EXISTS $specT")
    grown.unpersist()
    CacheRegistry.releaseAll()
  }

  test("filtered search under selective allow-lists: shortfall measured, monotone in beam/hops") {
    import org.apache.spark.sql.functions._
    // the documented degradation contract: a rare allow-list can
    // leave fewer than k allowed ids inside the bounded visited pool
    // (~seeds + hops·beam·(graphK+1)); the operator degrades by
    // SHRINKING the result set, never by stranding the walk. Measure
    // the shortfall at 1% / 5% / 20% selectivity and verify widening
    // beam/hops monotonically recovers it — the guidance the scaladoc
    // gives a caller with a selective filter.
    val table = Similarity.knnGraphTable(spark, Sf, 10, 3)
    val graph = spark.table(table)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")).cache()
    val queries = corpus.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv")).cache()
    val nQ = queries.count()
    val k = 5
    val selectivities = Seq(("1%", 100L), ("5%", 20L), ("20%", 5L))
    val widths = Seq((20, 3), (40, 5))
    val shortfall = selectivities.map { case (label, mod) =>
      val allowed = corpus.filter(col("vec_id") % mod === 1)
        .select(col("vec_id").as("b")).cache()
      val nAllowed = allowed.count()
      val fill = math.min(k.toLong, nAllowed)
      label -> widths.map { case (beam, hops) =>
        val served = Similarity.graphSearchCore(graph, corpus, queries, k,
          beam, hops, allowed = Some(allowed))
        // every pick honors the filter — degradation never leaks
        assert(served.join(allowed,
          served("vec_id") === allowed("b"), "left_anti").isEmpty,
          s"pick outside the allow-list at $label selectivity")
        val short = queries.select("qid")
          .join(served.groupBy("qid").count(), Seq("qid"), "left")
          .select(coalesce(col("count"), lit(0L)).as("cnt"))
          .filter(col("cnt") < fill).count()
        short
      }
    }
    shortfall.foreach { case (label, Seq(narrow, wide)) =>
      info(s"selectivity $label: $narrow/$nQ queries short at beam=20/hops=3, " +
        s"$wide/$nQ at beam=40/hops=5")
      assert(wide <= narrow,
        s"widening beam/hops increased shortfall at $label ($narrow -> $wide)")
    }
    // rarer filters are strictly harder — the 20% list must not be
    // worse off than the 1% list at the same width
    assert(shortfall.last._2.head <= shortfall.head._2.head,
      "20% allow-list shorter-filled than the 1% list at the same width")

    // the AUTO-WIDENING form: retries only the short queries with
    // doubled beam / +2 hops — shortfall must improve on the plain
    // walk, non-short queries must keep their first answers verbatim,
    // and no pick may leak past the filter
    val allowed1 = corpus.filter(col("vec_id") % 100 === 1)
      .select(col("vec_id").as("b")).cache()
    val fill1 = math.min(k.toLong, allowed1.count())
    def shortCount(df: org.apache.spark.sql.DataFrame): Long =
      queries.select("qid")
        .join(df.groupBy("qid").count(), Seq("qid"), "left")
        .select(coalesce(col("count"), lit(0L)).as("cnt"))
        .filter(col("cnt") < fill1).count()
    val plain = Similarity.graphSearchCore(graph, corpus, queries, k,
      20, 3, allowed = Some(allowed1))
    val adaptive = Similarity.graphSearchFilteredAdaptive(graph, corpus,
      queries, allowed1, k, beam = 20, hops = 3, maxDoublings = 2)
    val (sPlain, sAdaptive) = (shortCount(plain), shortCount(adaptive))
    info(s"adaptive widening at 1%: shortfall $sPlain/$nQ plain -> $sAdaptive/$nQ adaptive")
    assert(sAdaptive < sPlain,
      s"auto-widening did not reduce 1%-selectivity shortfall ($sPlain -> $sAdaptive)")
    assert(adaptive.join(allowed1,
      adaptive("vec_id") === allowed1("b"), "left_anti").isEmpty,
      "adaptive pick outside the allow-list")
    // queries already full at the first width are untouched
    val fullQids = plain.groupBy("qid").count().filter(col("count") >= fill1)
      .select("qid")
    val keptPlain = plain.join(fullQids, Seq("qid"), "left_semi").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getAs[Long]("vec_id"))).toSet
    val keptAdaptive = adaptive.join(fullQids, Seq("qid"), "left_semi").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank"), r.getAs[Long]("vec_id"))).toSet
    assert(keptPlain == keptAdaptive,
      "auto-widening disturbed queries that were already full at the first width")
    CacheRegistry.releaseAll()
  }

  test("per-segment graph closes the 1% selectivity shortfall structurally: 0 short, exact in-segment") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the same scenario the widener specs measure (1% allow-list =
    // vec_id % 100 == 1, 5 of 500; 50 queries) — the full-graph walk
    // leaves 47/50 short at beam 20/hops 3 and 12/50 after two
    // adaptive doublings; the per-segment graph must leave ZERO (every
    // scored candidate is allowed by construction)
    val corpus = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v")).cache()
    val queries = corpus.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv")).cache()
    val members = Tables.embeddings(spark, Sf).filter(col("vec_id") % 100 === 1)
    val segT = Similarity.knnGraphSegmentTableFor(spark, Sf, "spec_pct1",
      members, k = 10, iters = 3)
    val graph = spark.table(segT)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val segV = corpus.join(members.select("vec_id"), Seq("vec_id"), "left_semi").cache()
    val nSeg = segV.count()
    val k = 5
    val fill = math.min(k.toLong, nSeg)
    val seeds = Similarity.denseLcgSeeds(segV.select("vec_id"),
      queries.select("qid"), "qid", 20)
    val served = Similarity.graphSearchCore(graph, segV, queries, k,
      beam = 20, hops = 3, seedsOverride = Some(seeds))
    val nQ = queries.count()
    // a query that IS a segment member can reach only nSeg - 1
    // neighbors (serving excludes self by contract) — its full
    // result is one shorter
    val short = queries.select("qid")
      .join(segV.select(col("vec_id").as("qid")).withColumn("self", lit(1L)),
        Seq("qid"), "left")
      .join(served.groupBy("qid").count(), Seq("qid"), "left")
      .select(coalesce(col("count"), lit(0L)).as("cnt"),
        least(lit(fill), lit(nSeg) - coalesce(col("self"), lit(0L))).as("want"))
      .filter(col("cnt") < col("want")).count()
    info(s"segment path at 1%: shortfall $short/$nQ " +
      s"(plain walk 47/$nQ, adaptive 12/$nQ in the widener specs)")
    assert(short == 0L,
      s"per-segment graph left $short/$nQ queries short at the 1% allow-list")
    // beam (20) >= |segment| (5): the dense-seed set IS the whole
    // segment, so the answer must equal exact brute force over it
    val exact = queries.join(segV, col("qid") =!= col("vec_id"))
      .withColumn("c", graft.functions.VectorFunctions
        .cosine_similarity(col("qv"), col("v")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("c").desc, col("vec_id"))))
      .filter(col("rn") <= k).select("qid", "vec_id")
    val servedIds = served.select("qid", "vec_id")
    assert(servedIds.exceptAll(exact).isEmpty && exact.exceptAll(servedIds).isEmpty,
      "segment answers diverge from exact brute force over the allow-list")
    // routing: a declared segment goes to the segment walk verbatim
    val routed = Similarity.graphSearchFilteredRouted(spark, Sf, "en",
      declared = Set("en")).collect().toSeq
    val direct = Similarity.simGraphSearchSegment(spark, Sf, "en").collect().toSeq
    assert(routed == direct, "declared-segment routing diverges from the segment walk")
    // the PRODUCTION combination (converged segment build + informed
    // seeds — no dense-rank window anywhere) fills identically: with
    // n_seg <= 4*beam the informed fallback seeds every query with
    // the whole segment, so the answer is the same exact top-k
    val segTc = Similarity.knnGraphSegmentTableFor(spark, Sf, "spec_pct1",
      members, k = 10, converged = true)
    val graphC = spark.table(segTc)
      .select(col("vec_id").as("ga"), col("nbr_id").as("gb"))
    val servedProd = Similarity.graphSearchCore(graphC, segV, queries, k,
      beam = 20, hops = 3, informedSeeds = true).select("qid", "vec_id")
    assert(servedProd.exceptAll(exact).isEmpty && exact.exceptAll(servedProd).isEmpty,
      "converged+informed segment serving diverges from exact brute force")
    Seq(segT, segTc).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    CacheRegistry.releaseAll()
  }

  test("segment serving dashboard: per-segment recall row holds a floor; graph health row flags coverage drift") {
    import org.apache.spark.sql.functions._
    // recall row over the real en segment graph (the table the
    // registry walk serves from)
    val row = Similarity.segmentServeRecallRow(spark, Sf).collect()(0)
    assert(row.getAs[String]("segment") == "en" &&
      row.getAs[Long]("n_segment") > 0L)
    assert(row.getAs[Long]("n_ann") == row.getAs[Long]("n_exact"),
      s"segment serving returned short answers: $row")
    assert(row.getAs[Double]("recall") >= 0.9,
      s"per-segment serve recall below floor: $row")
    // size-aware walk budget (the r18 dashboard finding: fixed
    // beam=20 measured 0.72-0.76 on the 808-member sf0.1 segment;
    // recovery measured at beam 64 → 0.98) — floor preserved at the
    // historical sizes, the measured recovery point covered at the
    // size that decayed, monotone so growth can only widen the walk
    assert(Similarity.beamForSegment(218) == 20, "historic floor moved")
    assert(Similarity.beamForSegment(808) >= 64,
      "sizing rule undershoots the measured 0.98-recovery beam")
    assert((1L to 5000L by 97).sliding(2).forall { w =>
      Similarity.beamForSegment(w.head) <= Similarity.beamForSegment(w.last) })
    // graph health on a synthetic segment: fresh build is clean
    val members = Tables.embeddings(spark, Sf)
      .filter(col("vec_id") % 2 === 0).select("vec_id", "embedding").cache()
    val segT = Similarity.knnGraphSegmentTableFor(spark, Sf, "spechealth", members)
    def health(m: org.apache.spark.sql.DataFrame) =
      Similarity.graphArtifactHealthRow(spark, segT, m).collect()(0)
    val fresh = health(members)
    assert(fresh.getAs[Long]("n_missing") == 0L && fresh.getAs[Long]("n_orphans") == 0L &&
      !fresh.getAs[Boolean]("stale") && !fresh.getAs[Boolean]("filter_leak"),
      s"fresh segment graph reported unhealthy: $fresh")
    // membership grown WITHOUT a graph append — the silent-degradation
    // scenario the row exists for: missing members can never be served
    val grown = members.union(
      members.select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))).cache()
    val drifted = health(grown)
    assert(drifted.getAs[Long]("n_missing") == members.count() &&
      drifted.getAs[Boolean]("stale"),
      s"half-missing membership did not flag stale: $drifted")
    // knnGraphAppend brings the graph up to date — the row heals
    Similarity.knnGraphAppend(spark, segT, grown)
    val healed = health(grown)
    assert(healed.getAs[Long]("n_missing") == 0L && !healed.getAs[Boolean]("stale"),
      s"graph append did not clear the staleness flag: $healed")
    // membership SHRUNK below the graph (docs re-tagged/removed):
    // orphaned vertices would serve answers OUTSIDE the segment —
    // a filter-correctness leak, flagged on any orphan
    val leak = health(grown.filter(col("vec_id") % 4 === 0))
    assert(leak.getAs[Long]("n_orphans") > 0L && leak.getAs[Boolean]("filter_leak"),
      s"orphaned vertices not flagged as a filter leak: $leak")
    spark.sql(s"DROP TABLE IF EXISTS $segT")
    members.unpersist(); grown.unpersist()
    CacheRegistry.releaseAll()
  }

  test("filtered routing: a non-declared segment falls back to the adaptive widener, filter honored") {
    import org.apache.spark.sql.functions._
    val routed = Similarity.graphSearchFilteredRouted(spark, Sf, "fr",
      declared = Set("en")).cache()
    val allowed = Tables.documents(spark, Sf)
      .filter(col("lang") === "fr").select(col("doc_id").as("b"))
    assert(routed.count() > 0, "fallback arm returned nothing")
    assert(routed.join(allowed, routed("vec_id") === allowed("b"), "left_anti").isEmpty,
      "fallback arm leaked a pick outside the lang allow-list")
    routed.unpersist()
    CacheRegistry.releaseAll()
  }
}

package graft

import graft.ml.{DecisionTree, FeatureSpec, FeatureVectorizer}
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, round, udf}

/** Driver contract — see /root/repo/SURVEY.md §2 (operator inventory)
  * and §7 (build plan). Every operator has a `queries` entry; the
  * SQL-expressible ones also carry a DuckDB oracle with IDENTICAL
  * column names and rounding on both sides.
  */
object SparkEntry {

  /** Flagship query on sf0.001: the head of the LLM training-data
    * pipeline — quality gate, then exact dedup, reported as
    * per-language corpus stats. Composes three operator families in
    * one plan (text analysis, dedup, relational aggregate). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{count, length, lit, sum}
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val kept = TextAnalysis.pipeQualityFilter(spark, dir).select("doc_id")
    val keepers = Dedup.dedupExact(spark, dir).select(col("keep_id").as("doc_id"))
    Tables.documents(spark, dir)
      .join(kept, "doc_id").join(keepers, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(length(col("text")).cast("long")).as("chars"))
      .orderBy("lang")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational core
    "q1_agg" -> (Relational.q1Agg(_, _)),
    "q2_filter" -> (Relational.q2Filter(_, _)),
    "q3_join_agg" -> (Relational.q3JoinAgg(_, _)),
    "q4_broadcast_join" -> (Relational.q4BroadcastJoin(_, _)),
    "q5_semi_join" -> (Relational.q5SemiJoin(_, _)),
    "q6_anti_join" -> (Relational.q6AntiJoin(_, _)),
    "q7_window" -> (Relational.q7Window(_, _)),
    "q8_topk" -> (Relational.q8TopK(_, _)),
    "q9_distinct" -> (Relational.q9Distinct(_, _)),
    "q10_rollup" -> (Relational.q10Rollup(_, _)),
    "q11_case_agg" -> (Relational.q11CaseAgg(_, _)),
    "q12_having" -> (Relational.q12Having(_, _)),
    "q13_events_window" -> (Relational.q13EventsWindow(_, _)),
    "q14_union" -> (Relational.q14Union(_, _)),
    "q15_approx_distinct" -> (Relational.q15ApproxDistinct(_, _)),
    "q16_pivot" -> (Relational.q16Pivot(_, _)),
    "q17_percentile" -> (Relational.q17Percentile(_, _)),
    "q18_stats" -> (Relational.q18Stats(_, _)),
    "q19_strings" -> (Relational.q19Strings(_, _)),
    "q20_cube" -> (Relational.q20Cube(_, _)),
    "q21_asof_latest" -> (Relational.q21AsofLatest(_, _)),
    "q22_sample" -> (Relational.q22Sample(_, _)),
    "q23_stratified" -> ((s, d) => Relational.q23Stratified(s, d)),
    "q24_approx_percentile" -> (Relational.q24ApproxPercentile(_, _)),
    "q25_salted_join" -> (Relational.q25SaltedJoin(_, _)),
    "q26_asof_join" -> (Relational.q26AsofJoin(_, _)),
    "q27_range_join" -> (Relational.q27RangeJoin(_, _)),
    "q28_sessionize" -> ((s, d) => Relational.q28Sessionize(s, d)),
    "q29_json" -> (Relational.q29Json(_, _)),
    "q30_window_funcs" -> (Relational.q30WindowFuncs(_, _)),
    "q31_month_trend" -> (Relational.q31MonthTrend(_, _)),
    "q32_grouped_topk" -> ((s, d) => Relational.q32GroupedTopK(s, d)),
    "q33_sql_join" -> (Relational.q33SqlJoin(_, _)),
    "q34_exists_subquery" -> (Relational.q34ExistsSubquery(_, _)),
    "q35_intersect_except" -> (Relational.q35IntersectExcept(_, _)),
    "q36_grouping_sets" -> (Relational.q36GroupingSets(_, _)),
    "q37_outer_join" -> (Relational.q37OuterJoin(_, _)),
    "q38_rolling_window" -> (Relational.q38RollingWindow(_, _)),
    "q39_daily_active" -> (Relational.q39DailyActive(_, _)),
    "q40_retention" -> (Relational.q40Retention(_, _)),
    "q41_cross_modal" -> (Relational.q41CrossModal(_, _)),
    "q42_funnel" -> (Relational.q42Funnel(_, _)),
    "q43_null_agg" -> (Relational.q43NullAgg(_, _)),
    "q44_string_agg" -> (Relational.q44StringAgg(_, _)),
    "q45_recursive_cte" -> (Relational.q45RecursiveCte(_, _)),
    "q46_variant" -> (Relational.q46Variant(_, _)),
    "q47_unpivot" -> (Relational.q47Unpivot(_, _)),
    "q48_gapfill" -> (Relational.q48Gapfill(_, _)),
    "q49_time_rolling" -> (Relational.q49TimeRolling(_, _)),
    "text_normalize" -> (TextAnalysis.textNormalize(_, _)),
    // §2.3 dedup
    "dedup_exact" -> (Dedup.dedupExact(_, _)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.dedupNgramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.dedupMinhashLsh(s, d)),
    "dedup_eval" -> ((s, d) => Dedup.dedupEval(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.dedupEmbedding(s, d)),
    "dedup_embedding_ann" -> ((s, d) => Dedup.dedupEmbeddingAnn(s, d, augmentPlanted = true)),
    "dedup_semantic" -> ((s, d) => Dedup.dedupSemantic(s, d, augmentPlanted = true)),
    "dedup_cross_corpus" -> ((s, d) => Dedup.dedupCrossCorpus(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_keep_best" -> ((s, d) => Dedup.dedupKeepBest(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.dedupSubstring(s, d)),
    "pipe_span_dedup" -> ((s, d) => Dedup.pipeSpanDedup(s, d)),
    "pipe_span_dedup_keep_first" -> ((s, d) => Dedup.pipeSpanDedupKeepFirst(s, d)),
    "pipe_span_dedup_multibyte" -> ((s, d) => Dedup.pipeSpanDedupMultibyte(s, d)),
    "pipe_span_keep_first_multibyte" -> ((s, d) => Dedup.pipeSpanKeepFirstMultibyte(s, d)),
    "pipe_span_incremental" -> ((s, d) => Dedup.pipeSpanIncremental(s, d)),
    "pipe_span_keep_first_incremental" -> ((s, d) => Dedup.pipeSpanKeepFirstIncremental(s, d)),
    // §2.4 similarity
    "sim_bruteforce_topk" -> ((s, d) => Similarity.simBruteforceTopK(s, d)),
    "sim_lsh_ann" -> ((s, d) => Similarity.simLshAnn(s, d)),
    "sim_lsh_multitable" -> ((s, d) => Similarity.simLshMultiTable(s, d)),
    "sim_eval" -> ((s, d) => Similarity.simEval(s, d)),
    "sim_knn_graph" -> ((s, d) => Similarity.simKnnGraph(s, d)),
    "sim_knn_graph_incremental" -> ((s, d) => Similarity.simKnnGraphIncremental(s, d)),
    "sim_graph_search" -> ((s, d) => Similarity.simGraphSearch(s, d)),
    "sim_graph_search_filtered" -> ((s, d) => Similarity.simGraphSearchFiltered(s, d)),
    // beam pinned to the replayable 20-walk contract the static oracle
    // unrolls (the direct API defaults to the size-aware AutoBeam)
    "sim_graph_search_segment" -> ((s, d) => Similarity.simGraphSearchSegment(s, d, beam = 20)),
    "sim_hard_negatives" -> ((s, d) => Similarity.simHardNegatives(s, d)),
    "sim_hard_negatives_filtered" -> ((s, d) => Similarity.simHardNegativesFiltered(s, d)),
    "sim_graph_search_heldout" -> ((s, d) => Similarity.simGraphSearchHeldOut(s, d)),
    "sim_knn_components" -> ((s, d) => Similarity.simKnnComponents(s, d)),
    "sim_knn_label_prop" -> ((s, d) => Similarity.simKnnLabelProp(s, d)),
    "sim_knn_diversity" -> ((s, d) => Similarity.simKnnDiversity(s, d)),
    "sim_ivf_ann" -> ((s, d) => Similarity.simIvfAnn(s, d)),
    "sim_ivf_ann_persisted" -> ((s, d) => Similarity.simIvfAnnPersisted(s, d)),
    "sim_ivf_ann_incremental" -> ((s, d) => Similarity.simIvfAnnIncremental(s, d)),
    "sim_ivf_ann_forget" -> ((s, d) => Similarity.simIvfAnnForget(s, d)),
    "sim_ivf_sq8" -> ((s, d) => Similarity.simIvfSq8(s, d)),
    "sim_ivf_pq" -> ((s, d) => Similarity.simIvfPq(s, d)),
    "emb_centroids" -> (Similarity.embCentroids(_, _)),
    "emb_project" -> ((s, d) => Similarity.embProject(s, d)),
    "sim_range_search" -> ((s, d) => Similarity.simRangeSearch(s, d)),
    "emb_quantize" -> (Similarity.embQuantize(_, _)),
    // §2.5 text analysis
    "text_stats" -> (TextAnalysis.textStats(_, _)),
    "text_quality" -> (TextAnalysis.textQuality(_, _)),
    "text_langid" -> (TextAnalysis.textLangId(_, _)),
    "text_fingerprint" -> (TextAnalysis.textFingerprint(_, _)),
    "pipe_quality_filter" -> ((s, d) => TextAnalysis.pipeQualityFilter(s, d)),
    "pipe_pii_scrub" -> (TextAnalysis.pipePiiScrub(_, _)),
    "pipe_gopher_gate" -> ((s, d) => TextAnalysis.pipeGopherGate(s, d)),
    "pipe_span_ingest" -> ((s, d) => TextAnalysis.pipeSpanIngest(s, d)),
    "pipe_split_train_val" -> ((s, d) => TextAnalysis.pipeSplitTrainVal(s, d)),
    "pipe_dataset_card" -> ((s, d) => TextAnalysis.pipeDatasetCard(s, d)),
    "pipe_contamination_frac" -> ((s, d) => TextAnalysis.pipeContaminationFrac(s, d)),
    "pipe_sketch_rollup" -> ((s, d) => TextAnalysis.pipeSketchRollup(s, d)),
    "pipe_heavy_hitters_rollup" -> ((s, d) => TextAnalysis.pipeHeavyHittersRollup(s, d)),
    "pipe_tokenize" -> (TextAnalysis.pipeTokenize(_, _)),
    "pipe_chunk" -> ((s, d) => TextAnalysis.pipeChunk(s, d)),
    "pipe_quantile_rollup" -> ((s, d) => TextAnalysis.pipeQuantileRollup(s, d)),
    "pipe_token_budget" -> ((s, d) => TextAnalysis.pipeTokenBudget(s, d)),
    "pipe_chunk_dedup" -> ((s, d) => TextAnalysis.pipeChunkDedup(s, d)),
    "pipe_full_ingest" -> ((s, d) => TextAnalysis.pipeFullIngest(s, d)),
    "pipe_corpus_stats" -> (TextAnalysis.pipeCorpusStats(_, _)),
    "pipe_train_mix" -> ((s, d) => TextAnalysis.pipeTrainMix(s, d)),
    "pipe_lang_sampling_weights" -> ((s, d) => TextAnalysis.pipeLangSamplingWeights(s, d)),
    "pipe_pack_sequences" -> ((s, d) => TextAnalysis.pipePackSequences(s, d)),
    "pipe_corpus_shuffle" -> ((s, d) => TextAnalysis.pipeCorpusShuffle(s, d)),
    "pipe_shuffle_pack" -> ((s, d) => TextAnalysis.pipeShufflePack(s, d)),
    "pipe_lm_score" -> (TextAnalysis.pipeLmScore(_, _)),
    "pipe_lm_bigram" -> (TextAnalysis.pipeLmBigram(_, _)),
    "pipe_classifier_quality" -> (TextAnalysis.pipeClassifierQuality(_, _)),
    "pipe_lm_buckets" -> (TextAnalysis.pipeLmBuckets(_, _)),
    "pipe_decontaminate" -> ((s, d) => TextAnalysis.pipeDecontaminate(s, d)),
    "pipe_decontaminate_bloom" -> ((s, d) => TextAnalysis.pipeDecontaminateBloom(s, d)),
    "text_top_bigrams" -> ((s, d) => TextAnalysis.textTopBigrams(s, d)),
    "text_top_bigrams_sketch" -> ((s, d) => TextAnalysis.textTopBigramsSketch(s, d)),
    "text_repetition" -> (TextAnalysis.textRepetition(_, _)),
    "text_vocab_stats" -> (TextAnalysis.textVocabStats(_, _)),
    "text_bm25" -> ((s, d) => TextAnalysis.textBm25(s, d)),
    "text_entropy" -> (TextAnalysis.textEntropy(_, _)),
    "pipe_length_histogram" -> ((s, d) => TextAnalysis.pipeLengthHistogram(s, d)),
    "pipe_e2e" -> (TextAnalysis.pipeEndToEnd(_, _)),
    // §2.7 multimodal
    "mm_meta" -> (Multimodal.mmMeta(_, _)),
    "mm_decode" -> (Multimodal.mmDecodeChecked(_, _)),
    "mm_decode_real" -> (Multimodal.mmDecodeReal(_, _)),
    "mm_decode_wav" -> (Multimodal.mmDecodeWav(_, _)),
    "mm_audio_features" -> ((s, d) => Multimodal.mmAudioFeatures(s, d)),
    "mm_image_features" -> ((s, d) => Multimodal.mmImageFeatures(s, d)),
    "mm_image_dedup" -> ((s, d) => Multimodal.mmImageDedup(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.mmFrameSampleChecked(s, d)),
    "mm_frame_sample_gif" -> ((s, d) => Multimodal.mmFrameSampleGif(s, d)),
    "text_winnow" -> (TextAnalysis.textWinnow(_, _)),
    // §2.1 reference ML surface
    "ml_train_predict" -> (mlTrainPredict(_, _)),
    "ml_feature_vectorize" -> (mlFeatureVectorize(_, _)),
    // composed ML × pipeline + incremental dedup + repeated substrings
    "pipe_ml_filter" -> (pipeMlFilter(_, _)),
    "dedup_incremental" -> ((s, d) => Dedup.dedupIncremental(s, d)),
    "pipe_corpus_forget" -> ((s, d) => Dedup.pipeCorpusForget(s, d)),
    "dedup_incremental_persisted" -> ((s, d) => Dedup.dedupIncrementalPersisted(s, d)),
    "pipe_repeated_ngrams" -> ((s, d) => TextAnalysis.pipeRepeatedNgrams(s, d)),
    "pipe_incremental_e2e" -> (TextAnalysis.pipeIncrementalE2e(_, _)),
    "pipe_incremental_e2e_persisted" -> (TextAnalysis.pipeIncrementalE2ePersisted(_, _)),
    "stream_state_inspect" -> (streaming.EventStream.stateInspect(_, _)),
  )

  /** Model-based quality filter — the reference's one capability
    * (decision-tree train/predict, DecisionTreeTrainer.java:40 +
    * DecisionTreePredictor.java:34 semantics: persist → reload →
    * score → appended double prediction column) composed with the
    * §2.5 pipeline surface: train on the [[TextAnalysis
    * .qualityFeatures]] signals against a deterministic rule label
    * (the pipe_quality_filter gates), score every document, keep at
    * score ≥ 0.5.
    *
    * Partial contract (the ml_train_predict pattern): exact per-doc
    * key set, `rule_pass` (the deterministic label — exactly
    * recomputable in SQL), `has_score` per row, and a corpus-level
    * `agree_ok` flag asserted TRUE by the oracle: the tree must
    * reproduce its own training rule on ≥ 90% of documents — a
    * persisted-model corruption or feature mismatch collapses
    * agreement to chance. Measured agreement is 1.0 at all three SF
    * dirs (tools.ProbeAgreement) — the 0.9 bound is slack for
    * adversarial boundary data, not a working margin. Exact tree
    * semantics stay pinned by the flight-delay spec; per-language
    * kept/dropped stats invariants are spec-checked
    * (MlFilterIncrementalSpec). */
  private def pipeMlFilter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{avg, lit}
    val feats = operators.TextAnalysis.qualityFeatures(Tables.documents(s, dir))
      .withColumn("label",
        (col("words") >= 30 && col("alpha_ratio") >= 0.6).cast("double"))
    val spec = FeatureSpec(
      include = Some(Seq("words", "alpha_ratio", "punct_ratio", "stop_ratio")),
      labelField = "label")
    val modelPath = java.nio.file.Files.createTempDirectory("graft-mlfilter-model").toString
    val assembled = FeatureVectorizer.assemble(feats, spec)
    DecisionTree.trainAssembled(assembled, spec, modelPath, maxDepth = 6,
      fitPartitions = FitParallelism)
    val reloaded = DecisionTree.load(s, modelPath)
    import graft.CacheRegistry.Cacheable
    val scored = reloaded.setPredictionCol("score")
      .transform(assembled)
      .drop(FeatureVectorizer.FeaturesCol)
      .cacheTracked
    val agree = scored.agg(
      (avg(((col("score") >= 0.5) === (col("label") === 1.0)).cast("double")) >= 0.9)
        .as("agree_ok"))
    scored
      .select(col("doc_id"), col("lang"),
        (col("label") === 1.0).as("rule_pass"),
        col("score").isNotNull.as("has_score"))
      .crossJoin(agree)
      .orderBy("doc_id")
  }

  /** DuckDB replica of [[operators.Dedup.dedupIncremental]]: minhash
    * signatures over the identical md5-derived shingle hash and
    * permutation family (constants inlined), banding joined on the RAW
    * band tuple on BOTH sides (the Spark side joins the same raw
    * minhash values since round 5 — no band-hash collision gap),
    * exact-dup on raw text equality (Spark: 192-bit compound hash). */
  /** Shared CTE body ending in `shard_flags(doc_id, exact_dup,
    * near_dup)` — the tail of both the dedup_incremental oracle and
    * the pipe_incremental_e2e report oracle. */
  private def incrementalCtesSql(n: Int, numPerms: Int, rowsPerBand: Int,
                                 shardMod: Long,
                                 corpusCond: String = "TRUE"): String = {
    val p = operators.Dedup.MersennePrime
    val mins = (0 until numPerms).map { i =>
      val (a, b) = operators.Dedup.perm(i)
      s"min((h % $p * $a + $b) % $p)"
    }.mkString(", ")
    val numBands = numPerms / rowsPerBand
    s"""shg AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(substr(lower(text), CAST(i AS INT), $n)), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - ${n - 1}, 1) + 1)) AS i
       |        FROM documents)),
       |sig AS (SELECT doc_id, [$mins] AS sig FROM shg GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, band,
       |    list_slice(sig, CAST($rowsPerBand*band + 1 AS INT), CAST($rowsPerBand*band + $rowsPerBand AS INT)) AS key
       |  FROM sig, range(0, $numBands) br(band)),
       |corpusd AS (
       |  SELECT doc_id FROM documents
       |  WHERE doc_id % $shardMod <> 0 AND ($corpusCond)),
       |near AS (
       |  SELECT DISTINCT bs.doc_id
       |  FROM banded bs JOIN banded bc ON bs.band = bc.band AND bs.key = bc.key
       |  JOIN corpusd cd ON cd.doc_id = bc.doc_id
       |  WHERE bs.doc_id % $shardMod = 0),
       |exact AS (
       |  SELECT DISTINCT s.doc_id
       |  FROM documents s JOIN documents c ON s.text = c.text
       |  JOIN corpusd cd ON cd.doc_id = c.doc_id
       |  WHERE s.doc_id % $shardMod = 0),
       |shard_flags AS (
       |  SELECT d.doc_id, d.lang, d.text,
       |    (e.doc_id IS NOT NULL) AS exact_dup, (nr.doc_id IS NOT NULL) AS near_dup
       |  FROM documents d
       |  LEFT JOIN exact e ON e.doc_id = d.doc_id
       |  LEFT JOIN near nr ON nr.doc_id = d.doc_id
       |  WHERE d.doc_id % $shardMod = 0)""".stripMargin
  }

  private def incrementalOracleSql(n: Int, numPerms: Int, rowsPerBand: Int,
                                   shardMod: Long,
                                   corpusCond: String = "TRUE"): String =
    s"""WITH ${incrementalCtesSql(n, numPerms, rowsPerBand, shardMod, corpusCond)}
       |SELECT doc_id, exact_dup, near_dup FROM shard_flags
       |ORDER BY doc_id""".stripMargin

  /** The capstone composition's oracle: every stage's existing oracle
    * formulation (scrub closed form, quality rule on the scrubbed
    * text, 20-gram decontamination, the shared incremental-dedup
    * CTEs, the md5-keyed shuffle-pack windows) chained end to end, so
    * DuckDB replays the WHOLE pipeline's per-doc verdicts and pack
    * assignments, not just each stage in isolation. */
  private def fullIngestOracleSql(minWords: Int, minAlpha: Double, nEval: Long,
                                  nShards: Int, seqLen: Int, seed: Int): String =
    s"""WITH ${incrementalCtesSql(n = 9, numPerms = 32, rowsPerBand = 4, shardMod = 10)},
       |scrub AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 0 THEN
       |      text || ' contact user' || doc_id || '@example.com from 10.' ||
       |      (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 200 + 1)
       |    ELSE text END AS raw
       |  FROM documents),
       |cleaned AS (
       |  SELECT doc_id,
       |    (len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
       |     + len(regexp_extract_all(raw, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')))::BIGINT AS n_pii,
       |    regexp_replace(regexp_replace(raw,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
       |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS clean
       |  FROM scrub),
       |${spanCutCtesSql(textExpr = "clean", fromRel = "cleaned")},
       |q AS (
       |  SELECT cd.doc_id, cl.n_pii, cd.n_spans_cut, cd.n_chars_cut,
       |    len(regexp_extract_all(cd.text, '\\S+'))::BIGINT AS words,
       |    round(len(regexp_extract_all(cd.text, '[A-Za-z]')) / greatest(length(cd.text), 1), 4) AS alpha_ratio,
       |    (len(regexp_extract_all(cd.text, '\\S+')) >= $minWords
       |     AND len(regexp_extract_all(cd.text, '[A-Za-z]')) / greatest(length(cd.text), 1) >= $minAlpha) AS passed_quality
       |  FROM cleandocs cd JOIN cleaned cl USING (doc_id)
       |  WHERE cd.doc_id % 10 = 0 AND cd.doc_id >= $nEval),
       |dsh AS (
       |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 20) AS g
       |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 19, 1) + 1)) AS i
       |        FROM documents)),
       |ev AS (SELECT DISTINCT g FROM dsh WHERE doc_id < $nEval),
       |cont AS (
       |  SELECT DISTINCT doc_id FROM dsh
       |  WHERE doc_id >= $nEval AND g IN (SELECT g FROM ev)),
       |flags AS (
       |  SELECT q.doc_id, q.n_pii, q.n_spans_cut, q.n_chars_cut,
       |    q.words, q.alpha_ratio, q.passed_quality,
       |    (c.doc_id IS NOT NULL) AS contaminated, sf.exact_dup, sf.near_dup,
       |    (q.passed_quality AND c.doc_id IS NULL
       |     AND NOT sf.exact_dup AND NOT sf.near_dup) AS accepted
       |  FROM q
       |  LEFT JOIN cont c USING (doc_id)
       |  JOIN shard_flags sf USING (doc_id)),
       |keyed AS (
       |  SELECT doc_id, words, md5(doc_id || ':$seed') AS skey,
       |    ('0x' || substring(md5(doc_id || ':$seed'), 1, 15))::BIGINT % $nShards AS pack_shard
       |  FROM flags WHERE accepted),
       |packd AS (
       |  SELECT doc_id, pack_shard,
       |    ((sum(words) OVER (PARTITION BY pack_shard ORDER BY skey, doc_id
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      - words) // $seqLen)::BIGINT AS pack_bin
       |  FROM keyed)
       |SELECT f.doc_id, f.n_pii, f.n_spans_cut, f.n_chars_cut,
       |  f.words, f.alpha_ratio, f.passed_quality,
       |  f.contaminated, f.exact_dup, f.near_dup, f.accepted,
       |  coalesce(p.pack_shard, -1)::BIGINT AS pack_shard,
       |  coalesce(p.pack_bin, -1)::BIGINT AS pack_bin
       |FROM flags f LEFT JOIN packd p USING (doc_id)
       |ORDER BY f.doc_id""".stripMargin

  /** Daily-ingest report oracle: the incremental flags joined with the
    * deterministic quality rule, rolled up per language. */
  private def incrementalE2eOracleSql(n: Int, numPerms: Int, rowsPerBand: Int,
                                      shardMod: Long): String =
    s"""WITH ${incrementalCtesSql(n, numPerms, rowsPerBand, shardMod)},
       |gated AS (
       |  SELECT lang, exact_dup, near_dup,
       |    (len(regexp_extract_all(text, '\\S+')) >= 30
       |     AND len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) >= 0.6) AS q
       |  FROM shard_flags)
       |SELECT lang, count(*) AS n_new,
       |  sum(CASE WHEN q THEN 1 ELSE 0 END)::BIGINT AS n_quality,
       |  sum(CASE WHEN exact_dup THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup,
       |  sum(CASE WHEN near_dup THEN 1 ELSE 0 END)::BIGINT AS n_near_dup,
       |  sum(CASE WHEN q AND NOT exact_dup AND NOT near_dup THEN 1 ELSE 0 END)::BIGINT AS n_ingest
       |FROM gated GROUP BY lang ORDER BY lang""".stripMargin

  /** Fit-input fan-out for the invariant-checked ML queries: enough
    * to keep the per-level tree aggregates off a single task without
    * paying 32 tiny-task overheads on a 600k-row input. A FIXED
    * constant, not derived from defaultParallelism: repartitioning
    * changes the learned tree (per DecisionTree.trainAssembled's doc),
    * so a host-dependent value would make the appended predictions
    * vary with core count. Pinning it keeps the scored column
    * machine-independent while the exact-prediction flight spec keeps
    * using the fitPartitions=0 default. */
  private val FitParallelism: Int = 8

  /** Reference end-to-end: train decision-tree regression on lineitem
    * (label l_extendedprice), persist, reload, score, append the
    * prediction column. Tree internals are engine-specific, so the
    * oracle-checkable contract is partial (the q15/q24 pattern): the
    * exact key set, a per-row prediction-present flag, and a
    * Spark-computed fit-invariant flag the DuckDB oracle asserts
    * TRUE: a variance-impurity tree predicts leaf means, so its train
    * RMSE can never exceed the label's population stddev — a scored
    * frame that violates it means corrupted persistence or a feature
    * mismatch. (The synthetic lineitem gives these features ~no
    * predictive signal, so a tighter relative bound would be
    * dishonest; exact prediction semantics are pinned by the
    * flight-delay spec in DecisionTreeSpec.) */
  private def mlTrainPredict(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{avg, pow, sqrt, stddev_pop}
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_extendedprice")
    val spec = FeatureSpec(
      include = Some(Seq("l_quantity", "l_discount", "l_tax")),
      labelField = "l_extendedprice")
    val modelPath = java.nio.file.Files.createTempDirectory("graft-dt-model").toString
    // One assembly pass: train and predict consume the SAME assembled
    // frame (assembly is row-preserving; the trainer applies the
    // null-label drop itself), instead of vectorizing 60k rows twice.
    val assembled = FeatureVectorizer.assemble(li, spec)
    DecisionTree.trainAssembled(assembled, spec, modelPath, maxDepth = 6,
      fitPartitions = FitParallelism)
    val reloaded = DecisionTree.load(s, modelPath)
    // cached: the fit aggregate and the output projection both consume
    // the scored frame — without it assembly + tree transform run twice
    import graft.CacheRegistry.Cacheable
    val scored = reloaded.setPredictionCol("predicted_price")
      .transform(assembled)
      .drop(FeatureVectorizer.FeaturesCol)
      .cacheTracked
    // one-row aggregate crossJoin: the documented scalar-attach shape.
    // 1e-9 relative slack: with zero-gain splits RMSE == stddev exactly
    // in math, and the two sides aggregate in different orders — strict
    // <= could flake at the boundary while real corruption blows the
    // bound by orders of magnitude.
    val fit = scored.agg(
      (sqrt(avg(pow(col("predicted_price") - col("l_extendedprice"), 2))) <=
        stddev_pop(col("l_extendedprice")) * (1.0 + 1e-9)).as("rmse_ok"))
    // no output sort: the driver's compare sorts both sides by all
    // columns before hashing, so a 600k-row global range-sort here is
    // pure cost (measured ~0.5-1 s of this query's floor)
    scored
      .select(col("l_orderkey"), col("l_linenumber"),
        col("predicted_price").isNotNull.as("has_prediction"))
      .crossJoin(fit)
  }

  /** Null-safe sparse assembly surfaced as an active-slot count so the
    * DuckDB oracle can verify the null-skipping semantics in SQL. */
  private def mlFeatureVectorize(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      expr("nullif(l_discount, 0.0)").as("f_disc"),
      expr("nullif(l_tax, 0.0)").as("f_tax"))
    val spec = FeatureSpec(
      include = Some(Seq("l_quantity", "f_disc", "f_tax")), labelField = "unused")
    val nActive = udf(FeatureVectorizer.numActive)
    FeatureVectorizer.assemble(li, spec)
      .select(col("l_orderkey"), col("l_linenumber"),
        nActive(col(FeatureVectorizer.FeaturesCol)).as("n_active"))
  }

  /** Shared CTEs for the ANN oracles: `ex` explodes embeddings to
    * (vec_id, i, x) and `norms` holds per-vector L2 norms. */
  /** Shared by pipe_decontaminate and its Bloom-pruned scale twin —
    * the two formulations produce identical results by construction
    * (Bloom candidates are exactly verified). */
  /** The frozen BPE vocab as a DuckDB VALUES list — the oracle reads
    * the SAME constants the Spark kernel compiles in, so there is
    * nothing to drift. */
  private val bpeVocabSql: String =
    graft.functions.BpeVocab.tokens.zipWithIndex
      .map { case (t, i) => s"($i, '${t.replace("'", "''")}')" }.mkString(", ")

  private val decontaminateOracleSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 20) AS g
      |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 19, 1) + 1)) AS i
      |        FROM documents)),
      |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
      |cont AS (
      |  SELECT DISTINCT doc_id FROM sh
      |  WHERE doc_id >= 10 AND g IN (SELECT g FROM ev))
      |SELECT d.doc_id, (c.doc_id IS NOT NULL) AS contaminated
      |FROM documents d LEFT JOIN cont c USING (doc_id)
      |WHERE d.doc_id >= 10 ORDER BY d.doc_id""".stripMargin

  private val annExNormsSql: String =
    """ex AS (
      |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id)""".stripMargin

  /** Shared ANN-oracle tail: scores a `cand(qid, vec_id)` CTE by
    * cosine over `ex`/`norms` and emits the per-query top-k ranking —
    * the ONE place the scoring/tie-break/rounding contract lives for
    * both the LSH and IVF oracles. */
  private def annScoringTailSql(k: Int): String =
    s"""cdots AS (
       |  SELECT cand.qid, cand.vec_id, sum(q.x * e.x) AS dot
       |  FROM cand
       |  JOIN ex q ON q.vec_id = cand.qid
       |  JOIN ex e ON e.vec_id = cand.vec_id AND e.i = q.i
       |  GROUP BY 1, 2),
       |cos AS (
       |  SELECT qid, cd.vec_id, dot / (nq.nrm * ne.nrm) AS c
       |  FROM cdots cd JOIN norms nq ON nq.vec_id = qid JOIN norms ne ON ne.vec_id = cd.vec_id)
       |SELECT qid, vec_id, round(c, 4) AS cosine, rn AS rank
       |FROM (SELECT qid, vec_id, c,
       |        row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn FROM cos)
       |WHERE rn <= $k ORDER BY qid, rank""".stripMargin

  /** DuckDB replica of [[Similarity.simLshAnn]]: plane weights and
    * probe masks inlined as literals so both engines hash vectors into
    * the same sign-LSH buckets; candidate generation, cosine scoring
    * and ranking then mirror the Spark plan step for step. */
  /** Shared CTE body for the span-cut oracles — raw-substring replay
    * of [[operators.Dedup.spanDedupCore]], ending in
    * `cleandocs(doc_id, is_ascii, n_spans_cut, n_chars_cut, text,
    * clean_md5)` where `text` is the char-by-char-rebuilt cleaned
    * text. Composed by `pipe_span_dedup` (certification tail) and
    * `pipe_span_ingest` (the Gopher chain re-run over the cleaned
    * text). */
  /** DuckDB-side twin of `Dedup.multibyteDocs`' injection. */
  private val multibyteTextSql: String =
    "CASE WHEN doc_id % 7 = 1 THEN 'İ ' ELSE '' END || " +
      "CASE WHEN doc_id % 3 = 0 THEN replace(replace(text, 'e', 'é'), 'o', 'ø') ELSE text END"

  private def spanCutCtesSql(textExpr: String = "text",
                             fromRel: String = "documents"): String =
    s"""d AS (
      |  SELECT doc_id, $textExpr AS text, length($textExpr) AS len,
      |         length($textExpr) = strlen($textExpr) AS is_ascii,
      |         length(lower($textExpr)) = length($textExpr)
      |           AND NOT contains($textExpr, 'İ') AS lc_stable
      |  FROM $fromRel),
      |pos AS (
      |  SELECT doc_id, unnest(range(0, len - 49)) AS p
      |  FROM d WHERE len >= 50 AND lc_stable),
      |pg AS (
      |  SELECT pos.doc_id, pos.p,
      |         substr(lower(d.text), CAST(pos.p + 1 AS INT), 50) AS g
      |  FROM pos JOIN d USING (doc_id)),
      |rep AS (SELECT g FROM pg GROUP BY g HAVING count(*) >= 2),
      |hits AS (SELECT doc_id, p FROM pg WHERE g IN (SELECT g FROM rep)),
      |isl AS (
      |  SELECT doc_id, p,
      |    CASE WHEN p > coalesce(max(p + 50) OVER (
      |        PARTITION BY doc_id ORDER BY p
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |      THEN 1 ELSE 0 END AS ni
      |  FROM hits),
      |isl2 AS (
      |  SELECT doc_id, p,
      |    sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT doc_id, island, min(p) AS s, max(p) + 50 AS e
      |  FROM isl2 GROUP BY doc_id, island),
      |spanagg AS (
      |  SELECT doc_id, count(*) AS n_spans_cut,
      |         CAST(sum(e - s) AS BIGINT) AS n_chars_cut
      |  FROM spans GROUP BY doc_id),
      |chars AS (SELECT doc_id, unnest(range(0, len)) AS c FROM d),
      |keptc AS (
      |  SELECT ch.doc_id, ch.c FROM chars ch
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM spans sp
      |    WHERE sp.doc_id = ch.doc_id AND ch.c >= sp.s AND ch.c < sp.e)),
      |clean AS (
      |  SELECT k.doc_id,
      |    string_agg(substr(d.text, CAST(k.c + 1 AS INT), 1), ''
      |      ORDER BY k.c) AS ct
      |  FROM keptc k JOIN d USING (doc_id)
      |  GROUP BY k.doc_id),
      |rng AS (
      |  SELECT doc_id,
      |    string_agg(s || '-' || e, ';' ORDER BY s) AS cut_ranges
      |  FROM spans GROUP BY doc_id),
      |cleandocs AS (
      |  SELECT d.doc_id, d.is_ascii, d.lc_stable,
      |    coalesce(sa.n_spans_cut, 0) AS n_spans_cut,
      |    coalesce(sa.n_chars_cut, 0) AS n_chars_cut,
      |    coalesce(r.cut_ranges, '') AS cut_ranges,
      |    coalesce(c.ct, '') AS text,
      |    md5(coalesce(c.ct, '')) AS clean_md5
      |  FROM d
      |  LEFT JOIN spanagg sa USING (doc_id)
      |  LEFT JOIN clean c USING (doc_id)
      |  LEFT JOIN rng r USING (doc_id))""".stripMargin

  /** DuckDB replica of [[operators.Dedup.pipeSpanDedupKeepFirst]] —
    * char-level replay of the keeper rule: the first (doc_id, p)
    * occurrence of each repeated gram protects its positions; a char
    * is cut iff some non-keeper occurrence covers it and no keeper
    * does. Brute force per character is fine oracle-side. */
  private def spanKeepFirstOracleSql(textExpr: String = "text",
                                     whereSql: String = "TRUE"): String =
    s"""WITH d AS (
      |  SELECT doc_id, $textExpr AS text, length($textExpr) AS len,
      |         length($textExpr) = strlen($textExpr) AS is_ascii,
      |         length(lower($textExpr)) = length($textExpr)
      |           AND NOT contains($textExpr, 'İ') AS lc_stable
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, unnest(range(0, len - 49)) AS p
      |  FROM d WHERE len >= 50 AND lc_stable),
      |pg AS (
      |  SELECT pos.doc_id, pos.p,
      |         substr(lower(d.text), CAST(pos.p + 1 AS INT), 50) AS g
      |  FROM pos JOIN d USING (doc_id)),
      |rk AS (
      |  SELECT doc_id, p,
      |         row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn,
      |         count(*) OVER (PARTITION BY g) AS df
      |  FROM pg),
      |hits AS (SELECT doc_id, p, (rn = 1) AS keeper FROM rk WHERE df >= 2),
      |chars AS (SELECT doc_id, unnest(range(0, len)) AS c FROM d),
      |charcut AS (
      |  SELECT ch.doc_id, ch.c FROM chars ch
      |  WHERE EXISTS (
      |      SELECT 1 FROM hits h
      |      WHERE h.doc_id = ch.doc_id AND NOT h.keeper
      |        AND ch.c >= h.p AND ch.c < h.p + 50)
      |    AND NOT EXISTS (
      |      SELECT 1 FROM hits h2
      |      WHERE h2.doc_id = ch.doc_id AND h2.keeper
      |        AND ch.c >= h2.p AND ch.c < h2.p + 50)),
      |spans AS (
      |  SELECT doc_id, min(c) AS s, max(c) + 1 AS e
      |  FROM (SELECT doc_id, c,
      |          c - row_number() OVER (PARTITION BY doc_id ORDER BY c) AS isl
      |        FROM charcut)
      |  GROUP BY doc_id, isl),
      |spanagg AS (
      |  SELECT doc_id, count(*) AS n_spans_cut,
      |         CAST(sum(e - s) AS BIGINT) AS n_chars_cut
      |  FROM spans GROUP BY doc_id),
      |rng AS (
      |  SELECT doc_id,
      |    string_agg(s || '-' || e, ';' ORDER BY s) AS cut_ranges
      |  FROM spans GROUP BY doc_id),
      |keptc AS (
      |  SELECT ch.doc_id, ch.c FROM chars ch
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM charcut cc
      |    WHERE cc.doc_id = ch.doc_id AND cc.c = ch.c)),
      |clean AS (
      |  SELECT k.doc_id,
      |    string_agg(substr(d.text, CAST(k.c + 1 AS INT), 1), ''
      |      ORDER BY k.c) AS ct
      |  FROM keptc k JOIN d USING (doc_id)
      |  GROUP BY k.doc_id)
      |SELECT d.doc_id, d.is_ascii, d.lc_stable,
      |  coalesce(sa.n_spans_cut, 0) AS n_spans_cut,
      |  coalesce(sa.n_chars_cut, 0) AS n_chars_cut,
      |  coalesce(r.cut_ranges, '') AS cut_ranges,
      |  CAST(length(coalesce(c.ct, '')) AS BIGINT) AS clean_len,
      |  md5(coalesce(c.ct, '')) AS clean_md5
      |FROM d
      |LEFT JOIN spanagg sa USING (doc_id)
      |LEFT JOIN rng r USING (doc_id)
      |LEFT JOIN clean c USING (doc_id)
      |WHERE $whereSql
      |ORDER BY d.doc_id""".stripMargin

  private def lshOracleSql(nQueries: Int, k: Int, numPlanes: Int, dim: Int): String = {
    val planes = Similarity.lshPlanes(numPlanes, dim)
    val planeValues = (for (p <- 0 until numPlanes; i <- 0 until dim)
      yield s"($p, ${i + 1}, ${planes(p)(i)})").mkString(", ")
    val masks = Similarity.lshProbeMasks(numPlanes).mkString(", ")
    s"""WITH planes(p, i, w) AS (VALUES $planeValues),
       |$annExNormsSql,
       |pdots AS (
       |  SELECT e.vec_id, pl.p, sum(e.x * pl.w) AS d
       |  FROM ex e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2),
       |buckets AS (
       |  SELECT vec_id, sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
       |  FROM pdots GROUP BY vec_id),
       |masks(m) AS (SELECT unnest([$masks]::BIGINT[])),
       |probes AS (
       |  SELECT b.vec_id AS qid, xor(b.bucket, m.m) AS pb
       |  FROM buckets b CROSS JOIN masks m WHERE b.vec_id < $nQueries),
       |cand AS (
       |  SELECT p.qid, c.vec_id FROM probes p
       |  JOIN buckets c ON c.bucket = p.pb WHERE c.vec_id <> p.qid),
       |${annScoringTailSql(k)}""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simBruteforceTopK]] —
    * also the exact side of the `sim_eval` composition. */
  private val bruteforceTopkOracleSql: String =
    """WITH ex AS (
      |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
      |  FROM embeddings),
      |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
      |dots AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS vec_id, sum(q.x * e.x) AS dot
      |  FROM ex q JOIN ex e ON q.i = e.i
      |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
      |  GROUP BY 1, 2),
      |cos AS (
      |  SELECT qid, d.vec_id, d.dot / (nq.nrm * ne.nrm) AS c
      |  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms ne ON ne.vec_id = d.vec_id)
      |SELECT qid, vec_id, round(c, 4) AS cosine, rn AS rank FROM (
      |  SELECT qid, vec_id, c, row_number() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rn FROM cos)
      |WHERE rn <= 10 ORDER BY qid, rank""".stripMargin

  /** DuckDB replica of [[operators.Similarity.simKnnGraph]] — the
    * NN-Descent run UNROLLED: the all-pairs cosine matrix is computed
    * once (the dedup_embedding pattern; n² pairs is exactly what the
    * descent exists to avoid at scale, and exactly what the oracle
    * can afford at sf0.01), the deterministic affine-hash seeding is
    * replayed literally, and each round re-derives
    * current ∪ reversed ∪ neighbors-of-neighbors → per-vertex top-k
    * by (cosine DESC, id) — the identical total order the Spark
    * window uses. */
  /** The descent's CTE chain (shared by the graph oracle and its
    * components consumer), ending at `fin` (a, b, c, rn). */
  private def knnGraphOracleCtes(k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      val prev = s"e${t - 1}"
      s"""u$t AS (SELECT a, b FROM $prev UNION
         |        SELECT a, b FROM (
         |          SELECT p.b AS a, p.a AS b,
         |                 row_number() OVER (PARTITION BY p.b ORDER BY p.a) AS rr
         |          FROM $prev p) WHERE rr <= $k),
         |c$t AS (SELECT a, b FROM u$t UNION
         |        SELECT x.a, y.b FROM u$t x JOIN u$t y ON x.b = y.a WHERE x.a <> y.b),
         |e$t AS (SELECT a, b FROM (
         |  SELECT c$t.a, c$t.b,
         |         row_number() OVER (PARTITION BY c$t.a ORDER BY cs.c DESC, c$t.b) AS rn
         |  FROM c$t JOIN cs ON cs.ia = c$t.a AND cs.ib = c$t.b) WHERE rn <= $k)"""
        .stripMargin
    }.mkString(",\n")
    s"""ex AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |cs AS (
       |  SELECT ia, ib, d.dot / (na.nrm * nb.nrm) AS c
       |  FROM dots d JOIN norms na ON na.vec_id = d.ia JOIN norms nb ON nb.vec_id = d.ib),
       |mm AS (SELECT max(vec_id) + 1 AS m FROM embeddings),
       |ids AS (SELECT vec_id FROM embeddings),
       |e0 AS (
       |  SELECT DISTINCT i.vec_id AS a,
       |         (i.vec_id * 1664525 + t.j * 40503) % mm.m AS b
       |  FROM ids i CROSS JOIN mm CROSS JOIN range(1, ${k + 1}) t(j)
       |  WHERE (i.vec_id * 1664525 + t.j * 40503) % mm.m <> i.vec_id
       |    AND (i.vec_id * 1664525 + t.j * 40503) % mm.m IN (SELECT vec_id FROM ids)),
       |$rounds,
       |fin AS (
       |  SELECT e$iters.a, e$iters.b, cs.c,
       |         row_number() OVER (PARTITION BY e$iters.a ORDER BY cs.c DESC, e$iters.b) AS rn
       |  FROM e$iters JOIN cs ON cs.ia = e$iters.a AND cs.ib = e$iters.b)""".stripMargin
  }

  private def knnGraphOracleSql(k: Int, iters: Int): String =
    s"""WITH ${knnGraphOracleCtes(k, iters)}
       |SELECT a AS vec_id, rn::BIGINT AS rank, b AS nbr_id, round(c, 4) AS cosine
       |FROM fin ORDER BY vec_id, rank""".stripMargin

  /** DuckDB replica of [[operators.Similarity.simGraphSearch]] — the
    * beam walk unrolled on top of the unrolled descent graph
    * ([[knnGraphOracleCtes]] ends at `fin` = the persisted edge
    * list): replay the LCG entry points, then per hop expand the
    * beam through the edge list, re-rank every candidate by the
    * all-pairs cosine matrix under the identical (cosine DESC, id)
    * total order, keep `beam`; top-k of the final beam. Every
    * multiply-referenced hop is MATERIALIZED (the knnComponents
    * inlining lesson). */
  private def graphSearchOracleSql(nQueries: Int, k: Int, beam: Int, hops: Int,
                                   graphK: Int, graphIters: Int,
                                   allowedLang: Option[String] = None,
                                   band: Option[(Double, Double)] = None): String = {
    // the lang value is interpolated into a SQL string literal below —
    // restrict it to the two-letter code shape the documents table
    // uses so a future parameterization can't smuggle a quote in
    allowedLang.foreach(l => require(l.matches("[a-z]{2}"),
      s"allowedLang must be a two-letter code, got '$l'"))
    // leading-comma form so hops = 0 (no hop CTEs at all) still emits
    // valid SQL — the zero-hop baseline is just the scored seed beam
    val hopCtes = (1 to hops).map { t =>
      val prev = s"w${t - 1}"
      s""",
         |x$t AS MATERIALIZED (SELECT qid, b FROM $prev UNION
         |        SELECT p.qid, g.b FROM $prev p JOIN g ON g.a = p.b WHERE g.b <> p.qid),
         |w$t AS MATERIALIZED (SELECT qid, b FROM (
         |  SELECT x$t.qid, x$t.b,
         |         row_number() OVER (PARTITION BY x$t.qid ORDER BY cs.c DESC, x$t.b) AS rn
         |  FROM x$t JOIN cs ON cs.ia = x$t.qid AND cs.ib = x$t.b) WHERE rn <= $beam)"""
        .stripMargin
    }.mkString
    // unfiltered: top-k of the final beam. Filtered/banded: top-k
    // eligible among every scored candidate (seeds + each hop's
    // pre-cut set)
    lazy val seenUnion = (Seq("SELECT qid, b FROM s0") ++
      (1 to hops).map(t => s"SELECT qid, b FROM x$t")).mkString(" UNION ")
    val (poolCtes, poolName) = (allowedLang, band) match {
      case (Some(l), _) =>
        (s""",
           |ok AS (SELECT doc_id AS b FROM documents WHERE lang = '$l'),
           |pool AS (SELECT DISTINCT sn.qid, sn.b FROM ($seenUnion) sn
           |         JOIN ok ON ok.b = sn.b)""".stripMargin, "pool")
      case (None, Some(_)) =>
        (s""",
           |pool AS (SELECT DISTINCT qid, b FROM ($seenUnion))""".stripMargin, "pool")
      case (None, None) => ("", s"w$hops")
    }
    val bandPred = band match {
      case Some((lo, hi)) => s"\n       |  WHERE round(cs.c, 4) >= $lo AND round(cs.c, 4) < $hi"
      case None => ""
    }
    s"""WITH ${knnGraphOracleCtes(graphK, graphIters)},
       |g AS MATERIALIZED (SELECT a, b FROM fin),
       |qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < $nQueries),
       |s0 AS MATERIALIZED (
       |  SELECT DISTINCT q.qid, (q.qid * 1664525 + t.j * 40503) % mm.m AS b
       |  FROM qs q CROSS JOIN mm CROSS JOIN range(1, ${beam + 1}) t(j)
       |  WHERE (q.qid * 1664525 + t.j * 40503) % mm.m <> q.qid
       |    AND (q.qid * 1664525 + t.j * 40503) % mm.m IN (SELECT vec_id FROM ids)),
       |w0 AS MATERIALIZED (SELECT qid, b FROM (
       |  SELECT s0.qid, s0.b,
       |         row_number() OVER (PARTITION BY s0.qid ORDER BY cs.c DESC, s0.b) AS rn
       |  FROM s0 JOIN cs ON cs.ia = s0.qid AND cs.ib = s0.b) WHERE rn <= $beam)$hopCtes$poolCtes
       |SELECT qid, rn::BIGINT AS rank, b AS vec_id, round(c, 4) AS cosine FROM (
       |  SELECT $poolName.qid, $poolName.b, cs.c,
       |         row_number() OVER (PARTITION BY $poolName.qid ORDER BY cs.c DESC, $poolName.b) AS rn
       |  FROM $poolName JOIN cs ON cs.ia = $poolName.qid AND cs.ib = $poolName.b$bandPred) WHERE rn <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simGraphSearchSegment]]
    * — rank the segment ids densely (the same row_number window the
    * Spark side uses), unroll the dense-seeded fixed-T descent over
    * the SEGMENT subset, then walk full-corpus queries over the
    * segment graph with dense-rank LCG entry points. No post-filter:
    * every candidate is a segment member by construction, so the tail
    * is the plain top-k of the final beam. */
  private def graphSearchSegmentOracleSql(lang: String, nQueries: Int, k: Int,
                                          beam: Int, hops: Int, graphK: Int,
                                          graphIters: Int): String = {
    require(lang.matches("[a-z]{2}"),
      s"lang must be a two-letter code, got '$lang'")
    val segRounds = (1 to graphIters).map { t =>
      val prev = s"se${t - 1}"
      s"""su$t AS MATERIALIZED (SELECT a, b FROM $prev UNION
         |        SELECT a, b FROM (
         |          SELECT p.b AS a, p.a AS b,
         |                 row_number() OVER (PARTITION BY p.b ORDER BY p.a) AS rr
         |          FROM $prev p) WHERE rr <= $graphK),
         |sc$t AS (SELECT a, b FROM su$t UNION
         |        SELECT x.a, y.b FROM su$t x JOIN su$t y ON x.b = y.a WHERE x.a <> y.b),
         |se$t AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT sc$t.a, sc$t.b,
         |         row_number() OVER (PARTITION BY sc$t.a ORDER BY cs.c DESC, sc$t.b) AS rn
         |  FROM sc$t JOIN cs ON cs.ia = sc$t.a AND cs.ib = sc$t.b) WHERE rn <= $graphK)"""
        .stripMargin
    }.mkString(",\n")
    val hopCtes = (1 to hops).map { t =>
      val prev = s"w${t - 1}"
      s""",
         |x$t AS MATERIALIZED (SELECT qid, b FROM $prev UNION
         |        SELECT p.qid, g.b FROM $prev p JOIN g ON g.a = p.b WHERE g.b <> p.qid),
         |w$t AS MATERIALIZED (SELECT qid, b FROM (
         |  SELECT x$t.qid, x$t.b,
         |         row_number() OVER (PARTITION BY x$t.qid ORDER BY cs.c DESC, x$t.b) AS rn
         |  FROM x$t JOIN cs ON cs.ia = x$t.qid AND cs.ib = x$t.b) WHERE rn <= $beam)"""
        .stripMargin
    }.mkString
    s"""WITH ex AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |cs AS MATERIALIZED (
       |  SELECT ia, ib, d.dot / (na.nrm * nb.nrm) AS c
       |  FROM dots d JOIN norms na ON na.vec_id = d.ia JOIN norms nb ON nb.vec_id = d.ib),
       |sids AS (
       |  SELECT e.vec_id FROM embeddings e
       |  JOIN documents dd ON dd.doc_id = e.vec_id WHERE dd.lang = '$lang'),
       |sdense AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS r FROM sids),
       |sm AS (SELECT count(*) AS m FROM sids),
       |se0 AS (
       |  SELECT DISTINCT i.vec_id AS a, dn.vec_id AS b
       |  FROM sids i CROSS JOIN sm CROSS JOIN range(1, ${graphK + 1}) t(j)
       |  JOIN sdense dn ON dn.r = (i.vec_id * 1664525 + t.j * 40503) % sm.m
       |  WHERE dn.vec_id <> i.vec_id),
       |$segRounds,
       |g AS MATERIALIZED (SELECT a, b FROM se$graphIters),
       |qs AS (SELECT vec_id AS qid FROM embeddings WHERE vec_id < $nQueries),
       |s0 AS MATERIALIZED (
       |  SELECT DISTINCT q.qid, dn.vec_id AS b
       |  FROM qs q CROSS JOIN sm CROSS JOIN range(1, ${beam + 1}) t(j)
       |  JOIN sdense dn ON dn.r = (q.qid * 1664525 + t.j * 40503) % sm.m
       |  WHERE dn.vec_id <> q.qid),
       |w0 AS MATERIALIZED (SELECT qid, b FROM (
       |  SELECT s0.qid, s0.b,
       |         row_number() OVER (PARTITION BY s0.qid ORDER BY cs.c DESC, s0.b) AS rn
       |  FROM s0 JOIN cs ON cs.ia = s0.qid AND cs.ib = s0.b) WHERE rn <= $beam)$hopCtes
       |SELECT qid, rn::BIGINT AS rank, b AS vec_id, round(c, 4) AS cosine FROM (
       |  SELECT w$hops.qid, w$hops.b, cs.c,
       |         row_number() OVER (PARTITION BY w$hops.qid ORDER BY cs.c DESC, w$hops.b) AS rn
       |  FROM w$hops JOIN cs ON cs.ia = w$hops.qid AND cs.ib = w$hops.b) WHERE rn <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simGraphSearchHeldOut]]
    * — the base-only fixed-T descent (the incremental oracle's `be`
    * chain: its OWN id space vec_id % 10 != 0) unrolled into the
    * base graph, then the beam walk replayed for HELD-OUT query ids
    * (vec_id % 10 == 0): LCG seeds over the base id space, hop
    * expansion through base edges, re-rank by the shared all-pairs
    * cosine matrix, top-k of the final beam. The production shape —
    * queries the graph never saw — under the same hash gate as the
    * member-query walk. */
  private def graphSearchHeldOutOracleSql(nQueries: Int, k: Int, beam: Int,
                                          hops: Int, graphK: Int,
                                          graphIters: Int): String = {
    val baseRounds = (1 to graphIters).map { t =>
      val prev = s"be${t - 1}"
      s"""bu$t AS MATERIALIZED (SELECT a, b FROM $prev UNION
         |        SELECT a, b FROM (
         |          SELECT p.b AS a, p.a AS b,
         |                 row_number() OVER (PARTITION BY p.b ORDER BY p.a) AS rr
         |          FROM $prev p) WHERE rr <= $graphK),
         |bc$t AS (SELECT a, b FROM bu$t UNION
         |        SELECT x.a, y.b FROM bu$t x JOIN bu$t y ON x.b = y.a WHERE x.a <> y.b),
         |be$t AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT bc$t.a, bc$t.b,
         |         row_number() OVER (PARTITION BY bc$t.a ORDER BY cs.c DESC, bc$t.b) AS rn
         |  FROM bc$t JOIN cs ON cs.ia = bc$t.a AND cs.ib = bc$t.b) WHERE rn <= $graphK)"""
        .stripMargin
    }.mkString(",\n")
    val hopCtes = (1 to hops).map { t =>
      val prev = s"w${t - 1}"
      s""",
         |x$t AS MATERIALIZED (SELECT qid, b FROM $prev UNION
         |        SELECT p.qid, g.b FROM $prev p JOIN g ON g.a = p.b WHERE g.b <> p.qid),
         |w$t AS MATERIALIZED (SELECT qid, b FROM (
         |  SELECT x$t.qid, x$t.b,
         |         row_number() OVER (PARTITION BY x$t.qid ORDER BY cs.c DESC, x$t.b) AS rn
         |  FROM x$t JOIN cs ON cs.ia = x$t.qid AND cs.ib = x$t.b) WHERE rn <= $beam)"""
        .stripMargin
    }.mkString
    s"""WITH ex AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |cs AS MATERIALIZED (
       |  SELECT ia, ib, d.dot / (na.nrm * nb.nrm) AS c
       |  FROM dots d JOIN norms na ON na.vec_id = d.ia JOIN norms nb ON nb.vec_id = d.ib),
       |bids AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0),
       |bm AS (SELECT max(vec_id) + 1 AS m FROM bids),
       |be0 AS (
       |  SELECT DISTINCT i.vec_id AS a,
       |         (i.vec_id * 1664525 + t.j * 40503) % bm.m AS b
       |  FROM bids i CROSS JOIN bm CROSS JOIN range(1, ${graphK + 1}) t(j)
       |  WHERE (i.vec_id * 1664525 + t.j * 40503) % bm.m <> i.vec_id
       |    AND (i.vec_id * 1664525 + t.j * 40503) % bm.m IN (SELECT vec_id FROM bids)),
       |$baseRounds,
       |g AS MATERIALIZED (SELECT a, b FROM be$graphIters),
       |qs AS (SELECT vec_id AS qid FROM embeddings
       |       WHERE vec_id % 10 = 0 AND vec_id < ${nQueries * 10L}),
       |s0 AS MATERIALIZED (
       |  SELECT DISTINCT q.qid, (q.qid * 1664525 + t.j * 40503) % bm.m AS b
       |  FROM qs q CROSS JOIN bm CROSS JOIN range(1, ${beam + 1}) t(j)
       |  WHERE (q.qid * 1664525 + t.j * 40503) % bm.m <> q.qid
       |    AND (q.qid * 1664525 + t.j * 40503) % bm.m IN (SELECT vec_id FROM bids)),
       |w0 AS MATERIALIZED (SELECT qid, b FROM (
       |  SELECT s0.qid, s0.b,
       |         row_number() OVER (PARTITION BY s0.qid ORDER BY cs.c DESC, s0.b) AS rn
       |  FROM s0 JOIN cs ON cs.ia = s0.qid AND cs.ib = s0.b) WHERE rn <= $beam)$hopCtes
       |SELECT qid, rn::BIGINT AS rank, b AS vec_id, round(c, 4) AS cosine FROM (
       |  SELECT w$hops.qid, w$hops.b, cs.c,
       |         row_number() OVER (PARTITION BY w$hops.qid ORDER BY cs.c DESC, w$hops.b) AS rn
       |  FROM w$hops JOIN cs ON cs.ia = w$hops.qid AND cs.ib = w$hops.b) WHERE rn <= $k
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replica of
    * [[operators.Similarity.simKnnGraphIncremental]] — the
    * build+grow trace unrolled end to end: the fixed-T base descent
    * over vec_id % 10 != 0 (its OWN id space and modulus), then
    * `appendIters` restricted append rounds for the held-out ids
    * (hash-only seeds over the FULL id space; reverse edges capped
    * onto new vertices only; expansion through the UNION graph so a
    * new vertex climbs the frozen base lists), then the back-edge
    * merge — touched old vertices re-top-k their frozen list ∪ the
    * reversed new edges, untouched base rows pass through with their
    * original rank and rounded cosine. The shared all-pairs cosine
    * matrix is computed once (the sim_knn_graph pattern); every
    * multiply-referenced round is MATERIALIZED (the
    * knnComponents inlining lesson). */
  private def knnGraphIncrementalOracleSql(k: Int, iters: Int, appendIters: Int): String = {
    val baseRounds = (1 to iters).map { t =>
      val prev = s"be${t - 1}"
      s"""bu$t AS MATERIALIZED (SELECT a, b FROM $prev UNION
         |        SELECT a, b FROM (
         |          SELECT p.b AS a, p.a AS b,
         |                 row_number() OVER (PARTITION BY p.b ORDER BY p.a) AS rr
         |          FROM $prev p) WHERE rr <= $k),
         |bc$t AS (SELECT a, b FROM bu$t UNION
         |        SELECT x.a, y.b FROM bu$t x JOIN bu$t y ON x.b = y.a WHERE x.a <> y.b),
         |be$t AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT bc$t.a, bc$t.b,
         |         row_number() OVER (PARTITION BY bc$t.a ORDER BY cs.c DESC, bc$t.b) AS rn
         |  FROM bc$t JOIN cs ON cs.ia = bc$t.a AND cs.ib = bc$t.b) WHERE rn <= $k)"""
        .stripMargin
    }.mkString(",\n")
    val appendRounds = (1 to appendIters).map { t =>
      val prev = s"n${t - 1}"
      s"""rv$t AS (SELECT a, b FROM (
         |  SELECT p.b AS a, p.a AS b,
         |         row_number() OVER (PARTITION BY p.b ORDER BY p.a) AS rr
         |  FROM $prev p WHERE p.b % 10 = 0) WHERE rr <= $k),
         |al$t AS MATERIALIZED (SELECT a, b FROM $prev UNION SELECT a, b FROM bfe),
         |cn$t AS (SELECT a, b FROM $prev UNION SELECT a, b FROM rv$t UNION
         |        SELECT x.a, y.b FROM $prev x JOIN al$t y ON x.b = y.a WHERE x.a <> y.b),
         |n$t AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT cn$t.a, cn$t.b,
         |         row_number() OVER (PARTITION BY cn$t.a ORDER BY cs.c DESC, cn$t.b) AS rn
         |  FROM cn$t JOIN cs ON cs.ia = cn$t.a AND cs.ib = cn$t.b) WHERE rn <= $k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ex AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
       |dots AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS dot
       |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2),
       |cs AS MATERIALIZED (
       |  SELECT ia, ib, d.dot / (na.nrm * nb.nrm) AS c
       |  FROM dots d JOIN norms na ON na.vec_id = d.ia JOIN norms nb ON nb.vec_id = d.ib),
       |bids AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0),
       |nids AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0),
       |bm AS (SELECT max(vec_id) + 1 AS m FROM bids),
       |be0 AS (
       |  SELECT DISTINCT i.vec_id AS a,
       |         (i.vec_id * 1664525 + t.j * 40503) % bm.m AS b
       |  FROM bids i CROSS JOIN bm CROSS JOIN range(1, ${k + 1}) t(j)
       |  WHERE (i.vec_id * 1664525 + t.j * 40503) % bm.m <> i.vec_id
       |    AND (i.vec_id * 1664525 + t.j * 40503) % bm.m IN (SELECT vec_id FROM bids)),
       |$baseRounds,
       |bfe AS MATERIALIZED (SELECT a, b FROM be$iters),
       |fm AS (SELECT max(vec_id) + 1 AS m FROM embeddings),
       |s0 AS (
       |  SELECT DISTINCT i.vec_id AS a,
       |         (i.vec_id * 1664525 + t.j * 40503) % fm.m AS b
       |  FROM nids i CROSS JOIN fm CROSS JOIN range(1, ${k + 1}) t(j)
       |  WHERE (i.vec_id * 1664525 + t.j * 40503) % fm.m <> i.vec_id
       |    AND (i.vec_id * 1664525 + t.j * 40503) % fm.m IN (SELECT vec_id FROM embeddings)),
       |n0 AS MATERIALIZED (SELECT a, b FROM (
       |  SELECT s0.a, s0.b,
       |         row_number() OVER (PARTITION BY s0.a ORDER BY cs.c DESC, s0.b) AS rn
       |  FROM s0 JOIN cs ON cs.ia = s0.a AND cs.ib = s0.b) WHERE rn <= $k),
       |$appendRounds,
       |back AS MATERIALIZED (
       |  SELECT p.b AS a, p.a AS b FROM n$appendIters p WHERE p.b % 10 <> 0),
       |tch AS MATERIALIZED (SELECT DISTINCT a FROM back),
       |mc AS (SELECT f.a, f.b FROM bfe f JOIN tch ON tch.a = f.a
       |       UNION SELECT a, b FROM back),
       |mg AS (SELECT a, b, c, rn FROM (
       |  SELECT mc.a, mc.b, cs.c,
       |         row_number() OVER (PARTITION BY mc.a ORDER BY cs.c DESC, mc.b) AS rn
       |  FROM mc JOIN cs ON cs.ia = mc.a AND cs.ib = mc.b) WHERE rn <= $k),
       |nf AS (SELECT a, b, c, rn FROM (
       |  SELECT p.a, p.b, cs.c,
       |         row_number() OVER (PARTITION BY p.a ORDER BY cs.c DESC, p.b) AS rn
       |  FROM n$appendIters p JOIN cs ON cs.ia = p.a AND cs.ib = p.b) WHERE rn <= $k),
       |bfin AS (SELECT a, b, c, rn FROM (
       |  SELECT f.a, f.b, cs.c,
       |         row_number() OVER (PARTITION BY f.a ORDER BY cs.c DESC, f.b) AS rn
       |  FROM bfe f JOIN cs ON cs.ia = f.a AND cs.ib = f.b) WHERE rn <= $k)
       |SELECT vec_id, rank, nbr_id, cosine FROM (
       |  SELECT f.a AS vec_id, f.rn::BIGINT AS rank, f.b AS nbr_id, round(f.c, 4) AS cosine
       |  FROM bfin f WHERE f.a NOT IN (SELECT a FROM tch)
       |  UNION ALL
       |  SELECT a, rn::BIGINT, b, round(c, 4) FROM mg
       |  UNION ALL
       |  SELECT a, rn::BIGINT, b, round(c, 4) FROM nf)
       |ORDER BY vec_id, rank""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simKnnComponents]]:
    * the descent's `fin` CTE, thresholded on the ROUNDED cosine
    * (both engines compare the same 4-decimal value), undirected,
    * transitively closed, min-labeled.
    *
    * The closure is UNROLLED PATH DOUBLING, not a recursive CTE: the
    * dedup_clusters-style `WITH RECURSIVE reach` cannot be combined
    * with the descent chain — DuckDB evaluates the chain's windowed
    * UNION CTEs differently under the RECURSIVE keyword (measured:
    * the same prefix yields 6,992 vs 6,954 u1 rows and a collapsed
    * 48-pair p), silently corrupting the graph being closed. Each
    * doubling round covers paths of length 2^r, so `closureRounds`
    * rounds close any component of diameter ≤ 2^rounds — with
    * diameter bounded by the thresholded pair count (~10² at oracle
    * scale), 10 rounds (1,024 hops) is a safe ceiling. `p`, `r0`,
    * and each round are MATERIALIZED: DuckDB inlines plain CTEs per
    * reference, and each round references its predecessor twice, so
    * an uninlined chain re-plans the whole descent 2^rounds times
    * (measured: "Too many open files" from 1,024 inlined parquet
    * scans). */
  private def knnComponentsOracleSql(k: Int, iters: Int, tau: Double,
                                     closureRounds: Int = 10): String = {
    val doubling = (1 to closureRounds).map { r =>
      s"""r$r AS MATERIALIZED (SELECT src, dst FROM r${r - 1}
         |        UNION
         |        SELECT x.src, y.dst FROM r${r - 1} x JOIN r${r - 1} y ON x.dst = y.src
         |        WHERE x.src <> y.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${knnGraphOracleCtes(k, iters)},
       |p AS MATERIALIZED (
       |  SELECT DISTINCT least(a, b) AS id_a, greatest(a, b) AS id_b
       |  FROM fin WHERE round(c, 4) >= $tau),
       |r0 AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p
       |       UNION SELECT id_b, id_a FROM p),
       |$doubling,
       |labels AS (SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
       |           FROM r$closureRounds GROUP BY src)
       |SELECT emb.vec_id,
       |       coalesce(l.cluster_id, emb.vec_id) AS cluster_id,
       |       emb.vec_id = coalesce(l.cluster_id, emb.vec_id) AS is_rep
       |FROM embeddings emb LEFT JOIN labels l ON l.vec_id = emb.vec_id
       |ORDER BY emb.vec_id""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simKnnLabelProp]]: the
    * descent chain → undirected edges, then `rounds` unrolled
    * synchronous label-propagation steps (integer vote counts, ties
    * to the smallest label, isolated vertices keep their own). Every
    * round's label table is MATERIALIZED (each is referenced twice —
    * the knnComponents inlining lesson). Vote counts are integers,
    * so past the (hash-verified) edge list the replay is tie-proof
    * by construction. */
  private def knnLabelPropOracleSql(k: Int, iters: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      val prev = s"l${r - 1}"
      s"""t$r AS MATERIALIZED (
         |  SELECT a AS id, lbl FROM (
         |    SELECT u.a, $prev.lbl, count(*) AS cnt,
         |           row_number() OVER (PARTITION BY u.a
         |             ORDER BY count(*) DESC, $prev.lbl) AS rn
         |    FROM und u JOIN $prev ON $prev.id = u.b
         |    GROUP BY u.a, $prev.lbl) WHERE rn = 1),
         |l$r AS MATERIALIZED (
         |  SELECT $prev.id, coalesce(t$r.lbl, $prev.lbl) AS lbl
         |  FROM $prev LEFT JOIN t$r ON t$r.id = $prev.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${knnGraphOracleCtes(k, iters)},
       |und AS MATERIALIZED (
       |  SELECT a, b FROM fin UNION SELECT b, a FROM fin),
       |l0 AS MATERIALIZED (SELECT vec_id AS id, vec_id AS lbl FROM embeddings),
       |$steps
       |SELECT id AS vec_id, lbl AS label FROM l$rounds ORDER BY vec_id""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simKnnDiversity]]: the
    * descent chain → thresholded undirected edges, then `rounds`
    * unrolled Luby steps — per round, an undecided vertex enters the
    * MIS iff no undecided neighbor has a strictly smaller
    * (affine-hash priority, id); MIS neighbors become excluded. All
    * comparisons are integers (tie-proof), every round MATERIALIZED
    * (the inlining lesson). */
  private def knnDiversityOracleSql(k: Int, iters: Int, tau: Double,
                                    rounds: Int): String = {
    def pr(x: String) = s"(($x * 2654435761) % 1000003)"
    val steps = (1 to rounds).map { r =>
      val prev = s"s${r - 1}"
      s"""ud$r AS MATERIALIZED (SELECT id FROM $prev WHERE st = 0),
         |ue$r AS MATERIALIZED (
         |  SELECT u.a, u.b FROM und u
         |  JOIN ud$r x ON x.id = u.a JOIN ud$r y ON y.id = u.b),
         |mis$r AS MATERIALIZED (
         |  SELECT id FROM ud$r WHERE id NOT IN (
         |    SELECT a FROM ue$r
         |    WHERE ${pr("b")} < ${pr("a")}
         |       OR (${pr("b")} = ${pr("a")} AND b < a))),
         |exc$r AS MATERIALIZED (
         |  SELECT DISTINCT e.a AS id FROM ue$r e JOIN mis$r m ON m.id = e.b),
         |s$r AS MATERIALIZED (
         |  SELECT $prev.id,
         |         CASE WHEN mis$r.id IS NOT NULL THEN 1
         |              WHEN exc$r.id IS NOT NULL THEN 2
         |              ELSE $prev.st END AS st
         |  FROM $prev LEFT JOIN mis$r ON mis$r.id = $prev.id
         |             LEFT JOIN exc$r ON exc$r.id = $prev.id)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${knnGraphOracleCtes(k, iters)},
       |p AS MATERIALIZED (
       |  SELECT DISTINCT least(a, b) AS id_a, greatest(a, b) AS id_b
       |  FROM fin WHERE round(c, 4) >= $tau),
       |und AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM p
       |       UNION SELECT id_b, id_a FROM p),
       |s0 AS MATERIALIZED (SELECT vec_id AS id, 0 AS st FROM embeddings),
       |$steps
       |SELECT id AS vec_id, st = 1 AS selected FROM s$rounds ORDER BY vec_id""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.simLshMultiTable]]:
    * every table's plane family inlined as (t, p, i, w) VALUES rows;
    * candidates are the DISTINCT union over tables of same-bucket
    * pairs, then the shared exact-cosine scoring tail. */
  private def lshMultiTableOracleSql(nQueries: Int, k: Int, numPlanes: Int,
                                     dim: Int, nTables: Int): String = {
    val sets = Similarity.lshTablePlanes(nTables, numPlanes, dim)
    val planeValues = (for (t <- 0 until nTables; p <- 0 until numPlanes; i <- 0 until dim)
      yield s"($t, $p, ${i + 1}, ${sets(t)(p)(i)})").mkString(", ")
    s"""WITH planes(t, p, i, w) AS (VALUES $planeValues),
       |$annExNormsSql,
       |pdots AS (
       |  SELECT e.vec_id, pl.t, pl.p, sum(e.x * pl.w) AS d
       |  FROM ex e JOIN planes pl ON e.i = pl.i GROUP BY 1, 2, 3),
       |buckets AS (
       |  SELECT vec_id, t, sum(CASE WHEN d >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
       |  FROM pdots GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id
       |  FROM buckets q JOIN buckets c ON c.t = q.t AND c.bucket = q.bucket
       |  WHERE q.vec_id < $nQueries AND c.vec_id <> q.vec_id),
       |${annScoringTailSql(k)}""".stripMargin
  }

  /** DuckDB replica of [[Similarity.simIvfAnn]]: the frozen
    * [[operators.IvfCodebook]] centroids are inlined as literals so
    * both engines assign every vector to the same IVF cell (argmax
    * centroid cosine, ties → lowest cell), probe the same `nprobe`
    * cells per query, and rank the same candidates. */
  private def ivfOracleSql(nQueries: Int, k: Int, nprobe: Int,
                           corpusCond: String = "TRUE"): String = {
    val cb = operators.IvfCodebook.centroids
    val centValues = (for (ci <- cb.indices; i <- cb(ci).indices)
      yield s"($ci, ${i + 1}, ${cb(ci)(i)})").mkString(", ")
    s"""WITH cents(cidx, i, w) AS (VALUES $centValues),
       |$annExNormsSql,
       |cnorms AS (SELECT cidx, sqrt(sum(w*w)) AS cnrm FROM cents GROUP BY cidx),
       |cdot AS (
       |  SELECT e.vec_id, c.cidx, sum(e.x * c.w) AS dot
       |  FROM ex e JOIN cents c ON e.i = c.i GROUP BY 1, 2),
       |ccos AS (
       |  SELECT cd.vec_id, cd.cidx, cd.dot / (n.nrm * cn.cnrm) AS c
       |  FROM cdot cd JOIN norms n ON n.vec_id = cd.vec_id
       |  JOIN cnorms cn ON cn.cidx = cd.cidx),
       |ranked AS (
       |  SELECT vec_id, cidx,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cidx) AS rn
       |  FROM ccos),
       |assign AS (SELECT vec_id, cidx AS bucket FROM ranked WHERE rn = 1 AND ($corpusCond)),
       |probes AS (
       |  SELECT vec_id AS qid, cidx AS bucket FROM ranked
       |  WHERE vec_id < $nQueries AND rn <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id FROM probes p
       |  JOIN assign a ON a.bucket = p.bucket WHERE a.vec_id <> p.qid),
       |${annScoringTailSql(k)}""".stripMargin
  }

  /** DuckDB replica of [[operators.Similarity.embProject]]: the
    * pre-scaled JL matrix inlined as VALUES rows, mat-vec replayed as
    * a grouped sum in subscript order (the kernel accumulates
    * ascending i, so the doubles agree). */
  private def embProjectOracleSql(kProj: Int): String = {
    val m = operators.Similarity.jlProjection(kProj)
    val vals = (for (p <- m.indices; i <- m(p).indices)
      yield s"(${p + 1}, ${i + 1}, ${m(p)(i)})").mkString(", ")
    s"""WITH proj(j, i, w) AS (VALUES $vals),
       |ex AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings)
       |SELECT ex.vec_id, CAST(proj.j AS BIGINT) AS j, round(sum(ex.x * proj.w), 4) AS y
       |FROM ex JOIN proj ON ex.i = proj.i
       |GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin
  }

  /** DuckDB replica of [[operators.TextAnalysis.textBm25]]: same
    * whitespace tokenization, same Okapi constants (k1, b), the
    * query set inlined from [[operators.TextAnalysis.bm25Queries]]
    * so both engines score identical queries; ln == Spark's log
    * (both natural, IEEE double). */
  private def bm25OracleSql(k: Int, k1: Double, b: Double): String = {
    val qs = operators.TextAnalysis.bm25Queries
    val qtValues = qs.flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }.mkString(", ")
    val vocabIn = qs.flatMap(_._2).distinct.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, t FROM (
       |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |    FROM documents) WHERE t <> ''),
       |dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
       |qt(qid, term) AS (VALUES $qtValues),
       |tf AS (
       |  SELECT doc_id, t AS term, count(*)::DOUBLE AS tf FROM toks
       |  WHERE t IN ($vocabIn) GROUP BY 1, 2),
       |dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT qt.qid, tf.doc_id,
       |    sum(ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |        * (tf.tf * ${k1 + 1}) / (tf.tf + $k1 * (${1 - b} + $b * dl.dl / stats.avgdl))) AS s
       |  FROM tf
       |  JOIN dft USING (term) JOIN qt USING (term) JOIN dl USING (doc_id)
       |  CROSS JOIN stats
       |  GROUP BY 1, 2)
       |SELECT qid, doc_id, score, rank FROM (
       |  SELECT CAST(qid AS BIGINT) AS qid, doc_id, round(s, 4) AS score,
       |    CAST(row_number() OVER (PARTITION BY qid ORDER BY s DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replica of [[operators.Dedup.dedupSemantic]]: the frozen
    * [[operators.IvfCodebook]] centroids are inlined so both engines
    * quantize every (augmented) vector to the same IVF cell, compare
    * only within-cell pairs, and drop the same higher-id members. */
  private def semanticOracleSql(tau: Double): String = {
    val cb = operators.IvfCodebook.centroids
    val centValues = (for (ci <- cb.indices; i <- cb(ci).indices)
      yield s"($ci, ${i + 1}, ${cb(ci)(i)})").mkString(", ")
    s"""WITH cents(cidx, i, w) AS (VALUES $centValues),
       |ex0 AS (
       |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |ex AS (
       |  SELECT vec_id, x, i FROM ex0
       |  UNION ALL
       |  SELECT vec_id + 1000000,
       |         x + 0.02 * ((((vec_id * 64 + (i - 1)) * 2654435761) % 2001) - 1000) / 1000.0, i
       |  FROM ex0 WHERE vec_id < 64),
       |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
       |cnorms AS (SELECT cidx, sqrt(sum(w*w)) AS cnrm FROM cents GROUP BY cidx),
       |cdot AS (
       |  SELECT e.vec_id, c.cidx, sum(e.x * c.w) AS dot
       |  FROM ex e JOIN cents c ON e.i = c.i GROUP BY 1, 2),
       |ccos AS (
       |  SELECT cd.vec_id, cd.cidx, cd.dot / (n.nrm * cn.cnrm) AS c
       |  FROM cdot cd JOIN norms n ON n.vec_id = cd.vec_id
       |  JOIN cnorms cn ON cn.cidx = cd.cidx),
       |assign AS (
       |  SELECT vec_id, cidx AS cell FROM (
       |    SELECT vec_id, cidx,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cidx) AS rn
       |    FROM ccos) WHERE rn = 1),
       |pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
       |  FROM assign sa JOIN assign sb ON sb.cell = sa.cell AND sb.vec_id > sa.vec_id
       |  JOIN ex a ON a.vec_id = sa.vec_id
       |  JOIN ex b ON b.vec_id = sb.vec_id AND b.i = a.i
       |  GROUP BY 1, 2),
       |drops AS (
       |  SELECT DISTINCT id_b AS vec_id FROM pairs
       |  JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
       |  WHERE round(dot / (na.nrm * nb.nrm), 4) >= $tau)
       |SELECT a.vec_id AS id, a.cell::BIGINT AS cell, (d.vec_id IS NOT NULL) AS dropped
       |FROM assign a LEFT JOIN drops d USING (vec_id) ORDER BY id""".stripMargin
  }

  /** DuckDB replica of [[operators.TextAnalysis.pipeClassifierQuality]]:
    * the frozen [[operators.QualityWeights]] constants are inlined as a
    * DOUBLE[] literal (shortest-round-trip decimals — both parsers are
    * correctly rounded, so the doubles are bit-identical), gram/bucket
    * construction mirrors [[operators.TextAnalysis.classifierFeatureFrame]]
    * on the identical integer counts, and the score is the same
    * left-to-right fold over SORTED DISTINCT buckets (list_reduce with
    * the bias prepended ≡ Spark aggregate with the bias as zero), so
    * the logit matches bit-for-bit — keep = raw > 0 needs no rounding
    * tolerance at all. */
  private def classifierQualityOracleSql: String = {
    val d = operators.QualityWeights.D
    val bias = java.lang.Double.toString(operators.QualityWeights.Bias)
    val ws = operators.QualityWeights.W.map(java.lang.Double.toString).mkString(", ")
    s"""WITH wtab AS (SELECT [$ws]::DOUBLE[] AS wl),
       |toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
       |  FROM documents),
       |ws AS (
       |  SELECT doc_id, w, len(w)::BIGINT AS n_words, len(list_distinct(w))::BIGINT AS n_distinct
       |  FROM toks),
       |meta AS (
       |  SELECT d.doc_id,
       |    (length(d.text) - len(regexp_extract_all(d.text, '\\s')))::DOUBLE
       |      / greatest(ws.n_words, 1) AS mwl,
       |    len(regexp_extract_all(d.text, '[A-Za-z]'))::DOUBLE
       |      / greatest(length(d.text), 1) AS alpha_ratio,
       |    len(regexp_extract_all(lower(d.text), '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
       |      / greatest(ws.n_words, 1) AS stop_ratio
       |  FROM documents d JOIN ws USING (doc_id)),
       |bgc AS (
       |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
       |  FROM toks, unnest(range(1, greatest(len(w), 1))) t(i)),
       |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bgc GROUP BY 1, 2),
       |bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_c FROM bc GROUP BY 1),
       |sig AS (
       |  SELECT ws.doc_id, ws.w, ws.n_words,
       |    CASE WHEN ws.n_words = 0 THEN 0.0
       |         ELSE 1.0 - ws.n_distinct / ws.n_words END AS dup_word_frac,
       |    coalesce(bs.max_c::DOUBLE / bs.n_bigrams, 0.0) AS top_bigram_frac,
       |    m.mwl, m.alpha_ratio, m.stop_ratio
       |  FROM ws JOIN meta m USING (doc_id) LEFT JOIN bs USING (doc_id)),
       |grams AS (
       |  SELECT doc_id, list_concat(list_concat(w,
       |    CASE WHEN len(w) < 2 THEN []
       |         ELSE list_transform(range(1, len(w)), i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]) END), [
       |    '__nwc' || least(n_words // 8, 16)::VARCHAR || '__',
       |    '__nwf' || least(n_words // 2, 64)::VARCHAR || '__',
       |    '__mwl' || floor(mwl * 10)::BIGINT::VARCHAR || '__',
       |    '__al' || floor(alpha_ratio * 50)::BIGINT::VARCHAR || '__',
       |    '__stc' || least(floor(stop_ratio * 50)::BIGINT, 20)::VARCHAR || '__',
       |    '__stf' || least(floor(stop_ratio * 200)::BIGINT, 80)::VARCHAR || '__',
       |    '__duc' || floor(dup_word_frac * 20)::BIGINT::VARCHAR || '__',
       |    '__duf' || floor(dup_word_frac * 200)::BIGINT::VARCHAR || '__',
       |    '__tb' || least(floor(top_bigram_frac * 50)::BIGINT, 20)::VARCHAR || '__']) AS g
       |  FROM sig),
       |sc AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST($bias AS DOUBLE),
       |      list_transform(list_sort(list_distinct(list_transform(g,
       |        x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $d))),
       |        b -> wl[CAST(b + 1 AS INT)])),
       |      (a, x) -> a + x) AS raw
       |  FROM grams, wtab)
       |SELECT doc_id, round(raw, 4) AS score, raw > 0.0 AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replica of [[operators.Dedup.dedupMinhashLsh]]: the
    * splitmix (a,b) permutation constants are inlined so both engines
    * run the identical permutation family over the identical
    * md5-derived 60-bit shingle hash. Banding joins on the raw
    * 4-minhash band tuple — the Spark side xxhash64's that tuple only
    * to shrink the shuffle key, so the candidate sets are identical
    * barring a 64-bit band-hash collision. */
  private def minhashOracleSql(n: Int, numPerms: Int, rowsPerBand: Int, tau: Double): String = {
    val p = operators.Dedup.MersennePrime
    val mins = (0 until numPerms).map { i =>
      val (a, b) = operators.Dedup.perm(i)
      s"min((h % $p * $a + $b) % $p)"
    }.mkString(", ")
    val numBands = numPerms / rowsPerBand
    s"""WITH shg AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(substr(lower(text), CAST(i AS INT), $n)), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - ${n - 1}, 1) + 1)) AS i
       |        FROM documents)),
       |sig AS (SELECT doc_id, [$mins] AS sig FROM shg GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band,
       |    list_slice(sig, CAST($rowsPerBand*band + 1 AS INT), CAST($rowsPerBand*band + $rowsPerBand AS INT)) AS key
       |  FROM sig, range(0, $numBands) br(band)),
       |cand AS (
       |  SELECT DISTINCT ba.doc_id AS id_a, bb.doc_id AS id_b
       |  FROM banded ba JOIN banded bb
       |    ON ba.band = bb.band AND ba.key = bb.key AND ba.doc_id < bb.doc_id),
       |est AS (
       |  SELECT id_a, id_b,
       |    round(CAST(list_sum(list_transform(range(1, ${numPerms + 1}),
       |      i -> CASE WHEN sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)] THEN 1 ELSE 0 END)) AS DOUBLE) / $numPerms, 4) AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
       |SELECT id_a, id_b, est_jaccard FROM est
       |WHERE est_jaccard >= $tau ORDER BY id_a, id_b""".stripMargin
  }

  /** Composed truth + estimator oracle for `dedup_eval`: the exact
    * raw-substring jaccard pairs and the replayed minhash-LSH pairs
    * (the [[minhashOracleSql]] fragment), reduced to the same
    * one-row precision/recall summary the operator emits.
    *
    * The truth side is PPJOIN PREFIX-PRUNED (Xiao et al., WWW 2008 —
    * the same exact filter the Spark operator uses), not all-pairs:
    * under a global (df, gram) order, two sets with Jaccard ≥ τ MUST
    * share a gram inside each one's first sz − ⌈τ·sz⌉ + 1 grams, and
    * sizes must satisfy τ·|x| ≤ |y| — both provably lossless, so the
    * pruned truth is IDENTICAL to all-pairs (validated at sf0.001
    * and sf0.01) while the candidate join stops being quadratic in
    * shared-gram pairs. This is what makes the sf0.1 leg of the
    * three-decade gate runnable for this query: the all-pairs
    * formulation exhausts DuckDB's spill at sf0.1; the pruned one
    * measures 256 truth pairs in ~220 s with negligible temp usage.
    * The ceil epsilon (−1e-9) guards float-up error in τ·sz and can
    * only err toward a LARGER prefix / weaker filter — extra
    * candidates, never a lost pair. The prefix and size filters
    * derive from τ′ = τ − 5e-5, NOT τ: the truth predicate is
    * round(J, 4) ≥ τ, whose effective threshold is τ − 5e-5 (a pair
    * with true J in [τ−5e-5, τ) rounds up and must not be pruned) —
    * the same τ′ the Spark operator's pruning uses. */
  private def dedupEvalOracleSql(n: Int, numPerms: Int, rowsPerBand: Int, tau: Double): String = {
    val tauP = tau - 0.00005
    val p = operators.Dedup.MersennePrime
    val mins = (0 until numPerms).map { i =>
      val (a, b) = operators.Dedup.perm(i)
      s"min((h % $p * $a + $b) % $p)"
    }.mkString(", ")
    val numBands = numPerms / rowsPerBand
    s"""WITH rawsh AS (
       |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), $n) AS g
       |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - ${n - 1}, 1) + 1)) AS i
       |        FROM documents)),
       |sz AS (SELECT doc_id, count(*) AS sz FROM rawsh GROUP BY doc_id),
       |gdf AS (SELECT g, count(*) AS df FROM rawsh GROUP BY g),
       |pref AS (
       |  SELECT o.doc_id, o.g FROM (
       |    SELECT r.doc_id, r.g,
       |           row_number() OVER (PARTITION BY r.doc_id ORDER BY d.df, r.g) AS pos
       |    FROM rawsh r JOIN gdf d ON d.g = r.g) o
       |  JOIN sz s ON s.doc_id = o.doc_id
       |  WHERE o.pos <= s.sz - CAST(ceil($tauP * s.sz - 1e-9) AS BIGINT) + 1),
       |cand0 AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id
       |  JOIN sz sa ON sa.doc_id = a.doc_id JOIN sz sb ON sb.doc_id = b.doc_id
       |  WHERE sb.sz >= CAST(ceil($tauP * sa.sz - 1e-9) AS BIGINT)
       |    AND sa.sz >= CAST(ceil($tauP * sb.sz - 1e-9) AS BIGINT)),
       |common AS (
       |  SELECT cd.id_a, cd.id_b, count(*) AS c
       |  FROM cand0 cd JOIN rawsh a ON a.doc_id = cd.id_a
       |                JOIN rawsh b ON b.doc_id = cd.id_b AND b.g = a.g
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b FROM common
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE round(c / (sa.sz + sb.sz - c), 4) >= $tau),
       |shg AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(substr(lower(text), CAST(i AS INT), $n)), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - ${n - 1}, 1) + 1)) AS i
       |        FROM documents)),
       |sig AS (SELECT doc_id, [$mins] AS sig FROM shg GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig, band,
       |    list_slice(sig, CAST($rowsPerBand*band + 1 AS INT), CAST($rowsPerBand*band + $rowsPerBand AS INT)) AS key
       |  FROM sig, range(0, $numBands) br(band)),
       |cand AS (
       |  SELECT DISTINCT ba.doc_id AS id_a, bb.doc_id AS id_b
       |  FROM banded ba JOIN banded bb
       |    ON ba.band = bb.band AND ba.key = bb.key AND ba.doc_id < bb.doc_id),
       |pred AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      round(CAST(list_sum(list_transform(range(1, ${numPerms + 1}),
       |        i -> CASE WHEN sa.sig[CAST(i AS INT)] = sb.sig[CAST(i AS INT)] THEN 1 ELSE 0 END)) AS DOUBLE) / $numPerms, 4) AS ej
       |    FROM cand JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)
       |  WHERE ej >= $tau),
       |hit AS (
       |  SELECT p.id_a, p.id_b FROM pred p
       |  JOIN truth t ON p.id_a = t.id_a AND p.id_b = t.id_b)
       |SELECT
       |  (SELECT count(*) FROM truth)::BIGINT AS n_true,
       |  (SELECT count(*) FROM pred)::BIGINT AS n_pred,
       |  (SELECT count(*) FROM hit)::BIGINT AS n_hit,
       |  round(CASE WHEN (SELECT count(*) FROM pred) = 0 THEN 0
       |    ELSE (SELECT count(*) FROM hit) / (SELECT count(*) FROM pred) END, 4) AS "precision",
       |  round(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0
       |    ELSE (SELECT count(*) FROM hit) / (SELECT count(*) FROM truth) END, 4) AS recall""".stripMargin
  }

  /** DuckDB replica of [[operators.Dedup.dedupSimhash]]: identical
    * md5-derived token hash, 64 per-bit majority counts, identical
    * bit-pack, pigeonhole 16-bit chunk candidates, bit_count(xor)
    * verification. Generated (64 aggregate columns) like the LSH
    * oracle. */
  private def simhashOracleSql(maxHamming: Int): String = {
    val bitCounts = (0 until 64)
      .map(b => s"sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE 0 END) AS b$b").mkString(", ")
    val packed = (0 until 64)
      .map(b => s"(CASE WHEN b$b * 2 > n_tok THEN (1::BIGINT << $b) ELSE 0::BIGINT END)")
      .mkString(" + ")
    s"""WITH th AS (
       |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id,
       |          unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS t
       |        FROM documents)),
       |agg AS (SELECT doc_id, count(*) AS n_tok, $bitCounts FROM th GROUP BY doc_id),
       |shs AS (SELECT doc_id, $packed AS sh FROM agg),
       |chunked AS (
       |  SELECT doc_id, sh, chunk, (sh >> CAST(16*chunk AS INT)) & 65535 AS cv
       |  FROM shs, range(0, 4) cr(chunk)),
       |cand AS (
       |  SELECT DISTINCT ca.doc_id AS id_a, cb.doc_id AS id_b,
       |    CAST(bit_count(xor(ca.sh, cb.sh)) AS BIGINT) AS hamming
       |  FROM chunked ca JOIN chunked cb
       |    ON ca.chunk = cb.chunk AND ca.cv = cb.cv AND ca.doc_id < cb.doc_id)
       |SELECT id_a, id_b, hamming FROM cand
       |WHERE hamming <= $maxHamming ORDER BY id_a, id_b""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "dedup_incremental" -> incrementalOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, shardMod = 10),
    // forgotten (tombstoned) corpus docs must stop causing flags:
    // same incremental CTEs with the corpus side filtered to the
    // un-forgotten half — the never-ingested contract
    "pipe_corpus_forget" -> incrementalOracleSql(n = 9, numPerms = 32, rowsPerBand = 4,
      shardMod = 10, corpusCond = "doc_id % 2 = 0"),
    "pipe_full_ingest" -> fullIngestOracleSql(minWords = 30, minAlpha = 0.6,
      nEval = 10, nShards = 4, seqLen = 256, seed = 42),
    // probes persisted corpus state; flags are identical by construction
    "dedup_incremental_persisted" ->
      incrementalOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, shardMod = 10),
    "pipe_incremental_e2e" -> incrementalE2eOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, shardMod = 10),
    // persisted-probe composition: flags identical by construction
    "pipe_incremental_e2e_persisted" ->
      incrementalE2eOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, shardMod = 10),
    // the state store of a one-batch windowed-agg checkpoint IS the
    // full aggregate — same oracle shape as q13_events_window
    "stream_state_inspect" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS cnt, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Partial contract: exact key set + the deterministic rule label;
    // has_score / agree_ok are Spark-computed invariants asserted TRUE.
    "pipe_ml_filter" ->
      """SELECT doc_id, lang,
        |  (len(regexp_extract_all(text, '\S+')) >= 30
        |   AND len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) >= 0.6) AS rule_pass,
        |  TRUE AS has_score, TRUE AS agree_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Raw-substring twin: grouping raw 50-grams == grouping md5-60 gram
    // ids barring a collision; rank tie-break is the shared md5-60 id.
    "pipe_repeated_ngrams" ->
      """WITH g AS (
        |  SELECT doc_id, substr(lower(text), CAST(i AS INT), 50) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 49, 1) + 1)) AS i
        |        FROM documents)),
        |counts AS (
        |  SELECT g, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gid,
        |    count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        |  FROM g GROUP BY g
        |  HAVING count(*) >= 2)
        |SELECT row_number() OVER (ORDER BY n_occ DESC, gid) AS rank, g AS gram, n_occ, n_docs
        |FROM counts ORDER BY n_occ DESC, gid LIMIT 20""".stripMargin,
    "dedup_minhash_lsh" -> minhashOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, tau = 0.8),
    "dedup_eval" -> dedupEvalOracleSql(n = 9, numPerms = 32, rowsPerBand = 4, tau = 0.8),
    "dedup_simhash" -> simhashOracleSql(maxHamming = 3),
    "q29_json" ->
      """SELECT event_type, count(*) AS cnt,
        |  round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q30_window_funcs" ->
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price,
        |  lag(o_orderkey) OVER w AS prev_key,
        |  lead(o_orderkey) OVER w AS next_key,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cume
        |FROM orders WHERE o_orderstatus = 'F'
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, price, o_orderkey""".stripMargin,
    "q31_month_trend" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT month, cnt, revenue,
        |  round(revenue - coalesce(lag(revenue) OVER (ORDER BY month), 0.0), 2) AS mom_delta
        |FROM m ORDER BY month""".stripMargin,
    "q32_grouped_topk" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, o_orderkey,
        |  round(o_totalprice, 2) AS price
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q33_sql_join" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |  JOIN orders   ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q34_exists_subquery" ->
      """SELECT c_custkey, c_name,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q35_intersect_except" ->
      """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |h AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
        |b AS (SELECT count(*) AS n FROM (SELECT * FROM u INTERSECT SELECT * FROM h)),
        |ou AS (SELECT count(*) AS n FROM (SELECT * FROM u EXCEPT SELECT * FROM h))
        |SELECT 'both' AS set_op, n FROM b
        |UNION ALL SELECT 'only_urgent' AS set_op, n FROM ou
        |ORDER BY set_op""".stripMargin,
    "q36_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,
    "emb_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(x AS DOUBLE) AS x
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)),
        |sc AS (SELECT vec_id, max(abs(x)) / 127 AS scale FROM ex GROUP BY vec_id)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  round(max(abs(x - round(x / scale) * scale)), 6) AS max_err,
        |  round(avg(abs(x - round(x / scale) * scale)), 6) AS mean_err
        |FROM ex JOIN sc USING (vec_id)
        |GROUP BY vec_id, scale ORDER BY vec_id""".stripMargin,
    "emb_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
        |  round(avg(CAST(x AS DOUBLE)), 4) AS c, count(*) AS n
        |FROM (SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY label, i""".stripMargin,
    "emb_project" -> embProjectOracleSql(kProj = 16),
    // exact all-pairs radius twin; threshold on the rounded cosine
    // (the dedup_embedding convention) so boundary membership agrees
    "sim_range_search" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS qid, c.vec_id, sum(q.x * c.x) AS dot
        |  FROM ex q JOIN ex c ON q.i = c.i AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 5
        |  GROUP BY 1, 2)
        |SELECT qid, d.vec_id, round(d.dot / (nq.nrm * nc.nrm), 4) AS cosine
        |FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nc ON nc.vec_id = d.vec_id
        |WHERE round(d.dot / (nq.nrm * nc.nrm), 4) >= 0.25
        |ORDER BY qid, d.vec_id""".stripMargin,
    // Hash-invariant twin (same argument as dedup_ngram_jaccard): a
    // shared xxhash64'd 20-gram == a shared raw 20-gram substring.
    "pipe_decontaminate" -> decontaminateOracleSql,
    // the sketch contract: the oracle recomputes the EXACT distinct
    // sketch-family contract: exact k-th token count replayed, both
    // sketch-quality flags (direct and source->combined rollup)
    // expected true — maxTracked far exceeds per-lang vocabulary at
    // oracle scale, so the frequent-items summaries are exact
    "pipe_heavy_hitters_rollup" ->
      """WITH wl AS (
        |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |tok AS (SELECT lang, unnest(w) AS token FROM wl),
        |counts AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk
        |  FROM counts)
        |SELECT lang, cnt AS kth_cnt, TRUE AS direct_ok, TRUE AS rolled_ok
        |FROM ranked WHERE rk = 5 ORDER BY lang""".stripMargin,
    // side (raw substrings — equal to distinct hashes barring
    // collision) and expects the Spark-computed accuracy flag true
    "pipe_sketch_rollup" ->
      """WITH sh AS (
        |  SELECT DISTINCT lang, substr(lower(text), CAST(i AS INT), 12) AS g
        |  FROM (SELECT lang, text, unnest(range(1, greatest(length(text) - 11, 1) + 1)) AS i
        |        FROM documents))
        |SELECT lang, count(*)::BIGINT AS exact_distinct, true AS sketch_ok
        |FROM sh GROUP BY lang ORDER BY lang""".stripMargin,
    // graded twin: distinct-shingle hit counts per doc, policy
    // thresholds on the unrounded ratio of exact integer counts
    "pipe_contamination_frac" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 20) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 19, 1) + 1)) AS i
        |        FROM documents)),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 10),
        |hits AS (
        |  SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
        |         sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
        |  FROM sh s LEFT JOIN ev e USING (g)
        |  WHERE s.doc_id >= 10 GROUP BY 1)
        |SELECT doc_id, n_shingles, n_hits,
        |  round(n_hits / n_shingles, 4) AS frac,
        |  CASE WHEN n_hits / n_shingles >= 0.5 THEN 'drop'
        |       WHEN n_hits / n_shingles >= 0.05 THEN 'trim'
        |       ELSE 'keep' END AS action
        |FROM hits ORDER BY doc_id""".stripMargin,
    // the Bloom formulation verifies candidates exactly, so its result
    // — and oracle — are identical to the exact broadcast path
    "pipe_decontaminate_bloom" -> decontaminateOracleSql,
    "q37_outer_join" ->
      """WITH u AS (SELECT o_custkey, count(*) AS n_urgent FROM orders
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |l AS (SELECT o_custkey, count(*) AS n_low FROM orders
        |  WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT coalesce(u.o_custkey, l.o_custkey) AS o_custkey,
        |  coalesce(n_urgent, 0) AS n_urgent, coalesce(n_low, 0) AS n_low
        |FROM u FULL OUTER JOIN l ON u.o_custkey = l.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q44_string_agg" ->
      """SELECT r_name, count(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY r_name""".stripMargin,
    "q45_recursive_cte" ->
      """WITH RECURSIVE days(d) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL SELECT d + 1 FROM days WHERE d < DATE '1995-03-31'
        |),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n, sum(o_totalprice) AS rev
        |  FROM orders
        |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
        |  GROUP BY 1
        |)
        |SELECT days.d::TIMESTAMP AS day, coalesce(n, 0)::BIGINT AS n_orders,
        |  round(coalesce(rev, 0.0), 2) AS revenue
        |FROM days LEFT JOIN daily ON days.d = daily.d
        |ORDER BY day""".stripMargin,
    "q47_unpivot" ->
      """SELECT measure, count(*) AS cnt, round(sum(value), 2) AS total,
        |  round(avg(value), 6) AS mean
        |FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin,
    "q48_gapfill" ->
      """SELECT event_id, user_id, event_type,
        |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS last_purchase_value
        |FROM events ORDER BY event_id""".stripMargin,
    "q46_variant" ->
      """SELECT event_type,
        |  count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
        |  count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_distinct_k,
        |  round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q43_null_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  count(nullif(l_discount, 0.0)) AS n_nonnull,
        |  sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |  round(avg(nullif(l_discount, 0.0)), 4) AS avg_nonnull
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q42_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > v_us GROUP BY 1),
        |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name,
        |    (SELECT count(*) FROM v) AS users
        |  UNION ALL SELECT CAST(2 AS BIGINT), 'view_click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT CAST(3 AS BIGINT), 'view_click_purchase', (SELECT count(*) FROM p))
        |ORDER BY stage""".stripMargin,
    "q41_cross_modal" ->
      """WITH nr AS (
        |  SELECT vec_id, label,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_docs,
        |  round(avg(length(d.text)), 4) AS avg_chars,
        |  round(avg(nrm), 4) AS avg_norm
        |FROM documents d JOIN nr ON d.doc_id = nr.vec_id
        |GROUP BY 1 ORDER BY label""".stripMargin,
    "q39_daily_active" ->
      """SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS dau,
        |  count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q40_retention" ->
      """WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY 1),
        |ret AS (
        |  SELECT a.day, count(*) AS retained
        |  FROM daily a JOIN daily b ON a.user_id = b.user_id AND b.day = a.day + 1
        |  GROUP BY 1)
        |SELECT d.day, d.dau, coalesce(r.retained, 0) AS retained,
        |  round(coalesce(r.retained, 0) / d.dau, 4) AS retention_rate
        |FROM dau d LEFT JOIN ret r USING (day) ORDER BY day""".stripMargin,
    "q38_rolling_window" ->
      """WITH d AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, round(sum(o_totalprice), 2) AS revenue
        |  FROM orders GROUP BY 1),
        |n AS (SELECT day, revenue, datediff('day', DATE '1970-01-01', day) AS day_num FROM d)
        |SELECT day, revenue,
        |  round(sum(revenue) OVER (ORDER BY day_num
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM n ORDER BY day""".stripMargin,
    "text_top_bigrams" ->
      """WITH wl AS (
        |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT lang, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM wl, unnest(range(1, greatest(len(w), 1))) t(i)),
        |counts AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, bigram, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC,
        |      ('0x' || substr(md5(bigram), 1, 15))::BIGINT) AS rank
        |  FROM counts)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, bigram, cnt
        |FROM ranked WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    // Sketch contract: exact k-th-largest bigram count per language +
    // the Spark-computed sketch-validity flag asserted TRUE.
    "text_top_bigrams_sketch" ->
      """WITH wl AS (
        |  SELECT lang, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT lang, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM wl, unnest(range(1, greatest(len(w), 1))) t(i)),
        |counts AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS rk
        |  FROM counts)
        |SELECT lang, cnt AS kth_cnt, TRUE AS sketch_ok
        |FROM ranked WHERE rk = 5 ORDER BY lang""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |ws AS (
        |  SELECT doc_id, len(w)::BIGINT AS n_words, len(list_distinct(w))::BIGINT AS n_distinct_words
        |  FROM toks),
        |bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM toks, unnest(range(1, greatest(len(w), 1))) t(i)),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_c FROM bc GROUP BY 1)
        |SELECT ws.doc_id, n_words, n_distinct_words,
        |  CASE WHEN n_words = 0 THEN 0.0
        |       ELSE round(1.0 - n_distinct_words / n_words, 4) END AS dup_word_frac,
        |  coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
        |  round(coalesce(max_c::DOUBLE / n_bigrams, 0.0), 4) AS top_bigram_frac
        |FROM ws LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_vocab_stats" ->
      """WITH tok AS (
        |  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')) AS t
        |  FROM documents),
        |tc AS (SELECT lang, t, count(*) AS c FROM tok GROUP BY 1, 2)
        |SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
        |  round(count(*)::DOUBLE / sum(c), 4) AS type_token_ratio
        |FROM tc GROUP BY lang ORDER BY lang""".stripMargin,
    "text_bm25" -> bm25OracleSql(k = 10, k1 = 1.2, b = 0.75),
    // the card replays each composed gate's own math: quality filter
    // (words/alpha), the full Gopher mask, hash-distinct texts
    // (= dedup_exact's group count barring collisions), the planted
    // PII construction — rates are avg of exact 0/1 indicators
    "pipe_dataset_card" ->
      """WITH n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |w AS (SELECT doc_id, len(regexp_extract_all(text, '\S+'))::BIGINT AS w FROM documents),
        |base AS (SELECT count(*)::DOUBLE AS n_docs, sum(w)::DOUBLE AS total_words FROM w),
        |alpha AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE
        |    / greatest(length(text), 1) AS a
        |  FROM documents),
        |qual AS (
        |  SELECT count(*)::DOUBLE AS c FROM w JOIN alpha USING (doc_id)
        |  WHERE w.w >= 30 AND alpha.a >= 0.6),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |ws AS (
        |  SELECT doc_id, len(w)::BIGINT AS n_words, len(list_distinct(w))::BIGINT AS n_distinct
        |  FROM toks),
        |meta AS (
        |  SELECT d.doc_id,
        |    (length(d.text) - len(regexp_extract_all(d.text, '\s')))::DOUBLE
        |      / greatest(ws.n_words, 1) AS mwl,
        |    len(regexp_extract_all(d.text, '[A-Za-z]'))::DOUBLE
        |      / greatest(length(d.text), 1) AS alpha_ratio,
        |    len(regexp_extract_all(lower(d.text), '\b(the|a|an|and|or|of|to|in|is|it)\b'))::DOUBLE
        |      / greatest(ws.n_words, 1) AS stop_ratio
        |  FROM documents d JOIN ws USING (doc_id)),
        |bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM toks, unnest(range(1, greatest(len(w), 1))) t(i)),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_c FROM bc GROUP BY 1),
        |sig AS (
        |  SELECT ws.doc_id, ws.n_words,
        |    CASE WHEN ws.n_words = 0 THEN 0.0
        |         ELSE 1.0 - ws.n_distinct / ws.n_words END AS dup_word_frac,
        |    coalesce(bs.max_c::DOUBLE / bs.n_bigrams, 0.0) AS top_bigram_frac,
        |    m.mwl, m.alpha_ratio, m.stop_ratio
        |  FROM ws JOIN meta m USING (doc_id) LEFT JOIN bs USING (doc_id)),
        |goph AS (
        |  SELECT round(avg(CASE WHEN
        |    (CASE WHEN n_words < 30 OR n_words > 100000 THEN 1 ELSE 0 END
        |     + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 2 ELSE 0 END
        |     + CASE WHEN alpha_ratio < 0.8 THEN 4 ELSE 0 END
        |     + CASE WHEN stop_ratio < 0.01 THEN 8 ELSE 0 END
        |     + CASE WHEN dup_word_frac > 0.65 THEN 16 ELSE 0 END
        |     + CASE WHEN top_bigram_frac > 0.2 THEN 32 ELSE 0 END) = 0
        |    THEN 1.0 ELSE 0.0 END), 4) AS v
        |  FROM sig),
        |ex AS (SELECT count(DISTINCT text)::DOUBLE AS c FROM documents),
        |raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      text || ' contact user' || doc_id || '@example.com from 10.' ||
        |      (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 200 + 1)
        |    ELSE text END AS raw
        |  FROM documents),
        |piic AS (
        |  SELECT round(avg(CASE WHEN
        |    len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0
        |    THEN 1.0 ELSE 0.0 END), 4) AS v
        |  FROM raw)
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, n_docs AS value FROM base
        |  UNION ALL SELECT 'total_words', total_words FROM base
        |  UNION ALL SELECT 'mean_words', round(total_words / n_docs, 4) FROM base
        |  UNION ALL SELECT 'docs_lang_' || lang, count(*)::DOUBLE FROM documents GROUP BY lang
        |  UNION ALL SELECT 'quality_pass_rate', round(qual.c / n.n, 4) FROM qual, n
        |  UNION ALL SELECT 'gopher_pass_rate', v FROM goph
        |  UNION ALL SELECT 'exact_dup_rate', round(1 - ex.c / n.n, 4) FROM ex, n
        |  UNION ALL SELECT 'pii_contact_rate', v FROM piic)
        |ORDER BY metric""".stripMargin,
    // same 60-bit md5 family as the shuffle-pack keys: membership is
    // a pure function of doc_id, identical in both engines
    "pipe_split_train_val" ->
      """SELECT doc_id,
        |  ('0x' || substring(md5(doc_id || ':split'), 1, 15))::BIGINT % 100 AS bucket,
        |  CASE WHEN ('0x' || substring(md5(doc_id || ':split'), 1, 15))::BIGINT % 100 < 90 THEN 'train'
        |       WHEN ('0x' || substring(md5(doc_id || ':split'), 1, 15))::BIGINT % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the Gopher-gate mask: every signal derives from integer counts
    // both engines compute identically (the text_quality /
    // text_repetition formulas), compared UNROUNDED against the same
    // literal thresholds — so the bitmask is exact, not approximate
    "pipe_gopher_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS w
        |  FROM documents),
        |ws AS (
        |  SELECT doc_id, len(w)::BIGINT AS n_words, len(list_distinct(w))::BIGINT AS n_distinct
        |  FROM toks),
        |meta AS (
        |  SELECT d.doc_id,
        |    (length(d.text) - len(regexp_extract_all(d.text, '\s')))::DOUBLE
        |      / greatest(ws.n_words, 1) AS mwl,
        |    len(regexp_extract_all(d.text, '[A-Za-z]'))::DOUBLE
        |      / greatest(length(d.text), 1) AS alpha_ratio,
        |    len(regexp_extract_all(lower(d.text), '\b(the|a|an|and|or|of|to|in|is|it)\b'))::DOUBLE
        |      / greatest(ws.n_words, 1) AS stop_ratio
        |  FROM documents d JOIN ws USING (doc_id)),
        |bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM toks, unnest(range(1, greatest(len(w), 1))) t(i)),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_c FROM bc GROUP BY 1),
        |sig AS (
        |  SELECT ws.doc_id, ws.n_words,
        |    CASE WHEN ws.n_words = 0 THEN 0.0
        |         ELSE 1.0 - ws.n_distinct / ws.n_words END AS dup_word_frac,
        |    coalesce(bs.max_c::DOUBLE / bs.n_bigrams, 0.0) AS top_bigram_frac,
        |    m.mwl, m.alpha_ratio, m.stop_ratio
        |  FROM ws JOIN meta m USING (doc_id) LEFT JOIN bs USING (doc_id))
        |SELECT doc_id, n_words, reasons, reasons = 0 AS keep FROM (
        |  SELECT doc_id, n_words,
        |    (CASE WHEN n_words < 30 OR n_words > 100000 THEN 1 ELSE 0 END
        |     + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 2 ELSE 0 END
        |     + CASE WHEN alpha_ratio < 0.8 THEN 4 ELSE 0 END
        |     + CASE WHEN stop_ratio < 0.01 THEN 8 ELSE 0 END
        |     + CASE WHEN dup_word_frac > 0.65 THEN 16 ELSE 0 END
        |     + CASE WHEN top_bigram_frac > 0.2 THEN 32 ELSE 0 END)::BIGINT AS reasons
        |  FROM sig)
        |ORDER BY doc_id""".stripMargin,
    "pipe_length_histogram" ->
      """SELECT CAST(floor(length(text) / 100) * 100 AS BIGINT) AS bucket_lo,
        |  count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY bucket_lo""".stripMargin,
    "pipe_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
        |  FROM documents),
        |freqs AS (SELECT t, count(*) AS tf FROM toks GROUP BY t),
        |tot AS (SELECT count(*) AS total FROM toks)
        |SELECT doc_id, count(*) AS n_tok,
        |  round(sum(log10(tf)) / count(*) - log10(total), 4) AS lm_score
        |FROM toks JOIN freqs USING (t), tot
        |GROUP BY doc_id, total ORDER BY doc_id""".stripMargin,
    // Interpolated bigram LM: parallel unnests of the token array and
    // its tail zip element-wise in DuckDB, mirroring the Spark side's
    // zip_with pair stream; both engines collapse to per-(doc,p,t)
    // integer counts first so every probability is a ratio of the
    // SAME integers, and the λ weights are the literal doubles
    // 0.7/0.3 on both sides (1−λ at runtime is a different double).
    "pipe_classifier_quality" -> classifierQualityOracleSql,
    // the pipe_lm_bigram score CTEs + per-language quantile_cont
    // thresholds (≡ the exactPercentiles rank kernel, the q17
    // contract); strict > on identical round(4) doubles, so the
    // exact-threshold tie rule replays bit-for-bit
    "pipe_lm_buckets" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS l
        |  FROM documents),
        |big AS (
        |  SELECT doc_id,
        |    unnest(l[1:len(l)-1]) AS p,
        |    unnest(l[2:len(l)]) AS t
        |  FROM docs WHERE len(l) >= 2),
        |db AS (SELECT doc_id, p, t, count(*) AS c FROM big GROUP BY doc_id, p, t),
        |bf AS (SELECT p, t, sum(c) AS cb FROM db GROUP BY p, t),
        |pt AS (SELECT p, sum(cb) AS cp FROM bf GROUP BY p),
        |uf AS (SELECT t, count(*) AS tf
        |  FROM (SELECT unnest(l) AS t FROM docs) GROUP BY t),
        |tot AS (SELECT sum(tf) AS total FROM uf),
        |sc AS (
        |  SELECT doc_id,
        |    round(sum(c * log10(0.7e0 * (cb::DOUBLE / cp::DOUBLE)
        |      + 0.3e0 * (tf::DOUBLE / total::DOUBLE))) / sum(c), 4) AS lmb_score
        |  FROM db JOIN bf USING (p, t) JOIN pt USING (p) JOIN uf USING (t), tot
        |  GROUP BY doc_id),
        |wl AS (
        |  SELECT s.doc_id, d.lang, s.lmb_score
        |  FROM sc s JOIN documents d USING (doc_id)),
        |th AS (
        |  SELECT lang,
        |    round(quantile_cont(lmb_score, 0.3333333333333333), 4) AS t_lo,
        |    round(quantile_cont(lmb_score, 0.6666666666666666), 4) AS t_hi
        |  FROM wl GROUP BY lang)
        |SELECT doc_id, lang, lmb_score,
        |  CASE WHEN lmb_score > t_hi THEN 'head'
        |       WHEN lmb_score > t_lo THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM wl JOIN th USING (lang) ORDER BY doc_id""".stripMargin,
    "pipe_lm_bigram" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS l
        |  FROM documents),
        |big AS (
        |  SELECT doc_id,
        |    unnest(l[1:len(l)-1]) AS p,
        |    unnest(l[2:len(l)]) AS t
        |  FROM docs WHERE len(l) >= 2),
        |db AS (SELECT doc_id, p, t, count(*) AS c FROM big GROUP BY doc_id, p, t),
        |bf AS (SELECT p, t, sum(c) AS cb FROM db GROUP BY p, t),
        |pt AS (SELECT p, sum(cb) AS cp FROM bf GROUP BY p),
        |uf AS (SELECT t, count(*) AS tf
        |  FROM (SELECT unnest(l) AS t FROM docs) GROUP BY t),
        |tot AS (SELECT sum(tf) AS total FROM uf)
        |SELECT doc_id, sum(c)::BIGINT AS n_big,
        |  round(sum(c * log10(0.7e0 * (cb::DOUBLE / cp::DOUBLE)
        |    + 0.3e0 * (tf::DOUBLE / total::DOUBLE))) / sum(c), 4) AS lmb_score
        |FROM db JOIN bf USING (p, t) JOIN pt USING (p) JOIN uf USING (t), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same md5-derived hash threshold as TextAnalysis.pipeTrainMix;
    // Frame over floor-second epochs — the largest timestamp precision
    // both engines agree on exactly (parquet is TIMESTAMP(NANOS);
    // Spark truncates to micros on read). RANGE includes ties on both.
    "q49_time_rolling" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS trail7d_events,
        |  round(sum(value) OVER w, 2) AS trail7d_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // contiguous packing: bin = floor(start_offset / seqLen) within a
    // per-shard doc_id-ordered running token sum
    "pipe_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok,
        |         doc_id % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT shard, n_tok,
        |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT shard, ((cum - n_tok) // 2048)::BIGINT AS bin,
        |  count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  round(sum(n_tok) / 2048.0, 4) AS fill
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // hash-random shard + within-shard md5-key order; the checksum is
    // order-sensitive so the oracle verifies the permutation itself
    "pipe_corpus_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok,
        |         md5(doc_id || ':42') AS skey,
        |         ('0x' || substring(md5(doc_id || ':42'), 1, 15))::BIGINT % 8 AS shard
        |  FROM documents),
        |p AS (
        |  SELECT shard, doc_id, n_tok,
        |         row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS pos
        |  FROM keyed)
        |SELECT shard, count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  sum(pos * (doc_id % 1000003))::BIGINT AS perm_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin,
    // shuffle-then-pack: the pack_sequences bin walk in md5-key order
    // within hash-random shards
    "pipe_shuffle_pack" ->
      """WITH keyed AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok,
        |         md5(doc_id || ':42') AS skey,
        |         ('0x' || substring(md5(doc_id || ':42'), 1, 15))::BIGINT % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT shard, n_tok,
        |    sum(n_tok) OVER (PARTITION BY shard ORDER BY skey, doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM keyed)
        |SELECT shard, ((cum - n_tok) // 2048)::BIGINT AS bin,
        |  count(*) AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  round(sum(n_tok) / 2048.0, 4) AS fill
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // q ∝ p^alpha temperature flattening; all scalar arithmetic
    "pipe_lang_sampling_weights" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT sum(n_docs) AS n_total FROM c),
        |f AS (SELECT lang, n_docs, n_docs / n_total AS p,
        |             pow(n_docs / n_total, 0.3) AS p_alpha FROM c, t),
        |z AS (SELECT sum(p_alpha) AS z FROM f)
        |SELECT lang, n_docs, round(p, 6) AS p,
        |  round(p_alpha / z, 6) AS q,
        |  round(p_alpha / z / p, 6) AS weight
        |FROM f, z ORDER BY lang""".stripMargin,
    // the rate table is inlined as VALUES.
    "pipe_train_mix" ->
      """WITH rates(lang, rate) AS (VALUES ('en', 0.25), ('de', 0.5), ('fr', 0.5)),
        |t AS (
        |  SELECT d.doc_id, d.lang,
        |    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || d.lang), 1, 15))::BIGINT % 1000000 AS bucket,
        |    coalesce(r.rate, 1.0) AS rate
        |  FROM documents d LEFT JOIN rates r ON d.lang = r.lang)
        |SELECT doc_id, lang, bucket FROM t
        |WHERE bucket < rate * 1000000 ORDER BY doc_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
        | round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q5_semi_join" ->
      """SELECT o_orderpriority, count(*) AS cnt
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_mktsegment, count(*) AS cnt
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q7_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM lineitem WHERE l_suppkey <= 10
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q8_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q9_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q10_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q11_case_agg" ->
      """SELECT l_linestatus,
        | count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_cnt,
        | count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q12_having" ->
      """SELECT l_suppkey, count(*) AS cnt,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 500
        |ORDER BY l_suppkey""".stripMargin,
    "q13_events_window" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS cnt, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_union" ->
      """SELECT o_orderstatus, count(*) AS cnt FROM (
        | SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
        | UNION ALL
        | SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        |) GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q16_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q17_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18_stats" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_discount), 6) AS var_disc,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q19_strings" ->
      """SELECT doc_id,
        | upper(substr(text, 1, 10)) AS head10,
        | lang || '-' || source AS tag,
        | length(regexp_replace(text, '[aeiou]', '', 'g')) AS consonant_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q20_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q21_asof_latest" ->
      """SELECT user_id, event_type AS last_type, round(value, 2) AS last_value
        |FROM (SELECT user_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE ts < TIMESTAMP '2024-01-15')
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "sim_bruteforce_topk" -> bruteforceTopkOracleSql,
    // recall eval is a pure composition of two already-hash-verified
    // formulations: both sides replay EXACTLY in SQL (the IVF oracle
    // is linear — unlike dedup_eval's quadratic exact-truth side),
    // so the eval row itself is hash-verified, not flag-verified
    "sim_eval" ->
      s"""WITH exactq AS (SELECT qid, vec_id FROM ($bruteforceTopkOracleSql)),
         |annq AS (SELECT qid, vec_id FROM (${ivfOracleSql(nQueries = 5, k = 10, nprobe = 4)}))
         |SELECT n_exact, n_ann, n_hit,
         |  CASE WHEN n_exact = 0 THEN 0.0
         |       ELSE round(n_hit::DOUBLE / n_exact, 4) END AS recall
         |FROM (SELECT count(*)::BIGINT AS n_exact FROM exactq),
         |     (SELECT count(*)::BIGINT AS n_ann FROM annq),
         |     (SELECT count(*)::BIGINT AS n_hit FROM
         |        (SELECT * FROM annq INTERSECT SELECT * FROM exactq))""".stripMargin,
    "sim_knn_graph" -> knnGraphOracleSql(k = 10, iters = 3),
    "sim_graph_search" -> graphSearchOracleSql(nQueries = 5, k = 10, beam = 20,
      hops = 3, graphK = 10, graphIters = 3),
    "sim_graph_search_filtered" -> graphSearchOracleSql(nQueries = 5, k = 10,
      beam = 20, hops = 3, graphK = 10, graphIters = 3, allowedLang = Some("en")),
    "sim_hard_negatives" -> graphSearchOracleSql(nQueries = 5, k = 10,
      beam = 20, hops = 3, graphK = 10, graphIters = 3, band = Some((0.3, 0.6))),
    "sim_hard_negatives_filtered" -> graphSearchOracleSql(nQueries = 5, k = 10,
      beam = 20, hops = 3, graphK = 10, graphIters = 3,
      allowedLang = Some("en"), band = Some((0.3, 0.6))),
    "sim_graph_search_heldout" -> graphSearchHeldOutOracleSql(nQueries = 5,
      k = 10, beam = 20, hops = 3, graphK = 10, graphIters = 3),
    "sim_graph_search_segment" -> graphSearchSegmentOracleSql(lang = "en",
      nQueries = 5, k = 10, beam = 20, hops = 3, graphK = 10, graphIters = 3),
    "sim_knn_graph_incremental" ->
      knnGraphIncrementalOracleSql(k = 10, iters = 3, appendIters = 3),
    "sim_knn_components" -> knnComponentsOracleSql(k = 10, iters = 3, tau = 0.4),
    "sim_knn_label_prop" -> knnLabelPropOracleSql(k = 10, iters = 3, rounds = 4),
    "sim_knn_diversity" -> knnDiversityOracleSql(k = 10, iters = 3, tau = 0.4, rounds = 8),
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        | length(text) AS chars,
        | len(regexp_extract_all(text, '\S+')) AS words,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        | round(len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1), 4) AS alpha_ratio,
        | round(len(regexp_extract_all(text, '[.,;:!?]')) / greatest(length(text), 1), 4) AS punct_ratio,
        | round(len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b'))
        |   / greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 37 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q23_stratified" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, rn FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber,
        |   row_number() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 100 ORDER BY l_returnflag, rn""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
        | length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Composes the pipe_quality_filter predicate with the dedup_exact
    // keeper set (min doc_id per identical text).
    "pipe_e2e" ->
      """WITH kept AS (
        |  SELECT doc_id FROM documents
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 30
        |    AND len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) >= 0.6),
        |keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
        |SELECT lang, source, count(*) AS n_docs, sum(length(text))::BIGINT AS total_chars
        |FROM documents JOIN kept USING (doc_id) JOIN keepers USING (doc_id)
        |GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,
    "pipe_quality_filter" ->
      """SELECT doc_id,
        | len(regexp_extract_all(text, '\S+')) AS words,
        | round(len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1), 4) AS alpha_ratio
        |FROM documents
        |WHERE len(regexp_extract_all(text, '\S+')) >= 30
        |  AND len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) >= 0.6
        |ORDER BY doc_id""".stripMargin,
    // the planted contact line is a closed-form function of doc_id, so
    // both engines synthesize the identical raw string; the scrub fp is
    // md5 over the identically-redacted text
    "pipe_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      text || ' contact user' || doc_id || '@example.com from 10.' ||
        |      (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 200 + 1)
        |    ELSE text END AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips,
        |  md5(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS clean_fp
        |FROM raw ORDER BY doc_id""".stripMargin,
    // unigram Shannon entropy: the oracle recomputes the count table
    // per doc and sums -(c/n)·log2(c/n); both sides round(4) the
    // double (summation-order drift is ~1e-15, far under the round)
    "text_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')) AS t
        |  FROM documents),
        |cnt AS (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n, count(*) AS n_types FROM cnt GROUP BY 1),
        |ent AS (
        |  SELECT c.doc_id, sum(-(c.c / t.n) * log2(c.c / t.n)) AS h
        |  FROM cnt c JOIN tot t USING (doc_id) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(t.n, 0)::BIGINT AS n_tokens,
        |  coalesce(t.n_types, 0)::BIGINT AS n_types,
        |  round(coalesce(e.h, 0), 4) AS entropy,
        |  round(coalesce(CASE WHEN t.n_types <= 1 THEN 0 ELSE e.h / log2(t.n_types) END, 0), 4) AS norm_entropy
        |FROM documents d LEFT JOIN tot t USING (doc_id) LEFT JOIN ent e USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // chunk starts are every 48 tokens while < n_tokens (one empty
    // chunk for an empty token list); the md5 of the space-joined
    // window certifies the chunk PAYLOAD, not just its size
    "pipe_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS w
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 48)) AS start FROM toks)
        |SELECT doc_id, (start // 48)::BIGINT AS chunk_id,
        |  least(len(w) - start, 64)::BIGINT AS n_tokens,
        |  md5(array_to_string(w[CAST(start + 1 AS INT):CAST(start + 64 AS INT)], ' ')) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,
    // keeper = min packed (doc_id, chunk_id) per payload md5 — the
    // skew-safe arg-min both engines compute identically
    "pipe_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS w
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, w, unnest(range(0, greatest(len(w), 1), 64)) AS start FROM toks),
        |ch AS (
        |  SELECT doc_id, (start // 64)::BIGINT AS chunk_id,
        |    md5(array_to_string(w[CAST(start + 1 AS INT):CAST(start + 64 AS INT)], ' ')) AS chunk_md5
        |  FROM st),
        |k AS (SELECT chunk_md5, min(doc_id) AS kd FROM ch GROUP BY 1),
        |k2 AS (
        |  SELECT c.chunk_md5, m.kd, min(c.chunk_id) AS kc
        |  FROM ch c JOIN k m ON c.chunk_md5 = m.chunk_md5 AND c.doc_id = m.kd
        |  GROUP BY 1, 2)
        |SELECT doc_id, chunk_id, chunk_md5,
        |  NOT (doc_id = kd AND chunk_id = kc) AS is_dup
        |FROM ch JOIN k2 USING (chunk_md5)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    // the oracle is the NAIVE global running-sum prefix; the Spark
    // side reaches the same set via bin-threshold search (equal
    // because bins are monotone in the sort key)
    "pipe_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, len(w) AS n_tokens,
        |    len(list_distinct(w)) / greatest(len(w), 1) AS q
        |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS w
        |        FROM documents)),
        |c AS (
        |  SELECT doc_id, n_tokens, q,
        |    sum(n_tokens) OVER (ORDER BY q DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT doc_id, n_tokens::BIGINT AS n_tokens, round(q, 4) AS quality
        |FROM c WHERE cum <= (SELECT (sum(n_tokens) // 2)::BIGINT FROM d)
        |ORDER BY doc_id""".stripMargin,
    // mergeable-histogram quantile contract: the oracle replays the
    // partial→merge→cumulative walk AND the exact tie-stable discrete
    // percentile, expecting the bin-containment flag true
    "pipe_quantile_rollup" ->
      """WITH part AS (
        |  SELECT lang, source, n_chars // 256 AS bin, count(*) AS cnt
        |  FROM documents GROUP BY 1, 2, 3),
        |merged AS (SELECT lang, bin, sum(cnt) AS cnt FROM part GROUP BY 1, 2),
        |cums AS (
        |  SELECT lang, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY lang) AS total
        |  FROM merged),
        |approx AS (
        |  SELECT lang, max(total) AS total,
        |    min(CASE WHEN cum >= ceil(total * 0.5) THEN bin END) AS p50_bin,
        |    min(CASE WHEN cum >= ceil(total * 0.95) THEN bin END) AS p95_bin
        |  FROM cums GROUP BY 1),
        |ranked AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS total
        |  FROM documents),
        |exact AS (
        |  SELECT lang,
        |    min(CASE WHEN rk = ceil(total * 0.5) THEN n_chars END) AS p50_exact,
        |    min(CASE WHEN rk = ceil(total * 0.95) THEN n_chars END) AS p95_exact
        |  FROM ranked GROUP BY 1)
        |SELECT a.lang, a.total::BIGINT AS total,
        |  (p50_bin * 256)::BIGINT AS p50_lo, (p95_bin * 256)::BIGINT AS p95_lo,
        |  p50_exact, p95_exact,
        |  (p50_exact >= p50_bin * 256 AND p50_exact < (p50_bin + 1) * 256
        |   AND p95_exact >= p95_bin * 256 AND p95_exact < (p95_bin + 1) * 256) AS ok
        |FROM approx a JOIN exact e USING (lang)
        |ORDER BY lang""".stripMargin,
    // the oracle replays maximal-munch BPE encode against the SAME
    // frozen vocab (inlined as VALUES, like the minhash permutations):
    // a per-(word, position) longest-match table, then a recursive CTE
    // walks each word position-by-position; the positional checksum
    // certifies the full token SEQUENCE, not just counts
    "pipe_tokenize" ->
      s"""WITH RECURSIVE vocab(id, tok) AS (
        |  SELECT * FROM (VALUES $bpeVocabSql) v(id, tok)
        |),
        |words AS (
        |  SELECT doc_id, i AS wi, ws[i] AS w
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i
        |        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws
        |              FROM documents))
        |  WHERE length(ws[i]) > 0
        |),
        |pos AS (
        |  SELECT doc_id, wi, w, unnest(range(1, length(w)+1)) AS p FROM words
        |),
        |m AS (
        |  SELECT p.doc_id, p.wi, p.p,
        |         coalesce(max_by(v.id, length(v.tok)), -1) AS tid,
        |         coalesce(max(length(v.tok)), 1) AS mlen
        |  FROM pos p LEFT JOIN vocab v
        |    ON substr(p.w, CAST(p.p AS INT), length(v.tok)) = v.tok
        |  GROUP BY p.doc_id, p.wi, p.p
        |),
        |steps(doc_id, wi, p, tid, mlen) AS (
        |  SELECT doc_id, wi, p, tid, mlen FROM m WHERE p = 1
        |  UNION ALL
        |  SELECT m2.doc_id, m2.wi, m2.p, m2.tid, m2.mlen
        |  FROM steps s JOIN m m2
        |    ON m2.doc_id = s.doc_id AND m2.wi = s.wi AND m2.p = s.p + s.mlen
        |),
        |ord AS (
        |  SELECT doc_id, tid,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY wi, p) AS o
        |  FROM steps
        |)
        |SELECT d.doc_id,
        |  coalesce(t.n_tokens, 0)::BIGINT AS n_tokens,
        |  coalesce(t.n_unk, 0)::BIGINT AS n_unk,
        |  coalesce(t.sum_ids, 0)::BIGINT AS sum_ids,
        |  coalesce(t.checksum, 0)::BIGINT AS checksum
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         sum(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS n_unk,
        |         sum(tid) AS sum_ids,
        |         sum(o * tid) AS checksum
        |  FROM ord GROUP BY doc_id) t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "pipe_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        | sum(length(text))::BIGINT AS total_chars,
        | sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS total_words,
        | round(avg(length(text)), 4) AS avg_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, strlen(text) AS size_bytes, substr(text, 1, 16) AS head
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Mirrors the stub codec's byte arithmetic: the corpus is pure
    // ASCII, so DuckDB per-char codepoints ARE the UTF-8 payload bytes.
    "mm_decode" ->
      ("""WITH b AS (
        |  SELECT doc_id, unicode(substr(text, CAST(i AS INT), 1)) % 16 AS bin
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)
        |),
        |h AS (
        |  SELECT doc_id, """.stripMargin
        + (0 until 16).map(j => s"sum(CASE WHEN bin = $j THEN 1 ELSE 0 END)::BIGINT AS f$j").mkString(", ")
        + """
        |  FROM b GROUP BY doc_id
        |)
        |SELECT d.doc_id, strlen(d.text)::BIGINT AS size_bytes,
        |  CASE WHEN strlen(d.text) >= 2 AND unicode(substr(d.text,1,1)) = 255
        |            AND unicode(substr(d.text,2,1)) = 216 THEN 'jpeg'
        |       WHEN strlen(d.text) >= 4 AND unicode(substr(d.text,1,1)) = 137
        |            AND substr(d.text,2,1) = 'P' THEN 'png'
        |       ELSE 'raw' END AS format,
        |  """.stripMargin
        + (0 until 16).map(j => s"h.f$j").mkString(", ")
        + """
        |FROM documents d JOIN h USING (doc_id) ORDER BY d.doc_id""".stripMargin),
    // the PNG rows' expected decode output in closed form (the payload
    // pixels are a deterministic function of doc_id — see
    // Multimodal.pngBytes); the raw rows mirror the stub byte-sum
    "mm_decode_real" ->
      """WITH png AS (
        |  SELECT doc_id, 4 + doc_id % 8 AS w, 4 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |grid AS (
        |  SELECT p.doc_id, p.w, p.h, a.x, b.y
        |  FROM png p
        |  CROSS JOIN range(0, 12) a(x) CROSS JOIN range(0, 9) b(y)
        |  WHERE a.x < p.w AND b.y < p.h
        |),
        |pngrows AS (
        |  SELECT doc_id, 'png' AS format,
        |         min(w)::BIGINT AS width, min(h)::BIGINT AS height,
        |         sum((x + doc_id) % 256)::BIGINT AS sum_r,
        |         sum((y + 2*doc_id) % 256)::BIGINT AS sum_g,
        |         sum((x + y + 3*doc_id) % 256)::BIGINT AS sum_b,
        |         count(*)::BIGINT AS n_px
        |  FROM grid GROUP BY doc_id
        |),
        |rawrows AS (
        |  SELECT doc_id, 'raw' AS format, 0::BIGINT AS width, 0::BIGINT AS height,
        |         sum(unicode(substr(text, CAST(i AS INT), 1)))::BIGINT AS sum_r,
        |         0::BIGINT AS sum_g, 0::BIGINT AS sum_b,
        |         max(strlen(text))::BIGINT AS n_px
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i
        |        FROM documents WHERE doc_id % 5 <> 0)
        |  GROUP BY doc_id
        |)
        |SELECT * FROM pngrows UNION ALL SELECT * FROM rawrows ORDER BY doc_id""".stripMargin,
    // the WAV rows' expected decode output in closed form (PCM samples
    // are a deterministic function of doc_id — see Multimodal.wavBytes;
    // PCM is lossless so the JDK decoder must recover them exactly);
    // raw rows mirror the stub byte-sum. n_bytes is PCM data length
    // (2·n_samples) for audio rows, so no RIFF container knowledge
    // leaks into the oracle.
    "mm_decode_wav" ->
      """WITH wav AS (
        |  SELECT doc_id, 16 + doc_id % 16 AS n, 1 + doc_id % 7 AS step
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |samples AS (
        |  SELECT w.doc_id, ((s.i * w.step * 257 + w.doc_id) % 65536) - 32768 AS v
        |  FROM wav w CROSS JOIN range(0, 32) s(i) WHERE s.i < w.n
        |),
        |wavrows AS (
        |  SELECT doc_id, 'wav' AS format, count(*)::BIGINT AS n_samples,
        |         sum(v)::BIGINT AS sum_s, min(v)::BIGINT AS min_s,
        |         max(v)::BIGINT AS max_s, (2 * count(*))::BIGINT AS n_bytes
        |  FROM samples GROUP BY doc_id
        |),
        |rawrows AS (
        |  SELECT doc_id, 'raw' AS format, 0::BIGINT AS n_samples,
        |         sum(unicode(substr(text, CAST(i AS INT), 1)))::BIGINT AS sum_s,
        |         0::BIGINT AS min_s, 0::BIGINT AS max_s,
        |         max(strlen(text))::BIGINT AS n_bytes
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i
        |        FROM documents WHERE doc_id % 5 <> 0)
        |  GROUP BY doc_id
        |)
        |SELECT * FROM wavrows UNION ALL SELECT * FROM rawrows ORDER BY doc_id""".stripMargin,
    // windowed DSP features from the same closed-form PCM: integer
    // energy / zero crossings / peak per 8-sample window — the codec
    // path is lossless, so the oracle needs no codec at all
    "mm_audio_features" ->
      """WITH wav AS (
        |  SELECT doc_id, 16 + doc_id % 16 AS n, 1 + doc_id % 7 AS step
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |samples AS (
        |  SELECT w.doc_id, CAST(s.i AS BIGINT) AS i,
        |         ((s.i * w.step * 257 + w.doc_id) % 65536) - 32768 AS v
        |  FROM wav w CROSS JOIN range(0, 32) s(i) WHERE s.i < w.n
        |),
        |wins AS (
        |  SELECT doc_id, i // 8 AS win, v,
        |         lag(v) OVER (PARTITION BY doc_id, i // 8 ORDER BY i) AS pv
        |  FROM samples
        |)
        |SELECT doc_id, win, count(*)::BIGINT AS n, sum(v * v)::BIGINT AS sum_sq,
        |  sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END)::BIGINT AS zc,
        |  max(abs(v))::BIGINT AS peak
        |FROM wins GROUP BY doc_id, win ORDER BY doc_id, win""".stripMargin,
    // per-scanline image features from the same closed-form pixels:
    // channel sums + horizontal |Δr| gradient energy — PNG is
    // lossless, so the oracle needs no codec at all
    "mm_image_features" ->
      """WITH png AS (
        |  SELECT doc_id, 4 + doc_id % 8 AS w, 4 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |px AS (
        |  SELECT p.doc_id, b.y, a.x,
        |         (a.x + p.doc_id) % 256 AS r,
        |         (b.y + 2*p.doc_id) % 256 AS g,
        |         (a.x + b.y + 3*p.doc_id) % 256 AS b
        |  FROM png p
        |  CROSS JOIN range(0, 12) a(x) CROSS JOIN range(0, 9) b(y)
        |  WHERE a.x < p.w AND b.y < p.h
        |),
        |gd AS (
        |  SELECT doc_id, y, r, g, b,
        |         abs(r - lag(r) OVER (PARTITION BY doc_id, y ORDER BY x)) AS d
        |  FROM px
        |)
        |SELECT doc_id, y::BIGINT AS y,
        |  sum(r)::BIGINT AS sum_r, sum(g)::BIGINT AS sum_g, sum(b)::BIGINT AS sum_b,
        |  coalesce(sum(d), 0)::BIGINT AS grad_r
        |FROM gd GROUP BY doc_id, y ORDER BY doc_id, y""".stripMargin,
    // dHash63 replayed from the closed-form pixel formula (the
    // mm_decode_real discipline — PNG is lossless, so the Spark side's
    // decoded grays must equal the formula's): the 8×9 sample grid,
    // gray = r+g+b, bit(i,j) = left > right, bit 63 kept clear (1<<63
    // overflows DuckDB's shift). near_keeper brute-forces the
    // DISTINCT-hash rep join the Spark side reaches via banding —
    // equal because pigeonhole banding is lossless at hamming <= 3.
    "mm_image_dedup" ->
      """WITH img AS (
        |  SELECT doc_id, 4 + doc_id % 8 AS w, 4 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 5 = 0),
        |grid AS (
        |  SELECT doc_id, (j * w) // 9 AS xl, ((j + 1) * w) // 9 AS xr,
        |         (i * h) // 8 AS y, i, j
        |  FROM img CROSS JOIN range(0, 8) a(i) CROSS JOIN range(0, 8) b(j)
        |  WHERE NOT (i = 7 AND j = 7)),
        |bits AS (
        |  SELECT doc_id,
        |    CASE WHEN ((xl + doc_id) % 256 + (y + 2*doc_id) % 256 + (xl + y + 3*doc_id) % 256)
        |           > ((xr + doc_id) % 256 + (y + 2*doc_id) % 256 + (xr + y + 3*doc_id) % 256)
        |         THEN (1::BIGINT << CAST(i*8 + j AS INT)) ELSE 0 END AS bit
        |  FROM grid),
        |hashes AS (SELECT doc_id, sum(bit)::BIGINT AS dh FROM bits GROUP BY 1),
        |keep AS (SELECT dh, min(doc_id) AS keeper FROM hashes GROUP BY 1),
        |nk AS (
        |  SELECT a.dh, min(b.keeper) AS near_keeper
        |  FROM keep a JOIN keep b ON bit_count(xor(a.dh, b.dh)) <= 3
        |  GROUP BY 1)
        |SELECT h.doc_id, h.dh, k.keeper, n.near_keeper,
        |  h.doc_id <> k.keeper AS is_dup
        |FROM hashes h JOIN keep k USING (dh) JOIN nk n ON n.dh = h.dh
        |ORDER BY h.doc_id""".stripMargin,
    // winnowing on the md5-60 family: window minima over the n-gram
    // hash sequence, then distinct — the scheme itself (not just the
    // library column) oracle-checked end to end
    "text_winnow" ->
      """WITH hs AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(length(text) - 7, 1) + 1),
        |      i -> ('0x' || substr(md5(substr(lower(text), CAST(i AS INT), 8)), 1, 15))::BIGINT) AS h
        |  FROM documents
        |),
        |fps AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(0, greatest(len(h) - 4, 0) + 1),
        |      i -> list_aggregate(h[CAST(i + 1 AS INT):CAST(i + 4 AS INT)], 'min'))) AS fp
        |  FROM hs
        |)
        |SELECT doc_id, len(fp)::BIGINT AS n_fp,
        |       list_aggregate(fp, 'min') AS min_fp,
        |       list_aggregate(fp, 'max') AS max_fp
        |FROM fps ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      ("""WITH b AS (
        |  SELECT doc_id, CAST((i-1)//64 AS BIGINT) AS frame_idx,
        |         unicode(substr(text, CAST(i AS INT), 1)) % 4 AS bin
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i FROM documents)
        |),
        |frames AS (
        |  SELECT doc_id, frame_idx, """.stripMargin
        + (0 until 4).map(j => s"sum(CASE WHEN bin = $j THEN 1 ELSE 0 END)::BIGINT AS c$j").mkString(", ")
        + """
        |  FROM b WHERE frame_idx % 4 = 0 GROUP BY doc_id, frame_idx
        |)
        |SELECT doc_id, frame_idx, count(*) OVER (PARTITION BY doc_id)::BIGINT AS n_frames,
        |       c0, c1, c2, c3
        |FROM frames ORDER BY doc_id, frame_idx""".stripMargin),
    // the GIF frames' expected decode output in closed form (per-frame
    // pixels are a deterministic function of doc_id — see
    // Multimodal.gifBytes; the grayscale palette is an identity map,
    // so GIF's palette indirection is lossless); raw rows mirror the
    // 64-byte block framing with a per-block byte sum
    "mm_frame_sample_gif" ->
      """WITH gif AS (
        |  SELECT doc_id, 2 + doc_id % 4 AS nf, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 5 = 0
        |),
        |gifrows AS (
        |  SELECT g.doc_id, f.f AS frame_idx, 'gif' AS format, g.nf::BIGINT AS n_frames,
        |         g.w::BIGINT AS width, g.h::BIGINT AS height,
        |         sum((x.x + 3 * y.y + 5 * f.f + g.doc_id) % 256)::BIGINT AS sum_px
        |  FROM gif g
        |  CROSS JOIN range(0, 5) f(f)
        |  CROSS JOIN range(0, 8) x(x)
        |  CROSS JOIN range(0, 6) y(y)
        |  WHERE f.f < g.nf AND f.f % 2 = 0 AND x.x < g.w AND y.y < g.h
        |  GROUP BY g.doc_id, f.f, g.nf, g.w, g.h
        |),
        |rawrows AS (
        |  SELECT doc_id, b AS frame_idx, 'raw' AS format,
        |         max(nb)::BIGINT AS n_frames, 0::BIGINT AS width, 0::BIGINT AS height,
        |         sum(cp)::BIGINT AS sum_px
        |  FROM (
        |    SELECT doc_id, CAST((i-1)//64 AS BIGINT) AS b,
        |           CAST(ceil(length(text) / 64.0) AS BIGINT) AS nb,
        |           unicode(substr(text, CAST(i AS INT), 1)) AS cp
        |    FROM (SELECT doc_id, text, unnest(range(1, length(text)+1)) AS i
        |          FROM documents WHERE doc_id % 5 <> 0))
        |  WHERE b % 4 = 0
        |  GROUP BY doc_id, b
        |)
        |SELECT * FROM gifrows UNION ALL SELECT * FROM rawrows
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "ml_feature_vectorize" ->
      """SELECT l_orderkey, l_linenumber,
        | (1 + CASE WHEN l_discount <> 0 THEN 1 ELSE 0 END
        |    + CASE WHEN l_tax <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_active
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // Partial contract (q15/q24 pattern): exact key set + the two
    // Spark-computed flags asserted TRUE; exact tree semantics pinned
    // by the flight-delay spec.
    "ml_train_predict" ->
      """SELECT l_orderkey, l_linenumber, TRUE AS has_prediction, TRUE AS rmse_ok
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q15_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts, TRUE AS within_2pct
        |FROM lineitem""".stripMargin,
    "q24_approx_percentile" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
        |  TRUE AS within_1pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_salted_join" ->
      """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty, l_extendedprice FROM lineitem),
        |dim AS (SELECT DISTINCT qty,
        |          CASE WHEN qty >= 25 THEN 'high' ELSE 'low' END AS qty_tier FROM li)
        |SELECT qty_tier, count(*) AS cnt, round(sum(l_extendedprice), 2) AS total
        |FROM li JOIN dim USING (qty)
        |GROUP BY qty_tier ORDER BY qty_tier""".stripMargin,
    // Explicit QUALIFY instead of DuckDB's ASOF JOIN: ASOF leaves the
    // tie among equal-timestamp clicks unspecified, while the Spark
    // window deterministically takes the max-event_id click — the
    // oracle must encode the same tie-break. All time comparisons go
    // through epoch_us: DuckDB sees nanosecond timestamps, Spark sees
    // microsecond-truncated ones, so ranking at raw precision could
    // order same-microsecond clicks differently.
    "q26_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  round(p.value, 2) AS purchase_value,
        |  round(c.value, 2) AS last_click_value,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_s
        |FROM p JOIN c ON p.user_id = c.user_id AND epoch_us(c.ts) <= epoch_us(p.ts)
        |QUALIFY row_number() OVER (PARTITION BY p.event_id
        |  ORDER BY epoch_us(c.ts) DESC, c.event_id DESC) = 1
        |ORDER BY p.event_id""".stripMargin,
    "q27_range_join" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (1, 1.0, 9.0), (2, 10.0, 24.0), (3, 25.0, 39.0), (4, 40.0, 50.0))
        |SELECT band_id, count(*) AS cnt, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN bands ON l_quantity BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,
    "q28_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM e)
        |SELECT user_id, sess_seq, count(*) AS n_events, round(sum(value), 2) AS sess_value,
        |  CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, sess_seq ORDER BY user_id, sess_seq""".stripMargin,
    // Full sign-LSH multi-probe replica: the deterministic hyperplanes
    // and probe masks are INLINED as literals (Double.toString
    // round-trips exactly, so DuckDB computes the identical bucket
    // bits), then candidates/cosine/rank mirror the Spark plan.
    "sim_lsh_ann" -> lshOracleSql(nQueries = 5, k = 10, numPlanes = 6, dim = 64),
    "sim_lsh_multitable" -> lshMultiTableOracleSql(
      nQueries = 5, k = 10, numPlanes = 5, dim = 64, nTables = 8),
    "sim_ivf_ann" -> ivfOracleSql(nQueries = 5, k = 10, nprobe = 4),
    // identical output contract to sim_ivf_ann (same codebook, same
    // tie order) probed against the persisted partitioned index —
    // shares the generated oracle verbatim, the persisted-state
    // pattern dedup_incremental_persisted established
    "sim_ivf_ann_persisted" -> ivfOracleSql(nQueries = 5, k = 10, nprobe = 4),
    // build+append must be indistinguishable from built-with-it:
    // shares the inline operator's oracle verbatim
    "sim_ivf_ann_incremental" -> ivfOracleSql(nQueries = 5, k = 10, nprobe = 4),
    // forget must be indistinguishable from never-ingested: same
    // oracle with the corpus (assign) side filtered; queries still
    // come from the full set — a deleted user can still search
    "sim_ivf_ann_forget" ->
      ivfOracleSql(nQueries = 5, k = 10, nprobe = 4, corpusCond = "vec_id % 10 <> 0"),
    // the SQ8-served path re-ranks exactly, recovering the same top-k
    "sim_ivf_sq8" -> ivfOracleSql(nQueries = 5, k = 10, nprobe = 4),
    // the PQ-served path likewise re-ranks exactly from a 32× candidate
    // margin (8-byte codes are far coarser than SQ8's 64)
    "sim_ivf_pq" -> ivfOracleSql(nQueries = 5, k = 10, nprobe = 4),
    "text_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Same shingle/threshold math as Dedup.dedupNgramJaccard (n=12,
    // tau=0.8) over raw substrings instead of xxhash64 shingle hashes:
    // Jaccard on distinct substring sets equals Jaccard on distinct
    // hash sets barring a 64-bit collision. DuckDB `/` on BIGINT is
    // float division, matching Spark's double math; the filter applies
    // to the ROUNDED score exactly as the Spark plan does.
    "dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 12) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 11, 1) + 1)) AS i
        |        FROM documents)
        |),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, round(c / (sa.sz + sb.sz - c), 4) AS jaccard
        |FROM common
        |JOIN sz sa ON sa.doc_id = id_a
        |JOIN sz sb ON sb.doc_id = id_b
        |WHERE round(c / (sa.sz + sb.sz - c), 4) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // Connected components over the same near-dup pair list, via
    // transitive closure (recursive CTE): cluster label = min doc_id
    // reachable, exactly the fixpoint Dedup.connectedComponents'
    // min-label propagation converges to.
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 12) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 11, 1) + 1)) AS i
        |        FROM documents)
        |),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE round(c / (sa.sz + sb.sz - c), 4) >= 0.8
        |),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src)
        |SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        |       d.doc_id = coalesce(l.cluster_id, d.doc_id) AS keep
        |FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // raw-substring twin of the rolling-hash gram sets: DISTINCT
    // per-doc 50-char windows (whole text when shorter — the kernel's
    // len<=n branch), df-capped [2, 50], pairs within each gram's doc
    // set, distinct-gram count per pair
    "dedup_substring" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 50) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 49, 1) + 1)) AS i
        |        FROM documents)),
        |gc AS (SELECT g FROM g GROUP BY g HAVING count(*) BETWEEN 2 AND 50),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN gc USING (g) JOIN g b USING (g)
        |  WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, count(*) AS n_shared FROM p
        |GROUP BY 1, 2 ORDER BY id_a, id_b""".stripMargin,
    // span-level removal (Lee et al. 2021 ExactSubstr intervention):
    // replay with RAW substrings (the dedup_substring convention),
    // rebuild the cleaned text character-by-character (brute force is
    // fine oracle-side), certify by md5
    "pipe_span_dedup" ->
      s"""WITH ${spanCutCtesSql()}
        |SELECT doc_id, is_ascii, lc_stable, n_spans_cut, n_chars_cut, cut_ranges,
        |  CAST(length(text) AS BIGINT) AS clean_len, clean_md5
        |FROM cleandocs
        |ORDER BY doc_id""".stripMargin,
    "pipe_span_dedup_keep_first" -> spanKeepFirstOracleSql(),
    // the same two interventions over the multi-byte-injected corpus
    // (every third doc 'e'→'é'/'o'→'ø', mirrored in the Spark entry):
    // testdata ships pure-ASCII, so these entries are the non-vacuous
    // hash gate on code-point-exact cutting of non-ASCII text
    "pipe_span_dedup_multibyte" ->
      s"""WITH ${spanCutCtesSql(multibyteTextSql)}
        |SELECT doc_id, is_ascii, lc_stable, n_spans_cut, n_chars_cut, cut_ranges,
        |  CAST(length(text) AS BIGINT) AS clean_len, clean_md5
        |FROM cleandocs
        |ORDER BY doc_id""".stripMargin,
    "pipe_span_keep_first_multibyte" -> spanKeepFirstOracleSql(multibyteTextSql),
    // incremental forms: EXACTLY the batch cut over (corpus ∪ batch)
    // restricted to the arriving shard rows — same CTEs, one filter
    "pipe_span_incremental" ->
      s"""WITH ${spanCutCtesSql()}
        |SELECT doc_id, is_ascii, lc_stable, n_spans_cut, n_chars_cut, cut_ranges,
        |  CAST(length(text) AS BIGINT) AS clean_len, clean_md5
        |FROM cleandocs
        |WHERE doc_id % 10 = 0
        |ORDER BY doc_id""".stripMargin,
    "pipe_span_keep_first_incremental" ->
      spanKeepFirstOracleSql(whereSql = "d.doc_id % 10 = 0"),
    // the intervention composed with the quality gate (gate AFTER
    // cut): the Gopher chain replayed over the span-cut text
    "pipe_span_ingest" ->
      s"""WITH ${spanCutCtesSql()},
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '') AS w
        |  FROM cleandocs),
        |ws AS (
        |  SELECT doc_id, len(w)::BIGINT AS n_words, len(list_distinct(w))::BIGINT AS n_distinct
        |  FROM toks),
        |meta AS (
        |  SELECT d.doc_id,
        |    (length(d.text) - len(regexp_extract_all(d.text, '\\s')))::DOUBLE
        |      / greatest(ws.n_words, 1) AS mwl,
        |    len(regexp_extract_all(d.text, '[A-Za-z]'))::DOUBLE
        |      / greatest(length(d.text), 1) AS alpha_ratio,
        |    len(regexp_extract_all(lower(d.text), '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
        |      / greatest(ws.n_words, 1) AS stop_ratio
        |  FROM cleandocs d JOIN ws USING (doc_id)),
        |bg AS (
        |  SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
        |  FROM toks, unnest(range(1, greatest(len(w), 1))) t(i)),
        |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS max_c FROM bc GROUP BY 1),
        |sig AS (
        |  SELECT ws.doc_id, ws.n_words,
        |    CASE WHEN ws.n_words = 0 THEN 0.0
        |         ELSE 1.0 - ws.n_distinct / ws.n_words END AS dup_word_frac,
        |    coalesce(bs.max_c::DOUBLE / bs.n_bigrams, 0.0) AS top_bigram_frac,
        |    m.mwl, m.alpha_ratio, m.stop_ratio
        |  FROM ws JOIN meta m USING (doc_id) LEFT JOIN bs USING (doc_id))
        |SELECT cd.doc_id, cd.is_ascii, cd.n_spans_cut, cd.n_chars_cut,
        |  cd.clean_md5, g.n_words, g.reasons, g.reasons = 0 AS keep
        |FROM cleandocs cd JOIN (
        |  SELECT doc_id, n_words,
        |    (CASE WHEN n_words < 30 OR n_words > 100000 THEN 1 ELSE 0 END
        |     + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 2 ELSE 0 END
        |     + CASE WHEN alpha_ratio < 0.8 THEN 4 ELSE 0 END
        |     + CASE WHEN stop_ratio < 0.01 THEN 8 ELSE 0 END
        |     + CASE WHEN dup_word_frac > 0.65 THEN 16 ELSE 0 END
        |     + CASE WHEN top_bigram_frac > 0.2 THEN 32 ELSE 0 END)::BIGINT AS reasons
        |  FROM sig) g USING (doc_id)
        |ORDER BY cd.doc_id""".stripMargin,
    // dedup_clusters' labeling CTE with the survivor re-ranked by
    // quality (word count desc, then doc_id): DuckDB's
    // regexp_extract_all('\S+') length equals Spark's regexp_count
    // on the same pattern.
    "dedup_keep_best" ->
      """WITH RECURSIVE sh AS (
        |  SELECT DISTINCT doc_id, substr(lower(text), CAST(i AS INT), 12) AS g
        |  FROM (SELECT doc_id, text, unnest(range(1, greatest(length(text) - 11, 1) + 1)) AS i
        |        FROM documents)
        |),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |),
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
        |  WHERE round(c / (sa.sz + sb.sz - c), 4) >= 0.8
        |),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id FROM reach GROUP BY src),
        |lab AS (
        |  SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        |         len(regexp_extract_all(d.text, '\S+'))::BIGINT AS n_words
        |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
        |SELECT doc_id, cluster_id, n_words,
        |       row_number() OVER (PARTITION BY cluster_id ORDER BY n_words DESC, doc_id) = 1 AS keep
        |FROM lab ORDER BY doc_id""".stripMargin,
    // Exact nearest neighbor per vector — the unnest/dot-product
    // pattern proven by the sim_bruteforce_topk oracle, with every
    // vector as a query and rank-1 kept. Tie-break (equal cosine →
    // smaller id) mirrors the Spark kernel's comparison.
    "dedup_embedding" ->
      """WITH ex AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT id_a, id_b, d.dot / (na.nrm * nb.nrm) AS c
        |  FROM dots d JOIN norms na ON na.vec_id = d.id_a JOIN norms nb ON nb.vec_id = d.id_b)
        |SELECT id_a, id_b AS nearest, round(c, 4) AS cosine, round(c, 4) >= 0.9 AS is_dup
        |FROM (SELECT id_a, id_b, c,
        |        row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS rn FROM cos)
        |WHERE rn = 1 ORDER BY id_a""".stripMargin,
    // ANN near-dup twin: the oracle is the EXACT all-pairs τ-join over
    // the same augmented corpus (originals + perturbed copies of
    // vec_id < 64 — the integer-hash ramp is recomputed here term for
    // term; unnest is 1-based so the ramp uses i-1). The engine's LSH
    // candidate stage was measured at recall 1.0 on this data (every
    // planted pair within 2 sign bits), so bucketed-candidates +
    // exact-verify must equal the all-pairs scan bit for bit.
    "dedup_embedding_ann" ->
      """WITH ex0 AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, x, i FROM ex0
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |         x + 0.02 * ((((vec_id * 64 + (i - 1)) * 2654435761) % 2001) - 1000) / 1000.0, i
        |  FROM ex0 WHERE vec_id < 64),
        |norms AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
        |  FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT id_a, id_b, round(d.dot / (na.nrm * nb.nrm), 4) AS cosine
        |  FROM dots d JOIN norms na ON na.vec_id = d.id_a JOIN norms nb ON nb.vec_id = d.id_b)
        |SELECT id_a, id_b, cosine FROM cos WHERE cosine >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    "dedup_semantic" -> semanticOracleSql(tau = 0.9),
    // exact all-pairs corpus × reference-set cosine — the reference
    // side is the same deterministic perturbation family as the
    // engine recomputes (Dedup.dedupCrossCorpus)
    "dedup_cross_corpus" ->
      """WITH ex0 AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x, generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |ref AS (
        |  SELECT vec_id + 1000000 AS ref_id,
        |         x + 0.02 * ((((vec_id * 64 + (i - 1)) * 2654435761) % 2001) - 1000) / 1000.0 AS x, i
        |  FROM ex0 WHERE vec_id < 64),
        |cnorm AS (SELECT vec_id, sqrt(sum(x*x)) AS nrm FROM ex0 GROUP BY 1),
        |rnorm AS (SELECT ref_id, sqrt(sum(x*x)) AS nrm FROM ref GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS id, b.ref_id, sum(a.x * b.x) AS dot
        |  FROM ex0 a JOIN ref b ON a.i = b.i GROUP BY 1, 2),
        |cos AS (
        |  SELECT id, ref_id, round(d.dot / (cn.nrm * rn.nrm), 4) AS cosine
        |  FROM dots d JOIN cnorm cn ON cn.vec_id = d.id JOIN rnorm rn USING (ref_id))
        |SELECT id, ref_id, cosine FROM cos WHERE cosine >= 0.9 ORDER BY id, ref_id""".stripMargin,
    // Mirrors TextAnalysis.LangProfiles exactly: per-language hit-rate
    // scores (profile regex count / word count), argmax with Spark's
    // struct-max tie-break (max score, then max language code).
    "text_langid" ->
      """WITH sc AS (
        |  SELECT doc_id, lang AS lang_true,
        |    greatest(len(regexp_extract_all(text, '\S+')), 1) AS w,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|is|was|that|with|for)\b')) AS h_en,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit|ein)\b')) AS h_de,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|que|des|une)\b')) AS h_fr,
        |    len(regexp_extract_all(lower(text), '\b(el|la|los|las|es|que|de|una)\b')) AS h_es,
        |    len(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) AS h_zh
        |  FROM documents),
        |un AS (
        |  SELECT doc_id, lang_true, code, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, code DESC) AS rn
        |  FROM (
        |    SELECT doc_id, lang_true, 'en' AS code, h_en / w AS score FROM sc
        |    UNION ALL SELECT doc_id, lang_true, 'de', h_de / w FROM sc
        |    UNION ALL SELECT doc_id, lang_true, 'fr', h_fr / w FROM sc
        |    UNION ALL SELECT doc_id, lang_true, 'es', h_es / w FROM sc
        |    UNION ALL SELECT doc_id, lang_true, 'zh', h_zh / w FROM sc))
        |SELECT doc_id, lang_true, code AS lang_pred FROM un
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
  )
}

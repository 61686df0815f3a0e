#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r19.md per-query checklist table from the
committed bench_out.json — every registry query, its close-of-round
warm seconds, and the round-19 examination verdict."""
import json, sys

bench = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"))
q = bench["queries"]

# verdict per query; families default, specific overrides below.
OPT = "OPTIMIZED r19"
STRUCT = "structural (adjudicated)"
FLOOR = "overhead-bound at sf0.1 (plan minimal)"
MAP = "map-only scan (plan minimal)"

verdict = {}
for name in q:
    if name.startswith("q") and name[1].isdigit():
        verdict[name] = FLOOR
    elif name.startswith(("text_", "mm_")):
        verdict[name] = MAP
    else:
        verdict[name] = FLOOR

for n in ["pipe_span_dedup", "pipe_span_dedup_keep_first",
          "pipe_span_dedup_multibyte", "pipe_span_keep_first_multibyte",
          "pipe_span_ingest"]:
    verdict[n] = OPT + ": probe broadcast (SMJ removed)"
verdict["pipe_full_ingest"] = OPT + ": probe broadcast + single-subtree pack window (28->13 Exchanges)"
notes = {
    "ml_train_predict": STRUCT + ": MLlib level-wise fit 2.1s of total (ml_profile_out.json); persistence round-trip is the contract",
    "ml_feature_vectorize": MAP,
    "pipe_ml_filter": STRUCT + ": fit-per-invocation is the declared query",
    "sim_knn_graph": STRUCT + ": 3 NN-Descent rounds, ~12 exec-s/round candidate cosine+top-k; volume reverse-capped; per-round lineage cut required (r13)",
    "sim_knn_graph_incremental": STRUCT + ": same descent core over base+delta",
    "pipe_sketch_rollup": STRUCT + ": contract harness = 3 consumers (HLL x2 + exact); prod form ships sketch half only",
    "pipe_heavy_hitters_rollup": STRUCT + ": same contract-harness shape; final SMJ is a 5-row lang join",
    "text_top_bigrams_sketch": STRUCT + ": same contract-harness shape",
    "pipe_lm_bigram": STRUCT + ": oracle-pinned JM-smoothed scoring arithmetic",
    "pipe_lm_buckets": STRUCT + ": lm score + exactPercentiles thresholds, broadcast CASE",
    "pipe_classifier_quality": STRUCT + ": native one-kernel scoring (r19-build); md5 bucket ids oracle-pinned",
    "dedup_substring": STRUCT + ": deliberate gram-shuffle self-join (cannot broadcast)",
    "q37_outer_join": STRUCT + ": FullOuter => SMJ only strategy",
    "q17_percentile": STRUCT + ": distributed exact-rank kernel",
    "dedup_eval": STRUCT + ": estimator + exact truth on same grams (the eval contract)",
    "sim_eval": STRUCT + ": estimator + exact truth",
    "pipe_span_incremental": "examined: probe joins already broadcast; wall = orchestration depth + StagedRewrite recovery (durability contract)",
    "pipe_span_keep_first_incremental": "examined: same, plus keeper-election windows",
    "sim_graph_search": FLOOR + "; hop-loop lineage cuts",
    "sim_graph_search_filtered": FLOOR + "; hop-loop lineage cuts",
    "sim_graph_search_heldout": FLOOR + "; hop-loop lineage cuts",
    "sim_graph_search_segment": FLOOR + "; hop-loop lineage cuts",
    "sim_knn_diversity": FLOOR + "; greedy-selection iteration loop",
    "sim_knn_label_prop": FLOOR + "; propagation iteration loop",
    "sim_hard_negatives": FLOOR + "; band windows minimal",
    "sim_hard_negatives_filtered": FLOOR,
    "pipe_repeated_ngrams": "examined: phase-1 hash prefilter already semi-join + two-level agg; plan minimal",
    "dedup_ngram_jaccard": STRUCT + ": PPJoin prefix filter (r6-r9 adjudications)",
    "dedup_minhash_lsh": STRUCT + ": banded signature joins",
    "dedup_exact": MAP + " + hash agg",
    "mm_image_dedup": "examined (new in r18-build): dHash + simhash Hamming machinery, plan minimal",
}
verdict.update(notes)

fam_order = [
    ("Relational q1-q49 + views", lambda n: n[0] == "q" and n[1].isdigit()),
    ("Text analysis", lambda n: n.startswith("text_")),
    ("Dedup family", lambda n: n.startswith("dedup_")),
    ("Span-cut family", lambda n: "span" in n),
    ("Pipeline (pipe_*)", lambda n: n.startswith("pipe_")),
    ("Similarity / vectors", lambda n: n.startswith(("sim_", "emb_"))),
    ("Multimodal", lambda n: n.startswith("mm_")),
    ("ML surface", lambda n: n.startswith("ml_")),
    ("Streaming inspect", lambda n: n.startswith("stream_")),
]

done = set()
print("| query | warm s (close) | round-19 verdict |")
print("|---|---|---|")
for fam, pred in fam_order:
    names = sorted(n for n in q if pred(n) and n not in done)
    if not names:
        continue
    print(f"| **{fam}** | {sum(q[n] for n in names):.1f} total | |")
    for n in names:
        done.add(n)
        print(f"| {n} | {q[n]:.2f} | {verdict[n]} |")
rest = sorted(set(q) - done)
for n in rest:
    print(f"| {n} | {q[n]:.2f} | {verdict[n]} |")

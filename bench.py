#!/usr/bin/env python
"""Flagship benchmark — the driver's per-round perf gate.

Runs the 7 BASELINE.md flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
exactly ONE JSON line to stdout:

  {"metric": "flagship_total_sec", "value": <sum of per-query best>,
   "unit": "sec", "queries": {"a1_hash_agg": <best-of-3 sec>, ...},
   "sf": 0.1}

Method mirrors BASELINE.md exactly: build the DataFrame once, one
warm-up collect() (pays analysis + codegen, cached per DataFrame
object), then best-of-3 timed collect(). Timings exclude session
startup.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_to_es_spark.registry import queries
from hive_to_es_spark.session import get_spark

FLAGSHIPS = [
    "a1_hash_agg",
    "q3_shipping_priority",
    "j11_multiway",
    "w1_order_rank",
    "e1_tumbling",
    "s1_knn_cosine",
    "d1_dedup_exact",
]

# Heaviest non-flagship shapes (pairwise joins, wide windows, TF-IDF,
# MinHash) — benched so regressions in the expensive plans are visible
# in the per-round artifact, not just flagship regressions. Reported
# under "queries" too, but EXCLUDED from the headline value, which
# stays directly comparable to BASELINE.md's 7-flagship total.
EXTENSION = [
    "d4_dedup_ngram_jaccard",
    "d6_dedup_lsh_blocked",
    "s2_pairwise_topk",
    "d2_dedup_minhash",
    "t2_tfidf_terms",
    "j10_interval_overlap",
    "w4_range_frame",
    # round 3: widest TPC-H join, iterative component closure, and the
    # composed corpus pipeline — the three heaviest new shapes
    "q8_market_share",
    "d7_dedup_components",
    "p10_corpus_pipeline",
    "d8_dedup_minhash_portable",
    "d9_text_dup_groups",
    # round 7: w7 (the plain-window 3-task ceiling) is deprecated out
    # of the public registry; its value pin lives in test_plans.py
    # round 5: the bucketed-donor plan on the w7 shape (beats the
    # 3-task ceiling at equal semantics), and the
    # production-threshold prefix-filtered Jaccard
    "w8_range_frame_scalable",
    "d10_dedup_jaccard_prefix",
    # round 6: the hybrid MinHash-prefilter + exact-verify form of the
    # same low-threshold contract d4/d9 price — the reduction this op
    # exists for shows up as its delta vs d4's entry
    "d11_dedup_minhash_verified",
    # round 6: the hybrid pair stream closed into dup groups (compare
    # against d9's d4-pair closure), the binned range join, and the
    # broadcast decontamination scan
    "d12_dup_groups_hybrid",
    "j13_interval_bin_join",
    "t9_decontaminate",
    # round 6 batch 2: the cogrouped pandas as-of merge (heaviest
    # Python-boundary shape) and batch sessionization (stacked windows
    # + agg over one exchange)
    "g6_cogrouped_asof",
    "w9_sessionize",
    # round 6 batch 3: sketch-accuracy audit (banded candidates +
    # exact verify) and the ANN recall audit's brute-force arm
    "d13_sketch_accuracy",
    # round 11: the audit's fixed-slice production posture (r10 task 3)
    "d13_sketch_accuracy_sampled",
    "s12_recall_report",
    # round 7: the two-stage quantize-then-rerank serving pipeline
    # (one corpus scan computing both scores) and the URL-canonical
    # dedup scan
    "s13_two_stage_rerank",
    "x14_url_normalize",
    # round 7 batch 2: the C4-style corpus line-dedup (explode +
    # census + broadcast membership + reassembly — the heaviest new
    # text shape) and the temperature-mix scan filter
    "t13_line_dedup",
    "o10_temperature_mix",
    # round 7 batch 3: the full dedup-pipeline terminus (d12's pairs +
    # closure + quality survivor election)
    "d14_canonical_pick",
    # round 7 batch 4: substring-subsumption dedup (min-shingle block
    # + exact containment verify — the non-Jaccard dedup gap)
    "d15_subsumed_docs",
    # round 7 batch 5: the broadcast graded-contamination scan (t9's
    # shape + a LEFT join over every corpus doc)
    "t14_contamination_score",
    # round 7 batch 6: the PQ encode + ADC shortlist + exact re-rank
    # (heaviest new vector shape), the bloom-prefiltered semi join,
    # the perceptual image near-dup pair scan (two decode passes +
    # banded self-joins), and the collect_list journey build + regex
    "s15_ann_pq",
    "j18_bloom_prefilter",
    "m7_image_neardup",
    "w16_seq_pattern",
    # round 8: distributed BPE training (census + batched merge
    # rounds) and its corpus-encode consumer
    "t16_bpe_train",
    "t17_bpe_encode",
    # round 9: the incremental/persisted-index family (near-dup batch
    # vs index, IVF serving from a loaded index, streaming fold's
    # batch twin), the multimodal sequence packer, and the
    # repeated-passage census
    "d16_incremental_neardup",
    "s16_ann_ivf_persisted",
    "e11_stream_neardup_ingest",
    "m9_multimodal_pack",
    "t18_repeated_passages",
    # round 10: filtered vector search from the persisted index, the
    # CBO-reordered 3-table join, the two-phase-commit Python sink,
    # and watermarked streaming session metrics (batch twin)
    "s17_filtered_ann",
    "b10_cbo_stats_reorder",
    "b11_python_datasource_writer",
    "e12_stream_session_metrics",
    # round 11: paraphrase-level decontamination (broadcast eval batch
    # + map-side argmax) and the incremental IVF index append
    "t19_embedding_decontaminate",
    "s18_ivf_index_maintain",
    "s19_ivf_hot_cell_split",
    # round 11 batch 2: cluster-scoped semantic dedup (the heaviest
    # new pair shape), the census-first corpus quantile gate, and the
    # stateless streaming decontamination gate (batch twin)
    "d17_semantic_dedup",
    "t20_quality_quantile_gate",
    "e13_stream_decontaminate",
    # round 12: repeated-span removal (two gram passes + per-row edit)
    # and the Gopher rule family (pure scan-side projection)
    "d18_span_dedup",
    "t21_repetition_rules",
    # round 12: the carried-in daily peak (w20's plan + day census)
    "w21_peak_concurrency_daily",
    # round 11 batch 3: the two-pass interval-stabbing census (w9's
    # sessionize + carry-in running sum — two collect roundtrips) and
    # the fixed-domain token-budget mixture cut
    "w20_peak_concurrency",
    "o14_token_budget_mix",
    # round 12 batch 2: DSIR hashed-ngram selection (two feature
    # explodes + bounded-census model tables), integer-ppb PageRank
    # (eager edge census + 5 checkpointed domain-table rounds), and
    # the cross-source overlap matrix (collect_set + pair explosion)
    "t22_dsir_importance",
    "x15_domain_pagerank",
    "d19_source_overlap",
    # round 12 batch 3: keep-first paragraph dedup (the para-keyed
    # window + reassembly, d1's class at paragraph grain) and the 2-D
    # grid hotspot census (one corpus agg + census-sized neighborhood)
    "d20_paragraph_dedup",
    "a23_grid_hotspots",
    # round 13: CCNet head/middle/tail perplexity-bucket mixture
    # (t8 scoring checkpoint + census boundaries + scan-side draw)
    # and the bounded-state dedup batch twin (iterative horizon chain)
    "o15_perplexity_buckets",
    "e14_stream_dedup_watermarked",
    # round 13: unigram-LM tokenizer training (census EM at build,
    # one accounting scan + broadcast probe in the timed read) and
    # the scan-side character-entropy gate
    "t23_unigram_lm_train",
    "t24_char_entropy",
    # round 13: the top-K + OOV-floor production form of t8 (census
    # top-K broadcast, no word-keyed corpus shuffle)
    "t25_lm_score_topk",
    # round 14: unigram-LM encode (t23 train at build + one corpus
    # posexplode scan with broadcast id/cost probes in the timed read)
    "t26_unigram_lm_encode",
    # round 14: the composed 8-stage LLM corpus pipeline (gate frame
    # checkpoint at build + near-dup mining + level census in the read)
    "p26_llm_corpus_pipeline",
    # round 14: shard export through the pyatomic two-phase-commit
    # sink (write at build, manifest aggregate in the read)
    "p27_shard_export",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 3

# Ops that do real work at DataFrame-BUILD time, so build-once timing
# would count only the final read and under-report them (ADVICE r3):
# - d7/d9 run their label-propagation loop (jobs per round) at build;
# - d4 (and d9, which builds d4's pairs) materializes the capped
#   shingle table via localCheckpoint(eager=True) at build — the
#   explode + hot-shingle cap is most of its cost.
# These rebuild inside the timed section — the whole computation is
# what the number means.
# - w4/w8 run a one-scan approx-distinct gate job at build (w8 adds
#   the min/max bucket-bounds scan).
# - d10 has no checkpoint, but repeated collect() of one DataFrame
#   reuses materialized shuffle stages and times only the tail;
#   rebuilding per run prices the whole candidate + verify pipeline.
EAGER_BUILD = {
    "d4_dedup_ngram_jaccard",
    "d7_dedup_components",
    "d9_text_dup_groups",
    "w4_range_frame",
    "w8_range_frame_scalable",
    "d10_dedup_jaccard_prefix",
    # d11 materializes its shingle table (localCheckpoint) at build
    "d11_dedup_minhash_verified",
    # d12 runs d11's build plus the closure loop at build time
    "d12_dup_groups_hybrid",
    # d14 composes d12's build (pair gen + closure loop) before its
    # survivor election — rebuild so the number prices the pipeline
    "d14_canonical_pick",
    # d15 materializes its capped shingle table (localCheckpoint) at
    # build — rebuild so the number prices explode + cap + verify
    "d15_subsumed_docs",
    # t16/t17 run the batched merge loop (driver roundtrips +
    # localCheckpoints) at build
    "t16_bpe_train",
    "t17_bpe_encode",
    # the persisted-index family writes its index (and delta) at build
    "d16_incremental_neardup",
    "s16_ann_ivf_persisted",
    "e11_stream_neardup_ingest",
    # m9 collects its per-range weight offsets at build
    "m9_multimodal_pack",
    # round 10: s17 writes codebook + inverted lists, b10 ANALYZEs and
    # executes its join under the CBO confs, b11 runs the sink write —
    # all at build time
    "s17_filtered_ann",
    "b10_cbo_stats_reorder",
    "b11_python_datasource_writer",
    # round 11: s18 builds the base index, appends the delta and
    # writes the drift report at build time; s19 writes nothing but
    # its heavy stages are shuffles repeated collect() would reuse
    # (the d10 pitfall)
    "s18_ivf_index_maintain",
    "s19_ivf_hot_cell_split",
    # d17's assignment + pair join + dominance reduce are all shuffle
    # stages a repeated collect() would reuse (the d10 pitfall)
    "d17_semantic_dedup",
    # w20/o14 collect their per-range carry-in offsets at build time
    # (pass 1 of the two-pass plan runs as a job inside the op)
    "w20_peak_concurrency",
    "o14_token_budget_mix",
    # w21 reuses w20's two-pass plan (carry offsets collect at build)
    "w21_peak_concurrency_daily",
    # x15 runs the eager edge-census materialization + 5 checkpointed
    # PageRank rounds at build time — rebuild prices the whole loop
    "x15_domain_pagerank",
    # a23 materializes its cell census (the corpus-sized aggregate) at
    # build — rebuild prices the census scan, not just the tiny tail
    "a23_grid_hotspots",
    # d19/d20 have no checkpoint, but their heavy stages (fingerprint
    # distinct, para window) are shuffles a repeated collect() would
    # reuse (the d10 pitfall) — rebuild; t22 (round 15) shares its
    # one feature explode through a lazy checkpoint — rebuild prices
    # the explode, not just the census/scoring tail
    "t22_dsir_importance",
    "d19_source_overlap",
    "d20_paragraph_dedup",
    # o15 materializes the t8 score frame via localCheckpoint at
    # build — rebuild prices the scoring scans, not just the census
    "o15_perplexity_buckets",
    # e14 runs its checkpointed chain rounds at build — rebuild
    # prices the whole iteration, not just the final union read
    "e14_stream_dedup_watermarked",
    # t23 trains the whole EM (census + both E-steps) at build
    "t23_unigram_lm_train",
    # t26 trains t23's EM at build too (seg2/pieces checkpoints) —
    # rebuild prices train + encode, not just the reassembly read
    "t26_unigram_lm_encode",
    # p26 materializes the per-doc gate frame at build — rebuild
    # prices the gate scans + langid + decon, not just the census
    "p26_llm_corpus_pipeline",
    # p27 runs the full sink write at build — rebuild prices the
    # assign + stage + commit, not just the read-back aggregate
    "p27_shard_export",
}


# w1 jitter (r10 verdict task 6): w1_order_rank oscillated
# 0.221-0.243s across rounds at ~44k output rows with no plan change.
# The prescribed fix — noop-sink timing a la scale_proof's SINK_TIMED
# — was A/B'd on a quiet machine (3 reps x 9 runs, warm both paths):
# collect() min 0.213/0.221/0.263s vs noop-sink min 0.284/0.302/0.320s.
# The DataSourceV2 write path adds a consistent ~0.07-0.10s to this
# sub-second op (+40% on the reported min) and the rep-to-rep min
# spread does NOT collapse (0.036 vs 0.050) — at 44k rows pickling is
# ~2 MB and is NOT the noise source; general job-scheduling jitter is.
# (SINK_TIMED stays right for d13's 5M-row audit table in scale_proof,
# where pickling measurably dominates.) So w1 keeps collect() timing,
# comparable to BASELINE.md and every prior round, and tightens the
# min estimator with more timed runs instead.
#
# d7/d9 drift A/B (r12 verdict item 2): the two closure ops moved up
# two rounds running (d7 2.44 -> 2.97 s, d9 3.54 -> 4.12 s) with no
# plan change. A/B'd round 13 on a quiet machine — r11 tree vs r13
# tree, fresh process each, 5 timed runs after warm-up at sf0.1:
# d7 min 3.302 s (r11) vs 3.139 s (r13), d9 4.594 s (r11) vs 3.962 s
# (r13). The CURRENT tree is faster than the r11 tree on both ops,
# so the recorded drift is day-band machine noise, not a code
# regression — within band, closed.
N_RUNS_OVERRIDE = {"w1_order_rank": 9}

# Round-14 measurement fix (guide §1.4): w4/w8 emit 600k rows —
# collect() pickles ~600k x 4 fields to the Python driver every timed
# run, and that transfer, not the computation, dominated their bench
# entries (range_frame_sum's docstring measured the w4 compute at
# ~40 ms vs a ~3 s bench entry; w1's A/B showed pickling is NOT the
# noise source at 44k rows, but 600k rows is 13x that). These two keys
# now time the noop sink — "eagerly computes every column of every
# row and discards the result" — so the number prices the query, not
# the driver transfer. OLD (collect-timed, r13) numbers for
# comparison: w4 3.064 s, w8 3.209 s at sf0.1. Every other key keeps
# collect() timing (flagships MUST — the 2x gate compares against
# BASELINE.md's collect-timed totals; the other extension keys'
# outputs are <= ~100k rows where w1's A/B showed the DataSourceV2
# noop write path costs MORE than the pickling it avoids).
SINK_NOOP = {"w4_range_frame", "w8_range_frame_scalable"}


# Round-15 measurement fix (VERDICT r14 "What's wrong" #1, declared):
# the single-session flagship numbers drifted upward three rounds
# running (0.55 -> 0.59 -> 0.68 -> 0.70 s) with zero flagship code or
# plan changes — sub-100 ms entries are dominated by JVM warmth and
# scheduling jitter (the documented ~2.5x cross-layout band), so the
# per-round flagship delta kept flagging phantom regressions while
# real wins only showed up via interleaved fresh-subprocess A/Bs. The
# flagship line is now the per-query MEDIAN over
# $SPARK_GRAFT_BENCH_SUBPROC_REPS (default 3) FRESH subprocesses,
# each of which replays the historical layout exactly (cold JVM,
# flagships first, same _bench_one warm-up + best-of-3 collect()
# method), so each rep is directly comparable to BASELINE.md and to
# every prior round's number — the median just strips the day-band
# jitter between cold JVMs. Set the env var to 0 to get the old
# single-session numbers (also the automatic fallback if a subprocess
# fails); the parent's single-session flagship values are always kept
# in BENCH_latest_full.json under "flagship_singlesession". The
# stdout one-line JSON contract and $SPARK_GRAFT_SF_DIR /
# $SPARK_GRAFT_CPUS are unchanged.
SUBPROC_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_SUBPROC_REPS", "3"))

_SUBPROC_MARK = "@@FLAGSHIP_REP@@"

_SUBPROC_CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
import bench
from hive_to_es_spark.registry import queries
from hive_to_es_spark.session import get_spark
spark = get_spark("bench-flagship-rep")
spark.sparkContext.setLogLevel("ERROR")
qs = queries()
out = {{n: bench._bench_one(spark, qs, n) for n in bench.FLAGSHIPS}}
print({mark!r} + json.dumps(out))
"""


def _flagship_subprocess_reps(n_reps: int) -> list[dict[str, float]]:
    """Run the 7 flagships in n_reps fresh subprocesses (cold JVM each,
    flagships-first layout) and return the per-rep {name: best_sec}
    dicts. Reps that fail to produce the marker line are dropped."""
    repo = os.path.dirname(os.path.abspath(__file__))
    code = _SUBPROC_CHILD.format(repo=repo, mark=_SUBPROC_MARK)
    reps: list[dict[str, float]] = []
    for _ in range(n_reps):
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            check=False,
        )
        for line in r.stdout.splitlines():
            if line.startswith(_SUBPROC_MARK):
                reps.append(json.loads(line[len(_SUBPROC_MARK):]))
                break
    return reps


def _run_action(df, name: str) -> None:
    if name in SINK_NOOP:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()


def _bench_one(spark, qs, name: str) -> float:
    from hive_to_es_spark.functions.lifecycle import release_all_persistent

    n_runs = N_RUNS_OVERRIDE.get(name, N_RUNS)
    if name in EAGER_BUILD:
        _run_action(qs[name](spark, SF_DIR), name)  # warm-up: full build + read
        best = float("inf")
        for _ in range(n_runs):
            # ADVICE r14: each eager rebuild strands the previous
            # build's localCheckpoints in the block manager (p26 alone
            # left ~10 corpus-scale RDDs per bench session). Every
            # earlier key is finished at this point in the sequential
            # bench and this key rebuilds from scratch inside the
            # timer, so sweeping between runs (OUTSIDE the timed
            # region) is safe and keeps the session's memory flat.
            release_all_persistent(spark)
            t0 = time.perf_counter()
            _run_action(qs[name](spark, SF_DIR), name)
            best = min(best, time.perf_counter() - t0)
        release_all_persistent(spark)
        return round(best, 4)
    df = qs[name](spark, SF_DIR)  # build once (BASELINE.md method)
    _run_action(df, name)  # warm-up: analysis + codegen, cached on the object
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        _run_action(df, name)
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> int:
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    per_query: dict[str, float] = {}
    for name in FLAGSHIPS + EXTENSION:
        per_query[name] = _bench_one(spark, qs, name)
    flagship_singlesession = {n: per_query[n] for n in FLAGSHIPS}
    flagship_reps: list[dict[str, float]] = []
    if SUBPROC_REPS > 0:
        flagship_reps = _flagship_subprocess_reps(SUBPROC_REPS)
        if flagship_reps:  # fallback: keep single-session numbers
            for n in FLAGSHIPS:
                per_query[n] = round(
                    statistics.median(r[n] for r in flagship_reps), 4
                )
    flagship_total = round(sum(per_query[n] for n in FLAGSHIPS), 4)
    # The driver records only the TAIL of stdout, so the per-round
    # artifact must stay compact enough that the gate-relevant numbers
    # (flagship total + per-flagship seconds) always survive capture —
    # round 11's artifact truncated them out when the extended set
    # outgrew the window (r11 verdict task 8). The stdout line now
    # carries the 7 flagships + roll-ups only; the FULL per-query
    # detail (extension set included) is written to
    # BENCH_latest_full.json next to this script every run.
    full = {
        "metric": "flagship_total_sec",
        "value": flagship_total,
        "unit": "sec",
        "queries": per_query,
        "extended_total_sec": round(sum(per_query[n] for n in EXTENSION), 4),
        "sf": sf,
        "flagship_singlesession": flagship_singlesession,
        "flagship_subproc_reps": flagship_reps,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_latest_full.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1)
        fh.write("\n")
    print(
        json.dumps(
            {
                "metric": "flagship_total_sec",
                "value": flagship_total,
                "unit": "sec",
                "queries": {n: per_query[n] for n in FLAGSHIPS},
                "extended_total_sec": round(
                    sum(per_query[n] for n in EXTENSION), 4
                ),
                "full_detail": "BENCH_latest_full.json",
                "sf": sf,
                "flagship_method": (
                    f"median-of-{len(flagship_reps)}-fresh-subprocess"
                    if flagship_reps
                    else "single-session best-of-3"
                ),
                # Round-4 VERDICT asked for the r3->r4 extended-set
                # drift (s2 1.8x, d1 1.74x, d6 1.55x, w4 1.61x, e1
                # 1.29x) to be attributed. tools/bench_drift.py A/B
                # (round 5; fresh subprocess per variant, 5 runs each):
                # a session that has already run the full bench layout
                # reproduces r3's numbers almost exactly (s2 0.055 vs
                # r3 0.051; d1 0.024 vs 0.022), a fresh minimal session
                # is ~2x slower on the sub-100ms ops, and lifecycle
                # sweeps are NEUTRAL (with_sweeps ~= isolated). So the
                # drift is JVM/JIT warmth depth — how much code the JVM
                # compiled before the op ran — plus w4's eager-build
                # reclassification (all build-once variants reproduce
                # r3's 2.2s; the r4 3.57s includes the gate job + full
                # rebuild per timed run, by design). Expected bands:
                # same-layout reruns +-20%; cross-layout comparisons of
                # sub-100ms ops up to ~2.5x. Gate on the 2x bound vs
                # BASELINE.md flagships, not extended-set deltas.
                # Round-7 w8 drift check (VERDICT r6 task 3): the r5->r6
                # w8 move (2.74->3.35s, +22%) was re-A/B'd with fresh
                # subprocesses running the EXACT r5 tree vs the current
                # tree on the same day: r5 code 3.23-3.98s, current
                # 3.28-4.23s — indistinguishable. The move is
                # day/machine variance, not a code regression (w8's
                # source was untouched in r6; its bucket-parallel plan
                # shape stays pinned in test_plans.py).
                # Round-8 dedup-family drift check (VERDICT r7 task 4):
                # the uniform r6->r7 +10-35% on d4/d7/d9/d10/d11/d12
                # was re-A/B'd with the same methodology — interleaved
                # fresh subprocesses, EXACT r6 tree (54f7229) vs the
                # round-8 tree, same day, eager-rebuild best-of-3 at
                # sf0.1 (r6-tree vs current, two reps each):
                # d4 3.46/3.62 vs 3.69/3.56; d7 3.19/3.96 vs 3.23/3.84;
                # d9 4.06/4.71 vs 4.40/4.56; d10 1.95/2.14 vs 1.86/2.15;
                # d11 1.60/1.82 vs 1.43/1.97; d12 2.54/2.89 vs 2.30/2.82.
                # The between-tree gap is SMALLER than the within-tree
                # rep spread on every op (current faster on several) —
                # the r6->r7 drift is day variance, not a regression.
                "notes": "sub-100ms ops vary up to ~2.5x with JVM warmth across "
                "session layouts (tools/bench_drift.py); same-layout +-20%; "
                "multi-sec ops vary ~+-25% across days (w8 A/B round 7; "
                "dedup-family A/B round 8 — r6 tree vs r8 tree "
                "indistinguishable, within-tree spread > between-tree gap)",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Round-12 SCALE addendum: replicated-copy growth rungs for the keys
added or re-planned this round (d18, t21, w21, and e13 — whose r11
row measured the retired per-row array_intersect plan). Same
methodology as the main table: best-of-2 timed runs after a warm-up,
eager rebuild inside the timed section, two-sided slack 1.6 per
doubling, rungs k=1,2,4,8.

Usage: python tools/scale_round12_addendum.py   (~5 min; rewrites the
"## Round-12 addendum" section of docs/SCALE.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_to_es_spark.registry import queries
from hive_to_es_spark.session import get_spark
from tools.scale_proof import (
    DOC_MD,
    SF_DIR,
    SLACK,
    bench_one,
    build_scaled,
    fit_exponent,
    scaled_dir,
)

SCALES = [1, 2, 4, 8]
SECTION = "## Round-12 addendum (new/re-planned keys, measured this round)"

# (key, model growth factor per doubling, note)
OPS = [
    (
        "d18_span_dedup",
        2.0,
        "two gram passes (map-combined census + broadcast hot-set probe) "
        "+ per-row array edit + one doc_id join — linear in token mass; "
        "NOTE the ladder makes EVERY base gram hot at k>=2 (each gram "
        "recurs across copies), so flagged mass = full gram mass, the "
        "op's worst case",
    ),
    (
        "t21_repetition_rules",
        2.0,
        "pure scan-side array-HOF projection; no exchange at all",
    ),
    (
        "w21_peak_concurrency_daily",
        2.0,
        "w20's sessionize + carry plan (boundary stream constant under "
        "the ladder — copies share ts) + one bounded day-census prefix",
    ),
    (
        "e13_stream_decontaminate",
        2.0,
        "round-12 re-plan: exploded broadcast-hash join + map-side "
        "per-doc hit count (was: per-row broadcast-array intersect, "
        "7.07s at k=1 in the r11 addendum row)",
    ),
    (
        "t22_dsir_importance",
        2.0,
        "two feature explodes (census + scoring) linear in token mass; "
        "model tables bounded by the constant B=4096 bucket domain, "
        "broadcast back",
    ),
    (
        "x15_domain_pagerank",
        2.0,
        "one map-combined edge census scan is the only corpus-sized "
        "work; all 5 iterations run on the 64-domain tables "
        "(constant under the ladder), so small-k rungs are "
        "iteration-overhead-floored",
    ),
    (
        "d19_source_overlap",
        2.0,
        "distinct + collect_set linear in docs; pair mass bounded by "
        "|sources|^2 regardless of corpus size (ladder copies reuse "
        "the same 20 sources, so output rows are CONSTANT)",
    ),
    (
        "d20_paragraph_dedup",
        2.0,
        "d1's hash-partitioned-window class at paragraph grain: two "
        "data-sized shuffles (para window + doc_id reassembly); NOTE "
        "the ladder replicates every paragraph k-fold, so the hottest "
        "window partition grows k-fold — the op's worst-case skew",
    ),
    (
        "a23_grid_hotspots",
        2.0,
        "one map-combined cell census (eager-materialized) is the "
        "only corpus-sized work; the 9-way spread + equijoin run on "
        "the constant <=1024-cell domain",
    ),
]


def main() -> int:
    spark = get_spark("scale_r12")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {1: SF_DIR}
    for k in SCALES[1:]:
        d = scaled_dir(k)
        if not os.path.isdir(os.path.join(d, "documents.parquet")):
            build_scaled(spark, k)
        dirs[k] = d
    qs = queries()
    rows_md = []
    for key, factor, note in OPS:
        ts = []
        for k in SCALES:
            t, _ = bench_one(spark, qs[key], dirs[k], eager=True)
            ts.append(t)
        b = fit_exponent(SCALES, ts)
        steps = [y / x for x, y in zip(ts, ts[1:])]
        fail = any(g > factor * SLACK for g in steps)
        low = steps[-1] < factor / SLACK
        floor = ts[-1] < 0.5
        verdict = (
            "LOW(floor)" if floor else "FAIL" if fail else "LOW" if low else "PASS"
        )
        t_cells = ", ".join(f"{t:.3f}" for t in ts)
        import math

        rows_md.append(
            f"| `{key}` | {t_cells} | {b:.2f} | {math.log2(factor):.0f} "
            f"| {verdict} — {note} |"
        )
        print(f"{key}: t={t_cells} b={b:.2f} {verdict}")

    lines = [
        SECTION,
        "",
        "Same methodology as above: best-of-2 timed runs after a warm-up,",
        "eager rebuild inside the timed section, two-sided slack 1.6 per",
        "doubling. Rungs k=1,2,4,8 on the replicated-copy ladder.",
        "",
        "| op | t(k=1,2,4,8) s | fitted b | model b | verdict |",
        "|---|---|---|---|---|",
        *rows_md,
        "",
    ]
    md = open(DOC_MD).read()
    block = "\n".join(lines)
    if SECTION in md:
        md = re.sub(re.escape(SECTION) + r".*?(?=\n## |\Z)", block, md, flags=re.S)
    else:
        md = md.rstrip() + "\n\n" + block + "\n"
    with open(DOC_MD, "w") as f:
        f.write(md)
    print(f"updated {DOC_MD}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

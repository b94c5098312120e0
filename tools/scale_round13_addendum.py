#!/usr/bin/env python
"""Round-13 SCALE addendum: replicated-copy growth rungs for the keys
added this round (o15, e14, t23). Same methodology as the main table:
best-of-2 timed runs after a warm-up, eager rebuild inside the timed
section, two-sided slack 1.6 per doubling, rungs k=1,2,4,8.

Usage: python tools/scale_round13_addendum.py   (~5 min; rewrites the
"## Round-13 addendum" section of docs/SCALE.md)
"""

from __future__ import annotations

import math
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
SECTION = "## Round-13 addendum (new keys, measured this round)"

# (key, model growth factor per doubling, note)
OPS = [
    (
        "o15_perplexity_buckets",
        2.0,
        "t8 scoring (explode + word-census join) checkpointed once; "
        "census + boundary work bounded by the 4-dp score value "
        "domain; decision + draw scan-side. NOTE the ladder "
        "replicates docs identically, so the score census is "
        "CONSTANT across rungs — growth is the two corpus passes",
    ),
    (
        "e14_stream_dedup_watermarked",
        2.0,
        "iterative horizon chain: per round one struct-min aggregate "
        "+ one event_id join over the shrinking remainder; chain "
        "depth fixed at 2 by the redelivery construction, so rungs "
        "price two data-sized rounds + one ~1/13-sized round",
    ),
    (
        "t24_char_entropy",
        2.0,
        "pure scan-side array-program census (t21 class) — no "
        "exchange before the tiny output; linear in char mass",
    ),
    (
        "t25_lm_score_topk",
        2.0,
        "two corpus scans (census + scoring), vocab = constant K=20 "
        "rows broadcast; no word-keyed corpus shuffle (t8's is gone)",
    ),
    (
        "t23_unigram_lm_train",
        2.0,
        "word census scan + accounting scan are the only corpus-sized "
        "stages; ALL EM work (seed/E1/M/E2) runs on the 31-word "
        "census, CONSTANT under the ladder — small-k rungs are "
        "EM-overhead-floored",
    ),
]


def main() -> int:
    spark = get_spark("scale_r13")
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
        "doubling. Rungs k=1,2,4,8 on the replicated-copy ladder. (The",
        "d18 k=50 paper-shape rung for this round lives in its own",
        "section above.)",
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

#!/usr/bin/env python
"""Attribute the r3->r4 extended-set bench drift (VERDICT r4, What's
wrong #2): do the six drifted ops (s2, d1, d6, w4, e1, j10) time
differently in a fresh minimal session vs after the full bench layout
vs with lifecycle sweeps between ops?

Runs each variant in a FRESH subprocess (cold JVM, no shared session
state) and prints one JSON line per variant with 5 timed runs per op
(all runs kept, not just best, so spread is visible).

Usage: python tools/bench_drift.py            # all three variants
       python tools/bench_drift.py isolated   # one variant
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

OPS = [
    "s2_pairwise_topk",
    "d1_dedup_exact",
    "d6_dedup_lsh_blocked",
    "w4_range_frame",
    "e1_tumbling",
    "j10_interval_overlap",
]

VARIANTS = ("isolated", "after_full_bench", "with_sweeps")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from hive_to_es_spark.registry import queries
from hive_to_es_spark.session import get_spark

variant = {variant!r}
ops = {ops!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("drift-" + variant)
spark.sparkContext.setLogLevel("ERROR")
qs = queries()

if variant == "after_full_bench":
    # replicate bench.py's session history: one warm collect of every
    # benched query before the timed section
    import bench
    for name in bench.FLAGSHIPS + bench.EXTENSION:
        qs[name](spark, sf_dir).collect()

def sweep():
    if variant == "with_sweeps":
        from hive_to_es_spark.functions.lifecycle import release_all_persistent
        release_all_persistent(spark)

out = {{}}
for name in ops:
    df = qs[name](spark, sf_dir)
    df.collect()  # warm-up (bench.py method; none of the 6 is EAGER_BUILD)
    runs = []
    for _ in range(5):
        sweep()
        t0 = time.perf_counter()
        df.collect()
        runs.append(round(time.perf_counter() - t0, 4))
    out[name] = runs
print(json.dumps({{"variant": variant, "runs": out}}))
"""


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wanted = sys.argv[1:] or list(VARIANTS)
    for variant in wanted:
        code = _CHILD.format(repo=repo, variant=variant, ops=OPS)
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=False
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(json.dumps({"variant": variant, "error": r.stderr[-500:]}))
            continue
        print(line[-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

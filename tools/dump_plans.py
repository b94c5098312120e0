#!/usr/bin/env python
"""Dump .explain("formatted") output for registered keys to files.

Usage:
    python tools/dump_plans.py before [key ...]   # -> plans/$ROUND/<key>_before.txt
    python tools/dump_plans.py after  [key ...]   # -> plans/$ROUND/<key>_after.txt

The output round directory defaults to r15; override with the
SPARK_GRAFT_PLANS_ROUND env var (e.g. SPARK_GRAFT_PLANS_ROUND=r14).

Default key set: every key named in bench.py (FLAGSHIPS + EXTENSION).
The formatted plan is the per-round optimization evidence: Exchange
count, join strategy, PushedFilters/ReadSchema, WholeStageCodegen
spans, BatchEvalPython/ArrowEvalPython nodes.

Keys that do eager work at build time (bench.EAGER_BUILD) still only
dump the FINAL DataFrame's plan — the iterative/checkpointed stages
run at build and their per-round plans are not capturable in one
explain; the final plan plus the op's docstring is the evidence.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_to_es_spark.registry import queries
from hive_to_es_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> int:
    # ADVICE r14: no args must print usage, not crash with IndexError
    if len(sys.argv) < 2 or sys.argv[1] not in ("before", "after"):
        print(__doc__)
        return 2
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = bench.FLAGSHIPS + bench.EXTENSION
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for key in keys:
        try:
            df = qs[key](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture build failures verbatim
            text = f"BUILD FAILED: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

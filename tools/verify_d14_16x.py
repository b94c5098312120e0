#!/usr/bin/env python
"""Exact, disk-bounded 16x verification for d14_canonical_pick
(round 12, r11-verdict task 4).

d14's DuckDB oracle deliberately restates the pair stream as
brute-force exact Jaccard over ALL document pairs; under the
replicated-copy scale ladder that replay is quadratic and died on
ENOSPC at 16x (>79 GB of DuckDB temp — CHECK_r11_scale16x.json). The
operator itself is fine there; only the independent check was
missing. This tool closes the hole with a LIFTED replay that is
exact, not sampled:

Theorem (replicated-copy lift). tools/scale_proof.build_scaled
constructs the k-x documents table as k copies of the base table with
doc_id offsets (doc_id + i*OFFSET, i in 0..k-1) and IDENTICAL
text/n_chars/source. Jaccard similarity depends only on text, so for
copies x = i*OFFSET + a, y = j*OFFSET + b:
  J(x, y) = J(a, b), and J(copies of the same base doc) = 1 >= tau.
Hence the k-x pair graph is exactly the base pair graph lifted: all
copies of one base doc form a clique, and copies of base docs a, b
connect iff (a, b) connect at base scale. Therefore
  component_kx(any copy of a) = { all k copies of every b in
                                  component_base(a) },
  group_size_kx = k * group_size_base, and the canonical (max
n_chars, min doc_id tiebreak) is the UNMODIFIED base copy (i = 0) of
the base component's canonical, since n_chars ties across copies and
i = 0 minimizes doc_id (base ids < OFFSET).

So: run d14's (feasible, already hash-passing) DuckDB oracle at the
BASE scale, lift it k-fold in pure Python, and compare EXACTLY with
the Spark operator's output over the real k-x parquet. The DuckDB
side never touches the k-x data; the Spark side runs the full 16x
plan. A pass proves the 16x run row-for-row, including that the
MinHash prefilter lost no pair at 16x.

Usage: python tools/verify_d14_16x.py [k]      (default k=16)
Writes nothing; prints one JSON line with the cell to record in
CHECK_r{N}_scale16x.json for d14.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_to_es_spark.registry import queries, oracles
from hive_to_es_spark.session import get_spark
from tools.check import duck_connect
from tools.scale_proof import OFFSET, SF_DIR, build_scaled, scaled_dir


def lifted_expected(base_rows, k: int) -> set[tuple]:
    """Lift the base-scale oracle output k-fold per the theorem."""
    out = set()
    for doc_id, canonical_id, _is_canon, group_size in base_rows:
        for i in range(k):
            x = doc_id + i * OFFSET
            out.add(
                (
                    x,
                    canonical_id,  # base copy of the base canonical
                    1 if x == canonical_id else 0,
                    k * group_size,
                )
            )
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("verify_d14")
    spark.sparkContext.setLogLevel("ERROR")
    sdir = scaled_dir(k)
    if not os.path.isdir(os.path.join(sdir, "documents.parquet")):
        print(f"building {sdir} ...", file=sys.stderr)
        build_scaled(spark, k)

    con = duck_connect(SF_DIR)
    base = con.execute(oracles()["d14_canonical_pick"]).fetchall()
    expected = lifted_expected(base, k)

    t0 = time.time()
    got = {
        (r.doc_id, r.canonical_id, r.is_canonical, r.group_size)
        for r in queries()["d14_canonical_pick"](spark, sdir).collect()
    }
    secs = round(time.time() - t0, 2)

    missing = expected - got
    extra = got - expected
    ok = not missing and not extra
    cell = {
        "status": "pass" if ok else "fail",
        "method": (
            f"lifted replay (tools/verify_d14_16x.py): DuckDB oracle at base "
            f"{os.path.basename(SF_DIR)} lifted {k}x via the replicated-copy "
            f"theorem, compared EXACTLY (set equality on all 4 columns) with "
            f"the Spark operator over the real {k}x parquet — disk-bounded, "
            f"not sampled"
        ),
        "rows": len(got),
        "sec": secs,
    }
    if not ok:
        cell["err"] = (
            f"{len(missing)} expected rows missing, {len(extra)} unexpected; "
            f"sample missing={sorted(missing)[:3]} extra={sorted(extra)[:3]}"
        )
    print(json.dumps({"d14_canonical_pick": cell}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

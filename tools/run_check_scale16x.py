#!/usr/bin/env python
"""Full-inventory 16x oracle sweep -> CHECK_r{N}_scale16x.json.

Runs tools/check.py's sweep over every registered key at the
.tmp/scale16x replicated-copy dir, EXCEPT d14_canonical_pick's DuckDB
oracle, which is ENOSPC-infeasible at 16x by construction (the oracle
deliberately restates the pair stream as brute-force exact Jaccard
over all pairs; at 16x it spilled >79 GB of DuckDB temp in round 11
— more than this machine's free disk). d14 is instead verified by
tools/verify_d14_16x.py's EXACT lifted replay (disk-bounded; see the
theorem there), and its cell is patched into the artifact from that
run, so the sweep has zero unverified and zero infeasible cells.

Usage: python tools/run_check_scale16x.py CHECK_r12_scale16x.json
(~3.5 h; do NOT edit hive_to_es_spark/ modules while it runs)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_to_es_spark.registry import queries
from tools.scale_proof import scaled_dir

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "CHECK_scale16x.json"
    sdir = scaled_dir(16)
    if not os.path.isdir(os.path.join(sdir, "documents.parquet")):
        print("scale16x dir missing — build it first (tools/verify_d14_16x.py 16)")
        return 1

    # 1) d14 via the lifted replay (fast; also builds nothing extra)
    d14 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_d14_16x.py"), "16"],
        capture_output=True,
        text=True,
    )
    d14_cell = json.loads(d14.stdout.strip().splitlines()[-1])["d14_canonical_pick"]
    print(f"d14 lifted replay: {d14_cell['status']}")

    # 2) everything else through the standard sweep
    keys = [k for k in queries() if k != "d14_canonical_pick"]
    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check.py"),
            "--json",
            out,
            "--sf-dirs",
            sdir,
            *keys,
        ],
        cwd=REPO,
    ).returncode

    # 3) patch the d14 cell + summary, relabel the sweep key
    with open(os.path.join(REPO, out)) as f:
        art = json.load(f)
    (label, results), = art["sweeps"].items()
    results["d14_canonical_pick"] = d14_cell
    art["sweeps"] = {"scale16x": results}
    art["summary"] = {
        "scale16x": {
            s: sum(1 for r in results.values() if r["status"] == s)
            for s in ("pass", "fail", "rows_only")
        }
    }
    art["keys_total"] = len(results)
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"patched {out}: {art['summary']}")
    return rc or (0 if d14_cell["status"] == "pass" else 1)


if __name__ == "__main__":
    raise SystemExit(main())

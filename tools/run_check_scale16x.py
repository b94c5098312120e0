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

CHUNKED since round 12: one check.py subprocess per CHUNK of keys,
each with a fresh JVM. The round-12 single-process run died mid-sweep
(py4j gateway gone — driver memory creep across ~50 16x keys,
d2's MLlib MinHashLSH the straw), which turned every later key into a
spurious 'spark query raised' fail. Chunking bounds driver lifetime;
per-chunk partial artifacts are merged at the end, so a crashed chunk
costs only its own keys (retried once) and is LABELED failed rather
than poisoning the rest.

Usage:
  python tools/run_check_scale16x.py CHECK_r12_scale16x.json [key ...]
(~hours for the full inventory; do NOT edit hive_to_es_spark/ modules
while it runs. Pass explicit keys for a subset run — the artifact then
records exactly those keys.)
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
CHUNK = 20  # keys per fresh-JVM check.py subprocess


def _run_chunk(chunk: list[str], sdir: str, idx: int) -> dict:
    """One check.py subprocess; returns its per-key results dict."""
    part = os.path.join(REPO, f".tmp/check16x_part{idx}.json")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "check.py"),
            "--json",
            part,
            "--sf-dirs",
            sdir,
            *chunk,
        ],
        cwd=REPO,
    )
    try:
        with open(part) as f:
            art = json.load(f)
        ((_, results),) = art["sweeps"].items()
        return results
    except Exception as ex:  # chunk crashed before writing
        return {k: {"status": "fail", "err": f"chunk crashed: {ex}"} for k in chunk}
    finally:
        try:
            os.remove(part)
        except OSError:
            pass


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "CHECK_scale16x.json"
    want = sys.argv[2:]  # optional explicit subset
    sdir = scaled_dir(16)
    if not os.path.isdir(os.path.join(sdir, "documents.parquet")):
        print("scale16x dir missing — build it first (tools/verify_d14_16x.py 16)")
        return 1

    all_keys = [k for k in queries() if k != "d14_canonical_pick"]
    keys = [k for k in all_keys if not want or k in want]

    # 1) d14 via the lifted replay (fast; also builds nothing extra)
    results: dict[str, dict] = {}
    if not want or "d14_canonical_pick" in want:
        d14 = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "verify_d14_16x.py"), "16"],
            capture_output=True,
            text=True,
        )
        results["d14_canonical_pick"] = json.loads(
            d14.stdout.strip().splitlines()[-1]
        )["d14_canonical_pick"]
        print(f"d14 lifted replay: {results['d14_canonical_pick']['status']}")

    # 2) everything else through chunked fresh-JVM sweeps; EVERY
    #    failed key gets one fresh-JVM retry — that covers both the
    #    mid-run 'spark query raised' poisoning AND a chunk that died
    #    before writing its partial artifact ('chunk crashed: ...'),
    #    while a deterministic fail just fails again and keeps its
    #    label (ADVICE r12: the old 'raised'-substring filter skipped
    #    the crashed-chunk class the docstring promised to retry)
    for idx in range(0, len(keys), CHUNK):
        chunk = keys[idx : idx + CHUNK]
        got = _run_chunk(chunk, sdir, idx // CHUNK)
        retry = [
            k for k in chunk if got.get(k, {}).get("status") == "fail"
        ]
        if retry:
            print(f"retrying {len(retry)} keys from crashed/failed chunk {idx // CHUNK}")
            got.update(_run_chunk(retry, sdir, 1000 + idx // CHUNK))
        results.update(got)
        done = sum(1 for r in results.values() if r.get("status") == "pass")
        print(f"[chunk {idx // CHUNK}] cumulative: {done} pass / {len(results)} run")

    # subset runs label every unswept key explicitly so the artifact
    # is reproducible from this tool alone (ADVICE r12: the r12
    # summary's not_run count was hand-patched, with no per-key cells)
    if want:
        for k in ["d14_canonical_pick", *all_keys]:
            if k not in results:
                results[k] = {
                    "status": "not_run_this_round",
                    "err": "subset run: key not in the requested list; "
                    "see the previous full-inventory artifact",
                }
    art = {
        "keys_total": len(results),
        "summary": {
            "scale16x": {
                s: sum(1 for r in results.values() if r["status"] == s)
                for s in ("pass", "fail", "rows_only", "not_run_this_round")
            }
        },
        "sweeps": {"scale16x": results},
    }
    if want:
        art["note"] = (
            "subset run: only the listed keys were swept at 16x this round; "
            "unswept keys carry explicit not_run_this_round cells"
        )
    with open(os.path.join(REPO, out), "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {art['summary']}")
    return 0 if art["summary"]["scale16x"]["fail"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI entry point: run sync jobs from a JSON config file.

    python -m hive_to_es_spark --config jobs.json [--sf-dir DIR] [--cpus N]

Mirrors the reference tool's invocation shape: a config file listing
jobs (source, optional incremental predicate, projection, id column,
sink), executed in order, with a per-job row-count summary printed as
one JSON line (machine-parseable, like bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hive_to_es_spark")
    ap.add_argument("--config", required=True, help="JSON config file ({'jobs': [...]})")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="source data directory")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    args = ap.parse_args(argv)

    from hive_to_es_spark.pipeline import jobs_from_config, run_jobs
    from hive_to_es_spark.session import get_spark

    with open(args.config) as f:
        jobs = jobs_from_config(json.load(f))
    spark = get_spark("hive_to_es_spark_cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    summary = run_jobs(spark, args.sf_dir, jobs)
    print(json.dumps({"jobs": {r.job_name: r.n_rows for r in summary.collect()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

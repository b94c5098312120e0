"""Keyed upsert-merge for incremental syncs.

The reference's incremental mode is an UPSERT: re-imported documents
overwrite their previous version by `_id`. Elasticsearch gives that
away for free (`es.write.operation=upsert`); a parquet/file sink needs
it implemented. This is the batch form: union old + new, keep the
newest version per key (deterministic window), rewrite.

Scale notes: the window shuffles once on the key — same cost class as
the join any merge needs. For partitioned sinks, merge per affected
partition only (pass the partition predicate as `scope`), which is the
standard big-table pattern: never rewrite data the increment cannot
have touched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

VERSION_COL = "__version"


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    order_by: str | None = None,
) -> DataFrame:
    """Return existing ⟂ updates merged by `key`, updates winning.

    If `order_by` is given, the row with the greatest (order_by, side)
    wins — side breaks exact ties in favor of updates. Without it,
    updates always replace existing rows with the same key.
    """
    tagged_old = existing.withColumn(VERSION_COL, F.lit(0))
    tagged_new = updates.withColumn(VERSION_COL, F.lit(1))
    unioned = tagged_old.unionByName(tagged_new)
    order: list[Column] = []
    if order_by is not None:
        order.append(F.col(order_by).desc())
    order.append(F.col(VERSION_COL).desc())
    w = Window.partitionBy(key).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", VERSION_COL)
    )


def merge_into_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    scope: Column | None = None,
) -> None:
    """Upsert `updates` into the parquet dataset at `path`.

    `scope` restricts which existing rows participate (e.g. the date
    partitions the increment touches); out-of-scope rows pass through
    untouched. The rewrite is staged through a temp dir because the
    source of a write cannot also be its target.
    """
    import shutil
    import tempfile

    existing = spark.read.parquet(path)
    if scope is not None:
        in_scope = existing.filter(scope)
        out_scope = existing.filter(~scope)
        merged = merge_upsert(in_scope, updates, key).unionByName(out_scope)
    else:
        merged = merge_upsert(existing, updates, key)
    staging = tempfile.mkdtemp(prefix="merge_stage_")
    try:
        merged.write.mode("overwrite").parquet(staging)
        back = spark.read.parquet(staging)
        back.write.mode("overwrite").parquet(path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

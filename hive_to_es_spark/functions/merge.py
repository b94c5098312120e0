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


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path` via the Hadoop API.

    The one place the package touches py4j internals: `spark._jvm` /
    `spark._jsc` are classic-Spark-only (absent under Spark Connect).
    Driver-local `os.path` checks are wrong for hdfs://S3A/file:-URI
    sinks, so every path-existence or rename decision about a SINK
    must route through here."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    target = jvm_path(path)
    return target.getFileSystem(spark._jsc.hadoopConfiguration()), target


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Sink-filesystem existence check (see _hadoop_fs)."""
    fs, target = _hadoop_fs(spark, path)
    return bool(fs.exists(target))


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    key: str,
    order_by: str | list[str] | None = None,
) -> DataFrame:
    """Return existing ⟂ updates merged by `key`, updates winning.

    If `order_by` is given (one column or a list, compared in order),
    the row with the greatest (order_by..., side) wins — side breaks
    exact ties in favor of updates. Without it, updates always replace
    existing rows with the same key. A multi-column order matters for
    out-of-order increments: streaming micro-batches arrive in FILE
    order, not event-time order, so the winner must be decided by
    (event_time, unique_id), never by arrival."""
    tagged_old = existing.withColumn(VERSION_COL, F.lit(0))
    tagged_new = updates.withColumn(VERSION_COL, F.lit(1))
    unioned = tagged_old.unionByName(tagged_new)
    order: list[Column] = []
    if order_by is not None:
        cols = [order_by] if isinstance(order_by, str) else list(order_by)
        order.extend(F.col(c).desc() for c in cols)
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
    order_by: str | list[str] | None = None,
) -> None:
    """Upsert `updates` into the parquet dataset at `path`.

    `scope` restricts which existing rows participate (e.g. the date
    partitions the increment touches); out-of-scope rows pass through
    untouched.

    The merged output is written ONCE, to a staging directory that is
    a SIBLING of the sink (same filesystem — executors must be able to
    write it on a real cluster; a driver-local tempdir would not
    exist there), then swapped in via FileSystem.rename. Failure
    behavior: if the staging write fails, the target is untouched; if
    the delete/rename step fails, the staging copy SURVIVES for manual
    recovery — at no point do both copies cease to exist. (True
    atomicity needs a transactional table format; rename is atomic on
    HDFS/local, best-effort on S3.)
    """
    existing = spark.read.parquet(path)
    if scope is not None:
        in_scope = existing.filter(scope)
        out_scope = existing.filter(~scope)
        merged = merge_upsert(in_scope, updates, key, order_by).unionByName(out_scope)
    else:
        merged = merge_upsert(existing, updates, key, order_by)
    write_replace_parquet(spark, path, merged)


def write_replace_parquet(spark: SparkSession, path: str, df: DataFrame) -> None:
    """Replace the parquet dataset at `path` with `df`, safely even
    when `df`'s plan READS from `path`: write once to a sibling
    staging dir, then swap via FileSystem.rename (atomic on HDFS/
    local, best-effort on S3). If the staging write fails the target
    is untouched; if the swap fails the staging copy survives for
    manual recovery — at no point do both copies cease to exist."""
    import uuid

    staging = path.rstrip("/") + "_staging_" + uuid.uuid4().hex
    df.write.mode("overwrite").parquet(staging)
    # swap via the Hadoop FileSystem API (portable across local/HDFS)
    fs, target_p = _hadoop_fs(spark, path)
    _, staging_p = _hadoop_fs(spark, staging)  # sibling => same filesystem
    fs.delete(target_p, True)
    if not fs.rename(staging_p, target_p):
        raise IOError(
            f"rename {staging} -> {path} failed; merged data is intact at {staging}"
        )


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive sink-filesystem delete (see _hadoop_fs; classic-only).
    Returns False if the path did not exist."""
    fs, target = _hadoop_fs(spark, path)
    if not fs.exists(target):
        return False
    return bool(fs.delete(target, True))

"""Explicit block-manager lifecycle for materialized frames.

`localCheckpoint` / `persist` pin blocks in the executor block manager
until the backing RDD is garbage-collected JVM-side — which, driven
from Python, is effectively "until session end" (py4j holds the refs;
measured in this container: blocks survive gc.collect() +
System.gc()). Long-lived sessions that build operators repeatedly
(tools/check.py runs all 133; tests build the registry twice) would
accumulate dead blocks without explicit release. These helpers give
the two release points the codebase needs:

- `release_checkpoint(df)` — free the blocks behind ONE checkpointed
  frame, for loops that retire a round's state (functions/graph.py).
  Only call when nothing will read `df` again: a localCheckpoint has
  truncated lineage, so a released frame CANNOT be recomputed
  (Spark raises CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND).
- `release_all_persistent(spark)` — sweep every persistent RDD in the
  context, for harnesses at a point where no live frame is needed
  (tools/check.py after each key's result is already in pandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Cut lineage and pin a frame's rows, choosing the storage tier:

    - `checkpoint_dir=None` (default): `localCheckpoint` — executor
      block manager, no extra IO. Correct locally and fastest, but on
      a real cluster a lost executor loses its blocks and the frame
      CANNOT recompute (lineage is gone) — acceptable only for
      restartable jobs.
    - `checkpoint_dir=<path>`: RELIABLE checkpoint into that directory
      (shared storage on a cluster — HDFS/S3/NFS); survives executor
      loss. This is the knob long iterative jobs (connected
      components, the dedup pair plans) thread through for fault
      tolerance at 100 TB.

    `setCheckpointDir` is context-global in Spark; for a fixed dir it
    is set once per context (one dir per job run is the normal
    discipline). The guard caches the last dir WE set on the context
    object — `getCheckpointDir()` cannot be compared against the
    caller's path because Spark returns the qualified
    '<dir>/<uuid>' subdirectory it created, so a naive compare
    re-points (and re-mkdirs a fresh uuid dir) on every call.
    Caveat: the cache cannot see an external sc.setCheckpointDir()
    made between materialize calls — if other code re-points the
    context-global dir mid-job, pass a fresh checkpoint_dir (or keep
    one dir per job, the discipline above)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if getattr(sc, "_h2es_checkpoint_dir", None) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        sc._h2es_checkpoint_dir = checkpoint_dir
    return df.checkpoint(eager=eager)


def release_checkpoint(df: DataFrame) -> bool:
    """Free the block-manager storage behind a localCheckpoint'ed
    DataFrame. Returns True if blocks were released. Best-effort: a
    frame whose analyzed plan is not a bare LogicalRDD (i.e. not the
    object localCheckpoint returned) is left alone."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False


def release_all_persistent(spark: SparkSession) -> int:
    """Unpersist EVERY persistent RDD in the SparkContext (cached,
    persisted, and localCheckpoint'ed frames alike). Returns the
    number released. Only safe when no live DataFrame will be read
    again — checkpointed frames cannot recompute."""
    sc = spark.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    ids = list(jmap.keySet())
    for rid in ids:
        try:
            jmap.get(rid).unpersist(False)
        except Exception:
            pass
    return len(ids)

"""SparkSession factory with the engine's binding configuration.

Local test profile: local[N] single JVM. At cluster scale the same
configs apply except master/shuffle-partitions sizing; see
docs/SCALE.md for the 1000-executor posture.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level SQL confs the engine requires. These are also applied
# defensively at load time (io.load_tables) because the driver may hand
# us a session we did not build.
REQUIRED_RUNTIME_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark 4.x refuses
    # natively (PARQUET_TYPE_ILLEGAL); read as bigint nanos instead and
    # rebuild the column (io.load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic wall-clock semantics matching DuckDB's naive
    # timestamps (the correctness oracle). io.read_table additionally
    # asserts UTC before normalizing events.ts, because this apply is
    # best-effort on externally built sessions.
    "spark.sql.session.timeZone": "UTC",
    # events.ts in its TIMESTAMP(MICROS, isAdjustedToUTC=false) form
    # must surface as TIMESTAMP_NTZ for io.read_table's cast branch to
    # fire; this is the default, pinned so a driver session that turns
    # it off cannot change which branch normalizes the column.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def get_spark(app_name: str = "hive_to_es_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    local[cpus] for tests/bench; AQE on (runtime re-plan: broadcast
    conversion, partition coalescing, skew-join splitting) — the
    knob that makes the same declarative plans survive a 100x
    scale-up without hand-tuning.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Arrow for every pandas interchange (UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Index/export parquet writes (d16/e11/s16-s18 lifecycles, p27
        # shards) use zstd: measured round 15 on the two heaviest
        # index-writing keys — wall-NEUTRAL locally (d16/e11 A/B,
        # 2 reps x 3 runs each codec, within noise) at 39% fewer
        # bytes than snappy (guide §6) — the at-scale read/write IO
        # and storage win with no semantic surface (readers
        # autodetect the codec per column chunk).
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_confs(spark: SparkSession) -> None:
    """Set required runtime-settable confs on an externally built session."""
    for k, v in REQUIRED_RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Immutable in this session build; reads will fail loudly
            # later if the conf truly differs.
            pass

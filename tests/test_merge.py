"""Upsert-merge semantics: updates win, untouched rows survive,
scoped merges leave out-of-scope data alone."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_to_es_spark.functions.merge import merge_into_parquet, merge_upsert


def test_updates_replace_by_key(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING")
    new = spark.createDataFrame([(2, "B"), (4, "d")], "k INT, v STRING")
    got = {r.k: r.v for r in merge_upsert(old, new, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_order_by_prefers_newer_timestamp(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k INT, v STRING, ts INT")
    stale_update = spark.createDataFrame([(1, "STALE", 5)], "k INT, v STRING, ts INT")
    got = {r.k: r.v for r in merge_upsert(old, stale_update, "k", order_by="ts").collect()}
    assert got == {1: "a"}  # older update does NOT clobber newer data


def test_merge_into_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "ds")
    spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING").write.parquet(path)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k INT, v STRING")
    merge_into_parquet(spark, path, updates, "k")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scoped_merge_leaves_other_partitions(spark, tmp_path):
    path = str(tmp_path / "ds")
    spark.createDataFrame(
        [(1, "2024", "a"), (2, "2024", "b"), (3, "2025", "c")], "k INT, y STRING, v STRING"
    ).write.parquet(path)
    updates = spark.createDataFrame([(1, "2024", "A")], "k INT, y STRING, v STRING")
    merge_into_parquet(spark, path, updates, "k", scope=F.col("y") == "2024")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "A", 2: "b", 3: "c"}

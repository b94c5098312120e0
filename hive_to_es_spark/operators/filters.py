"""Projection / filter / predicate operators (SURVEY.md §2.B, f1-f5).

All predicates stay Column expressions (never Python UDFs) so Catalyst
pushes them into the parquet scan — at 100 TB these run as row-group
skips + partition pruning, not post-scan filters. Verify with
.explain(): PushedFilters must list them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_to_es_spark.functions.money import sum_cents
from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

_F1_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity >= 45 AND l_discount > 0.05 AND l_returnflag IN ('A', 'R')
"""


@register("f1_pred_basic", _F1_ORACLE)
def f1_pred_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + boolean + IN-list predicates, pushed to the scan."""
    li = load_tables(spark, sf_dir).lineitem
    return li.filter(
        (F.col("l_quantity") >= 45)
        & (F.col("l_discount") > 0.05)
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


# Fixtures carry no NULLs, so nullability is manufactured with
# nullif(l_discount, 0) — then IS NULL / null-safe equality are exercised.
_F2_ORACLE = """
SELECT
  count(*) AS n_rows,
  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
  CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq
FROM lineitem
"""


@register("f2_pred_null", _F2_ORACLE)
def f2_pred_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: IS [NOT] NULL + null-safe equality (<=>)."""
    li = load_tables(spark, sf_dir).lineitem
    d = F.nullif(F.col("l_discount"), F.lit(0.0))
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return li.agg(
        F.count("*").alias("n_rows"),
        one_if(d.isNull()).alias("n_null"),
        one_if(d.isNotNull()).alias("n_not_null"),
        one_if(d.eqNullSafe(F.lit(0.05))).alias("n_nullsafe_eq"),
    )


_F3_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type
FROM part
WHERE p_name LIKE '%red%' OR regexp_matches(p_type, '^(PROMO|SMALL)')
"""


@register("f3_pred_like", _F3_ORACLE)
def f3_pred_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE and regex (RLIKE) pattern predicates."""
    p = load_tables(spark, sf_dir).part
    return p.filter(
        F.col("p_name").like("%red%") | F.col("p_type").rlike("^(PROMO|SMALL)")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


_F4_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice BETWEEN 100000 AND 200000
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


@register("f4_pred_between_in", _F4_ORACLE)
def f4_pred_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN + IN-subquery (compiled as a left-semi join)."""
    t = load_tables(spark, sf_dir)
    building = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        t.orders.filter(F.col("o_totalprice").between(100000, 200000))
        .join(building, t.orders.o_custkey == building.c_custkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_F5_ORACLE = """
SELECT
  CASE WHEN o_totalprice < 50000 THEN 'small'
       WHEN o_totalprice < 200000 THEN 'mid'
       ELSE 'big' END AS bucket,
  count(*) AS n,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY 1
"""


@register("f5_case_when", _F5_ORACLE)
def f5_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection feeding an aggregation."""
    o = load_tables(spark, sf_dir).orders
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("big")
    )
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), sum_cents("o_totalprice").alias("total_cents"))
    )


# NULL keys are manufactured on BOTH sides (nullif) so the null-safe
# join's distinguishing behavior — NULL matches NULL — carries rows
# that a plain equi join would drop.
_F6_ORACLE = """
SELECT coalesce(c.seg, 'NULL_SEG') AS seg_label,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer) c
JOIN (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg FROM customer) s
  ON c.seg IS NOT DISTINCT FROM s.seg
GROUP BY c.seg
"""


@register("f6_null_safe_eq", _F6_ORACLE)
def f6_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (HiveQL `<=>` / SQL IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of vanishing — the semantics a
    sync job needs when the join key is legitimately nullable (else
    every NULL-keyed row silently drops from the output and the sink
    under-counts). 'BUILDING' is nullif'd to NULL on both sides, so
    the null-null bucket is the largest group and any engine that
    planned a plain equi join loses it entirely.

    Plan note: Spark plans eqNullSafe as a hash join on a
    null-coalesced key (EqualNullSafe is still an equi predicate),
    NOT a nested loop — same shuffle shape as j1 at any scale.
    """
    c = load_tables(spark, sf_dir).customer
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    left = c.select("c_custkey", seg)
    right = c.select(seg).distinct()
    return (
        left.join(right, left.seg.eqNullSafe(right.seg))
        .groupBy(left.seg)
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .select(F.coalesce(left.seg, F.lit("NULL_SEG")).alias("seg_label"), "n_pairs")
    )

"""Aggregation operators (SURVEY.md §2.B "Aggregation", keys a1-a11).

All grouped aggregation compiles to HashAggregateExec with automatic
partial (map-side) + final aggregation — one shuffle on the group
keys, no driver involvement. At 100 TB the only knobs are shuffle
partition sizing (AQE coalesces) and key skew (AQE skew handling);
nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

# TPC-H Q1 shape: scan + filter + 8-way grouped agg on lineitem.
# Flagship query (BASELINE.md row 1). Doubles rounded 2dp (money) /
# 6dp (averages) on BOTH engines for hash-stable cross-engine values.
_A1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 6)                                        AS avg_qty,
  round(avg(l_extendedprice), 6)                                   AS avg_price,
  round(avg(l_discount), 6)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("a1_hash_agg", _A1_ORACLE)
def a1_hash_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/count (TPC-H Q1 shape) — partial+final hash agg."""
    li = load_tables(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )

"""Window-function operators (SURVEY.md §2.B "Window functions", w1-w7).

Windows shuffle once on the partition key, then sort within each
partition — at 100 TB the cost profile is one exchange + per-partition
sort, the same as a sort-merge join side. Partition keys here are
high-cardinality (o_custkey) or low-count-but-huge (l_returnflag,
where the per-partition sort dominates and spills via
UnsafeExternalSorter); neither collects to the driver.

Gotchas baked in (FIXTURES.md "Cross-engine gotchas"):
- Spark SQL has no QUALIFY — window output filtered via a subquery
  (DataFrame: filter after the projection).
- Every ORDER BY inside a window carries a unique tiebreaker
  (o_orderkey / l_linenumber) so rank/ntile/cume_dist are
  deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

# Per-customer ordering used by w2/w3/w6: orderdate then key (unique).
# A function, not a module constant: Window specs need an active
# session, which does not exist at import time.
def _by_cust_date() -> Window:
    return Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )

_W1_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
)
WHERE rnk <= 3
"""


@register("w1_order_rank", _W1_ORACLE)
def w1_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — flagship (BASELINE.md row 4).

    rank() over a unique total order (price desc, key asc), then the
    no-QUALIFY subquery filter.
    """
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


_W2_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


@register("w2_running_sum", _W2_ORACLE)
def w2_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer total — ROWS unbounded-preceding frame."""
    o = load_tables(spark, sf_dir).orders
    w = _by_cust_date().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


_W3_ORACLE = """
SELECT o_custkey, o_orderkey,
       lag(o_totalprice, 1) OVER w  AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price,
       round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


@register("w3_lag_lead", _W3_ORACLE)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics with NULL edges per partition."""
    o = load_tables(spark, sf_dir).orders
    w = _by_cust_date()
    prev = F.lag("o_totalprice", 1).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.round(F.col("o_totalprice") - prev, 2).alias("delta_prev"),
    )


# RANGE frame over a numeric order key: the frame covers value range
# [l_quantity - 1, l_quantity], peers included — deterministic under
# ties by construction (no tiebreaker needed for RANGE).
_W4_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_returnflag ORDER BY l_quantity
         RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS range_sum
FROM lineitem
"""


# Default ceiling on distinct (partition, order) pairs for w4's
# broadcast rewrite: 100k pairs ≈ a few MB broadcast (well under the
# 10 MB autoBroadcast default), measured from the approx-distinct scan
# below. Above it the aggregate itself is no longer a "tiny" table and
# the plain partitioned RANGE window is the right plan.
RANGE_BROADCAST_LIMIT = 100_000


def range_frame_sum(
    li: DataFrame,
    part_col: str,
    order_col: str,
    sum_col: str,
    delta,
    broadcast_distinct_limit: int = RANGE_BROADCAST_LIMIT,
) -> DataFrame:
    """RANGE BETWEEN `delta` PRECEDING AND CURRENT ROW sum of
    `sum_col`, partitioned by `part_col`, ordered by `order_col` —
    with a cardinality-gated choice of physical plan.

    A RANGE frame's value depends only on (partition key, order
    value), so when the distinct pair count is broadcastable the fact
    table never needs to be shuffled or windowed at all: aggregate
    `sum_col` per pair (map-side partial agg), compute each distinct
    value's frame sum with a range self-join ON THE TINY AGGREGATE,
    and broadcast the result back. That sidesteps the structural
    ceiling of a low-cardinality partition key (l_returnflag has 3
    values -> the naive window caps at 3 tasks no matter the cluster).

    The gate: one approx_count_distinct scan (no shuffle — HLL partial
    agg; driver state = one long). Above `broadcast_distinct_limit`
    (continuous keys — prices, timestamps) the aggregate is no longer
    tiny and the plan falls back to the plain partitioned RANGE
    window, whose parallelism is the partition-key cardinality; when
    THAT is also low at production scale, quantize the order key
    (bucket prices to cents) to re-enter the rewrite. Measured at
    sf0.1 both forms compute in ~40ms — w4's ~2s bench entry is
    600k-row result transfer, not compute.
    """
    n_pairs = li.agg(
        F.approx_count_distinct(F.struct(part_col, order_col)).alias("n")
    ).first()["n"]
    if n_pairs > broadcast_distinct_limit:
        w_expr = (
            f"round(sum({sum_col}) OVER (PARTITION BY {part_col} "
            f"ORDER BY {order_col} RANGE BETWEEN {delta} PRECEDING "
            f"AND CURRENT ROW), 2)"
        )
        return li.select(
            "l_orderkey", "l_linenumber", order_col, F.expr(w_expr).alias("range_sum")
        )
    g = li.groupBy(part_col, order_col).agg(F.sum(sum_col).alias("_s"))
    a = g.select(F.col(part_col).alias("_p"), F.col(order_col).alias("_q"))
    b = g.select(
        F.col(part_col).alias("_bp"),
        F.col(order_col).alias("_bq"),
        F.col("_s").alias("_bs"),
    )
    frame_sums = (
        a.join(
            b,
            (F.col("_p") == F.col("_bp"))
            & (F.col("_bq") >= F.col("_q") - delta)
            & (F.col("_bq") <= F.col("_q")),
        )
        .groupBy("_p", "_q")
        .agg(F.sum("_bs").alias("_range_sum"))
    )
    return (
        li.join(
            F.broadcast(frame_sums),
            (li[part_col] == F.col("_p")) & (li[order_col] == F.col("_q")),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            order_col,
            F.round("_range_sum", 2).alias("range_sum"),
        )
    )


@register("w4_range_frame", _W4_ORACLE)
def w4_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE BETWEEN value-based frame aggregation over a DISCRETE
    order key (~150 distinct (flag, quantity) pairs) — takes
    range_frame_sum's broadcast-rewrite path; see that docstring for
    the plan and the cardinality gate."""
    li = load_tables(spark, sf_dir).lineitem
    return range_frame_sum(li, "l_returnflag", "l_quantity", "l_extendedprice", 1)


_W7_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_returnflag ORDER BY l_extendedprice
         RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW), 2) AS range_sum
FROM lineitem
"""


@register("w7_range_frame_highcard", _W7_ORACLE)
def w7_range_frame_highcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a CONTINUOUS order key (l_extendedprice:
    ~57k distinct pairs at sf0.01, ~all-distinct at scale) — the
    high-cardinality fallback branch of range_frame_sum, pinned by an
    explicit limit so the windowed path is the one value-verified at
    every test scale (the production default would already choose it
    beyond ~100k pairs). Parallelism = partition-key cardinality; at
    production scale with few partitions, quantize the order key to
    re-enter w4's rewrite."""
    li = load_tables(spark, sf_dir).lineitem
    return range_frame_sum(
        li,
        "l_returnflag",
        "l_extendedprice",
        "l_extendedprice",
        100.0,
        broadcast_distinct_limit=1000,
    )


_W5_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       ntile(4)       OVER w AS price_quartile,
       round(cume_dist()    OVER w, 6) AS cume,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


@register("w5_ntile_cume", _W5_ORACLE)
def w5_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / cume_dist / percent_rank — deterministic because the
    window order (price, key) is a unique total order."""
    o = load_tables(spark, sf_dir).orders
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


_W6_ORACLE = """
SELECT o_custkey, o_orderkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice)  OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register("w6_first_last", _W6_ORACLE)
def w6_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full-partition frame (the
    default growing frame would make last_value = current row)."""
    o = load_tables(spark, sf_dir).orders
    w = _by_cust_date().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )

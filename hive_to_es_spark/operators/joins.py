"""Join operators (SURVEY.md §2.B "Joins", j1-j11).

Physical strategy is Catalyst's: equi joins pick broadcast-hash /
shuffled-hash / sort-merge by size (+ AQE runtime conversion and skew
splitting). The engine's job is declaring semantics and hinting
broadcast for bounded dims (region=5, nation=25 rows at EVERY scale —
always broadcast). The as-of join (j9) is deliberately the windowed
union form, not a pairwise self-join: at 100 TB the self-join is
O(clicks x purchases) per user while the window is one shuffle +
linear scan per user partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_to_es_spark.functions.money import cents, sum_cents
from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

_J1_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


@register("j1_inner_equi", _J1_ORACLE)
def j1_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi join (fact -> dim)."""
    t = load_tables(spark, sf_dir)
    return t.customer.join(
        t.nation, t.customer.c_nationkey == t.nation.n_nationkey, "inner"
    ).select("c_custkey", "c_name", "n_name")


# Big-order threshold leaves most customers unmatched -> real NULL rows.
_J2_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, 'left' AS side
FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
  ON c.c_custkey = o.o_custkey
UNION ALL
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, 'right' AS side
FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o RIGHT JOIN customer c
  ON c.c_custkey = o.o_custkey
"""


@register("j2_left_right_outer", _J2_ORACLE)
def j2_left_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT and RIGHT outer joins (same result set, both code paths)."""
    t = load_tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    left = (
        t.customer.join(big, t.customer.c_custkey == big.o_custkey, "left")
        .select("c_custkey", "o_orderkey", "o_totalprice", F.lit("left").alias("side"))
    )
    right = (
        big.join(t.customer, t.customer.c_custkey == big.o_custkey, "right")
        .select("c_custkey", "o_orderkey", "o_totalprice", F.lit("right").alias("side"))
    )
    return left.unionByName(right)


_J3_ORACLE = """
SELECT
  coalesce(c.c_nationkey, s.s_nationkey) AS nkey, c.c_custkey, s.s_suppkey
FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
FULL OUTER JOIN (SELECT * FROM supplier WHERE s_acctbal > 9000) s
  ON c.c_nationkey = s.s_nationkey
"""


@register("j3_full_outer", _J3_ORACLE)
def j3_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with unmatched rows surviving on both sides."""
    t = load_tables(spark, sf_dir)
    c = t.customer.filter(F.col("c_acctbal") > 9000)
    s = t.supplier.filter(F.col("s_acctbal") > 9000)
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nkey"), "c_custkey", "s_suppkey"
    )


_J4_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@register("j4_semi", _J4_ORACLE)
def j4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    t = load_tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_J5_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


@register("j5_anti", _J5_ORACLE)
def j5_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    t = load_tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(
        big, t.customer.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_J6_ORACLE = """
SELECT r_name, count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


@register("j6_broadcast", _J6_ORACLE)
def j6_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of bounded dims — no shuffle of the fact side.

    region (5 rows) and nation (25 rows) are size-bounded at every
    scale factor: broadcasting them keeps the only shuffle in this
    plan the final groupBy, which AQE coalesces.
    """
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


_J7_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("j7_cross", _J7_ORACLE)
def j7_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (bounded sides only — 5 x 25)."""
    t = load_tables(spark, sf_dir)
    return t.region.crossJoin(t.nation).select("r_name", "n_name")


_J8_ORACLE = """
SELECT b.bucket AS bucket, count(*) AS n,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN (VALUES ('q00_10', 0.0, 10.0), ('q10_25', 10.0, 25.0),
             ('q25_40', 25.0, 40.0), ('q40_51', 40.0, 51.0)) AS b(bucket, lo, hi)
  ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
GROUP BY b.bucket
"""


@register("j8_theta_range", _J8_ORACLE)
def j8_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-band) join — broadcast nested loop over a tiny
    band table; at scale the band table is always the broadcast side.

    Revenue is summed in exact integer CENTS (round 10: the 8x
    endurance sweep caught round(sum(double), 2) diverging between
    engines at ~1.4M rows/bucket — double accumulation order differs
    and the error passes 2dp at 1e10 magnitude; bigint cents are
    associative and exact at any scale, the a20/p17 money rule)."""
    t = load_tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [("q00_10", 0.0, 10.0), ("q10_25", 10.0, 25.0), ("q25_40", 25.0, 40.0), ("q40_51", 40.0, 51.0)],
        "bucket string, lo double, hi double",
    )
    li = t.lineitem
    return (
        li.join(F.broadcast(bands), (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


_J9_ORACLE = """
SELECT p.event_id AS event_id, p.user_id AS user_id,
       max(c.ts) AS last_click_ts, count(c.event_id) AS n_clicks_before
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


@register("j9_asof", _J9_ORACLE)
def j9_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at ts <= purchase ts.

    Spark has no native ASOF JOIN; the scalable form is NOT a pairwise
    self-join (O(clicks x purchases) per user) but a tagged union +
    one window pass: last(click_ts) IGNORE NULLS over rows preceding.
    One shuffle on user_id, linear per partition — survives 100x.
    """
    ev = load_tables(spark, sf_dir).events
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    # clicks sort before purchases at equal ts so <= semantics hold
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .withColumn("n_clicks_before", F.sum("is_click").over(w).cast("bigint"))
        .filter(F.col("is_purchase"))
        .select("event_id", "user_id", "last_click_ts", "n_clicks_before")
    )


_J10_ORACLE = """
SELECT a.o_custkey AS o_custkey, count(*) AS n_overlap_pairs
FROM orders a
JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
 AND a.o_orderdate < b.o_orderdate + INTERVAL 30 DAY
 AND b.o_orderdate < a.o_orderdate + INTERVAL 30 DAY
GROUP BY a.o_custkey
"""


@register("j10_interval_overlap", _J10_ORACLE)
def j10_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: [d, d+30d) windows of the same customer.

    Equi key (custkey) carries the shuffle; the range predicate is
    evaluated post-match, so this stays a hash/sort-merge join, not a
    nested loop — the 100 TB-safe shape for interval joins with a
    blocking key.
    """
    o = load_tables(spark, sf_dir).orders.select("o_custkey", "o_orderkey", "o_orderdate")
    a, b = o.alias("a"), o.alias("b")
    day30 = F.expr("INTERVAL 30 DAYS")
    cond = (
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.o_orderdate") < F.col("b.o_orderdate") + day30)
        & (F.col("b.o_orderdate") < F.col("a.o_orderdate") + day30)
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count("*").alias("n_overlap_pairs"))
    )


_J11_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


@register("j11_multiway", _J11_ORACLE)
def j11_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join (TPC-H Q5 shape) — flagship, benchmarked.

    Join order: facts first (orders filtered by date prunes lineitem
    via the join), dims broadcast last. AQE re-plans smaller sides to
    broadcast at runtime; region/nation hinted explicitly.
    """
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        t.lineitem.join(orders, t.lineitem.l_orderkey == orders.o_orderkey)
        .join(t.customer, orders.o_custkey == t.customer.c_custkey)
        .join(
            t.supplier,
            (t.lineitem.l_suppkey == t.supplier.s_suppkey)
            & (t.customer.c_nationkey == t.supplier.s_nationkey),
        )
        .join(F.broadcast(t.nation), t.supplier.s_nationkey == t.nation.n_nationkey)
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            t.nation.n_regionkey == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
    )


# TPC-H Q3 shape adapted to the fixture columns (no o_shippriority in
# the fixtures — grouped on (l_orderkey, o_orderdate) instead).
_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate  > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey ASC
LIMIT 10
"""


@register("q3_shipping_priority", _Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority flagship (BASELINE.md row 2): 3-table join +
    agg + top-10.

    Both date filters sit on the fact tables before the joins (scan
    pruning); customer-segment filter prunes the build side. The final
    top-10 is TakeOrderedAndProject over the aggregate.
    """
    t = load_tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t.orders.filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t.lineitem.filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# TPC-H Q10 shape: returned-item revenue per customer in a quarter.
_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey ASC
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue report (TPC-H Q10 shape): 4-table join,
    quarter + returnflag filters on the facts pre-join, nation
    broadcast, top-20 customers by lost revenue."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t.customer, orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# TPC-H Q18 shape: orders whose total line quantity exceeds a
# threshold (IN-subquery over a grouped HAVING -> left-semi join after
# decorrelation).
_Q18_ORACLE = """
SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS total_qty_c
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 180
)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


@register("q18_large_orders", _Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders (TPC-H Q18 shape): the IN-subquery over a
    grouped HAVING becomes a left-semi join against the aggregated key
    set — Catalyst's subquery decorrelation, declared explicitly."""
    t = load_tables(spark, sf_dir)
    big_orders = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 180)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        t.lineitem.join(big_orders, t.lineitem.l_orderkey == big_orders.big_key, "left_semi")
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum_cents("l_quantity").alias("total_qty_c"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


# TPC-H Q17 shape: correlated scalar subquery (per-part average
# quantity) — the decorrelation benchmark.
_Q17_ORACLE = """
SELECT CAST(round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 7.0) AS BIGINT)
         AS avg_yearly_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


@register("q17_small_quantity", _Q17_ORACLE)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    scalar subquery (per-part avg quantity) is declared as its
    decorrelated form — aggregate once per part key, join back, filter.
    Catalyst produces the same plan from the correlated SQL; writing
    the decorrelation out keeps it explicit and hintable."""
    t = load_tables(spark, sf_dir)
    brand_parts = t.part.filter(F.col("p_brand") == "Brand#4").select("p_partkey")
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(sum_cents("l_extendedprice") / 7.0)
            .cast("bigint")
            .alias("avg_yearly_cents")
        )
    )


# TPC-H Q4 shape: EXISTS-correlated order-priority counts.
_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): EXISTS with a
    cross-table correlated predicate -> left-semi join on
    (orderkey, shipdate > orderdate)."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# TPC-H Q14 shape: promo revenue share in a month.
_Q14_ORACLE = """
SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(round(l_extendedprice * (1 - l_discount) * 100)
                               AS BIGINT) ELSE 0 END) * 1000000
            // sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS promo_share_ppm
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): conditional
    aggregation ratio over a month of shipments; the date filter
    prunes lineitem before the part join."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), cents(rev)).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        li.join(t.part, li.l_partkey == t.part.p_partkey)
        .agg(F.sum(promo).alias("_p"), sum_cents(rev).alias("_r"))
        # DECIMAL(38,0) widening: bigint cents * 10^6 wraps at ~9.2e12
        # cents (~$92B) of month revenue (round-11 review); share <= 1e6
        # so the DIV result stays bigint-safe
        .select(F.expr("CAST(_p AS DECIMAL(38,0)) * 1000000 DIV _r").alias("promo_share_ppm"))
    )


# TPC-H Q2 shape: pick the minimum-cost row per group via a grouped
# scalar subquery joined back (here: cheapest part per brand).
_Q2_ORACLE = """
SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice
FROM part p
JOIN (
  SELECT p_brand, min(p_retailprice) AS min_price
  FROM part GROUP BY p_brand
) m ON p.p_brand = m.p_brand AND p.p_retailprice = m.min_price
QUALIFY row_number() OVER (PARTITION BY p.p_brand ORDER BY p.p_partkey) = 1
"""


@register("q2_min_cost", _Q2_ORACLE)
def q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost selection (TPC-H Q2 shape): grouped-min scalar
    subquery joined back to recover the full row, key-deduped when the
    minimum ties. (DuckDB's QUALIFY in the oracle = Spark's subquery
    filter — the no-QUALIFY gotcha in reverse.)"""
    t = load_tables(spark, sf_dir)
    p = t.part
    # derived from the same relation -> rename the group key to keep
    # the self-join unambiguous
    mins = (
        p.groupBy("p_brand")
        .agg(F.min("p_retailprice").alias("min_price"))
        .withColumnRenamed("p_brand", "m_brand")
    )
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    return (
        p.join(
            mins,
            (p.p_brand == mins.m_brand) & (p.p_retailprice == mins.min_price),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
        .select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# j12 — the skew-mitigation join as a registered, value-verified
# operator: output must be ROW-IDENTICAL to the plain join, so the
# oracle is simply the UNSALTED SQL join. What's being verified is the
# salting transform's correctness (fact salt + dim explode cancel out
# exactly), not a new semantics.
_J12_ORACLE = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register("j12_salted_skew_join", _J12_ORACLE)
def j12_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join (functions/skew.py): the structural fix
    for single-key skew that AQE cannot split (one key's rows exceed a
    task). Fact rows get a random salt in [0,16); the dim explodes 16x
    so every salted key still matches; the hot key's rows spread over
    16 tasks. The aggregate proves row-identity with the plain join —
    same oracle as an unsalted e6-style join.

    The dim side carries a SHUFFLE_HASH hint: salting only does work
    when the join SHUFFLES on (key, salt) — a broadcast join has no
    fact-side shuffle to spread, so broadcasting here (as a small dim
    would auto-trigger at test scale) would verify a plan in which the
    salt is dead weight. The hint pins the shuffled-hash-join path the
    operator exists to demonstrate (asserted in tests/test_plans.py);
    in production you reach for salting precisely when the dim is too
    big to broadcast OR the hot key overflows a single task.

    Measured benefit (tests/test_skew.py, 90%-hot fact, AQE skew
    split off, local[8] best-of-3): wash at 1x fixture scale (0.48s
    both — overhead-dominated), 1.76x faster at 4x (plain 1.15s vs
    salted 0.66s) — the gap opens with scale because the plain plan
    caps at one task's throughput; asserted salted < plain at 4x."""
    from hive_to_es_spark.functions.skew import explode_dim, salt_fact, SALT_COL

    t = load_tables(spark, sf_dir)
    fact = salt_fact(
        t.events.select(F.col("user_id").alias("c_custkey"), "value"), 16
    )
    dim = explode_dim(t.customer.select("c_custkey", "c_mktsegment"), 16)
    joined = fact.join(dim.hint("shuffle_hash"), ["c_custkey", SALT_COL], "inner")
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_events"),
        sum_cents("value").alias("total_cents"),
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width_s: int,
) -> DataFrame:
    """Generic fixed-bin point-in-interval join: rows of `points`
    matched to rows of `intervals` with lo <= point < hi, planned as
    an EQUI join on floor(unix_time / bin_width_s) instead of the
    BroadcastNestedLoopJoin Catalyst produces for a raw range
    predicate. See j13's docstring for the full cost argument.

    Completeness: a point p in [lo, hi) has bin(p) in
    [bin(lo), bin(hi)] for ANY bin width, and the interval explodes to
    exactly that inclusive bin range (sequence), so every qualifying
    pair meets. If intervals are no longer than bin_width_s each
    explodes to <= 2 rows; longer intervals still work, at
    ceil(len/width)+1 rows. Each (point, interval) pair meets at most
    once because the point's bin is unique — no distinct needed.
    Property-tested against the naive join on boundary-engineered
    synthetic intervals in tests/test_property.py.
    """
    i_lo = F.floor(F.unix_timestamp(F.col(lo_col)) / bin_width_s)
    i_hi = F.floor(F.unix_timestamp(F.col(hi_col)) / bin_width_s)
    binned = intervals.withColumn("_bin", F.explode(F.sequence(i_lo, i_hi)))
    pts = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_col)) / bin_width_s)
    )
    return (
        pts.join(binned, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


_J13_ORACLE = """
WITH win AS (
  SELECT o_orderkey AS win_id, o_orderdate AS lo
  FROM orders WHERE o_totalprice > 495000
)
SELECT w.win_id,
       CAST(count(*) AS BIGINT) AS n_shipped,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM win w
JOIN lineitem l
  ON l.l_shipdate >= w.lo AND l.l_shipdate < w.lo + INTERVAL 7 DAY
GROUP BY w.win_id
"""


@register("j13_interval_bin_join", _J13_ORACLE)
def j13_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via fixed-width BIN equi-join — the
    100 TB shape for range joins when NEITHER side is broadcastable.

    j8 handles range joins whose interval side is tiny (broadcast
    nested loop); j10 handles intervals that share an equi blocking
    key. This operator covers the remaining case: many intervals, no
    natural equi key. Catalyst would plan the raw range predicate as
    BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons
    and a driver-sized interval side; at 10^9 points x 10^6 intervals
    that is 10^15 comparisons and never finishes.

    The binned plan (the standard fixed-bin range-join rewrite, as in
    Spark's own RANGE_JOIN hint on Databricks and Flink's interval
    join): pick a bin width >= the max interval length (7 days here),
    explode each interval to the 2 week-bins it can touch, tag each
    point with its single week-bin, equi-join on the bin, then apply
    the exact range predicate. The join becomes a plain shuffled hash
    join on the bin key; comparisons drop to sum over bins of
    |points_bin| x |intervals_bin| — linear in both inputs for
    non-pathological time distributions. Each (point, interval) pair
    meets at most once (the point's bin is unique), so no distinct
    pass is needed before the aggregate.

    Here: "promotion windows" = the top ~1% orders by price open a
    [o_orderdate, +7d) window; count lineitems shipped inside each
    window. The oracle states the pure range-join semantics; the hash
    match proves the bin rewrite loses no pair at bin boundaries
    (intervals crossing a week edge are covered by the 2-bin explode).
    """
    t = load_tables(spark, sf_dir)
    win = t.orders.filter(F.col("o_totalprice") > 495000).select(
        F.col("o_orderkey").alias("win_id"),
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("hi"),
    )
    pts = t.lineitem.select("l_shipdate", "l_extendedprice")
    return (
        binned_interval_join(pts, win, "l_shipdate", "lo", "hi", 7 * 86400)
        .groupBy("win_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shipped"),
            sum_cents("l_extendedprice").alias("revenue_cents"),
        )
    )


_J14_ORACLE = """
SELECT p.event_id AS event_id, p.user_id AS user_id,
       max(c.ts) AS last_click_ts_30m,
       CAST(count(c.event_id) AS BIGINT) AS n_clicks_30m
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts + INTERVAL 30 MINUTE > p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


@register("j14_asof_tolerance", _J14_ORACLE)
def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE (pandas merge_asof's `tolerance`
    semantic): for each purchase, the latest click in the half-open
    window (ts - 30min, ts] — a stale click is NULL, not matched.

    Same scale argument as j9: the pairwise LEFT JOIN the oracle
    states is O(clicks x purchases) per user; the plan here is one
    shuffle on user_id and a single RANGE-framed window pass. The
    frame bound must honor the STRICT lower inequality
    (c.ts > p.ts - 30min) exactly, so the order key is unix_micros —
    integer microseconds, the native resolution of both engines'
    timestamps — and the frame is [-(30*60*10^6 - 1), 0]: off-by-one
    at the boundary or a float order key (epoch seconds as double)
    would silently include/exclude boundary clicks and break the
    hash. Purchase rows inside the frame carry NULL click_ts, so max/
    count see clicks only; RANGE ties (click and purchase at the same
    microsecond) are included, matching c.ts <= p.ts.
    """
    ev = load_tables(spark, sf_dir).events.filter(
        F.col("event_type").isin("click", "purchase")
    )
    tol_us = 30 * 60 * 1_000_000
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("us"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        (F.col("event_type") == "click").cast("long").alias("is_click"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-(tol_us - 1), 0)
    )
    return (
        tagged.withColumn("last_click_ts_30m", F.max("click_ts").over(w))
        .withColumn("n_clicks_30m", F.sum("is_click").over(w).cast("bigint"))
        .filter(F.col("is_purchase"))
        .select("event_id", "user_id", "last_click_ts_30m", "n_clicks_30m")
    )


_J15_ORACLE = """
WITH t AS (
  SELECT user_id, ts, event_id, value, event_type,
         CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tie
  FROM events WHERE event_type IN ('signup', 'purchase') AND ts IS NOT NULL
),
w AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'signup'
                         THEN {'sid': event_id, 'sval': round(value, 2)}
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, tie, event_id
                 ROWS UNBOUNDED PRECEDING) AS ver
  FROM t
)
SELECT event_id, user_id,
       struct_extract(ver, 'sid') AS signup_id,
       struct_extract(ver, 'sval') AS tier
FROM w WHERE event_type = 'purchase'
"""


@register("j15_pit_scd2", _J15_ORACLE)
def j15_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 point-in-time join: attach the dimension VERSION valid at
    each fact's timestamp. Signup events form the slowly-changing
    dimension (each signup opens a validity period [ts, next signup));
    every purchase picks up the id AND payload (tier) of the period
    containing it — purchases before any signup keep NULLs, exactly
    SCD2's "no version valid yet".

    Same scalable shape as j9 (tagged union + one window pass, one
    shuffle on the entity key, linear per partition) but carrying the
    dimension PAYLOAD through last(..., ignorenulls) — the difference
    between an as-of timestamp lookup and a real point-in-time
    dimension join. The interval-join formulation (fact BETWEEN
    valid_from AND valid_to) is what warehouses write; this window
    form never materializes the validity intervals at all, so there
    is no unbounded range predicate for the planner to mis-join on.
    Versions-at-equal-ts resolve by event_id order, pinned in both
    engines."""
    ev = load_tables(spark, sf_dir).events
    # NULL-ts guard mirrored in the oracle: Spark sorts NULLS FIRST
    # ascending, DuckDB nulls_last — an unfiltered NULL-ts signup
    # would be "earliest version" in one engine and "latest row" in
    # the other (same divergence class g6/w9 guard against)
    # the version travels as ONE struct: a signup with NULL value
    # still advances BOTH fields together (sid=new id, sval=NULL) —
    # two independent last(..., ignorenulls) columns would let the
    # version id and its payload disagree on such a row
    t = ev.filter(
        F.col("event_type").isin("signup", "purchase") & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "signup",
            F.struct(
                F.col("event_id").alias("sid"),
                F.round("value", 2).alias("sval"),
            ),
        ).alias("ver"),
        (F.col("event_type") == "signup").cast("int").alias("is_signup"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_signup").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("v", F.last("ver", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("v.sid").alias("signup_id"),
            F.col("v.sval").alias("tier"),
        )
    )


# j16 — nearest-event as-of join (pandas merge_asof direction=
# 'nearest'): each purchase matched to the CLOSEST click by |Δt|
# within ±1 h, ties to the EARLIER click. j9/j14 cover direction=
# 'backward'; nearest needs BOTH frame directions and a tie rule, so
# it is a distinct semantic, not a parameter tweak. Two RANGE frames
# over one (user, time) sort — Spark plans both over a single
# exchange — then pure integer arithmetic picks the side.
_J16_TOL_US = 3600 * 1_000_000

_J16_ORACLE = f"""
WITH t AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
  FROM events
  WHERE event_type IN ('click', 'purchase') AND ts IS NOT NULL
),
framed AS (
  SELECT user_id, event_id, event_type, us,
         max(click_us) OVER (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN {_J16_TOL_US} PRECEDING AND CURRENT ROW) AS prev_us,
         min(click_us) OVER (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN CURRENT ROW AND {_J16_TOL_US} FOLLOWING) AS next_us
  FROM t
)
SELECT event_id, user_id,
       CASE WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
            WHEN next_us IS NULL OR (prev_us IS NOT NULL
                 AND us - prev_us <= next_us - us) THEN prev_us
            ELSE next_us END AS nearest_click_us,
       CASE WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
            WHEN next_us IS NULL OR (prev_us IS NOT NULL
                 AND us - prev_us <= next_us - us) THEN us - prev_us
            ELSE next_us - us END AS delta_us,
       CASE WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
            WHEN next_us IS NULL OR (prev_us IS NOT NULL
                 AND us - prev_us <= next_us - us) THEN 'prev'
            ELSE 'next' END AS side
FROM framed WHERE event_type = 'purchase'
"""


@register("j16_nearest_event", _J16_ORACLE)
def j16_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join (merge_asof direction='nearest'):
    every purchase gets the closest click within ±1 h by absolute
    time distance, equal distances resolving to the EARLIER click —
    the attribution semantic when a click can plausibly follow its
    purchase (post-purchase confirmation clicks).

    Plan: one shuffle on user_id; both RANGE frames (backward max,
    forward min) share the same window sort, so Spark evaluates them
    in a single Window operator over one exchange. All time math in
    integer epoch-micros (j14's rule: boundary clicks are exact at
    native resolution); min/max over the frame are order-insensitive,
    so no tiebreaker column is needed inside the frames themselves.
    A same-instant click lands in BOTH frames with Δ=0 and resolves
    to 'prev' on both engines."""
    ev = load_tables(spark, sf_dir).events.filter(
        F.col("event_type").isin("click", "purchase") & F.col("ts").isNotNull()
    )
    tagged = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias("click_us"),
    )
    base = Window.partitionBy("user_id").orderBy("us")
    prev_us = F.max("click_us").over(base.rangeBetween(-_J16_TOL_US, 0))
    next_us = F.min("click_us").over(base.rangeBetween(0, _J16_TOL_US))
    framed = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "us",
        prev_us.alias("prev_us"),
        next_us.alias("next_us"),
    )
    both_null = F.col("prev_us").isNull() & F.col("next_us").isNull()
    take_prev = F.col("next_us").isNull() | (
        F.col("prev_us").isNotNull()
        & (F.col("us") - F.col("prev_us") <= F.col("next_us") - F.col("us"))
    )
    return framed.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(take_prev, F.col("prev_us"))
        .otherwise(F.col("next_us"))
        .alias("nearest_click_us"),
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(take_prev, F.col("us") - F.col("prev_us"))
        .otherwise(F.col("next_us") - F.col("us"))
        .alias("delta_us"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(take_prev, F.lit("prev"))
        .otherwise(F.lit("next"))
        .alias("side"),
    )


# j17 — interpolation join (feature backfill): every 'view' event gets
# purchase 'value' linearly interpolated between the user's bracketing
# purchases. The gap j9/j14/j16 leave open: as-of picks ONE neighbor's
# value verbatim; backfilling a continuous signal at probe timestamps
# needs BOTH brackets and arithmetic between them — the pandas
# merge_asof + lerp composition, expressed as two ROWS frames over one
# (user, time) sort. All math in integer cents x epoch-micros; the
# floor division is emulated exactly ((n - ((n%d)+d)%d) DIV d) because
# Spark DIV truncates while a negative numerator must floor — the one
# place truncate-vs-floor could silently split the engines.
_J17_ORACLE = """
WITH t AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type='purchase' THEN epoch_us(ts) END AS p_us,
         CASE WHEN event_type='purchase'
              THEN CAST(round(value*100) AS BIGINT) END AS p_cents,
         CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS k
  FROM events WHERE event_type IN ('view','purchase') AND ts IS NOT NULL
    AND (event_type = 'view' OR value IS NOT NULL)
),
framed AS (
  SELECT event_id, user_id, us, event_type,
    last_value(p_us IGNORE NULLS) OVER w_prev AS prev_us,
    last_value(p_cents IGNORE NULLS) OVER w_prev AS prev_cents,
    first_value(p_us IGNORE NULLS) OVER w_next AS next_us,
    first_value(p_cents IGNORE NULLS) OVER w_next AS next_cents
  FROM t
  WINDOW
    w_prev AS (PARTITION BY user_id ORDER BY us, k, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id ORDER BY us, k, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
calc AS (
  SELECT *, (next_cents - prev_cents) * (us - prev_us) AS nmr,
         next_us - prev_us AS dnm
  FROM framed
  WHERE event_type = 'view' AND prev_us IS NOT NULL AND next_us IS NOT NULL
)
SELECT event_id, user_id, us, prev_us, prev_cents, next_us, next_cents,
       prev_cents + (nmr - ((nmr % dnm) + dnm) % dnm) // dnm AS lerp_cents
FROM calc
"""


@register("j17_lerp_join", _J17_ORACLE)
def j17_lerp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolation join: purchase `value` linearly interpolated at
    every view timestamp between the user's bracketing purchases
    (probes without both brackets drop — no extrapolation).

    Plan: one shuffle on user_id; the backward last(IGNORE NULLS) and
    forward first(IGNORE NULLS) ROWS frames share a single window sort
    (us, kind, event_id — purchases sort before a same-instant view,
    so an exact-hit probe lerps to exactly that purchase's value and
    the forward bracket is strictly later, keeping the denominator
    positive). Lerp stays in bigint cents x micros end to end:
    numerator magnitude is bounded by max-cents-delta x max-us-span
    (~1e17 on the fixture month, safely inside int64 and deliberately
    OUTSIDE double's 2^53 exactness — which is why no double division
    appears anywhere). Exact floor division per the module comment."""
    ev = load_tables(spark, sf_dir).events.filter(
        F.col("event_type").isin("view", "purchase")
        & F.col("ts").isNotNull()
        # A purchase with a NULL value cannot anchor a lerp; dropping
        # it HERE keeps (p_us, p_cents) null together — tracked as two
        # IGNORE-NULLS columns, a null-valued purchase would otherwise
        # desynchronize them (timestamp from it, cents from an earlier
        # one). Mirrored in the oracle.
        & ((F.col("event_type") == "view") | F.col("value").isNotNull())
    )
    t = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", F.unix_micros("ts")).alias("p_us"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("bigint"),
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", F.lit(0))
        .otherwise(F.lit(1))
        .alias("k"),
    )
    base = Window.partitionBy("user_id").orderBy("us", "k", "event_id")
    w_prev = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    framed = t.select(
        "event_id",
        "user_id",
        "us",
        "event_type",
        F.last("p_us", ignorenulls=True).over(w_prev).alias("prev_us"),
        F.last("p_cents", ignorenulls=True).over(w_prev).alias("prev_cents"),
        F.first("p_us", ignorenulls=True).over(w_next).alias("next_us"),
        F.first("p_cents", ignorenulls=True).over(w_next).alias("next_cents"),
    )
    calc = (
        framed.filter(
            (F.col("event_type") == "view")
            & F.col("prev_us").isNotNull()
            & F.col("next_us").isNotNull()
        )
        .withColumn(
            "nmr",
            (F.col("next_cents") - F.col("prev_cents"))
            * (F.col("us") - F.col("prev_us")),
        )
        .withColumn("dnm", F.col("next_us") - F.col("prev_us"))
    )
    return calc.select(
        "event_id",
        "user_id",
        "us",
        "prev_us",
        "prev_cents",
        "next_us",
        "next_cents",
        (
            F.col("prev_cents")
            + F.expr("(nmr - ((nmr % dnm) + dnm) % dnm) DIV dnm")
        ).alias("lerp_cents"),
    )


# j18 — Bloom-filter semi-join reduction. The bitmap is built and
# probed with the SAME xxhash64 inside one Spark job, so it can never
# drop a true member (no false negatives); the exact semi join above
# it removes the false positives — the oracle is therefore the plain
# EXISTS, and the bloom is pure plan mechanics, invisible to results.
_J18_BITS = 16_384  # 256 bigint words; ~0.1% fp at ~300 keys, k=2


def _bloom_positions(key):
    """k=2 bit positions for a key: two independent xxhash64 draws."""
    return [
        F.pmod(F.xxhash64(key), F.lit(_J18_BITS)),
        F.pmod(F.xxhash64(key, F.lit(1)), F.lit(_J18_BITS)),
    ]


def _bloom_build(dim: DataFrame, key: str) -> DataFrame:
    """One-row DataFrame with a word->bits map column `bloom` covering
    the dim's key set. Map form (not a 256-column row) so the bitmap
    width is a constant, not a schema; absent words mean 0."""
    pos = dim.select(F.explode(F.array(*_bloom_positions(F.col(key)))).alias("pos"))
    words = pos.groupBy(F.expr("pos DIV 64").alias("word")).agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom")
    )


def _bloom_probe(fact: DataFrame, bloom_row: DataFrame, key: str) -> DataFrame:
    """Filter fact to rows whose key passes BOTH bloom bits. The
    one-row bloom attaches via broadcast nested-loop (the scalar
    crossJoin idiom); the test is codegen'd bit math on the scan."""
    probed = fact.crossJoin(F.broadcast(bloom_row))
    cond = None
    probe_cols = []
    for i, p in enumerate(_bloom_positions(F.col(key))):
        probed = probed.withColumn(f"_bp{i}", p)
        probe_cols.append(f"_bp{i}")
        t = (
            F.coalesce(
                F.element_at(F.col("bloom"), F.expr(f"_bp{i} DIV 64")),
                F.lit(0).cast("bigint"),
            ).bitwiseAND(F.expr(f"shiftleft(1L, CAST(_bp{i} % 64 AS INT))"))
            != 0
        )
        cond = t if cond is None else (cond & t)
    return probed.filter(cond).drop("bloom", *probe_cols)


_J18_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000)
GROUP BY o_orderpriority
"""


@register("j18_bloom_prefilter", _J18_ORACLE)
def j18_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit integer Bloom filter:
    revenue by priority for orders of high-balance BUILDING customers
    (~2% of customers). The selective dim side is folded into a
    16384-bit bitmap (a one-row word->bits map, built with bit_or over
    two xxhash64 positions per key), broadcast at constant cost, and
    probed scan-side — ~98% of the fact stream dies BEFORE the exact
    semi join, so at 100 TB (where the dim outgrows the broadcast
    threshold and the semi join must shuffle) the shuffle carries ~2%
    of orders instead of all of them. This is what Spark's runtime
    bloom-filter rewrite does internally; expressed explicitly it
    works across stages/jobs (e.g. saved and reused by tomorrow's
    incremental run) where the optimizer's version cannot.

    No false negatives by construction (same hashes build and probe —
    the test measures the candidate stream: every true match passes,
    and false positives stay under 1%); the exact semi join above the
    probe removes those, so results are oracle-exact. All bit math is
    whole-stage codegen; the bitmap rides a broadcast nested-loop
    attach (1 row), never a shuffle."""
    t = load_tables(spark, sf_dir)
    dim = t.customer.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey")
    cand = _bloom_probe(t.orders, _bloom_build(dim, "c_custkey"), "o_custkey")
    matched = cand.join(
        dim, cand["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )

"""Additional TPC-H query shapes (Q5/Q6/Q7/Q12/Q16/Q19/Q21/Q22),
adapted to the fixture's columns where the official schema has fields
the fixtures lack (no l_shipmode/commitdate/receiptdate, no partsupp,
no c_phone — each adaptation keeps the SHAPE that makes the query a
distinct optimizer/runtime exercise).

Shared plan discipline: selective filters sit on the scans, bounded
dims broadcast, semi/anti joins express EXISTS/NOT EXISTS (never a
correlated per-row subquery), and every aggregate keys on bounded-
cardinality columns so partial aggregation collapses map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_to_es_spark.functions.money import cents, sum_cents
from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

_Q5_ORACLE = """
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


@register("q5_local_supplier", _Q5_ORACLE)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): 6-table join where the
    interesting constraint is c_nationkey = s_nationkey — an extra
    equi-edge BETWEEN the two dimension paths. Region/nation/supplier
    broadcast; the year filter prunes the orders scan."""
    t = load_tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            t.nation.n_regionkey == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    supp = t.supplier.join(
        F.broadcast(asia_nations), t.supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t.customer.select("c_custkey", "c_nationkey"),
              orders.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
    )


_Q6_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): pure scan + filter +
    global agg — the canonical predicate-pushdown/codegen microbench.
    All three predicates reach the parquet scan."""
    li = load_tables(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum_cents(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue_cents"
            )
        )
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(CAST(round(volume * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-national shipping volume (TPC-H Q7 shape): the same dim
    table (nation) joined TWICE under different roles, with a
    disjunctive cross-role predicate. Both nation probes broadcast;
    the disjunction runs post-join on two tiny ints."""
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(t.orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_ok)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum_cents("volume").alias("revenue_cents"))
    )


# Q12 adapted: no l_shipmode in the fixtures -> l_linestatus plays the
# mode role; the shape (join + conditional two-way priority counts) is
# unchanged.
_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


@register("q12_shipmode_priority", _Q12_ORACLE)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-by-shipmode (TPC-H Q12 shape, l_linestatus as mode):
    fact-fact join with the date filter on the lineitem scan, then
    conditional counts — the CASE aggregates fold into one pass."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t.orders.select("o_orderkey", "o_orderpriority"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# Q16 adapted: no partsupp table -> supplier relationships observed
# from lineitem; the shape (distinct-count per part attribute triple
# with an exclusion filter) is unchanged.
_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_supplier_variety", _Q16_ORACLE)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier variety (TPC-H Q16 shape): selective dim filter
    broadcast into the fact, then COUNT(DISTINCT) per attribute triple
    — Spark plans the distinct as a two-phase partial aggregate."""
    t = load_tables(spark, sf_dir)
    parts = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# Q19 adapted: brand/size/quantity bands stand in for the official
# brand/container/quantity bands — the point is the disjunction of
# conjunctions that must still collapse into ONE join + one scan pass.
_Q19_ORACLE = """
SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under an OR-of-ANDs predicate (TPC-H Q19
    shape). The disjuncts all share the p_partkey = l_partkey
    equi-edge, so Catalyst keeps ONE broadcast hash join and evaluates
    the disjunction as a post-join filter; the common l_quantity <= 30
    and part-side brand/size bounds are still pushable prefilters."""
    t = load_tables(spark, sf_dir)
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    return (
        t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(
            band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_cents"
            )
        )
    )


# Q21 adapted: "the supplier who single-handedly failed a
# multi-supplier order" — l_returnflag = 'R' stands in for the
# receipt-after-commit lateness predicate. The EXISTS/NOT EXISTS pair
# decorrelates to a semi + anti join, which is the whole point of the
# shape.
_Q21_ORACLE = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


@register("q21_waiting_supplier", _Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape): EXISTS ->
    left-semi join, NOT EXISTS -> left-anti join, both on the order
    key with a supplier-differs residual — no correlated subquery ever
    executes per row."""
    t = load_tables(spark, sf_dir)
    l1 = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1")
    )
    l2 = t.lineitem.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = t.lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    )
    failed_orders = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey")
    )
    candidate = (
        l1.join(failed_orders, l1.k1 == F.col("o_orderkey")).select("k1", "sk1")
        .join(l2, (F.col("k1") == l2.k2) & (F.col("sk1") != l2.sk2), "left_semi")
        .join(l3, (F.col("k1") == l3.k3) & (F.col("sk1") != l3.sk3), "left_anti")
    )
    return (
        candidate.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            F.col("sk1") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


# Q22 adapted: no c_phone in the fixtures -> c_nationkey is the
# country code. Shape preserved: scalar subquery (global average)
# feeding a filter + NOT EXISTS anti join.
_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
FROM customer, avg_bal
WHERE c_acctbal > ab
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
"""


@register("q22_global_sales_opportunity", _Q22_ORACLE)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant rich customers (TPC-H Q22 shape): a broadcast scalar
    aggregate (global average balance) gates the scan, then an anti
    join against recent orders finds customers with above-average
    balances and no order in the final fixture year (every fixture
    customer has SOME order, so 'never ordered' would be vacuous)."""
    t = load_tables(spark, sf_dir)
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        t.customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            t.orders.filter(
                F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            sum_cents("c_acctbal").alias("totacctbal_cents"),
        )
    )


# Q8 adapted: single-word p_type ('ECONOMY') for the official
# three-word type. Shape preserved: 8-relation join, market share =
# conditional volume / total volume per year.
_Q8_ORACLE = """
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                     THEN CAST(round(volume * 100) AS BIGINT) ELSE 0 END) * 1000000
            // sum(CAST(round(volume * 100) AS BIGINT)) AS BIGINT) AS mkt_share_ppm
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): the widest join in the
    suite — part, lineitem, orders, customer, supplier, region, and
    nation twice. Every dimension (part filter, ASIA customers,
    supplier->nation) broadcasts; only the two facts shuffle. The
    share is a conditional-sum / sum in exact bigint cents, emitted
    as integer parts-per-million (num*1e6 DIV den — exact inputs,
    floor division, zero float path; functions/money.py)."""
    t = load_tables(spark, sf_dir)
    econ_parts = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_cust = (
        t.customer.join(
            F.broadcast(
                t.nation.join(
                    F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
                    t.nation.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            t.customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = t.supplier.join(
        F.broadcast(
            t.nation.select(
                F.col("n_nationkey").alias("n2_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        t.supplier.s_nationkey == F.col("n2_key"),
    ).select("s_suppkey", "supp_nation")
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = t.lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(econ_parts), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(asia_cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", cents("volume"))
                .otherwise(F.lit(0).cast("bigint"))
            ).alias("_nat_cents"),
            sum_cents("volume").alias("_all_cents"),
        )
        .select(
            "o_year",
            # DECIMAL widening (round-11 review): cents * 10^6 wraps at ~$92B
            F.expr("CAST(_nat_cents AS DECIMAL(38,0)) * 1000000 DIV _all_cents").alias("mkt_share_ppm"),
        )
    )


# Q9 adapted: no partsupp -> supply cost stands in as 50% of
# p_retailprice; p_name LIKE '%red%' for the official '%green%'.
_Q9_ORACLE = """
SELECT nation, o_year,
       CAST(sum(CAST(round(amount * 100) AS BIGINT)) AS BIGINT) AS sum_profit_cents
FROM (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): profit = revenue minus
    cost, grouped by supplier nation x order year. The LIKE filter
    prunes part first (broadcast), supplier->nation broadcasts, and
    the amount expression folds into the aggregate's input — one
    shuffle for the fact-fact join, one for the 25x7-group agg."""
    t = load_tables(spark, sf_dir)
    parts = t.part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nat = t.supplier.join(
        F.broadcast(t.nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        t.supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        t.lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "nation",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(sum_cents("amount").alias("sum_profit_cents"))
    )


# Q11 adapted: no partsupp -> a part's "stock value" is its observed
# lineitem revenue. Shape preserved: grouped value per part compared
# against a scalar-subquery fraction of the global total. Per-part
# values are exact bigint CENTS and the threshold compare runs in
# pure integers (value*10*np > 14*tv) — no float boundary anywhere
# (functions/money.py; the global total sums unboundedly many parts).
_Q11_ORACLE = """
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS part_value_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value_cents
FROM pv, (SELECT CAST(sum(part_value_cents) AS BIGINT) AS tv, count(*) AS np
          FROM pv) total
WHERE part_value_cents * 10 * np > 14 * tv
"""


@register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): per-part
    value vs a scalar fraction of the global total. The global total
    re-aggregates the (already small) per-part aggregate and broadcasts
    as a 1-row cross join — the fact table is read once."""
    li = load_tables(spark, sf_dir).lineitem
    pv = li.groupBy("l_partkey").agg(
        sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "part_value_cents"
        )
    )
    total = pv.agg(F.sum("part_value_cents").alias("tv"), F.count("*").alias("np"))
    return (
        pv.crossJoin(F.broadcast(total))
        # threshold in pure integers: value > 1.4 * tv / np  <=>
        # value * 10 * np > 14 * tv (positive np) — no float boundary;
        # both products DECIMAL(38,0)-widened: value*10*np scales with
        # the distinct-part count and wraps bigint well inside the
        # design range (round-11 review; DuckDB side is HUGEINT-exact)
        .filter(
            F.expr("CAST(part_value_cents AS DECIMAL(38,0)) * 10 * np")
            > F.expr("CAST(14 AS DECIMAL(38,0)) * tv")
        )
        .select("l_partkey", "part_value_cents")
    )


# Q13 adapted: no o_comment -> "special" orders excluded by priority
# instead of the comment regex. Shape preserved: left outer join,
# per-customer count (zeros kept), then the count-of-counts histogram.
_Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", _Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): the
    double aggregation — LEFT join keeps order-less customers (their
    count(o_orderkey) is 0, counting only non-nulls), first groupBy
    is per-customer, second collapses to the tiny histogram."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


# Q15: top supplier by quarterly revenue. Revenue is exact bigint
# cents, so the max-equality compare (and any tie) is exact on both
# engines (functions/money.py).
_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): the view-then-max pattern. The
    quarterly revenue aggregate plays the view; its max broadcasts as
    a 1-row cross join back onto itself (ties kept, per spec); the
    supplier dim broadcasts onto the (tiny) winner set. The argmax
    decision runs on exact bigint cents — decision-grade floats are
    the first thing that diverges cross-engine at scale."""
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            sum_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue_cents"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_cents") == F.col("mx"))
        .join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue_cents")
    )


# Q20 adapted: no partsupp/availqty -> a supplier "has excess stock"
# of a part when it shipped > 40 units of that red-prefixed part in
# 1996 (p_name LIKE 'red%' mirrors the official 'forest%' prefix).
# Shape preserved: nested IN-subqueries decorrelating to a grouped-
# HAVING subquery + two semi joins.
_Q20_ORACLE = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 40
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
"""


@register("q20_excess_stock", _Q20_ORACLE)
def q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-stock suppliers (TPC-H Q20 shape): both IN-subqueries
    become left-semi joins — the inner one against a grouped-HAVING
    aggregate (per supplier x part shipped quantity), the outer
    against the 1-nation dim. Nothing correlated runs per row."""
    t = load_tables(spark, sf_dir)
    brand_parts = t.part.filter(F.col("p_name").like("red%")).select("p_partkey")
    qualifying = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    nation1 = t.nation.filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    return (
        t.supplier.join(
            F.broadcast(nation1),
            t.supplier.s_nationkey == F.col("n_nationkey"),
            "left_semi",
        )
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )

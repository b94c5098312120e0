"""Exact integer-cents money arithmetic (the a20/p17/j8 rule).

`round(sum(double), 2)` is NOT scale-safe: double accumulation order
differs between engines (and between Spark plans), and at ~1.4M
rows/group at 1e10 magnitude the disagreement crosses the 2dp
rounding boundary (measured by the round-10 endurance sweep on j8).
The scale-safe form rounds each ROW to integer cents — both engines
evaluate the identical expression tree on the identical double, so
the per-row bigint is bit-deterministic — and sums bigints, which is
exact and associative at any scale and under any partitioning.

Oracle-side twin (DuckDB sums BIGINT into HUGEINT, so the outer cast
matters):  CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Per-row integer cents: round(x * 100) as bigint.

    Deterministic cross-engine because round-to-0dp of the same double
    has no scaling step (unlike round(x, 2), where BigDecimal-vs-C
    scaling can split exact .5 ties at the target precision).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def sum_cents(col: Column | str) -> Column:
    """Exact bigint-cents sum — group, window, or global."""
    return F.sum(cents(col))

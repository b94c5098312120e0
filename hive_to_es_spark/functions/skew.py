"""Skew-handling join helpers: salting for power-law keys.

AQE's skew-join splitting (on by default in session.get_spark) handles
most skew at runtime by splitting oversized shuffle partitions. It
cannot help when a SINGLE KEY's rows exceed one task's memory — the
classic power-law case (one user with 10^8 events joined to their
profile). Salting fixes that structurally:

- fact side: each row gets a random salt in [0, n_salts) appended to
  the join key -> the hot key's rows spread over n_salts partitions;
- dim side: each row is EXPLODED n_salts times, once per salt value,
  so every salted fact key still finds its match.

Cost: dim side inflates n_salts x (fine for dims; never salt two fact
tables against each other — pick the smaller side to explode). Result
is row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_fact(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Append a uniform random salt column to the (big, skewed) side."""
    return df.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )


def explode_dim(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the (small) side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


# Join types for which the salted result is row-identical to the
# plain join. Fact-preserving types only: every fact row carries ONE
# salt, so its match status vs the exploded dim is unchanged. Right /
# full outer are NOT here — an unmatched dim row would be emitted once
# per salt replica (n_salts copies), which is silently wrong.
_SALT_SAFE_HOW = {
    "inner", "left", "left_outer", "leftouter",
    "semi", "left_semi", "leftsemi",
    "anti", "left_anti", "leftanti",
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join `fact` to `dim` on `on`, salted n_salts ways.

    Row-identical to fact.join(dim, on, how) for fact-preserving join
    types (inner / left outer / semi / anti); the shuffle key becomes
    (on..., salt), so a key holding X% of the fact spreads over
    n_salts partitions instead of one. Right and full outer joins are
    rejected: the exploded dim side would emit every unmatched dim row
    n_salts times — swap the sides (salt the other table) or dedupe
    unmatched rows explicitly instead.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join(how={how!r}): only fact-preserving join types "
            f"{sorted(_SALT_SAFE_HOW)} are row-identical under salting; "
            "right/full outer would duplicate unmatched dim rows n_salts times"
        )
    f = salt_fact(fact, n_salts, seed)
    d = explode_dim(dim, n_salts)
    return f.join(d, on + [SALT_COL], how).drop(SALT_COL)

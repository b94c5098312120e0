"""Cross-engine parity for the benched flagships (+ the operators with
the trickiest oracle alignment), using the exact comparison the
driver's t2 gate applies. The full registry sweep lives in
tools/check.py (slower; run it before shipping a new operator)."""

from __future__ import annotations

import pytest

from hive_to_es_spark.registry import oracles, queries
from tests.conftest import assert_parity

FLAGSHIPS = [
    "a1_hash_agg",
    "q3_shipping_priority",
    "j11_multiway",
    "w1_order_rank",
    "e1_tumbling",
    "s1_knn_cosine",
    "d1_dedup_exact",
]

TRICKY = ["j9_asof", "e3_session", "x4_array", "u4_except", "a11_min_max_by"]


@pytest.mark.parametrize("key", FLAGSHIPS + TRICKY)
def test_parity(spark, duck, sf_dir, key):
    sdf = queries()[key](spark, sf_dir).toPandas()
    ddf = duck.execute(oracles()[key]).fetchdf()
    assert_parity(sdf, ddf)


@pytest.mark.parametrize("key", ["o3_sample", "a8_approx_distinct", "d2_dedup_minhash"])
def test_rows_only_ops_produce_rows(spark, sf_dir, key):
    assert queries()[key](spark, sf_dir).count() > 0


def test_asof_join_matches_native_asof(spark, duck, sf_dir):
    """j9's windowed as-of form vs DuckDB's NATIVE ASOF JOIN — an
    independent implementation of the same semantics (the groupBy
    oracle in j9's registration is a third). All three must agree on
    every (purchase, last_click_ts) pair including tie handling."""
    got = {
        (r.event_id, r.last_click_ts)
        for r in queries()["j9_asof"](spark, sf_dir).collect()
    }
    want = set(
        duck.execute(
            """
            SELECT p.event_id, c.ts AS last_click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND c.ts <= p.ts
            """
        ).fetchall()
    )
    assert got == want

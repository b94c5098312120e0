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

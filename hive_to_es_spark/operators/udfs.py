"""UDF / UDAF / UDTF surface (SURVEY.md §2.E, g1-g4).

Discipline: Python enters the data path ONLY through Arrow-vectorized
interfaces — pandas_udf (scalar + grouped-agg), applyInPandas
(grouped-map), and the Spark 4 Python UDTF. Row-at-a-time
`F.udf` is banned in this engine: at 100 TB it serializes every row
through pickle; Arrow batches amortize the Python boundary ~100x.
Each UDF here has a pure-SQL oracle twin so the vectorized
implementation is hash-checked, not trusted.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Tuple  # g7's SCALAR_ITER hints resolve at module scope

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from hive_to_es_spark.io import load_tables
from hive_to_es_spark.registry import register

_G1_ORACLE = """
SELECT doc_id,
       trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')) AS norm_text,
       len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')), ' ')) AS n_tokens
FROM documents
WHERE doc_id < 300
"""


@register("g1_scalar_pandas_udf", _G1_ORACLE)
def g1_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF: text normalization (lowercase, strip
    non-alphanumerics) over Arrow batches of pandas Series."""

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"[^a-z0-9 ]", " ", regex=True).str.strip()

    d = load_tables(spark, sf_dir).documents.filter(F.col("doc_id") < 300)
    norm = normalize(F.col("text"))
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).alias("n_tokens"),
    )


# z-score per market segment; pandas std(ddof=1) == stddev_samp.
_G2_ORACLE = """
SELECT c_custkey,
       c_mktsegment,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment), 6) AS bal_z
FROM customer
"""


@register("g2_grouped_map", _G2_ORACLE)
def g2_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map (applyInPandas): per-segment z-score. Each group
    arrives as one pandas DataFrame; groups process in parallel across
    executors (the partition key is the shuffle key)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_z": ((pdf["c_acctbal"] - mu) / sd).round(6),
            }
        )

    c = load_tables(spark, sf_dir).customer
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, "c_custkey BIGINT, c_mktsegment STRING, bal_z DOUBLE"
    )


_G3_ORACLE = """
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""


@register("g3_grouped_agg_udaf", _G3_ORACLE)
def g3_grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (custom UDAF): quantity-weighted average
    price — two full-column pandas Series in, one scalar out."""

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_tables(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("wavg_price")
    )


_G4_ORACLE = """
SELECT event_id, 'k' AS prop_key, CAST(json_extract(props, '$.k') AS INTEGER) AS prop_value
FROM events WHERE event_id < 1000
"""


@register("g4_udtf", _G4_ORACLE)
def g4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): explode each event's JSON props object
    into (key, value) rows — one input row, N output rows."""
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="event_id BIGINT, prop_key STRING, prop_value INT")
    class ExplodeProps:
        def eval(self, event_id: int, props: str):
            for k, v in json.loads(props).items():
                yield event_id, k, int(v)

    ev = load_tables(spark, sf_dir).events.filter(F.col("event_id") < 1000)
    spark.udtf.register("explode_props", ExplodeProps)
    # spark.sql analyzes eagerly (the view inlines into the returned
    # plan), so the view can be dropped before the caller ever
    # collects — no catalog state survives this call.
    view = f"_g4_events_in_{uuid.uuid4().hex}"
    ev.select("event_id", "props").createOrReplaceTempView(view)
    try:
        return spark.sql(
            "SELECT t.event_id, t.prop_key, t.prop_value "
            f"FROM {view}, LATERAL explode_props(event_id, props) t"
        )
    finally:
        spark.catalog.dropTempView(view)


# mapInArrow: the zero-copy batch interface below pandas — pyarrow
# RecordBatches in and out, no pandas conversion at all. The oracle
# states the same norm in SQL.
_G5_ORACLE = """
SELECT vec_id,
       round(sqrt(list_aggregate(
         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         'sum')), 6) AS l2_norm
FROM embeddings
"""


@register("g5_arrow_batch_map", _G5_ORACLE)
def g5_arrow_batch_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: per-vector L2 norm computed on raw pyarrow
    RecordBatches — the lowest-overhead Python boundary Spark offers
    (no pandas materialization; columnar buffers pass through
    zero-copy). The numerics mirror the engine's JVM fold exactly:
    float32 components widen to float64 and accumulate in list order,
    so the result hash-matches the SQL oracle bit for bit. The
    accumulation is a deliberate sequential fold: numpy's pairwise
    summation reorders additions and breaks cross-engine bit parity
    (the same trade documented on d5's HOF note) — production numeric
    kernels without an oracle constraint would np.asarray the Arrow
    buffers and vectorize. At 100 TB this is the interface for
    numpy-heavy per-batch work (quantization/codec layers) when even
    pandas overhead matters."""
    import pyarrow as pa

    def batch_norms(batches):
        for batch in batches:
            vec_ids = batch.column("vec_id")
            norms = []
            for emb in batch.column("embedding"):
                # A NULL embedding yields a null ListScalar whose
                # .values access raises — emit SQL NULL instead of
                # crashing the whole Arrow batch (output is nullable).
                if not emb.is_valid:
                    norms.append(None)
                    continue
                acc = 0.0
                for x in emb.values:
                    v = float(x.as_py())
                    acc += v * v
                norms.append(round(acc ** 0.5, 6))
            yield pa.RecordBatch.from_arrays(
                [vec_ids, pa.array(norms, type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    e = load_tables(spark, sf_dir).embeddings
    return e.select("vec_id", "embedding").mapInArrow(
        batch_norms, "vec_id BIGINT, l2_norm DOUBLE"
    )


# Cogrouped-map: the last Pandas-UDF interface Spark offers (after
# scalar g1, grouped-map g2, grouped-agg g3, UDTF g4, mapInArrow g5).
# The oracle restates the as-of merge as one window pass (j9's shape):
# clicks sort before purchases at equal ts, so max(click_ts) over the
# preceding rows IS "latest click at ts <= purchase ts". Gap math runs
# on integer epoch microseconds end to end — the only float op is the
# final avg division, identical in both engines.
_G6_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts,
         (event_type = 'purchase') AS is_purchase,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tie
  FROM events WHERE event_type IN ('click', 'purchase') AND ts IS NOT NULL
),
asof_m AS (
  SELECT user_id, is_purchase,
         epoch_us(ts) AS tus,
         epoch_us(max(click_ts) OVER (
           PARTITION BY user_id ORDER BY ts, tie
           ROWS UNBOUNDED PRECEDING)) AS click_us
  FROM tagged
)
SELECT user_id,
       count(*) AS n_purchases,
       count(click_us) AS n_matched,
       CASE WHEN count(click_us) > 0
            THEN round(sum(tus - click_us) / count(click_us) / 1000000.0, 6)
       END AS avg_gap_s
FROM asof_m WHERE is_purchase GROUP BY user_id
"""


@register("g6_cogrouped_asof", _G6_ORACLE)
def g6_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: purchases and clicks cogrouped per
    user, merged with pandas ``merge_asof`` (latest click at
    ts <= purchase ts), reduced to per-user attribution stats.

    This is the interface for per-key merges whose logic lives in a
    Python library (backtesting joins, per-entity reconciliation):
    ``dfA.groupBy(k).cogroup(dfB.groupBy(k))`` shuffles BOTH sides on
    the same key once, then hands each key's pair of pandas frames to
    one task — no pairwise join blow-up, parallel across keys, and at
    100 TB the state per task is one user's events, not the table.
    The timestamp math stays on integer epoch-microseconds (datetime64
    ns // 1000) because float64 cannot represent epoch-nanoseconds
    exactly (2^53 < 1.7e18); sums are exact ints, so the single
    rounded division hash-matches the SQL oracle. j9 is the same
    semantics as a pure JVM window plan — the pair pins this interface
    against that oracle family.

    Two measured performance lessons baked in (scale_proof found the
    first cut INVERSELY scaling, 9.4s at 1x -> 2.4s at 8x):
    1. The per-group kernel is numpy searchsorted (the exact
       merge_asof semantics: side='right' - 1 = last click <= each
       purchase), not pd.merge_asof — building three pandas frames
       per group cost ~6 ms x n_groups; the array kernel is ~10x less.
    2. The cogroup inputs are explicitly repartition(n, key)'d:
       AQE sizes shuffle partitions BY BYTES, and a few MB of events
       coalesce to ONE partition — serializing all groups through one
       Python worker. Byte-based sizing is blind to per-GROUP Python
       cost; any pandas-cogroup stage over many small groups needs a
       partition floor pinned by group count, not data size. The
       user-specified repartition satisfies the cogroup's distribution
       requirement (no extra exchange) and AQE does not coalesce it."""
    import numpy as np

    def asof_stats(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
        if purchases.empty:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_matched", "sum_gap_us"]
            )
        uid = int(purchases["user_id"].iloc[0])
        # epoch micros as int64: exact integer arithmetic (see docstring)
        p = np.sort(purchases["ts"].to_numpy().astype("int64")) // 1000
        if clicks.empty:
            n_matched, sum_gap_us = 0, 0
        else:
            c = np.sort(clicks["cts"].to_numpy().astype("int64")) // 1000
            idx = np.searchsorted(c, p, side="right") - 1
            m = idx >= 0
            n_matched = int(m.sum())
            sum_gap_us = int((p[m] - c[idx[m]]).sum())
        return pd.DataFrame(
            [[uid, len(p), n_matched, sum_gap_us]],
            columns=["user_id", "n_purchases", "n_matched", "sum_gap_us"],
        )

    n_parts = spark.sparkContext.defaultParallelism
    ev = load_tables(spark, sf_dir).events
    # ts IS NOT NULL on both sides (mirrored in the oracle): a NaT
    # reaching the numpy kernel would cast to int64 garbage instead of
    # being skipped the way the oracle's window skips SQL NULLs.
    purchases = (
        ev.filter((F.col("event_type") == "purchase") & F.col("ts").isNotNull())
        .select("user_id", "ts")
        .repartition(n_parts, "user_id")
    )
    # The click side renames ts -> cts: both cogroup inputs derive from
    # the SAME events scan, so their columns carry identical attribute
    # ids, and a projection above the cogroup makes Catalyst mis-prune
    # the right child's ts (the left's ts "covers" it) — the worker
    # then receives a click frame without its timestamp. Distinct names
    # break the id collision; any self-cogroup needs this.
    clicks = (
        ev.filter((F.col("event_type") == "click") & F.col("ts").isNotNull())
        .select("user_id", F.col("ts").alias("cts"))
        .repartition(n_parts, "user_id")
    )
    stats = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_stats,
            "user_id BIGINT, n_purchases BIGINT, n_matched BIGINT, sum_gap_us BIGINT",
        )
    )
    return stats.select(
        "user_id",
        "n_purchases",
        "n_matched",
        F.when(
            F.col("n_matched") > 0,
            F.round(F.col("sum_gap_us") / F.col("n_matched") / 1000000.0, 6),
        ).alias("avg_gap_s"),
    )


# g7 — iterator-of-series scalar UDF (SCALAR_ITER): the pandas-UDF
# variant whose function receives the WHOLE Arrow batch stream, so
# expensive one-time state (a model, a tokenizer, a calibration
# table) loads ONCE per Python worker instead of once per batch —
# the pattern every ML-scoring stage at scale depends on (loading a
# 2 GB model per 10k-row batch is the classic UDF performance bug).
# The "model" here is a per-language calibration table; scoring is
# vectorized numpy on each batch. Rounding happens JVM-side (F.round)
# so the cross-engine compare never sees pandas' banker's rounding.
_G7_ORACLE = """
SELECT doc_id, lang,
       round(ln(CAST(n_chars AS DOUBLE)) - CASE lang
         WHEN 'en' THEN 5.0 WHEN 'de' THEN 5.2 WHEN 'fr' THEN 5.1
         WHEN 'es' THEN 5.05 ELSE 5.3 END, 6) AS calib_score
FROM documents
"""


@register("g7_scalar_iter_udf", _G7_ORACLE)
def g7_scalar_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALAR_ITER pandas UDF: per-language length calibration where
    the calibration table is built once per worker inside the
    iterator function (before the batch loop — the amortized-init
    slot), then applied vectorized to every Arrow batch. The oracle
    restates the arithmetic in SQL, so what is verified is that the
    iterator plumbing feeds every batch through exactly once.

    (Iterator/Tuple are imported at module scope: with PEP-563 string
    annotations, pyspark resolves the UDF's hints against the module
    globals — function-local imports make the signature unreadable.)"""

    @pandas_udf("double")
    def calibrated(
        batches: Iterator[Tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        import numpy as np

        # one-time init per Python worker stream: the "model load".
        # (A real stage would read weights from disk/broadcast here.)
        offsets = {"en": 5.0, "de": 5.2, "fr": 5.1, "es": 5.05}
        for n_chars, lang in batches:
            off = lang.map(lambda v: offsets.get(v, 5.3)).astype("float64")
            yield pd.Series(np.log(n_chars.astype("float64")) - off.to_numpy())

    d = load_tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        "lang",
        F.round(calibrated(F.col("n_chars"), F.col("lang")), 6).alias("calib_score"),
    )


_G8_WIN = 8  # passage window size (tokens)
_G8_STRIDE = 4  # passage stride (tokens) -> 50% overlap

_G8_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS nt
  FROM documents
),
starts AS (
  SELECT doc_id, tk,
         CAST(unnest(range(1, nt + 1, {_G8_STRIDE})) AS BIGINT) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) / {_G8_STRIDE} + 1 AS BIGINT) AS passage_no,
       array_to_string(tk[start : start + {_G8_WIN} - 1], ' ') AS passage,
       CAST(least(CAST({_G8_WIN} AS BIGINT), len(tk) - start + 1) AS BIGINT)
         AS n_tokens
FROM starts
"""


@register("g8_arrow_udtf", _G8_ORACLE)
def g8_arrow_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDTF (Spark 4, useArrow=True): chunk
    every document into overlapping retrieval passages (8-token
    windows, stride 4 — the RAG indexing step that turns a corpus
    into embeddable units). One row in, ceil(n_tokens/stride) rows
    out, with per-passage token accounting.

    vs g4 (pickled row-at-a-time UDTF): useArrow ships input AND
    yielded rows as Arrow batches — the UDTF analogue of the
    pandas_udf-vs-udf gap, which is what makes a table function
    viable in a corpus-sized lateral join at 100 TB. The chunker
    itself is pure Python per doc (bounded by the doc's own length);
    partition parallelism comes from the lateral join over the scan.
    The oracle replays the same window/stride ladder with DuckDB's
    stepped scalar range() — both sides unbounded in doc length."""
    from pyspark.sql.functions import udtf

    win, stride = _G8_WIN, _G8_STRIDE

    @udtf(
        returnType="doc_id BIGINT, passage_no BIGINT, passage STRING, n_tokens BIGINT",
        useArrow=True,
    )
    class Passages:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            no = 0
            for start in range(0, len(toks), stride):
                no += 1
                window = toks[start : start + win]
                yield doc_id, no, " ".join(window), len(window)

    d = load_tables(spark, sf_dir).documents
    spark.udtf.register("rag_passages", Passages)
    view = f"_g8_docs_in_{uuid.uuid4().hex}"
    d.select("doc_id", "text").createOrReplaceTempView(view)
    try:
        return spark.sql(
            "SELECT t.doc_id, t.passage_no, t.passage, t.n_tokens "
            f"FROM {view}, LATERAL rag_passages(doc_id, text) t"
        )
    finally:
        spark.catalog.dropTempView(view)

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

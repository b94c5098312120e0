"""Extended deduplication operators (training-data pipeline set):
SimHash (d3), n-gram Jaccard (d4), embedding-cosine near-dup (d5).

Together with d1 (exact hash) and d2 (MinHash-LSH) these cover the
standard LLM-corpus dedup ladder. Scale rule shared by all: candidate
pairs must come from a blocking key (shared shingle, signature band,
label/LSH bucket) — the all-pairs product never appears in any plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_to_es_spark.io import load_tables
from hive_to_es_spark.operators.dedup import word_shingles
from hive_to_es_spark.operators.similarity import _dbl, _dot, _norm
from hive_to_es_spark.registry import register


@register("d3_dedup_simhash", None)  # xxhash64 is Spark-specific -> rows-only
def d3_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document, plus 4x16-bit band keys.

    Classic SimHash: each word hashes to 64 bits; bit b of the
    signature is the sign of sum(+-1 over words, + if word's bit b is
    set). Near-dups differ in few bits, so any of the 4 band keys
    colliding is the candidate condition (banding = the blocking key).
    Everything is JVM expressions: collect word hashes per doc, then
    nested higher-order folds — no Python, no driver.
    """
    d = load_tables(spark, sf_dir).documents
    # explode to (doc_id, word_hash) rows, then 64 literal-shift vote
    # aggregates — every expression is a codegen'd JVM bit op (the
    # higher-order-function form was ~10x slower: HOF lambdas are
    # interpreted per element, literal shifts are whole-stage codegen).
    words = F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("w")
    hashed = d.select("doc_id", words).select("doc_id", F.xxhash64("w").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    # signature bit string, MSB (bit 63) first
    sig_bits = F.concat(
        *[F.when(F.col(f"v{b}") > 0, "1").otherwise("0") for b in range(63, -1, -1)]
    )
    with_sig = votes.select("doc_id", sig_bits.alias("sig_bits"))
    return with_sig.select(
        "doc_id",
        F.conv("sig_bits", 2, 16).alias("simhash_hex"),
        *[
            F.conv(F.col("sig_bits").substr(1 + 16 * i, 16), 2, 16).alias(f"band{i}")
            for i in range(4)
        ],
    ).orderBy("doc_id")


# Shingle construction mirrored in DuckDB: list_transform over a range,
# out-of-range indexing -> NULL, concat_ws skips NULLs (same as the
# Spark word_shingles helper).
_D4_ORACLE = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(
      range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1) + 1),
      i -> concat_ws(' ', string_split(lower(text), ' ')[i],
                          string_split(lower(text), ' ')[i+1],
                          string_split(lower(text), ' ')[i+2])
    ))) AS shingle
  FROM documents
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
"""


@register("d4_dedup_ngram_jaccard", _D4_ORACLE)
def d4_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, blocked by shared shingle.

    Only documents sharing at least one 3-word shingle ever meet (the
    shingle equi-join IS the blocking key); Jaccard is then exact:
    |A∩B| / (|A|+|B|-|A∩B|). The d2 MinHash op approximates exactly
    this quantity — d4 is its ground truth at test scale.
    """
    d = load_tables(spark, sf_dir).documents
    sh = d.select("doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# Demo threshold 0.3: the fixture embeddings are diffuse (within-label
# max cosine ~0.47 at sf0.01); a production near-dup gate would sit at
# ~0.95 with the identical plan.
_D5_ORACLE = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(
         list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(
        list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.3
"""


@register("d5_dedup_embedding", _D5_ORACLE)
def d5_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label.

    Same blocked-pair plan as s2 with a threshold filter instead of a
    top-k window; at 100 TB the label becomes an LSH/IVF bucket id and
    the plan is unchanged.
    """
    e = load_tables(spark, sf_dir).embeddings
    a = e.select(
        F.col("vec_id").alias("id_a"),
        "label",
        _dbl("embedding").alias("ea"),
        _norm(_dbl("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        _dbl("embedding").alias("eb"),
        _norm(_dbl("embedding")).alias("nb"),
    )
    # cosine computed ONCE per pair (projected before the filter, so
    # the predicate references the scalar, not the array fold)
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (a.label == b.label_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= 0.3)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
    )

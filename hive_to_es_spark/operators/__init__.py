"""Operator families (SURVEY.md §2). Importing this package registers
every operator in hive_to_es_spark.registry.REGISTRY."""

from hive_to_es_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    dedup_ext,
    filters,
    joins,
    pipeline_ops,
    scalars,
    similarity,
    sort_set,
    text,
    text_ext,
    tpch_ext,
    udfs,
    windows,
)

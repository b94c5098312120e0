"""hive_to_es_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the `TQCCC/hive_to_es` tool class (config-driven
Hive -> Elasticsearch sync that delegates all querying to HiveQL; see
SURVEY.md §0 for provenance — the reference repo was empty at survey
time, so the capability surface is reconstructed from public knowledge
of the tool class plus the full HiveQL SELECT surface it inherits),
extended with LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Design rules (binding, see SURVEY.md §1.2/§3.2):
- Everything is a DataFrame with an explicit schema; no RDD paths.
- Declare plans with DataFrame/SQL API; let Catalyst+AQE pick physical
  strategies (broadcast vs SMJ, partial agg, partition coalescing).
- Python UDFs only where built-ins genuinely can't express the
  semantics, and then always Arrow-vectorized (pandas_udf /
  applyInPandas / mapInPandas), never row-at-a-time.
- No driver-side collect() inside any operator path.
"""

from hive_to_es_spark.registry import REGISTRY, oracles, queries  # noqa: F401
from hive_to_es_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"

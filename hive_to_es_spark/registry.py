"""Query/oracle registry — the driver-facing correctness contract.

Every operator from SURVEY.md §2 registers here as
``(name, query_fn, oracle_sql | None)``. ``__spark_entry__.queries()``
and ``oracle_sql()`` are thin views over this registry.

Determinism rules baked into every registration (SURVEY.md §2,
"Oracle determinism rules"):
1. identical aliases in query and oracle;
2. cross-engine float outputs rounded (6 dp similarity, 2 dp money);
3. every LIMIT preceded by a total order with a unique tiebreaker;
4. collect_list always sort_array'd;
5. events.ts ns-fix applied by the loader on the Spark side only.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Op] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator's query function (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator key {name!r}")
        REGISTRY[name] = Op(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for registration side effects; idempotent.
    from hive_to_es_spark import operators, streaming  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: op.fn for k, op in sorted(REGISTRY.items())}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: op.oracle for k, op in sorted(REGISTRY.items()) if op.oracle is not None}

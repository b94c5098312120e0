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
    # Deprecated ops are verification pins kept next to their
    # replacement (e.g. w7's 3-task plain-window branch vs w8's
    # bucketed-donor plan). They are EXCLUDED from the public
    # queries()/oracles() views — the driver, bench and the operator
    # index never see them — but remain reachable with
    # include_deprecated=True so tests/tools can keep them
    # hash-verified against the oracle.
    deprecated: bool = False


REGISTRY: dict[str, Op] = {}


def register(
    name: str, oracle: str | None = None, deprecated: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register an operator's query function (and its DuckDB oracle)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator key {name!r}")
        REGISTRY[name] = Op(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            deprecated=deprecated,
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import for registration side effects; idempotent.
    from hive_to_es_spark import operators, streaming  # noqa: F401


def queries(include_deprecated: bool = False) -> dict[str, QueryFn]:
    _ensure_loaded()
    return {
        k: op.fn
        for k, op in sorted(REGISTRY.items())
        if include_deprecated or not op.deprecated
    }


def oracles(include_deprecated: bool = False) -> dict[str, str]:
    _ensure_loaded()
    return {
        k: op.oracle
        for k, op in sorted(REGISTRY.items())
        if op.oracle is not None and (include_deprecated or not op.deprecated)
    }


def deprecated_keys() -> set[str]:
    _ensure_loaded()
    return {k for k, op in REGISTRY.items() if op.deprecated}

#!/usr/bin/env python
"""Generate docs/OPERATORS.md from the live registry — one row per
registered operator with its oracle kind and docstring summary.
Run after adding operators; the test suite asserts it is current."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_to_es_spark.registry import REGISTRY, queries  # noqa: E402

HEADER = """# Operator index (generated — do not edit)

Regenerate with `python tools/gen_operator_index.py`. One row per
operator registered in `hive_to_es_spark.registry`; "sql" means the
driver hash-compares the result against the DuckDB oracle, "rows"
means a rows-only check (semantics nondeterministic across engines or
iterative). Keys map to SURVEY.md §2 (+ the §2.D-ext additions).

| Key | Oracle | Summary |
|---|---|---|
"""


def render() -> str:
    """The full OPERATORS.md content from the live registry — one
    function so the drift-guard test can regenerate and diff the
    WHOLE document (key set, oracle kinds AND summaries), not just
    the key list."""
    queries()  # force registration
    public = {k: op for k, op in REGISTRY.items() if not op.deprecated}
    lines = [HEADER]
    for key in sorted(public):
        op = public[key]
        summary = " ".join((op.doc.strip().splitlines() or [""])[0].split())
        kind = "sql" if op.oracle else "rows"
        lines.append(f"| `{key}` | {kind} | {summary} |\n")
    n_sql = sum(1 for op in public.values() if op.oracle)
    lines.append(
        f"\n**{len(public)} operators: {n_sql} sql-oracle, "
        f"{len(public) - n_sql} rows-only.**\n"
    )
    deprecated = {k: op for k, op in REGISTRY.items() if op.deprecated}
    if deprecated:
        lines.append(
            "\n## Deprecated verification pins (not in the public "
            "registry view; reachable only via "
            "`queries(include_deprecated=True)`)\n\n"
        )
        for key in sorted(deprecated):
            op = deprecated[key]
            summary = " ".join((op.doc.strip().splitlines() or [""])[0].split())
            lines.append(f"- `{key}` — {summary}\n")
    return "".join(lines)


def main() -> int:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "OPERATORS.md")
    with open(out, "w") as f:
        f.write(render())
    n_dep = sum(1 for op in REGISTRY.values() if op.deprecated)
    print(f"wrote {out}: {len(REGISTRY) - n_dep} operators (+{n_dep} deprecated pins)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

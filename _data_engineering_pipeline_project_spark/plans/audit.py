"""Physical-plan introspection — the engine's "is this the plan I want?"
toolkit.

The project discipline is: after an operator is correct, read its plan
and iterate until the physical shape is right (filters pushed to the
scan, dimensions broadcast, no surprise shuffles, codegen spans wide).
These helpers make that check programmatic so tests can pin plan shapes
(see tests/test_plans.py) and regressions surface as failures, not as
10× slowdowns at scale.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan_str(df: DataFrame) -> str:
    """Final (AQE-resolved) physical plan after execution."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters content per parquet scan (one string per scan —
    predicates contain commas, so no splitting)."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_str(df))
        if m.group(1).strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema (pruned column set) of each scan — catches operators
    accidentally reading all columns for a narrow projection."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", explain_str(df))


def _node_count(plan: str, node: str) -> int:
    """Count physical nodes by their unique detail headers '(id) Node' —
    the formatted explain prints every node twice (tree + detail)."""
    return len(set(re.findall(rf"\((\d+)\) {node}\b", plan)))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (BroadcastExchange headers
    don't match the bare 'Exchange' node name)."""
    return _node_count(explain_str(df), "Exchange")


def broadcast_join_count(df: DataFrame) -> int:
    return _node_count(explain_str(df), "BroadcastHashJoin")


def scan_summary(df: DataFrame) -> dict[str, object]:
    """One-call audit: scans, pushdowns, joins, exchanges, codegen spans."""
    plan = explain_str(df)
    return {
        "scans": _node_count(plan, "Scan parquet"),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_joins": _node_count(plan, "BroadcastHashJoin"),
        "sortmerge_joins": _node_count(plan, "SortMergeJoin"),
        "shuffles": _node_count(plan, "Exchange"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }

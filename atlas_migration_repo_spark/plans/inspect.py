"""Physical-plan accessors and counters (shared by tests and PLANS.md)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (post-AQE-prepare) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text: operator tree + per-operator details."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def exchange_count(plan: str) -> int:
    """Number of shuffle exchanges (each is a full data re-partition —
    the unit of cost that dominates at 100 TB)."""
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))


def broadcast_join_count(plan: str) -> int:
    return plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")


def pushed_filters(plan: str) -> list[str]:
    """Predicates that reached the parquet reader (row-group pruning)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out

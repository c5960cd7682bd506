"""Plan inspection: programmatic access to Catalyst physical plans.

The engine writes zero custom optimizer rules (SURVEY.md §4) — these
helpers exist to *verify* that declarative plans got the physical shape we
expect (filters pushed to parquet, small sides broadcast, no redundant
exchanges), both in tests and in the generated PLANS.md audit.
"""

from atlas_migration_repo_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    formatted_plan,
    physical_plan,
    pushed_filters,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "formatted_plan",
    "physical_plan",
    "pushed_filters",
]

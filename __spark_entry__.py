"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``atlas_migration_repo_spark.registry``: every operator from
SURVEY.md §2 registers a (spark, sf_dir) -> DataFrame callable plus, when
SQL-expressible, its DuckDB oracle SQL. The driver smoke-runs ``entry``,
then hash-compares each ``queries()`` entry against ``oracle_sql()`` at
sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from atlas_migration_repo_spark.registry import QUERIES, load_all_modules

load_all_modules()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["agg_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}

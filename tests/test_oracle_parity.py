"""Replay of the driver's correctness gate over every registered query.

Queries with an oracle: exact order-insensitive value parity vs DuckDB.
Queries without (rows-only contract): run and require a stable schema and
a non-negative row count.
"""

from __future__ import annotations

import pytest

from atlas_migration_repo_spark.registry import QUERIES

from conftest import SF_DIR, assert_matches_oracle


def _keys():
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _keys())
def test_query_matches_oracle(spark, oracle_con, name):
    qd = QUERIES[name]
    if qd.oracle is None:
        df = qd.fn(spark, SF_DIR)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0
    else:
        assert_matches_oracle(spark, oracle_con, qd)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns

"""Shared test harness: Spark session + DuckDB oracle replay.

``assert_matches_oracle`` replicates the driver's correctness gate
(__spark_entry__.py docstring): same row count, same column names, and
order-insensitive exact value equality between the PySpark DataFrame and
the DuckDB oracle SQL over the same parquet files. Tests default to the
DRIVER'S scale factor (sf0.01) so a green local run always means
driver-scale green; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.001 for a
faster inner loop while iterating on one operator.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from atlas_migration_repo_spark.catalog import TABLES, table_path
from atlas_migration_repo_spark.registry import load_all_modules
from atlas_migration_repo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

load_all_modules()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="atlas-tests")
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(SF_DIR, t)}')"
        )
    yield con
    con.close()


def _norm_value(v):
    """Canonicalize a cell for cross-engine comparison."""
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return out


def run_spark(spark, qd, sf_dir: str):
    df = qd.fn(spark, sf_dir)
    return df.columns, df.collect()


def run_oracle(con, qd):
    cur = con.execute(qd.oracle)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def assert_matches_oracle(spark, con, qd, sf_dir: str = SF_DIR):
    s_cols, s_rows = run_spark(spark, qd, sf_dir)
    o_cols, o_rows = run_oracle(con, qd)
    assert sorted(s_cols) == sorted(o_cols), (
        f"{qd.name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{qd.name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    # The driver's hash gate is pandas-based and dies on unhashable cells
    # (TypeError: unhashable type 'list'). Reject complex-typed result
    # columns here so the mismatch is caught locally, not at judging time.
    for r in s_rows[:1] + o_rows[:1]:
        bad = [i for i, v in enumerate(r) if isinstance(v, (list, dict, set))]
        assert not bad, (
            f"{qd.name}: oracle-gated result has unhashable cells in columns "
            f"{[s_cols[i] if i < len(s_cols) else i for i in bad]}; "
            "serialize arrays to a canonical string in BOTH twins"
        )
    s_norm = _normalize(list(s_cols), [tuple(r) for r in s_rows])
    o_norm = _normalize(list(o_cols), [tuple(r) for r in o_rows])
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
    ]
    assert not mismatches, (
        f"{qd.name}: {len(mismatches)} row mismatches; first: "
        f"spark={mismatches[0][1]} oracle={mismatches[0][2]} "
        f"(cols sorted: {sorted(s_cols)})"
    )

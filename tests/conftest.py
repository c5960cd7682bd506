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
    return df.columns, df.collect(), df.schema


def run_oracle(con, qd):
    cur = con.execute(qd.oracle)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


# ---------------------------------------------------------------------------
# Pandas-dtype parity audit (VERDICT r9 "next" #1c). The driver's hash gate
# compares pandas frames, and pandas dtype is where Spark and DuckDB can
# diverge even when every VALUE matches: Spark FLOOR returns BIGINT (int64)
# while DuckDB's returns DOUBLE (float64), and a surfaced DECIMAL reaches
# pandas as object-``Decimal`` from Spark but float64 from DuckDB's
# ``.df()``. Value comparison alone (above) is blind to this axis — that is
# exactly how math_funcs/cast_types stayed builder-green for six rounds and
# failed their first driver sampling (r9). So every oracle-gated key also
# asserts that the TYPE CLASS of each output column agrees between the Spark
# schema and DuckDB's ``DESCRIBE`` of the oracle, and that neither side
# surfaces a decimal.

_DUCK_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.BinaryType):
        return "bin"
    return "other"


def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in _DUCK_INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BLOB":
        return "bin"
    return "other"


def assert_dtype_parity(con, qd, spark_schema) -> None:
    """Spark-vs-DuckDB pandas-dtype-class parity for one oracle key."""
    desc = con.execute(f"DESCRIBE {qd.oracle}").fetchall()
    duck_classes = {row[0]: _duck_type_class(row[1]) for row in desc}
    spark_classes = {f.name: _spark_type_class(f.dataType) for f in spark_schema.fields}
    bad = []
    for name, s_cls in spark_classes.items():
        d_cls = duck_classes.get(name)
        if d_cls is None:
            continue  # column-name parity is asserted separately
        if s_cls == "decimal" or d_cls == "decimal":
            bad.append(
                (name, s_cls, d_cls, "surfaced DECIMAL reaches pandas as "
                 "object-Decimal (Spark) vs float64 (DuckDB) — cast both "
                 "twins to DOUBLE or VARCHAR before surfacing")
            )
        elif s_cls != d_cls:
            bad.append(
                (name, s_cls, d_cls, "pandas dtype class diverges — align "
                 "the twins with explicit CASTs (e.g. CAST(FLOOR(x) AS "
                 "BIGINT) in the oracle: Spark FLOOR is BIGINT, DuckDB's "
                 "is DOUBLE)")
            )
    assert not bad, (
        f"{qd.name}: driver-hash dtype hazard in columns "
        + "; ".join(f"{n} (spark={s}, duckdb={d}: {why})" for n, s, d, why in bad)
    )


def assert_matches_oracle(spark, con, qd, sf_dir: str = SF_DIR):
    s_cols, s_rows, s_schema = run_spark(spark, qd, sf_dir)
    o_cols, o_rows = run_oracle(con, qd)
    assert_dtype_parity(con, qd, s_schema)
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

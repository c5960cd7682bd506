"""Fixture catalog: table loading + shared column helpers.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under
the scale-factor directory. All reads stay fully declarative so Catalyst
gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan — pushdown/pruning happen
    at the source when callers .select()/.where() on the result."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    try:
        df = spark.read.parquet(table_path(sf_dir, name))
    except Exception as e:  # pragma: no cover - only ns-precision fixtures
        if name == "events" and "PARQUET_TYPE_ILLEGAL" in str(e):
            # ns-precision events.parquet: Spark 4 hard-rejects
            # TIMESTAMP(NANOS) unless nanosAsLong surfaces it as raw int64.
            # Runtime-settable, so this works on any caller-supplied session.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(table_path(sf_dir, name))
        else:
            raise
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns fixture surfaced as int64 ns → convert to µs TIMESTAMP_NTZ
        # (floor, matching DuckDB's ns→µs CAST truncation). Integral `div`,
        # NOT `/`: float division of 1.7e18 ns exceeds double's 53-bit
        # mantissa. timestamp_add on an NTZ epoch literal is zone-pure, so
        # no session-timeZone mutation is needed (timestamp_micros +
        # cast('timestamp_ntz') would round-trip through the session zone).
        df = df.withColumn(
            "ts",
            F.timestamp_add(
                "MICROSECOND",
                F.expr("ts div 1000"),
                F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
            ),
        )
    # µs fixtures land as TIMESTAMP_NTZ already — pass through untouched.
    # NTZ (naive wall-clock) is the canonical ts type engine-wide: it is
    # exactly DuckDB's TIMESTAMP semantics, so results collect identically
    # regardless of the driver session's time zone. Epoch math on NTZ goes
    # through epoch_us() below, never a bare session-TZ-dependent cast.
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata —
    no Spark job, no data scan. The cheap replacement for a driver-side
    `df.count()` when an operator only needs N to size its blocking
    (same footer-stats source table_log's data skipping harvests)."""
    import os

    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(d, n)).metadata.num_rows
            for d, _sub, names in os.walk(path)
            for n in names
            if n.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


# ---- determinism helpers (SURVEY.md §5.4) -----------------------------------
# Floats: Spark and DuckDB sum in different orders → ulp drift. Every derived
# double that feeds the oracle hash is rounded to 4 decimals on BOTH sides.


def r4(c: Column) -> Column:
    """Round a double expression to 4 decimals (hash-stable float policy).
    + 0.0 canonicalizes IEEE -0.0 to +0.0, twin of oracle.sql_r4."""
    return F.round(c.cast("double"), 4) + F.lit(0.0)


def msum(c: Column) -> Column:
    """Exact money-sum: DECIMAL(30,8) accumulation → DECIMAL(.,4) → double.

    Twin of oracle.sql_msum. Why this exact shape (measured on the fixture):
    - Fixture measures are ≤2dp and their products ≤6dp-exact, so the
      per-row double→decimal(30,8) cast has a 100× margin to any rounding
      tie — Spark's shortest-repr HALF_UP and DuckDB's exact-binary
      rounding agree on every row. (Scale 4 does NOT work: 6dp products
      hit exact .xxxx50 ties that the engines break differently.)
    - Decimal aggregation is exact and order-independent → immune to
      shuffle-order double drift (≈1e-4 at sf0.1, past the round grid).
    - The 4dp rounding happens decimal→decimal (exact ties, HALF_UP ==
      half-away-from-zero in both engines), then decimal→double is
      correctly rounded in both engines for |value|·1e4 < 2^53.
    Decimal sums stay in Tungsten codegen (Decimal128) — JVM fast path.
    """
    return F.sum(c.cast("decimal(30,8)")).cast("decimal(38,4)").cast("double")


def as_date(c: Column) -> Column:
    """Fixture dates are midnight ms-timestamps; compare as DATE everywhere."""
    return c.cast("date")


_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"

_TRUNC_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def epoch_us(c: Column | str) -> Column:
    """Microseconds since epoch of a naive (TIMESTAMP_NTZ) wall clock,
    read as UTC — independent of the session time zone.

    ``unix_micros`` rejects NTZ, and every cast/shim that goes through LTZ
    (``cast('timestamp')``, ``to_utc_timestamp``) first reinterprets the
    wall clock in the *session* zone — wrong on a driver session pinned to
    anything but UTC (verified empirically). Field extraction on NTZ is
    wall-clock-pure, so the epoch is assembled arithmetically:
    days-since-epoch · 86400e6 + h·3600e6 + m·60e6 + fractional-seconds·1e6.
    This equals DuckDB's ``EPOCH_US(ts)`` on a naive timestamp exactly.
    """
    col = F.col(c) if isinstance(c, str) else c
    day = F.datediff(col.cast("date"), F.to_date(F.lit("1970-01-01"))).cast("bigint")
    sec_us = (F.date_part(F.lit("SECOND"), col) * 1_000_000).cast("bigint")
    return (
        day * 86_400_000_000
        + F.hour(col).cast("bigint") * 3_600_000_000
        + F.minute(col).cast("bigint") * 60_000_000
        + sec_us
    )


def ntz_trunc(unit: str, c: Column | str) -> Column:
    """date_trunc twin that stays TIMESTAMP_NTZ. Spark's ``date_trunc``
    implicitly casts NTZ input through the session zone (LTZ) and back —
    shifting the wall clock off-UTC sessions; flooring the arithmetic epoch
    instead is zone-pure and matches DuckDB's naive DATE_TRUNC exactly."""
    us = _TRUNC_US[unit]
    e = epoch_us(c)
    return F.timestamp_add("MICROSECOND", e - (e % us), F.expr(_EPOCH_NTZ))

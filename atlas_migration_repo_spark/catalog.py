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
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark 4 hard-rejects
        # (PARQUET_TYPE_ILLEGAL) unless nanosAsLong is set. The conf is
        # runtime-settable, and the driver may hand us a SparkSession built
        # without it — so set it here, at the read site, not only in
        # session.get_spark.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # events.ts is ns-precision parquet, surfaced as int64 ns (see
        # session.py nanosAsLong). Convert to µs TimestampType: floor
        # division matches DuckDB's CAST(ts_ns AS TIMESTAMP) truncation,
        # so both engines see identical µs instants.
        # integral `div`, NOT `/`: float division of 1.7e18 ns exceeds
        # double's 53-bit mantissa and would corrupt low-order digits
        # (dtype-gated: re-landed copies of events — e.g. a sink's output
        # read back — already carry µs TimestampType and pass through)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


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

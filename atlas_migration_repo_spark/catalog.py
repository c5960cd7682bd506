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


# Inferred parquet schema per file path. Schema inference reads the file
# footer through the JVM (~80 ms per call vs ~15 ms with the schema handed
# to the reader — measured r10); a 6-table join paid it six times per query
# construction. Metadata only — every query still scans the parquet data.
_SCHEMA_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Plain parquet scan — pushdown/pruning happen
    at the source when callers .select()/.where() on the result."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    cached = _SCHEMA_CACHE.get(path)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        try:
            df = spark.read.parquet(path)
        except Exception as e:  # pragma: no cover - only ns-precision fixtures
            if name == "events" and "PARQUET_TYPE_ILLEGAL" in str(e):
                # ns-precision events.parquet: Spark 4 hard-rejects
                # TIMESTAMP(NANOS) unless nanosAsLong surfaces it as raw int64.
                # Runtime-settable, so this works on any caller-supplied session.
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                df = spark.read.parquet(path)
            else:
                raise
        _SCHEMA_CACHE[path] = df.schema
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


# msum fast path: per-row 8dp mantissa is split at this base into two
# overflow-safe long sums (see msum docstring for the full budget).
_MSUM_SPLIT = 3_000_000


def _mantissa8(c: Column) -> Column:
    """round(c·1e8) half-away-from-zero as a long — the unscaled value of
    CAST(c AS DECIMAL(30,8)) for every value in msum's input contract."""
    return (c * 1e8 + F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("bigint")


def _mantissa4(c: Column) -> Column:
    """round(c·1e4) half-away-from-zero as a long — the unscaled 4dp value.
    For ≤4dp-exact inputs with |c| < 5e14·1e-4 the double product c·1e4
    carries < 0.5 units of error (|c·1e4|·2⁻⁵² < 0.5 up to |c·1e4| ≈ 2e15),
    so the long recovers the exact scaled integer. Use instead of
    _mantissa8 when |c| can exceed ~1e9 (there c·1e8 > 2^58 and the
    8dp product's error exceeds the rounding margin) and the input is
    4dp-exact — e.g. a 4dp measure times an integer weight."""
    return (c * 1e4 + F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("bigint")


def _msum_parts(c: Column, dp: int = 8) -> tuple[Column, Column]:
    """(hi, lo) long mantissa split of c at the dp-digit grid."""
    m = _mantissa8(c) if dp == 8 else _mantissa4(c)
    lo = m % _MSUM_SPLIT
    # (m - lo) is an exact multiple of the split base ≤ 2^53, so the double
    # division below is exact; the quotient re-enters long space unrounded.
    hi = ((m - lo) / _MSUM_SPLIT).cast("bigint")
    return hi, lo


# exact decimal scale factors for reconstruction: multiplying the integer
# Σm (DECIMAL(p,0)) by 10^-dp as DECIMAL(dp,dp) is exact (p+dp+1 ≤ 38).
_MSUM_SCALE = {8: "0.00000001", 4: "0.0001"}


def _msum_total(hi_sum: Column, lo_sum: Column) -> Column:
    """The exact integer mantissa sum Σm as DECIMAL(28,0), rebuilt from the
    two overflow-safe long partial sums (hi·SPLIT + lo, all exact)."""
    return (
        hi_sum.cast("decimal(19,0)") * F.lit(_MSUM_SPLIT).cast("decimal(7,0)")
        + lo_sum.cast("decimal(19,0)")
    )


def _msum_reconstruct(hi_sum: Column, lo_sum: Column, dp: int = 8) -> Column:
    """Σ(c at dp-digit grid) reconstructed exactly in decimal from the two
    long partial sums: value equals SUM(CAST(c AS DECIMAL(30,8))) for every
    dp-exact input (the 8dp decimal just carries trailing zeros at dp=4)."""
    return _msum_total(hi_sum, lo_sum) * F.lit(_MSUM_SCALE[dp]).cast(
        f"decimal({dp},{dp})"
    )


def msum(c: Column) -> Column:
    """Exact money-sum, bit-identical to DECIMAL(30,8) accumulation →
    DECIMAL(38,4) → double, via integer-mantissa long sums (r10 fast path).

    Twin of oracle.sql_msum. Input contract (unchanged from the decimal
    form): values are ≤6dp-exact decimals (fixture measures are ≤2dp, their
    products ≤6dp-exact; arbitrary doubles are r4-rounded first — see
    similarity.sim_maxsim) with |value| < 1e9.

    Why this computes the same result (measured exhaustively on the
    fixtures, pinned by tests/test_properties.py::test_msum_fast_path_*):
    - Per row, round(c·1e8) half-away-from-zero on the BINARY double equals
      the unscaled value of Spark's shortest-repr cast(c as decimal(30,8)):
      a ≤6dp-exact value sits ≥50 mantissa units from the nearest rounding
      tie, while the c·1e8 double product carries ≤1e-3 units of error —
      a 4-5 order-of-magnitude margin (same argument, same 100× headroom,
      as the decimal form's docstring made for the cast itself).
    - The mantissa is split m = (m DIV 3e6)·3e6 + (m % 3e6), truncating
      division, so the two long partial sums reconstruct Σm exactly at any
      aggregation order — the same order-independence decimal sums gave.
      Overflow budget: |m| ≤ 1.3e13 → |hi| ≤ 4.4e6, |lo| < 3e6; at 100 TB
      (~6e11 lineitem rows) both sums stay below 2.7e18 ≪ 2^63.
    - Reconstruction runs on |groups| rows only, entirely in decimal with
      no precision-loss adjustment (27+8+1 ≤ 38 digits end to end): Σm as
      DECIMAL(28,0), ·1e-8 → DECIMAL(37,8) exact, → DECIMAL(38,4) is the
      identical HALF_UP 4dp rounding, → double correctly rounded once.
    Why: the decimal form pays a Double.toString + BigDecimal parse per row
    per measure (measured 1.76 s for Q1's four sums at sf0.1 vs 0.28 s for
    this form); the long form stays in whole-stage codegen arithmetic.
    """
    hi, lo = _msum_parts(c)
    return (
        _msum_reconstruct(F.sum(hi), F.sum(lo))
        .cast("decimal(38,4)")
        .cast("double")
    )


def msum8(c: Column, dp: int = 8) -> Column:
    """Exact money-sum cast straight to double, NO 4dp rounding — the twin
    of ``F.sum(c.cast("decimal(30,8)")).cast("double")`` (r11; same input
    contract and mantissa argument as msum — see its docstring). The
    reconstructed DECIMAL value equals the DECIMAL(38,8) sum exactly, and
    decimal→double casting is value-based, so the single correctly-rounded
    conversion lands on the identical double regardless of the decimal's
    declared precision. ``dp=4`` switches to the 4dp mantissa for inputs
    that are 4dp-exact but too large for the 8dp grid (see _mantissa4)."""
    hi, lo = _msum_parts(c, dp)
    return _msum_reconstruct(F.sum(hi), F.sum(lo), dp).cast("double")


def msum_dec(c: Column) -> Column:
    """Exact money-sum typed DECIMAL(38,8) — drop-in for
    ``F.sum(c.cast("decimal(30,8)"))`` at sites where the sum STAYS decimal
    downstream (division, subtraction, ordering): the reconstructed value
    is Σm·1e-8 exactly (the decimal sum's value) and the explicit
    DECIMAL(38,8) cast (lossless widening from DECIMAL(37,8)) pins the
    type, so downstream decimal type-derivation — division result scale,
    ROUND output type — is unchanged from the decimal-accumulation form."""
    hi, lo = _msum_parts(c)
    return _msum_reconstruct(F.sum(hi), F.sum(lo)).cast("decimal(38,8)")


def sql_msum_spark(expr: str) -> str:
    """Spark-SQL text twin of msum for queries built as SQL strings
    (func_sql_udf): the same mantissa-split long sums, reconstructed in
    decimal — bit-identical to
    ``CAST(ROUND(SUM(CAST((expr) AS DECIMAL(30,8))), 4) AS DOUBLE)``
    under msum's input contract (0.5D literals keep the ±0.5 tie nudge a
    DOUBLE, exactly like the Column form's F.lit(0.5))."""
    m = f"CAST(({expr}) * 1e8 + IF(({expr}) >= 0, 0.5D, -0.5D) AS BIGINT)"
    lo = f"({m} % {_MSUM_SPLIT})"
    hi = f"CAST(({m} - {lo}) / {_MSUM_SPLIT} AS BIGINT)"
    total = (
        f"(CAST(SUM({hi}) AS DECIMAL(19,0)) * CAST({_MSUM_SPLIT} AS DECIMAL(7,0))"
        f" + CAST(SUM({lo}) AS DECIMAL(19,0)))"
    )
    return (
        f"CAST(CAST({total} * CAST(0.00000001 AS DECIMAL(8,8))"
        f" AS DECIMAL(38,4)) AS DOUBLE)"
    )


def msum_over(c: Column, w) -> Column:
    """Windowed msum: bit-identical to
    ``SUM(CAST(c AS DECIMAL(30,8))) OVER w → DECIMAL(38,4) → DOUBLE``
    (equivalently ``ROUND(..., 4)::DOUBLE`` — both are HALF_UP on the same
    exact value). The two long mantissa sums evaluate in the SAME window
    frame pass; per output row the reconstruction is long→decimal
    arithmetic, never a double→string→BigDecimal parse."""
    hi, lo = _msum_parts(c)
    return (
        _msum_reconstruct(F.sum(hi).over(w), F.sum(lo).over(w))
        .cast("decimal(38,4)")
        .cast("double")
    )


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

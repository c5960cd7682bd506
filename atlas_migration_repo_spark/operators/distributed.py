"""Distributed global-order primitives (round 8): exact global rank,
NTILE, and running aggregates WITHOUT an unpartitioned window.

An ``Window.orderBy(...)`` with no partition spec forces Spark to sort
the entire relation on ONE task — correct at fixture scale, a dead
executor at 100 TB (the class VERDICT r7 flagged on
corpus_curriculum_order). Every primitive here replaces that shape with
the classic two-tier plan:

1. ``repartitionByRange`` on the sort key — every partition sorts
   independently, and range partition i holds keys strictly below
   partition i+1's;
2. ONE eager ``localCheckpoint`` of the narrow ranked relation, so the
   offset pass and the rank pass observe the same physical partitioning;
3. one per-partition aggregate (count / sum / max) collected to the
   driver — ``parts`` rows, a scalar-sized broadcast, not data;
4. exclusive prefix offsets re-attached as a literal map keyed by
   ``spark_partition_id()``, combined with a partition-LOCAL window.

Exactness: ranks and NTILE are integer arithmetic — bit-identical to the
single-window plan at any scale. Running SUM offsets change the
GROUPING of additions, so they are exact (hence hash-stable) for
integer and decimal columns only; callers with float running sums keep
the single window and an allow-list entry instead. Running MAX is
order-independent and always safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PARTS = 32  # scale with cluster; each task sorts n/parts rows


# NULL group values must hit the same offset-map key from both sides:
# concat_ws silently SKIPS null columns (shorter key) while str(None)
# yields "None" — so both encoders coalesce NULL to one sentinel byte.
# For NUMERIC/temporal group columns cast-to-string never emits control
# bytes, but a STRING group column passes through cast unchanged, so a
# value equal to "\x00" (or containing the "\x1f" separator) would
# collide (ADVICE r9 #4). Both encoders therefore escape symmetrically:
# \x01 is the escape byte (\x01→\x01\x01, \x00→\x010, \x1f→\x011), so
# encoded values never contain a raw \x00 or \x1f, the bare-\x00 NULL
# sentinel cannot collide, and the \x1f join is unambiguous — the
# encoding is injective over arbitrary string domains.
_NULL_KEY = "\x00"


def _esc_col(c: Column) -> Column:
    c = F.replace(c, F.lit("\x01"), F.lit("\x01\x01"))
    c = F.replace(c, F.lit("\x00"), F.lit("\x010"))
    return F.replace(c, F.lit("\x1f"), F.lit("\x011"))


def _esc_str(s: str) -> str:
    return (
        s.replace("\x01", "\x01\x01")
        .replace("\x00", "\x010")
        .replace("\x1f", "\x011")
    )


def _grp_key_col(group_cols: list[str]) -> Column:
    """Spark-side offset-map key: group columns + __pid, null-safe."""
    return F.concat_ws(
        "\x1f",
        *[
            F.coalesce(_esc_col(F.col(c).cast("string")), F.lit(_NULL_KEY))
            for c in group_cols
        ],
        F.col("__pid").cast("string"),
    )


def _grp_key_str(g: tuple, pid: int) -> str:
    """Driver-side twin of _grp_key_col for one collected group tuple."""
    return "\x1f".join(
        [_NULL_KEY if v is None else _esc_str(str(v)) for v in g] + [str(pid)]
    )


def _ranged(df: DataFrame, order_exprs: list[Column], parts: int) -> DataFrame:
    return (
        df.repartitionByRange(parts, *order_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _offset_expr(per_pid: dict[int, object], to_lit) -> Column:
    """Exclusive prefix offsets as a literal map over __pid. Range
    partitions are ordered by key range, so pid order IS sort order."""
    offsets, acc = [], None
    for pid in sorted(per_pid):
        offsets.append((pid, acc))
        acc = per_pid[pid] if acc is None else acc + per_pid[pid]
    return F.element_at(
        F.create_map(
            *[
                x
                for pid, off in offsets
                for x in (F.lit(pid), to_lit(off))
            ]
        ),
        F.col("__pid"),
    )


def global_rank(
    df: DataFrame,
    order_exprs: list[Column],
    parts: int = DEFAULT_PARTS,
    out: str = "rk",
) -> tuple[DataFrame, int]:
    """Exact 1-based global ROW_NUMBER over ``order_exprs`` (which must
    total-order the rows — include a unique tiebreak). Returns (df with
    ``out`` added, total row count) — the count is free (it is the sum
    of the offset pass) and most callers need it anyway."""
    tr = _ranged(df, order_exprs, parts)
    counts = {
        r["__pid"]: r["n"]
        for r in tr.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = int(sum(counts.values()))
    if n == 0:
        return tr.withColumn(out, F.lit(None).cast("bigint")).drop("__pid"), 0
    off = _offset_expr(counts, lambda v: F.lit(int(v or 0)).cast("bigint"))
    local = F.row_number().over(Window.partitionBy("__pid").orderBy(*order_exprs))
    return tr.withColumn(out, (off + local).cast("bigint")).drop("__pid"), n


def ntile_from_rank(rank_col: Column, n: int, k: int) -> Column:
    """The closed-form NTILE inverse: with n rows in k buckets, buckets
    1..n%k hold ⌈n/k⌉ rows and the rest ⌊n/k⌋ — exact int64 DIV
    arithmetic, bit-identical to NTILE(k) OVER (ORDER BY ...)."""
    base, rem = divmod(n, k)
    head = rem * (base + 1)
    c = rank_col
    # (a - a%b)/b is integer division computed exactly: the numerator is
    # an exact multiple of b and quotients stay far inside double's 2^53
    # integer range at any real n
    big = F.lit(1) + ((c - 1) - ((c - 1) % (base + 1))) / (base + 1)
    small = F.lit(rem + 1) + (
        (c - head - 1) - ((c - head - 1) % max(base, 1))
    ) / max(base, 1)
    return F.when(c <= head, big).otherwise(small).cast("bigint")


def global_ntile(
    df: DataFrame,
    order_exprs: list[Column],
    k: int,
    parts: int = DEFAULT_PARTS,
    out: str = "tile",
) -> DataFrame:
    """Exact NTILE(k) OVER (ORDER BY order_exprs) without the global
    window: distributed rank, then the closed-form bucket inverse."""
    ranked, n = global_rank(df, order_exprs, parts, out="__grk")
    if n == 0:
        return ranked.withColumn(out, F.lit(None).cast("bigint")).drop("__grk")
    return ranked.withColumn(
        out, ntile_from_rank(F.col("__grk"), n, k)
    ).drop("__grk")


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column],
    parts: int = DEFAULT_PARTS,
    out: str = "rk",
) -> tuple[DataFrame, dict]:
    """Exact ROW_NUMBER() OVER (PARTITION BY group_cols ORDER BY
    order_exprs) when the GROUPS are few but each group is data-scale —
    the low-cardinality-partition window that otherwise puts n/|groups|
    rows on one task. Range-partitions on (group_cols + order_exprs), so
    a group spans consecutive partitions and each task sorts only its
    slice; the rank is the group's exclusive prefix count across
    partitions plus the partition-local row_number. The offset map holds
    ≤ parts × |groups| entries — keep groups bounded (that is the
    operator's premise). Returns (df + rank, {group tuple: group size})
    — group sizes fall out of the offset pass for free."""
    order_all = [F.col(c).asc() for c in group_cols] + order_exprs
    tr = _ranged(df, order_all, parts)
    rows = (
        tr.groupBy("__pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per: dict[tuple, dict[int, int]] = {}
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        per.setdefault(g, {})[r["__pid"]] = r["n"]
    sizes = {g: sum(m.values()) for g, m in per.items()}
    if not per:
        return tr.withColumn(out, F.lit(None).cast("bigint")).drop("__pid"), {}
    entries = []
    for g, m in per.items():
        acc = 0
        for pid in sorted(m):
            entries.append((_grp_key_str(g, pid), acc))
            acc += m[pid]
    key = _grp_key_col(group_cols)
    off = F.element_at(
        F.create_map(
            *[x for k, v in entries for x in (F.lit(k), F.lit(v))]
        ),
        key,
    )
    local = F.row_number().over(
        Window.partitionBy("__pid", *group_cols).orderBy(*order_exprs)
    )
    return tr.withColumn(out, (off + local).cast("bigint")).drop("__pid"), sizes


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[Column],
    value: Column,
    parts: int = DEFAULT_PARTS,
    out: str = "cum",
) -> DataFrame:
    """Exact running SUM(value) OVER (PARTITION BY group_cols ORDER BY
    order_exprs ROWS UNBOUNDED PRECEDING) for few-but-huge groups and
    INTEGER / DECIMAL (or integer-valued double) values — the grouped
    twin of global_running_sum, same exactness restriction."""
    order_all = [F.col(c).asc() for c in group_cols] + order_exprs
    tr = _ranged(df.withColumn("__val", value), order_all, parts)
    agg_df = tr.groupBy("__pid", *group_cols).agg(F.sum("__val").alias("s"))
    sum_type = dict(agg_df.dtypes)["s"]
    per: dict[tuple, dict[int, object]] = {}
    for r in agg_df.collect():
        g = tuple(r[c] for c in group_cols)
        per.setdefault(g, {})[r["__pid"]] = r["s"]
    if not per:
        return tr.withColumn(out, F.lit(None)).drop("__pid", "__val")
    entries = []
    for g, m in per.items():
        acc = None
        for pid in sorted(m):
            entries.append((_grp_key_str(g, pid), acc))
            acc = m[pid] if acc is None else acc + m[pid]
    key = _grp_key_col(group_cols)
    off = F.element_at(
        F.create_map(
            *[
                x
                for k, v in entries
                for x in (
                    F.lit(k),
                    F.lit(str(v if v is not None else 0)).cast(sum_type),
                )
            ]
        ),
        key,
    )
    local = F.sum("__val").over(
        Window.partitionBy("__pid", *group_cols)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tr.withColumn(out, off + local).drop("__pid", "__val")


def global_running_sum(
    df: DataFrame,
    order_exprs: list[Column],
    value: Column,
    parts: int = DEFAULT_PARTS,
    out: str = "cum",
) -> DataFrame:
    """Exact running SUM(value) OVER (ORDER BY order_exprs ROWS UNBOUNDED
    PRECEDING) for INTEGER / DECIMAL value columns (exact, order-
    independent addition — the offset regrouping cannot change the
    result). Do not use with float sums; keep those single-window and
    allow-listed."""
    tr = _ranged(df.withColumn("__val", value), order_exprs, parts)
    agg_df = tr.groupBy("__pid").agg(F.sum("__val").alias("s"))
    sum_type = dict(agg_df.dtypes)["s"]  # schema-only, no job
    per_pid = {r["__pid"]: r["s"] for r in agg_df.collect()}
    if not per_pid:
        return tr.withColumn(out, F.lit(None)).drop("__pid", "__val")
    off = _offset_expr(
        per_pid,
        lambda v: F.lit(str(v if v is not None else 0)).cast(sum_type),
    )
    local = F.sum("__val").over(
        Window.partitionBy("__pid")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tr.withColumn(out, off + local).drop("__pid", "__val")

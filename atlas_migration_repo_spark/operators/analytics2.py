"""Second analytics batch (SURVEY.md §2 extensions): robust statistics,
BI share-of-total, Pareto skyline, event-transition matrices, and
time-weighted averages.

Like everything in operators/, these are declarative DataFrame plans —
Catalyst owns the physical strategy; docstrings call out the one place
each operator concentrates data and why it holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import epoch_us, load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query


@query(
    "skyline_pareto",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline: parts not dominated on (min retail price, max
    size). The oracle is the O(n²) NOT EXISTS definition; the Spark plan is
    the O(n log n) sweep — pre-aggregate max(size) per distinct price
    (map-side combine shrinks n to |distinct prices|), then one ordered
    prefix-max window over that small relation. A row is dominated iff a
    strictly cheaper price achieved >= its size, or its own price bucket
    achieved > its size. At 100 TB the per-price pre-aggregate is the
    scale valve: the global window runs on distinct prices only; range
    partitioning the price axis and chaining per-range prefix maxima
    removes even that single-reducer step if price cardinality explodes."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    per_price = p.groupBy("p_retailprice").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    best_lt = per_price.withColumn("best_cheaper", F.max("gmax").over(w))
    return (
        p.join(F.broadcast(best_lt), "p_retailprice")
        .where(
            (F.col("best_cheaper").isNull() | (F.col("best_cheaper") < F.col("p_size")))
            & (F.col("gmax") <= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@query(
    "event_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           {sql_r4('n * 1.0 / SUM(n) OVER (PARTITION BY from_type)')} AS p
    FROM pairs
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    timeline: count + row-normalized probability of each (from → to) step.
    One shuffle partitions by user for the lead(); the 5×5 transition
    matrix aggregates map-side. The per-from normalization window runs on
    25 rows — free at any corpus size (the heavy lifting stays keyed by
    user, the classic sequence-mining partitioning)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        r4(F.col("n") * 1.0 / F.sum("n").over(wn)).alias("p"),
    )


@query(
    "agg_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type, QUANTILE_CONT(value, 0.5) AS med
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           {sql_r4('ANY_VALUE(m.med)')} AS median_value,
           {sql_r4('QUANTILE_CONT(ABS(e.value - m.med), 0.5)')} AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    twin of agg_stats' stddev (outlier-immune, the detector of choice when
    ts_anomaly_zscore's mean/σ get dragged by heavy tails). Two exact
    medians: group medians first (5 rows, broadcast back), then the median
    of absolute deviations. Exact percentile is a per-group sort at scale;
    swap F.percentile for percentile_approx to trade exactness for a
    mergeable sketch when groups stop fitting a partition."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            r4(F.first("med")).alias("median_value"),
            r4(F.percentile(F.abs(F.col("value") - F.col("med")), 0.5)).alias("mad"),
        )
    )


@query(
    "share_of_total",
    oracle=f"""
    WITH rev AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                                 AS DECIMAL(30,8))), 4) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, revenue,
           {sql_r4('revenue / SUM(revenue) OVER ()')} AS share,
           CAST(RANK() OVER (ORDER BY revenue DESC) AS INT) AS rev_rank
    FROM rev
    """,
)
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total with ranking — the BI staple: revenue by
    (returnflag, linestatus), each group's share of the grand total, and
    its rank. Aggregates first (map-side partials → 6 rows), so the
    unpartitioned share/rank windows run on group cardinality, not row
    count — the aggregate-then-window order is exactly what keeps this
    shape scale-free. Shares divide the already-rounded decimal sums, so
    both engines divide bit-identical doubles."""
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).cast(
                    "decimal(30,8)"
                )
            )
            .cast("decimal(38,4)")
            .cast("double")
            .alias("revenue")
        )
    )
    w_all = Window.partitionBy()
    return rev.select(
        "l_returnflag",
        "l_linestatus",
        "revenue",
        r4(F.col("revenue") / F.sum("revenue").over(w_all)).alias("share"),
        F.rank().over(Window.orderBy(F.col("revenue").desc())).cast("int").alias("rev_rank"),
    )


@query(
    "ts_time_weighted_avg",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, value,
             (LEAD(EPOCH_US(CAST(ts AS TIMESTAMP))) OVER w
              - EPOCH_US(CAST(ts AS TIMESTAMP))) // 1000000 AS dt_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id,
           CAST(SUM(dt_s) AS BIGINT) AS obs_seconds,
           {sql_r4('CAST(SUM(CAST(value * dt_s AS DECIMAL(30,8))) AS DOUBLE) / SUM(dt_s)')} AS twap
    FROM seq
    WHERE dt_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dt_s) > 0
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the next
    one, so it weighs by its holding duration — the honest mean for
    irregular series where a plain AVG over-counts bursts. Whole-second
    durations (integer floor) keep value·dt exactly representable:
    value is ≤4dp and dt ≤ 2.6e6 s, so the product is a ≤4dp number under
    2^53 — the decimal accumulation is then exact and order-independent in
    both engines. One user-partitioned window + one aggregate, the same
    single-shuffle profile as sessionize."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = epoch_us(F.lead("ts").over(w)) - epoch_us("ts")
    seq = (
        ev.select("user_id", "value", dt_us.alias("_dt_us"))
        .where(F.col("_dt_us").isNotNull())
        .select("user_id", "value", F.expr("_dt_us div 1000000").alias("dt_s"))
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum("dt_s").alias("obs_seconds"),
            (
                F.sum((F.col("value") * F.col("dt_s")).cast("decimal(30,8)")).cast(
                    "double"
                )
                / F.sum("dt_s")
            ).alias("_twap_raw"),
        )
        .where(F.col("obs_seconds") > 0)
        .select(
            "user_id",
            "obs_seconds",
            r4(F.col("_twap_raw")).alias("twap"),
        )
    )

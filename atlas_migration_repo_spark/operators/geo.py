"""Geospatial operators (spatial joins without any GIS extension).

Vanilla Spark has no ST_* functions; these operators express the two
spatial-join workhorses with pure relational plans, which is exactly how
they scale on 100 TB anyway:

- pair finding = GRID-CELL PRUNE (integer cell equi-join — the spatial
  twin of LSH banding) then exact haversine verify on candidates only;
  never an all-pairs distance matrix.
- nearest-assignment = broadcast the small hub table and take the
  min(struct(distance, id)) — one scan, no shuffle of the fact side.

Coordinates are derived from keys with pure integer arithmetic (portable
to the DuckDB oracle bit-for-bit); haversine itself is trig, where Spark
(java.lang.Math) and DuckDB (libm) agree to ~1 ulp — output distances are
rounded on the shared 4dp grid, and pair MEMBERSHIP never depends on a
float (grid cells are integers), so the oracle gate is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query

EARTH_KM = 6371.0
N_HUBS = 8  # small broadcast side for nearest-assignment


def _lat(key: Column) -> Column:
    """Deterministic latitude in (-60, 60): pure integer arithmetic on the
    key — identical in Spark and DuckDB, no hashing, no floats until the
    final division."""
    return ((key * 7919 + 13) % 12000) / 100.0 - 60.0


def _lon(key: Column) -> Column:
    """Deterministic longitude in (-180, 180)."""
    return ((key * 104729 + 7) % 36000) / 100.0 - 180.0


_SQL_LAT = "((({k}) * 7919 + 13) % 12000) / 100.0 - 60.0"
_SQL_LON = "((({k}) * 104729 + 7) % 36000) / 100.0 - 180.0"


def _haversine(lat1, lon1, lat2, lon2) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_KM * F.asin(F.sqrt(a))


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    dlat = f"RADIANS(({lat2}) - ({lat1}))"
    dlon = f"RADIANS(({lon2}) - ({lon1}))"
    a = (
        f"SIN({dlat}/2)*SIN({dlat}/2) + COS(RADIANS({lat1}))*COS(RADIANS({lat2}))"
        f"*SIN({dlon}/2)*SIN({dlon}/2)"
    )
    return f"2 * {EARTH_KM} * ASIN(SQRT({a}))"


@query(
    "geo_haversine_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k,
             {_SQL_LAT.format(k='c_custkey')} AS lat,
             {_SQL_LON.format(k='c_custkey')} AS lon,
             CAST(FLOOR({_SQL_LAT.format(k='c_custkey')}) AS INT) AS cy,
             CAST(FLOOR({_SQL_LON.format(k='c_custkey')}) AS INT) AS cx
      FROM customer
    )
    SELECT a.k AS ka, b.k AS kb,
           {sql_r4(_sql_haversine('a.lat', 'a.lon', 'b.lat', 'b.lon'))} AS dist_km
    FROM pts a JOIN pts b ON a.cy = b.cy AND a.cx = b.cx AND a.k < b.k
    """,
)
def geo_haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join by grid-cell pruning: each point lands in its
    1°×1° integer cell; candidate pairs are an equi-join on (cell_y,
    cell_x) — the spatial analogue of LSH banding — and only candidates
    pay the exact haversine. Pair membership is decided by INTEGER cells,
    so the oracle gate is exact even though haversine is trig; distances
    round on the shared 4dp grid. At 100 TB the cell id is the shuffle
    key: density skew is handled like any hot key (salt or AQE), and a
    radius search widens to the 8 neighbor cells — same plan shape."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    pts = c.select(
        "k",
        _lat(F.col("k")).alias("lat"),
        _lon(F.col("k")).alias("lon"),
        F.floor(_lat(F.col("k"))).cast("int").alias("cy"),
        F.floor(_lon(F.col("k"))).cast("int").alias("cx"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
            r4(
                _haversine(
                    F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")
                )
            ).alias("dist_km"),
        )
    )


@query(
    "geo_nearest_hub",
    oracle=f"""
    WITH hubs AS (
      SELECT i AS hub_id,
             {_SQL_LAT.format(k='i * 1000')} AS hlat,
             {_SQL_LON.format(k='i * 1000')} AS hlon
      FROM RANGE({N_HUBS}) t(i)
    ),
    pts AS (
      SELECT c_custkey AS k,
             {_SQL_LAT.format(k='c_custkey')} AS lat,
             {_SQL_LON.format(k='c_custkey')} AS lon
      FROM customer
    ),
    scored AS (
      SELECT k, hub_id,
             {sql_r4(_sql_haversine('lat', 'lon', 'hlat', 'hlon'))} AS d
      FROM pts, hubs
    )
    SELECT hub_id, COUNT(*) AS n_assigned, {sql_r4('AVG(d)')} AS mean_km
    FROM (SELECT k, hub_id, d,
                 ROW_NUMBER() OVER (PARTITION BY k ORDER BY d, hub_id) AS rn
          FROM scored)
    WHERE rn = 1
    GROUP BY hub_id
    """,
)
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-assignment spatial join: broadcast the N_HUBS hub table,
    score every point against all hubs in one scan, argmin via
    min(struct(d, hub_id)) — deterministic tie-break on hub id, no
    shuffle of the point side, then a hub-cardinality aggregate. The
    classic store/cell-tower assignment at 100 TB: fact side never
    shuffles, hubs always broadcast. Distances are r4-rounded BEFORE the
    argmin on both engines so tie-breaks see identical values."""
    hubs = spark.range(N_HUBS).select(
        F.col("id").cast("int").alias("hub_id"),
        _lat(F.col("id") * 1000).alias("hlat"),
        _lon(F.col("id") * 1000).alias("hlon"),
    )
    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    scored = pts.crossJoin(F.broadcast(hubs)).select(
        "k",
        "hub_id",
        r4(_haversine(F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon"))).alias(
            "d"
        ),
    )
    best = (
        scored.groupBy("k")
        .agg(F.min(F.struct("d", "hub_id")).alias("b"))
        .select(F.col("b.hub_id").alias("hub_id"), F.col("b.d").alias("d"))
    )
    return best.groupBy("hub_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        r4(F.avg("d")).alias("mean_km"),
    )

"""Aggregation operators (SURVEY.md §2.4).

All hash aggregations: Spark plans partial (map-side) + final aggregates
automatically, so at 100 TB each groupBy here shuffles only the partial
aggregate rows (|groups| × partitions), never raw data. Grouping keys are
low-cardinality fixture columns → no skew salting needed; AQE handles
stragglers if a key ever grows hot.

Reference parity: the reference ships no code (/root/reference/README.md:1-9);
this module implements the aggregate surface of SURVEY.md §2.4 which derives
the capability contract from the README's ETL claim (README.md:3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import as_date, load, msum, r4
from atlas_migration_repo_spark.oracle import sql_msum, sql_r4
from atlas_migration_repo_spark.registry import query

_Q1_CUTOFF = "2001-09-02"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_msum('l_quantity')} AS sum_qty,
  {sql_msum('l_extendedprice')} AS sum_base_price,
  {sql_msum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_msum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_r4('AVG(l_quantity)')} AS avg_qty,
  {sql_r4('AVG(l_extendedprice)')} AS avg_price,
  {sql_r4('AVG(l_discount)')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", oracle=_Q1_ORACLE, tags=("bench", "flagship"))
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pricing-summary report (TPC-H Q1 shape).

    scan → filter (pushed to parquet) → derived measures → 2-key hash agg.
    At scale: the filter prunes row groups at the source; the aggregate
    reduces 100 TB to 6 groups map-side before any shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(as_date(F.col("l_shipdate")) <= F.lit(_Q1_CUTOFF).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            msum(F.col("l_quantity")).alias("sum_qty"),
            msum(F.col("l_extendedprice")).alias("sum_base_price"),
            msum(disc_price).alias("sum_disc_price"),
            msum(charge).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )

"""Scan operators (SURVEY.md §2.1).

The migration contract's read side ("extract objects, land columnar on S3",
/root/reference/README.md:3,7): plain declarative parquet scans so Catalyst
plants predicate pushdown + column pruning at the source. `scan_pruned`'s
plan is asserted in tests to actually push its filter into the parquet
reader (PushedFilters) — at 100 TB that's the difference between reading
one column's row groups and reading everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load
from atlas_migration_repo_spark.registry import query


@query("scan_parquet", oracle="SELECT r_regionkey, r_name FROM region")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of a parquet table."""
    return load(spark, sf_dir, "region")


@query(
    "scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-06-01'
    """,
)
def scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: reads 4 of 12 lineitem columns
    and only row groups that can contain late ship dates."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(F.col("l_shipdate") >= F.lit("2001-06-01").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "scan_cached",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def scan_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The memory tier: cache() materializes the scan into compressed
    columnar batches on first action; every later query reads
    InMemoryTableScan instead of parquet (verified by plan test) — the
    right treatment for a dimension read by dozens of queries per job.
    At cluster scale the same call distributes the cache across executor
    storage memory with partition-level eviction."""
    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal").cache()
    c.count()  # materialize
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast("double").alias("bal"),
    )

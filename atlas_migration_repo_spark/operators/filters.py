"""Projection / filter / predicate operators (SURVEY.md §2.2).

All predicates are Column expressions → Catalyst pushes them into the
parquet scan; none of these shuffles (except distinct_rows, which is a
hash-aggregate on low-cardinality keys). Per-row double arithmetic
(price*(1-disc)) is IEEE-deterministic and bit-exact across Spark and
DuckDB, so projected measures need no rounding — only aggregates do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import as_date, load
from atlas_migration_repo_spark.registry import query


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (derived revenue measures)."""
    li = load(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
    """,
)
def filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates on numeric + date."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45)
        & (as_date(F.col("l_shipdate")) < F.lit("1996-01-01").cast("date"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list predicate."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%' OR p_brand LIKE '%#1_'
    """,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE prefix / wildcard patterns."""
    p = load(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("PROMO%") | F.col("p_brand").like("%#1_")
    ).select("p_partkey", "p_type", "p_brand")


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN on numeric and date ranges."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_discount").between(0.05, 0.07)
        & as_date(F.col("l_shipdate")).between("1997-01-01", "1997-12-31")
    ).select("l_orderkey", "l_linenumber", "l_discount")


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' OR o_totalprice > 200000)
      AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'O')
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT precedence."""
    o = load(spark, sf_dir, "orders")
    return o.where(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000))
        & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_orderstatus") == "O"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "filter_null_semantics",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) IS NULL AS is_free,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_neg,
           NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM 0.05 AS is_five
    FROM lineitem
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: fixtures are null-free, so nulls are synthesized with
    NULLIF, then probed with IS NULL / COALESCE / null-safe equality
    (Spark <=> ≡ DuckDB IS NOT DISTINCT FROM)."""
    li = load(spark, sf_dir, "lineitem")
    disc_n = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_n.isNull().alias("is_free"),
        F.coalesce(disc_n, F.lit(-1.0)).alias("disc_or_neg"),
        disc_n.eqNullSafe(F.lit(0.05)).alias("is_five"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (hash aggregate on the projected keys)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()

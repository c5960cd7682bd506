"""Sorts, limits, set operations (SURVEY.md §2.6).

limit_topk compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows — no global sort, no full shuffle), which is the shape that
survives 100 TB. sort_multi materializes its ordering as a rank column so
the order-insensitive oracle hash still verifies ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load
from atlas_migration_repo_spark.registry import query


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey ASC) AS BIGINT) AS rn
    FROM orders
    WHERE o_totalprice > 350000
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY (desc + asc, unique-key tiebreak), with the rank
    materialized so ordering itself is hash-verified. The rank is the
    DISTRIBUTED global row_number (operators/distributed.global_rank:
    range partition + per-partition offsets) — the filtered relation
    still scales with the table, so no single task may sort it."""
    from atlas_migration_repo_spark.operators.distributed import global_rank

    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000)
    ranked, _n = global_rank(
        o.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        [
            F.col("o_orderstatus").desc(),
            F.col("o_totalprice").asc(),
            F.col("o_orderkey").asc(),
        ],
        out="rn",
    )
    return ranked.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "rn"
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject: heap per partition, merge k)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


def _seg(spark: SparkSession, sf_dir: str, seg: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == seg)
        .select("c_nationkey")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by column name (no shuffle — partitions concatenate)."""
    return _seg(spark, sf_dir, "BUILDING").unionByName(_seg(spark, sf_dir, "MACHINERY"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + hash dedup."""
    return (
        _seg(spark, sf_dir, "BUILDING").unionByName(_seg(spark, sf_dir, "MACHINERY")).distinct()
    )


def _buyers(spark: SparkSession, sf_dir: str, status: str) -> DataFrame:
    # keyed on o_custkey so INTERSECT/EXCEPT stay non-trivial at every sf
    # (nation-keyed sets collapse to identical 25-key sets past sf0.001)
    return (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == status)
        .select("o_custkey")
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): customers with both a finished and a
    pending order."""
    return _buyers(spark, sf_dir, "F").intersect(_buyers(spark, sf_dir, "P"))


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): finished-order customers with no
    pending order."""
    return _buyers(spark, sf_dir, "F").subtract(_buyers(spark, sf_dir, "P"))


@query(
    "set_except_all",
    oracle="""
    SELECT l_quantity, COUNT(*) AS n
    FROM (
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
      EXCEPT ALL
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY l_quantity
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): multiplicities subtract instead
    of collapsing — the semantics reconciliation needs when duplicate
    rows are legitimate (event logs). Spark plans exceptAll as a
    count-annotated aggregate + generate, one shuffle on the value."""
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.where(F.col("l_returnflag") == "R").select("l_quantity")
    return a.exceptAll(r).groupBy("l_quantity").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_quantity, COUNT(*) AS n
    FROM (
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT ALL
      SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY l_quantity
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): min-of-multiplicities per
    value — the overlap measure between two event populations."""
    li = load(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "A").select("l_quantity")
    r = li.where(F.col("l_returnflag") == "R").select("l_quantity")
    return a.intersectAll(r).groupBy("l_quantity").agg(F.count(F.lit(1)).alias("n"))

"""Graph operators over relational projections (SURVEY.md §2 extras next
to pagerank_nations and the dedup connected-components loop).

The graph here is the NATION TRADE GRAPH: an undirected edge joins two
nations when at least one lineitem flows between a customer of one and a
supplier of the other — the bipartite customer×supplier relation projected
to its nation endpoints. Nodes are bounded (nations), but the same plans
run on billion-edge graphs because every step is edge-relational:
no adjacency materialization, no driver-side graph object.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load
from atlas_migration_repo_spark.registry import query

_SQL_TRADE_EDGES = """
    SELECT DISTINCT LEAST(cn.n_nationkey, sn.n_nationkey) AS a,
                    GREATEST(cn.n_nationkey, sn.n_nationkey) AS b
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_nationkey <> sn.n_nationkey
"""


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (a < b) nation-trade edge list. The lineitem→orders join
    shuffles once on orderkey; every dimension (customer, supplier,
    nation) broadcasts; the distinct runs on ≤ nations² rows."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
    )
    return pairs.select(
        F.least("c_nationkey", "s_nationkey").alias("a"),
        F.greatest("c_nationkey", "s_nationkey").alias("b"),
    ).distinct()


@query(
    "graph_triangles",
    oracle=f"""
    WITH e AS ({_SQL_TRADE_EDGES})
    SELECT CAST((SELECT COUNT(*) FROM (SELECT DISTINCT a FROM e
                 UNION SELECT DISTINCT b FROM e)) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                 JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS BIGINT)
             AS n_triangles
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the nation trade graph, plus node/edge
    counts — the clustering-coefficient primitive.

    Scale shape: edges are ORIENTED from the lower-(degree, id) endpoint
    to the higher before the wedge join, the classic trick that bounds
    any vertex's out-degree at O(√m) so the hottest wedge key produces
    O(m) — not O(d_max²) — join output on a skewed graph; wedges then
    semi-verify against the oriented edge set with one equi-join. The
    count is orientation-invariant (each triangle has exactly one vertex
    with two out-edges under a total order), so the oracle's simpler
    a<b<c id-ordered SQL join counts the identical set."""
    e = trade_edges(spark, sf_dir)  # a < b by id
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (degree, id): src = smaller endpoint under the total order
    ed = (
        e.join(F.broadcast(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da")), "a")
        .join(F.broadcast(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("d")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("d")))
            .alias("e")
        )
        .select("e.s", "e.d")
    )
    w1 = ed.select(F.col("s").alias("u"), F.col("d").alias("v1"))
    w2 = ed.select(F.col("s").alias("u"), F.col("d").alias("v2"))
    wedges = w1.join(w2, "u").where(F.col("v1") < F.col("v2"))
    # a wedge closes iff (v1,v2) is an oriented edge in either direction
    closing = ed.select(
        F.least("s", "d").alias("v1"), F.greatest("s", "d").alias("v2")
    )
    tri = wedges.join(
        closing, ["v1", "v2"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges_n = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return nodes.crossJoin(edges_n).crossJoin(tri)

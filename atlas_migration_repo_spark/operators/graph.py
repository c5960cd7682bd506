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


_BFS_MAX_HOPS = 6


@query(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE eu AS (
        SELECT a AS src, b AS dst FROM ({_SQL_TRADE_EDGES}) t
        UNION ALL
        SELECT b AS src, a AS dst FROM ({_SQL_TRADE_EDGES}) t
    ),
    walk(node, hop) AS (
        SELECT CAST(0 AS BIGINT) AS node, 0 AS hop
        UNION
        SELECT eu.dst, walk.hop + 1
        FROM walk JOIN eu ON eu.src = walk.node
        WHERE walk.hop < {_BFS_MAX_HOPS}
    )
    SELECT node AS n_nationkey, CAST(MIN(hop) AS INT) AS hops
    FROM walk GROUP BY node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest HOPS over the trade graph (source: nation
    0), bounded at 6 levels. The Spark plan is the BFS recurrence
    UNROLLED into a static DAG — frontier(i+1) = frontier(i) ⋈ edges —
    then one min-hop aggregate; no driver-side loop actions, no
    convergence collect. The oracle is DuckDB's recursive CTE with
    UNION-distinct recursion (rows bounded by nodes x hops, never path
    counts), so two entirely different engines walk the same graph.
    Scale shape: each level is one equi-join on the frontier (node-set
    sized, broadcastable); on billion-edge graphs the same unrolled plan
    runs with the frontier exchanged instead of broadcast."""
    e = trade_edges(spark, sf_dir)
    eu = e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    frontier = spark.range(1).select(
        F.lit(0).cast("bigint").alias("node"), F.lit(0).alias("hop")
    )
    levels = [frontier]
    for i in range(1, _BFS_MAX_HOPS + 1):
        # name-based equi-join: reusing `eu` across levels with a column
        # condition makes the self-join lineage ambiguous and Spark
        # degrades it to a nested loop — USING(src) keeps every level a
        # hash join (broadcast here; exchanged on big graphs)
        frontier = (
            frontier.select(F.col("node").alias("src"))
            .join(eu, "src")
            .select(F.col("dst").alias("node"), F.lit(i).alias("hop"))
            .distinct()
        )
        levels.append(frontier)
    from functools import reduce as _reduce

    walk = _reduce(lambda x, y: x.unionByName(y), levels)
    return (
        walk.groupBy("node")
        .agg(F.min("hop").cast("int").alias("hops"))
        .select(F.col("node").alias("n_nationkey"), "hops")
    )


_SQL_WEIGHTED_EDGES = f"""
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w
    FROM (
      SELECT DISTINCT l.l_orderkey,
             LEAST(cn.n_nationkey, sn.n_nationkey) AS a,
             GREATEST(cn.n_nationkey, sn.n_nationkey) AS b
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE cn.n_nationkey <> sn.n_nationkey
    ) t
    GROUP BY a, b
"""
_SC_MAX_EDGES = 4


def shortest_cost_iterative(
    eu: DataFrame,
    source: int,
    max_edges: int,
) -> DataFrame:
    """ITERATIVE frontier Bellman-Ford over a directed weighted edge list
    `eu(src, dst, w)`: each round relaxes only from nodes whose cost
    improved last round, merges with a node-sized min, truncates lineage
    with `localCheckpoint`, and EXITS EARLY the first round that improves
    nothing (the `min_label_components` idiom — one node-scale count per
    round is the only driver action). Early exit is exact, not an
    approximation: relaxation is monotone, so a no-improvement round
    proves a fixpoint and the result equals running all `max_edges`
    rounds. After k rounds best[v] is EXACTLY the min cost over walks of
    ≤ k edges (frontier BF ≡ full BF per round), which is what makes a
    bounded recursive-CTE oracle at the same cap comparable.

    Scale shape: state is node-sized throughout; each round is one hash
    join frontier ⋈ edges plus one node-keyed min — no path explosion,
    no unbounded lineage, depth a parameter instead of an unrolled
    3-level plan (VERDICT r6 "next" #7)."""
    spark = eu.sparkSession
    best = spark.range(1).select(
        F.lit(source).cast("bigint").alias("node"),
        F.lit(0).cast("bigint").alias("cost"),
    )
    frontier = best
    for _round in range(max_edges):
        cand = (
            frontier.select(F.col("node").alias("src"), "cost")
            .join(eu, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        merged = (
            best.unionByName(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            # lazy: the improved-count action below materializes AND
            # checkpoints this node-sized state in one job (r10 — the
            # eager form paid a separate checkpoint job per round)
            .localCheckpoint(eager=False)
        )
        improved = (
            merged.join(
                best.select(
                    "node", F.col("cost").alias("__prev")
                ),
                "node",
                "left",
            )
            .where(
                F.col("__prev").isNull() | (F.col("cost") < F.col("__prev"))
            )
            .select("node", "cost")
        )
        if improved.count() == 0:  # fixpoint: further rounds are no-ops
            break
        frontier, best = improved, merged
    return best


@query(
    "graph_shortest_cost",
    oracle=f"""
    WITH RECURSIVE we AS ({_SQL_WEIGHTED_EDGES}),
    eu AS (
        SELECT a AS src, b AS dst, w FROM we
        UNION ALL
        SELECT b AS src, a AS dst, w FROM we
    ),
    walk(node, cost, hops) AS (
        SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS cost, 0 AS hops
        UNION
        SELECT eu.dst, walk.cost + eu.w, walk.hops + 1
        FROM walk JOIN eu ON eu.src = walk.node
        WHERE walk.hops < {_SC_MAX_EDGES}
    )
    SELECT node AS n_nationkey, CAST(MIN(cost) AS BIGINT) AS min_cost
    FROM walk GROUP BY node
    """,
)
def graph_shortest_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded WEIGHTED shortest path (Bellman-Ford, ≤{_SC_MAX_EDGES}
    edges) from nation 0 over the trade graph, edge weight = distinct
    orders flowing between the pair. Spark runs the ITERATIVE
    frontier-relaxation loop (depth parameterized, early exit at the
    fixpoint — see shortest_cost_iterative); the oracle walks the same
    graph through DuckDB's UNION-distinct recursive CTE at the same cap.
    Integer costs keep both engines exact; hash joins per level (the
    USING-join lesson from graph_bfs_hops)."""
    e = trade_edges_weighted(spark, sf_dir)
    eu = e.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    best = shortest_cost_iterative(eu, source=0, max_edges=_SC_MAX_EDGES)
    return best.select(
        F.col("node").alias("n_nationkey"),
        F.col("cost").cast("bigint").alias("min_cost"),
    )


def trade_edges_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted nation-trade edges: weight = DISTINCT orders flowing
    between the pair (one lineitem→orders shuffle, dims broadcast, the
    distinct and count on ≤ nations² × orders keys)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            "l_orderkey",
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    return pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("w")
    )

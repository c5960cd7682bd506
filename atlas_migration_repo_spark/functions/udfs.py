"""User-defined function surface (SURVEY.md §2.8).

The deliberate slow path: these four operators exist to prove the Python
extension tiers work end-to-end, each at its proper rung of the cost ladder:

1. ``udf_scalar``  — row-at-a-time Python UDF (pickled per row; ~100× slower
   than built-ins — never on a hot path, here as the compatibility tier).
2. ``udf_pandas``  — Arrow-vectorized scalar pandas UDF (numpy over columnar
   batches; the correct tier when Python is genuinely needed).
3. ``udaf_grouped_pandas`` — applyInPandas grouped-map (whole group as a
   pandas DataFrame; shuffles on the key like any agg, so it scales out).
4. ``udtf_split``  — Python UDTF via SQL LATERAL join (row → many rows).

Every UDF here is deterministic and declared so, keeping Catalyst free to
re-order/collapse plans around them.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query


@query(
    "udf_scalar",
    oracle="""
    SELECT c_custkey,
           LOWER(REPLACE(c_name, '#', '_')) AS norm_name
    FROM customer
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Python UDF: deterministic string normalizer (oracle is the
    equivalent SQL expression)."""

    @F.udf(returnType=T.StringType(), useArrow=False)
    def norm_name(s: str) -> str:
        return s.replace("#", "_").lower()

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", norm_name("c_name").alias("norm_name"))


@query(
    "udf_pandas",
    oracle="""
    SELECT event_id,
           ROUND((value - MIN(value) OVER ()) /
                 (MAX(value) OVER () - MIN(value) OVER ()), 4) AS norm_value
    FROM events
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: global min-max normalization. The
    min/max are computed declaratively and broadcast-crossjoined (no
    collect, no closure capture), then the UDF is pure numpy arithmetic."""

    @F.pandas_udf(T.DoubleType())
    def minmax(v: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
        return ((v - lo) / (hi - lo)).round(4)

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return ev.crossJoin(F.broadcast(bounds)).select(
        "event_id", minmax("value", "lo", "hi").alias("norm_value")
    )


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS value_sum,
           ROUND(MAX(value) - MIN(value), 4) AS value_range
    FROM events
    GROUP BY user_id
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF: per-user event summary via applyInPandas. Each
    group arrives as one pandas DataFrame after a shuffle on user_id —
    the same distribution as a built-in agg, so it scales with executors."""

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("value_sum", T.DoubleType()),
            T.StructField("value_range", T.DoubleType()),
        ]
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "value_sum": [float(round(v.sum(), 4))],
                "value_range": [float(round(v.max() - v.min(), 4))],
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    return ev.groupBy("user_id").applyInPandas(summarize, schema=out_schema)


@query(
    "udtf_split",
    oracle="""
    SELECT doc_id,
           UNNEST(STRING_SPLIT(text, ' ')) AS word,
           CAST(LENGTH(UNNEST(STRING_SPLIT(text, ' '))) AS INT) AS wlen
    FROM documents
    WHERE doc_id < 50
    """,
)
def udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (row → many rows) applied with a SQL LATERAL join:
    text → (word, wlen) tuples."""

    @F.udtf(returnType="word: string, wlen: int")
    class SplitWords:
        def eval(self, text: str):
            for w in text.split(" "):
                yield w, len(w)

    spark.udtf.register("split_words", SplitWords)
    load(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.word, t.wlen FROM _udtf_docs d, LATERAL split_words(d.text) t"
    )


@query(
    "udf_arrow_map",
    oracle=f"""
    SELECT p_partkey, {sql_r4('p_retailprice * 1.1')} AS adjusted
    FROM part
    """,
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch tier below pandas UDFs — the UDF
    receives raw pyarrow RecordBatches (no pandas conversion cost), the
    right interface for columnar-native Python logic (tokenizers,
    Arrow-native kernels). Arithmetic via pyarrow.compute is the same
    IEEE double op as both engines', so parity is exact after r4."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def adjust(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("p_partkey"), pc.multiply(b.column("p_retailprice"), 1.1)],
                ["p_partkey", "adjusted"],
            )

    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    out = p.mapInArrow(adjust, "p_partkey long, adjusted double")
    return out.select("p_partkey", r4(F.col("adjusted")).alias("adjusted"))


@query(
    "udtf_table_arg",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events, value AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF over a TABLE argument with PARTITION BY /
    ORDER BY: the engine shuffles and sorts each user's events, streams
    them through one Python instance in event-time order, and terminate()
    emits the per-user summary — arbitrary ordered per-group logic (rung
    5 of the UDF cost ladder, the batch twin of stream_stateful). At
    100 TB this costs exactly one shuffle on the partition key plus an
    Arrow-batched Python pass per group."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, last_value double")
    class UserDigest:
        def __init__(self) -> None:
            self.user = None
            self.n = 0
            self.last = None

        def eval(self, row):
            self.user = row["user_id"]
            self.n += 1
            self.last = row["value"]

        def terminate(self):
            if self.user is not None:
                yield self.user, self.n, self.last

    spark.udtf.register("user_digest", UserDigest)
    load(spark, sf_dir, "events").select(
        "user_id", "value", "ts", "event_id"
    ).createOrReplaceTempView("ev_udtf")
    return spark.sql(
        "SELECT * FROM user_digest(TABLE(ev_udtf) PARTITION BY user_id ORDER BY (ts, event_id))"
    )


@query(
    "udaf_grouped_arrow",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def udaf_grouped_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow (Spark 4): each group arrives as ONE pyarrow
    Table with no pandas conversion — the zero-copy rung between
    applyInPandas and JVM aggregates. Money is summed as exact integer
    cents (2dp × 100 sits within 1e-10 of an integer, so every rounding
    mode agrees), keeping the result independent of intra-group row
    order — the same order-independence discipline as catalog.msum."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def digest(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100)), pa.int64())
        return pa.table(
            {
                "o_orderstatus": [t["o_orderstatus"][0].as_py()],
                "n": [t.num_rows],
                "total_cents": [pc.sum(cents).as_py()],
            }
        )

    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    out = o.groupBy("o_orderstatus").applyInArrow(
        digest, "o_orderstatus string, n long, total_cents long"
    )
    return out.select(
        "o_orderstatus", "n", (F.col("total_cents").cast("double") / 100.0).alias("total")
    )


@query(
    "udaf_cogrouped_pandas",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS line_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS order_total,
           COALESCE(li.line_total, 0.0) AS line_total,
           (li.l_orderkey IS NOT NULL) AS has_lines
    FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    """,
)
def udaf_cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas API: orders and lineitems co-partitioned on
    the order key arrive as two aligned pandas frames per key-group, and
    the Python function reconciles them (header total vs summed lines) —
    the escape hatch for per-key logic that needs BOTH sides at once
    (custom matching, ragged joins, order-book replay). Arrow moves each
    cogroup in columnar batches; the shuffle is the same single
    hash-partitioning a join would pay. The oracle is the equivalent
    join+aggregate; per-key pandas sums are order-independent here
    because each order has ≤7 lines (double sum exact to 2dp)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")

    def reconcile(key: tuple, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        total = round(float(odf["o_totalprice"].iloc[0]), 2) if len(odf) else None
        lsum = round(float(ldf["l_extendedprice"].sum()), 2) if len(ldf) else 0.0
        if not len(odf):  # lines without a header: not emitted (matches oracle)
            return pd.DataFrame(
                columns=["o_orderkey", "order_total", "line_total", "has_lines"]
            )
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "order_total": [total],
                "line_total": [lsum],
                "has_lines": [bool(len(ldf))],
            }
        )

    out_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("order_total", T.DoubleType()),
            T.StructField("line_total", T.DoubleType()),
            T.StructField("has_lines", T.BooleanType()),
        ]
    )
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(reconcile, schema=out_schema)
    )


@query(
    "udf_broadcast_lookup",
    oracle="""
    SELECT c_custkey, n_name AS nation_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def udf_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-variable lookup inside a vectorized UDF: the 25-row
    nation map ships once per executor via sc.broadcast and each Arrow
    batch maps key→name with a pandas .map — the pattern for small
    reference data a UDF needs (tokenizer vocab, label maps) without a
    join in the plan. The declarative twin IS the broadcast join (the
    oracle); this registers the imperative form the API supports. At
    scale the broadcast object must stay executor-memory-small — that is
    the same ~200 MB budget a broadcast join gets."""
    n = {
        r["n_nationkey"]: r["n_name"]
        for r in load(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    }
    bc = spark.sparkContext.broadcast(n)

    @F.pandas_udf(T.StringType())
    def lookup(keys: pd.Series) -> pd.Series:
        m = bc.value
        return keys.map(m)

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", lookup(F.col("c_nationkey")).alias("nation_name"))


@query(
    "udtf_analyze_dynamic",
    oracle="""
    SELECT doc_id,
           STRING_SPLIT(text, ' ')[1] AS w1,
           STRING_SPLIT(text, ' ')[2] AS w2,
           STRING_SPLIT(text, ' ')[3] AS w3
    FROM documents WHERE doc_id < 50
    """,
)
def udtf_analyze_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF with a static analyze() (Spark 4): the OUTPUT
    SCHEMA is computed at plan time from the call's literal argument —
    first_words(text, 3) materializes columns w1..w3, the same function
    called with 5 would materialize w1..w5. This is the remaining rung of
    the UDTF surface after the basic generator (udtf_split) and the
    TABLE-arg aggregator (udtf_table_arg): schema-producing functions
    (dynamic pivots, configurable featurizers) where the shape itself is
    an argument. Catalyst sees a fixed schema post-analysis, so pruning
    and downstream planning are unaffected; execution is the usual
    Arrow-batched lateral generator, one Python pass, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstWords:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None:
                raise ValueError("first_words(text, n): n must be a literal")
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"w{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            # ''.split(' ') == [''] — matches DuckDB's STRING_SPLIT('', ' '),
            # whose first element is '' not NULL; only SQL NULL maps to [].
            ws = text.split(" ") if text is not None else []
            yield tuple(ws[i] if i < len(ws) else None for i in range(n))

    spark.udtf.register("first_words", FirstWords)
    load(spark, sf_dir, "documents").where(F.col("doc_id") < 50).createOrReplaceTempView(
        "_udtf_docs_dyn"
    )
    return spark.sql(
        "SELECT d.doc_id, t.* FROM _udtf_docs_dyn d, LATERAL first_words(d.text, 3) t"
    )

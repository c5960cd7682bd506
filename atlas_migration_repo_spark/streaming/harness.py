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

from atlas_migration_repo_spark.catalog import epoch_us

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),  # µs parquet, naive wall-clock
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table. ts stays TIMESTAMP_NTZ end-to-end,
    exactly like the batch loader (catalog.load) — event-time windows,
    watermarks and session windows all accept NTZ, and NTZ collects as naive
    datetimes matching the DuckDB oracle on any driver session time zone."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def wm_ts(c) -> "F.Column":
    """NTZ → LTZ hop for `withWatermark`, which requires TIMESTAMP (LTZ).

    Builds the instant from the zone-pure arithmetic epoch (catalog.epoch_us)
    so the wall clock is read as UTC on any session time zone — a bare
    cast (or to_utc_timestamp) would reinterpret it in the session zone and
    shift every window/session boundary off the oracle's."""
    return F.timestamp_micros(epoch_us(c))


def ntz_ts(c) -> "F.Column":
    """LTZ → NTZ hop for result columns: renders the instant as its UTC
    wall clock via epoch arithmetic (session-TZ-independent), matching the
    naive timestamps the DuckDB oracle produces."""
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_add(
        "MICROSECOND", F.unix_micros(col), F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    )


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

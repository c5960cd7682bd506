"""Arbitrary stateful streaming (SURVEY.md §2.9): per-key running state via
applyInPandasWithState.

The state (count, decimal-exact sum, max ts) is O(1) per user and merges
per micro-batch — with availableNow over one batch the final emission per
key equals the batch aggregate, which is the oracle. In production the
same operator runs continuously with GroupStateTimeout to expire idle
keys, bounding the state store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from atlas_migration_repo_spark.registry import query
from atlas_migration_repo_spark.streaming.harness import run_to_table

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),  # value in 1e-4 units: exact
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # accumulate in integer 1e-4 units: order-independent and exact,
        # the Python twin of the msum decimal policy
        cents += int(round(float(pdf["value"].sum()) * 10000))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [cents / 10000.0]}
    )


@query(
    "stream_stateful",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DECIMAL(38,4)) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful per-key operator: running per-user (count, exact
    sum) via applyInPandasWithState. One micro-batch (availableNow) ⇒ the
    final update per key equals the batch aggregate."""

    def build(src: DataFrame) -> DataFrame:
        return (
            src.select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update,
                outputStructType=_OUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    return run_to_table(spark, sf_dir, "stream_stateful", build, output_mode="update")


_TWS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_min", T.DoubleType()),
        T.StructField("value_max", T.DoubleType()),
    ]
)


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf Python runtime for
    its state-server protocol; this container ships a broken
    google.protobuf (no descriptor module), so the operator is gated the
    same way as the absent spark-avro jar — implemented, tested when the
    dependency exists, excluded from the registry when it can't run."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _tws_query_gate(name: str, oracle: str):
    if tws_available():
        return query(name, oracle=oracle)
    return lambda fn: fn  # leave unregistered; see tws_available docstring


@_tws_query_gate(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           MIN(value) AS value_min, MAX(value) AS value_max
    FROM events GROUP BY user_id
    """,
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState, with composable typed state handles and a
    RocksDB-backed store. Per-user running (count, min, max): all exact
    merges, so one availableNow micro-batch must equal the batch GROUP
    BY. In production the same processor registers timers to expire idle
    keys; state is O(1) per user either way."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class MinMaxCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", "n BIGINT, vmin DOUBLE, vmax DOUBLE"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, vmin, vmax = self._state.get()
            else:
                n, vmin, vmax = 0, float("inf"), float("-inf")
            for pdf in rows:
                n += len(pdf)
                vmin = min(vmin, float(pdf["value"].min()))
                vmax = max(vmax, float(pdf["value"].max()))
            self._state.update((n, vmin, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_min": [vmin],
                    "value_max": [vmax],
                }
            )

        def close(self) -> None:
            pass

    def build(src: DataFrame) -> DataFrame:
        return (
            src.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                statefulProcessor=MinMaxCount(),
                outputStructType=_TWS_OUT,
                outputMode="Update",
                timeMode="None",
            )
        )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        return run_to_table(
            spark, sf_dir, "stream_tws", build, output_mode="update"
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

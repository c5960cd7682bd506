"""Unit tests for the Hudi COW bridge: timeline layout, spec file
naming, LogStore-backed concurrent instants, optimistic conflict
detection, clustering history, event-range pruning, and meta-column
preservation across rewrites."""

from __future__ import annotations

import json
import os
import re
import shutil

import pytest
from pyspark.sql import functions as F

import atlas_migration_repo_spark.sources.hudi_interop as H
from atlas_migration_repo_spark.catalog import load
from atlas_migration_repo_spark.sources.files import scratch_path
from atlas_migration_repo_spark.sources.hudi_interop import (
    ConcurrentHudiWriteError,
    cluster_hudi,
    completed_instants,
    delete_hudi,
    hudi_timeline,
    read_hudi,
    read_hudi_event_range,
    read_hudi_incremental,
    upsert_hudi,
    write_hudi,
)

from conftest import SF_DIR


def _fresh(key: str) -> str:
    root = scratch_path(SF_DIR, key)
    shutil.rmtree(root, ignore_errors=True)
    return root


_BASEFILE_RE = re.compile(r"^[0-9a-f]{12}-\d+_0-0-0_\d{17}\.parquet$")


def test_timeline_layout_and_file_naming(spark):
    """The on-disk shape is the published spec: hoodie.properties keys,
    the requested -> inflight -> completed instant triple (commit's
    inflight is the bare `.inflight` quirk), spec base-file names,
    per-partition `.hoodie_partition_metadata`, and the five `_hoodie_*`
    meta columns leading every data file's footer schema."""
    root = _fresh("t_hudi_layout")
    df = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_hudi(
        df, root, record_key="o_orderkey", partition_by=["o_orderstatus"]
    )
    props = H._read_props(root)
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.recordkey.fields"] == "o_orderkey"
    assert props["hoodie.table.partition.fields"] == "o_orderstatus"
    assert props["hoodie.datasource.write.hive_style_partitioning"] == "true"

    (instant, action), = completed_instants(root)
    assert action == "commit"
    hoodie = H._hoodie_dir(root)
    assert os.path.exists(os.path.join(hoodie, f"{instant}.commit.requested"))
    assert os.path.exists(os.path.join(hoodie, f"{instant}.inflight"))
    assert os.path.exists(os.path.join(hoodie, f"{instant}.commit"))

    meta = H._read_commit_meta(root, instant, "commit")
    assert meta["operationType"] == "insert"
    import pyarrow.parquet as pq

    n_meta_files = 0
    for part, stats in meta["partitionToWriteStats"].items():
        pm = os.path.join(root, part, ".hoodie_partition_metadata")
        assert os.path.exists(pm)
        n_meta_files += 1
        for st in stats:
            name = os.path.basename(st["path"])
            assert _BASEFILE_RE.match(name), name
            assert name.startswith(st["fileId"] + "_")
            assert st["prevCommit"] == "null"
            fp = os.path.join(root, st["path"])
            sch = pq.read_schema(fp)
            assert tuple(sch.names[:5]) == H._META_COLS
            assert pq.ParquetFile(fp).metadata.num_rows == st["numWrites"]
            assert st["numInserts"] == st["numWrites"]
    assert n_meta_files >= 2  # multiple order statuses


@pytest.mark.parametrize("store_name", ["posix_link", "coordinated_put"])
def test_hudi_concurrent_insert_race(spark, store_name):
    """The Hudi bridge claims instants through the same LogStore seam as
    TableLog and the Delta/Iceberg bridges: 4 threads x 3 inserts against
    one table must all win UNIQUE instants with no lost or duplicated
    batch — under both the POSIX hard-link store and the coordinated-put
    store (the rename-less object-store protocol)."""
    import threading

    from atlas_migration_repo_spark.sources.table_log import (
        CoordinatedPutLogStore,
        PosixLinkLogStore,
        set_default_log_store,
    )

    mk = {
        "posix_link": PosixLinkLogStore,
        "coordinated_put": CoordinatedPutLogStore,
    }[store_name]
    root = _fresh(f"t_hudi_race_{store_name}")
    set_default_log_store(mk())
    try:
        write_hudi(
            spark.range(10_000, 10_010).select("id").coalesce(1),
            root,
            record_key="id",
        )
        errors: list[Exception] = []

        def writer(tid: int) -> None:
            try:
                for j in range(3):
                    lo = (tid * 3 + j) * 100
                    write_hudi(
                        spark.range(lo, lo + 100).select("id").coalesce(1),
                        root,
                        record_key="id",
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        done = completed_instants(root)
        assert len(done) == 13  # seed + 12 appends
        assert len({i for i, _ in done}) == 13  # unique instants
        got = sorted(r["id"] for r in read_hudi(spark, root).collect())
        assert got == list(range(1200)) + list(range(10_000, 10_010))
    finally:
        set_default_log_store(None)


def test_upsert_conflict_detection(spark, monkeypatch):
    """Optimistic concurrency: a delete that COMPLETES between an
    upsert's claim and its publication, touching the same file group,
    must fail the upsert loudly (stale snapshot) instead of silently
    losing the delete."""
    root = _fresh("t_hudi_conflict")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    write_hudi(df.coalesce(1), root, record_key="id")
    upd = spark.range(0, 100).select(F.col("id"), F.lit(9.9).alias("v"))

    orig = H._stage_place
    fired = {"done": False}

    def interpose(df_, path_, instant_, pby_):
        placed = orig(df_, path_, instant_, pby_)
        if not fired["done"]:
            fired["done"] = True
            # racing delete rewrites the same file group and wins
            delete_hudi(spark.range(500, 510).select("id"), root)
        return placed

    monkeypatch.setattr(H, "_stage_place", interpose)
    with pytest.raises(ConcurrentHudiWriteError):
        upsert_hudi(upd, root)
    # the delete's outcome survives; the failed upsert published nothing
    got = {r["id"] for r in read_hudi(spark, root).collect()}
    assert got == set(range(1000)) - set(range(500, 510))


def test_clustering_compacts_and_preserves_history(spark):
    """Clustering collapses many small file groups into one compacted
    group via a replacecommit; the pre-cluster instant still resolves
    the OLD groups (time travel across a replace), and the data is
    identical through the rewrite."""
    root = _fresh("t_hudi_cluster_unit")
    for i in range(4):
        write_hudi(
            spark.range(i * 100, (i + 1) * 100).select("id").coalesce(1),
            root,
            record_key="id",
        )
    pre = completed_instants(root)[-1][0]
    _, _, before = H._replay_hudi(root)
    assert len(before) == 4
    cluster_hudi(root)
    _, _, after = H._replay_hudi(root)
    assert len(after) == 1
    _, _, at_pre = H._replay_hudi(root, as_of=pre)
    assert len(at_pre) == 4
    a = sorted(r["id"] for r in read_hudi(spark, root).collect())
    b = sorted(r["id"] for r in read_hudi(spark, root, as_of=pre).collect())
    assert a == b == list(range(400))


def test_event_range_prunes_files(spark):
    """Event-time skipping drops file slices in the TIMELINE: a narrow
    window scans strictly fewer files than the table holds, and the
    result equals the exact filter over a full read."""
    root = _fresh("t_hudi_ev_unit")
    ev = (
        load(spark, SF_DIR, "events")
        .select("event_id", "ts", "event_type", "value")
        .repartitionByRange(8, "ts")
    )
    write_hudi(ev, root, record_key="event_id", event_time_field="ts")
    _, _, slices = H._replay_hudi(root)
    lo, hi = "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    ranged = read_hudi_event_range(spark, root, lo, hi)
    assert 0 < len(ranged.inputFiles()) < len(slices)
    expect = (
        read_hudi(spark, root)
        .where(F.col("ts").between(F.lit(lo), F.lit(hi)))
        .count()
    )
    assert ranged.count() == expect > 0


def test_incremental_exact_across_clustering(spark):
    """COW rewrites preserve `_hoodie_commit_time`, so an incremental
    pull from before a clustering replacecommit still returns exactly
    the records of the later commits — no phantom re-emission of
    clustered rows."""
    root = _fresh("t_hudi_incr_unit")
    for i in range(3):
        write_hudi(
            spark.range(i * 100, (i + 1) * 100).select("id").coalesce(1),
            root,
            record_key="id",
        )
    begin = completed_instants(root)[0][0]
    cluster_hudi(root)
    got = sorted(r["id"] for r in read_hudi_incremental(spark, root, begin).collect())
    assert got == list(range(100, 300))


def test_checkpoint_replay_is_noop(spark):
    """A write replayed with an already-committed checkpoint key returns
    the original instant and adds nothing to the timeline."""
    root = _fresh("t_hudi_ckpt_unit")
    df = spark.range(0, 100).select("id").coalesce(1)
    i0 = write_hudi(df, root, record_key="id", checkpoint="src:0")
    i1 = write_hudi(df, root, record_key="id", checkpoint="src:0")
    assert i0 == i1
    assert len(completed_instants(root)) == 1
    assert read_hudi(spark, root).count() == 100
    assert H.hudi_checkpoint(root) == "src:0"


def test_delete_all_rows_publishes_empty_slice(spark):
    """Deleting every record of a file group publishes a 0-row base file
    slice (the group stays visible, empty) rather than leaving the old
    slice live."""
    root = _fresh("t_hudi_del_all")
    write_hudi(
        spark.range(0, 50).select("id").coalesce(1), root, record_key="id"
    )
    delete_hudi(spark.range(0, 50).select("id"), root)
    assert read_hudi(spark, root).count() == 0
    _, _, slices = H._replay_hudi(root)
    assert len(slices) == 1
    st = slices[0]["stat"]
    assert st["numWrites"] == 0 and st["numDeletes"] == 50
    assert os.path.exists(os.path.join(root, st["path"]))


def test_upsert_preserves_meta_on_carried_rows(spark):
    """Within a rewritten file group, carried-over rows keep their
    original commit time and seqno; only updated rows take the new
    instant (the invariant incremental queries rely on)."""
    root = _fresh("t_hudi_carry")
    df = spark.range(0, 200).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    write_hudi(df.coalesce(1), root, record_key="id")
    upsert_hudi(
        spark.range(0, 50).select(F.col("id"), F.lit(-1.0).alias("v")), root
    )
    i0, i1 = [i for i, _ in completed_instants(root)]
    rows = read_hudi(spark, root, with_meta=True).select(
        "id", "_hoodie_commit_time", "_hoodie_file_name"
    ).collect()
    assert len(rows) == 200
    for r in rows:
        want = i1 if r["id"] < 50 else i0
        assert r["_hoodie_commit_time"] == want, (r["id"], want)
        # every row of the group lives in the NEW slice file
        assert r["_hoodie_file_name"].endswith(f"_{i1}.parquet")


def test_partition_pruning_reads_only_matching_files(spark):
    """partition_eq pruning happens against writeStat partitionPath:
    every scanned file sits under the requested partition dir."""
    root = _fresh("t_hudi_prune_unit")
    df = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    write_hudi(
        df, root, record_key="o_orderkey", partition_by=["o_orderpriority"]
    )
    pruned = read_hudi(
        spark, root, partition_eq={"o_orderpriority": "1-URGENT"}
    )
    files = pruned.inputFiles()
    assert files and all("o_orderpriority=1-URGENT" in f for f in files)


def test_timeline_operation_types(spark):
    """hudi_timeline reports the spec action/operationType pairs for a
    full lifecycle, and the commit JSON carries partitionToReplaceFileIds
    only on the replacecommit."""
    root = _fresh("t_hudi_tl_unit")
    df = spark.range(0, 60).select("id").coalesce(1)
    write_hudi(df, root, record_key="id")
    upsert_hudi(spark.range(0, 10).select("id"), root)
    delete_hudi(spark.range(50, 60).select("id"), root)
    cluster_hudi(root)
    tl = hudi_timeline(root)
    assert [(a, o) for _i, a, o in tl] == [
        ("commit", "insert"),
        ("commit", "upsert"),
        ("commit", "delete"),
        ("replacecommit", "cluster"),
    ]
    for instant, action in completed_instants(root):
        meta = H._read_commit_meta(root, instant, action)
        assert ("partitionToReplaceFileIds" in meta) == (
            action == "replacecommit"
        )
    assert read_hudi(spark, root).count() == 50


def test_lakehouse_cli_on_hudi(spark):
    """The operational CLI auto-detects Hudi roots and serves the
    describe/history/files/fsck verbs from timeline metadata alone."""
    from atlas_migration_repo_spark.lakehouse import (
        _DISPATCH,
        detect_format,
        fsck,
    )

    root = _fresh("t_hudi_cli")
    write_hudi(
        spark.range(0, 100).select("id").coalesce(1), root, record_key="id"
    )
    upsert_hudi(spark.range(0, 10).select("id"), root)
    assert detect_format(root) == "hudi"
    d = _DISPATCH[("hudi", "describe")](root)
    assert d["num_commits"] == 2 and d["num_records"] == 100
    h = _DISPATCH[("hudi", "history")](root)
    assert [x["operation"] for x in h] == ["insert", "upsert"]
    assert h[1]["num_updates"] == 10
    files = _DISPATCH[("hudi", "files")](root)
    assert len(files) == 1  # the upsert produced a new slice of the group
    chk = fsck(root)
    assert chk["ok"] and chk["checked_files"] == 1

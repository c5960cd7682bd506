"""Partition-topology independence: results must not depend on
``spark.sql.shuffle.partitions`` — the session knob that changes between a
laptop and a 1000-executor cluster. This is the runnable form of the
repo's cluster-size-independence claim: every value the engine emits is
either exact (integers, decimal-accumulated msum sums) or rounded into the
r4 envelope BEFORE leaving the plan, so re-sharding every shuffle cannot
move a single cell.

An always-on sample covers one representative per operator family; the
full-registry replay is opt-in (SPARK_GRAFT_PART_REPLAY=1) like the
time-zone replay, because it re-runs all ~330 queries.
"""

from __future__ import annotations

import os

import pytest

from atlas_migration_repo_spark.registry import QUERIES

from conftest import SF_DIR, _normalize

# one per family; streaming keys excluded (their harness pins its own
# partition count — that scoping is itself under test elsewhere)
_SAMPLE = (
    "agg_pricing_summary",
    "join_multiway",
    "win_running_sum",
    "set_union_distinct",
    "q7_nation_trade",
    "text_tfidf",
    "dedup_spans",
    "sim_cosine_topk",
    "agg_two_stage_salted",
    "agg_percentile",
)


def _rows(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    return _normalize(list(df.columns), [tuple(r) for r in df.collect()])


def _replay(spark, name):
    base = _rows(spark, name)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        moved = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == moved, f"{name}: result moved when shuffle partitions changed"


@pytest.mark.parametrize("name", _SAMPLE)
def test_partition_independent_sample(spark, name):
    _replay(spark, name)


_full = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PART_REPLAY"),
    reason="set SPARK_GRAFT_PART_REPLAY=1 for the full-registry replay",
)


@_full
@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if not n.startswith("stream_"))
)
def test_partition_independent_full(spark, name):
    _replay(spark, name)

"""Operator-level behavioral tests beyond oracle parity."""

from __future__ import annotations

from atlas_migration_repo_spark.registry import QUERIES

from conftest import SF_DIR


def test_approx_count_distinct_accuracy(spark):
    """HLL++ at rsd=0.05 must land within 15% of the exact distinct count."""
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in QUERIES["agg_count_distinct"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in QUERIES["agg_approx_count_distinct"].fn(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) / ex < 0.15, (k, approx[k], ex)


def test_scan_pruned_pushes_filters(spark):
    """The pruned scan's physical plan must push its predicate into the
    parquet reader and read only the projected columns."""
    df = QUERIES["scan_pruned"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    assert "l_extendedprice" not in plan  # column pruning held

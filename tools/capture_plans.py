#!/usr/bin/env python
"""Capture `EXPLAIN FORMATTED` output for benchmark queries into plans/<dir>/.

Usage: python tools/capture_plans.py <outdir> <suffix> [key ...]
  outdir  e.g. plans/r10
  suffix  e.g. before | after
  keys    registry keys; default = all bench-tagged queries

Driver-only (explain, no execution) so it is cheap and does not perturb a
concurrently running benchmark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from atlas_migration_repo_spark.plans.inspect import formatted_plan
from atlas_migration_repo_spark.registry import QUERIES, load_all_modules
from atlas_migration_repo_spark.session import get_spark


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    load_all_modules()
    spark = get_spark(app_name="atlas-capture-plans")
    if not keys:
        keys = [n for n, qd in QUERIES.items() if "bench" in qd.tags]
    for name in keys:
        df = QUERIES[name].fn(spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

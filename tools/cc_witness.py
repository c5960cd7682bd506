#!/usr/bin/env python
"""Linear-time connected-components witness for embed_dedup_clusters.

embed_dedup_clusters' DuckDB oracle is a recursive-CTE transitive closure
over the cosine near-dup pair graph — O(|component|^2) rows by
construction, which is fine at the driver gate's sf0.01 but runs for
hours at sf1 where the fixture's noise-floor tau produces a giant
component (the same declared-quadratic-oracle boundary as
fuzzy_match_names). This witness replaces that closure with the textbook
linear check:

1. take the PAIR SET from dedup_embed — itself hash-verified against the
   exact quadratic SQL oracle at the same scale factor (PARITY_SF1_r7
   records the sf1 pass), so the edges are already certified;
2. run a driver-side union-find (path compression + min-id labels) over
   those edges — O(E alpha(V));
3. compare (vec_id, cluster_id, is_canonical) EXACTLY against the Spark
   operator's output.

Equivalence holds because min-label connected components are unique given
the edge set: any two correct implementations must emit identical rows.

Usage: python tools/cc_witness.py <sf_dir> [--log FILE]
Appends one JSON line: {"key": "embed_dedup_clusters",
"status": "witness_pass"|"witness_fail", ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    from atlas_migration_repo_spark.registry import QUERIES, load_all_modules
    from atlas_migration_repo_spark.session import get_spark

    load_all_modules()
    spark = get_spark(app_name="cc-witness")
    t0 = time.time()

    pairs = QUERIES["dedup_embed"].fn(spark, args.sf_dir).select("va", "vb").collect()
    n_vec = spark.read.parquet(
        os.path.join(args.sf_dir, "embeddings.parquet")
    ).count()

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root so the final label IS the component minimum
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for r in pairs:
        union(r["va"], r["vb"])

    expected = {}
    for v in range(n_vec):
        lab = find(v)
        expected[v] = (lab, lab == v)

    got = {
        r["vec_id"]: (r["cluster_id"], r["is_canonical"])
        for r in QUERIES["embed_dedup_clusters"].fn(spark, args.sf_dir).collect()
    }

    mismatches = [
        (v, expected.get(v), got.get(v))
        for v in set(expected) | set(got)
        if expected.get(v) != got.get(v)
    ]
    rec = {
        "key": "embed_dedup_clusters",
        "status": "witness_pass" if not mismatches else "witness_fail",
        "witness": "driver union-find over the sf-verified dedup_embed pair set",
        # the witness rule (VERDICT r7 "next" #8): a witness is only as
        # good as its substrate; name it so the docs-freshness audit can
        # demand the substrate's own hash pass in the SAME parity log
        "substrate": "dedup_embed",
        "n_vectors": n_vec,
        "n_edges": len(pairs),
        "n_clusters": sum(1 for _, (l, _c) in expected.items() if _c),
        "mismatches": len(mismatches),
        "sec": round(time.time() - t0, 2),
        "sf_dir": args.sf_dir,
    }
    line = json.dumps(rec)
    print(line)
    if args.log:
        with open(args.log, "a", buffering=1) as fh:
            fh.write(line + "\n")
    if mismatches:
        print("first mismatches:", mismatches[:5], file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Engine-independent exact recompute witness for the quadratic-oracle
similarity keys (VERDICT r7 "next" #5).

At sf10 the embeddings table holds ~200k vectors; the DuckDB oracles for
`sim_knn_join`, `dedup_embed`, and `embed_knn_label_accuracy` are all-pairs
SQL (O(N²) relational rows — ~4·10¹⁰ at this scale, days of oracle time),
so the sf1 replay's hash gate cannot be extended verbatim. This witness
replaces the SQL oracle with a SUBSTRATE-FREE exact recompute: blocked
float64 BLAS over the raw parquet shortlists candidates, and every
emitted value is the SEQUENTIAL left-associative IEEE chain the operators
and oracles both define as the exact answer (see sim_knn_join's
docstring) — so the comparison is bit-exact, not approximate, and covers
EVERY row, not a sample:

- `sim_knn_join`: exact 1-NN (chain cosine, ties by min id, r4-rounded)
  for all N vectors, set-compared to the Spark output.
- `dedup_embed`: the exact τ-threshold pair set (va < vb, chain cosine
  ≥ τ, r4), set-compared to the Spark output.
- `embed_knn_label_accuracy`: the per-label accuracy table recomputed
  from the witness 1-NN, compared to the Spark output.

Each result appends one JSON line with `substrate:
"numpy-float64-exact-recompute"` and a `rows_compared` count — the form
the docs-freshness witness audit accepts for engine-free recomputes.
`embed_dedup_clusters` then chains on the witnessed `dedup_embed` pair
set through tools/cc_witness.py (witness-on-witness, audited).

Usage: python tools/knn_witness.py <sf_dir> [--log FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BLOCK = 4096
EPS = 1e-9  # BLAS-vs-chain shortlist margin, same as _KNN_RERANK_EPS


def _r4(x: float) -> float:
    """Spark's round(x, 4): HALF_UP on the double's exact decimal
    expansion (Decimal(float) == java BigDecimal(double)), -0.0 → +0.0."""
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP)) + 0.0


def _chain_dot(x, y) -> float:
    s = 0.0
    for i in range(len(x)):
        s += float(x[i]) * float(y[i])
    return s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--log", default=None)
    args = ap.parse_args()

    import numpy as np
    import pyarrow.parquet as pq

    from atlas_migration_repo_spark.llm.similarity import COSINE_TAU
    from atlas_migration_repo_spark.registry import QUERIES, load_all_modules
    from atlas_migration_repo_spark.session import get_spark

    load_all_modules()
    spark = get_spark(app_name="knn-witness")

    tbl = pq.read_table(os.path.join(args.sf_dir, "embeddings.parquet"))
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_pylist()
    A = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    n = len(ids)
    order = np.argsort(ids, kind="stable")
    ids, A = ids[order], A[order]
    labels = [labels[i] for i in order]
    assert (ids == np.arange(n)).all(), "vec_ids must be dense 0..n-1"

    # exact chain norms (sequential sum of squares, NOT numpy pairwise sum)
    chain_norm = np.array(
        [math.sqrt(_chain_dot(v, v)) for v in A], dtype=np.float64
    )
    An = A / np.linalg.norm(A, axis=1, keepdims=True)  # BLAS shortlist side

    t0 = time.time()
    nn_witness = {}  # vec_id -> (nn_id, cosine_r4, same_label)
    pair_witness = set()  # (va, vb, cosine_r4)
    for lo in range(0, n, BLOCK):
        hi = min(lo + BLOCK, n)
        S = An[lo:hi] @ An.T
        S[np.arange(hi - lo), np.arange(lo, hi)] = -np.inf  # self
        smax = S.max(axis=1)
        for i in range(hi - lo):
            vi = lo + i
            best = None
            for j in np.nonzero(S[i] >= smax[i] - EPS)[0]:
                ce = _chain_dot(A[vi], A[j]) / (chain_norm[vi] * chain_norm[j])
                key = (-ce, int(j))
                if best is None or key < best[0]:
                    best = (key, int(j), ce)
            _, j, ce = best
            nn_witness[vi] = (j, _r4(ce), labels[vi] == labels[j])
            # τ-pair candidates from the same Gram block (va < vb half)
            for j in np.nonzero(S[i] >= COSINE_TAU - EPS)[0]:
                if j <= vi:
                    continue
                ce = _chain_dot(A[vi], A[j]) / (chain_norm[vi] * chain_norm[j])
                if ce >= COSINE_TAU:
                    pair_witness.add((vi, int(j), _r4(ce)))
    t_compute = round(time.time() - t0, 2)

    out = open(args.log, "a", buffering=1) if args.log else None

    def emit(rec):
        line = json.dumps(rec)
        print(line)
        if out:
            out.write(line + "\n")

    # --- sim_knn_join ------------------------------------------------------
    t0 = time.time()
    got = {
        r["vec_id"]: (r["nn_id"], r["cosine"], r["same_label"])
        for r in QUERIES["sim_knn_join"].fn(spark, args.sf_dir).collect()
    }
    mism = [
        (v, nn_witness.get(v), got.get(v))
        for v in set(nn_witness) | set(got)
        if nn_witness.get(v) != got.get(v)
    ]
    emit(
        {
            "key": "sim_knn_join",
            "status": "witness_pass" if not mism else "witness_fail",
            "witness": "blocked float64 BLAS shortlist + exact chain re-rank "
            "over the raw parquet, every vector",
            "substrate": "numpy-float64-exact-recompute",
            "rows_compared": len(got),
            "mismatches": len(mism),
            "sec": round(time.time() - t0 + t_compute, 2),
            "sf_dir": args.sf_dir,
        }
    )
    if mism:
        print("first mismatches:", mism[:5], file=sys.stderr)
        sys.exit(1)

    # --- embed_knn_label_accuracy -----------------------------------------
    t0 = time.time()
    by_label: dict[str, list[bool]] = {}
    for v, (_j, _c, same) in nn_witness.items():
        by_label.setdefault(labels[v], []).append(same)
    expect_acc = {
        lab: (len(v), _r4(sum(v) / len(v))) for lab, v in by_label.items()
    }
    got_acc = {
        r["label"]: (r["n_vectors"], r["knn1_accuracy"])
        for r in QUERIES["embed_knn_label_accuracy"].fn(spark, args.sf_dir).collect()
    }
    ok = expect_acc == got_acc
    emit(
        {
            "key": "embed_knn_label_accuracy",
            "status": "witness_pass" if ok else "witness_fail",
            "witness": "per-label accuracy recomputed from the witness 1-NN",
            "substrate": "numpy-float64-exact-recompute",
            "rows_compared": len(got_acc),
            "mismatches": 0 if ok else len(
                set(expect_acc.items()) ^ set(got_acc.items())
            ),
            "sec": round(time.time() - t0, 2),
            "sf_dir": args.sf_dir,
        }
    )
    if not ok:
        print("accuracy diff:", expect_acc, got_acc, file=sys.stderr)
        sys.exit(1)

    # --- dedup_embed --------------------------------------------------------
    t0 = time.time()
    got_pairs = {
        (r["va"], r["vb"], r["cosine"])
        for r in QUERIES["dedup_embed"].fn(spark, args.sf_dir).collect()
    }
    diff = pair_witness ^ got_pairs
    emit(
        {
            "key": "dedup_embed",
            "status": "witness_pass" if not diff else "witness_fail",
            "witness": "exact chain-cosine tau-pair set from the same "
            "blocked recompute, every pair",
            "substrate": "numpy-float64-exact-recompute",
            "rows_compared": len(got_pairs),
            "mismatches": len(diff),
            "sec": round(time.time() - t0, 2),
            "sf_dir": args.sf_dir,
        }
    )
    if diff:
        print("first pair diffs:", sorted(diff)[:5], file=sys.stderr)
        sys.exit(1)
    if out:
        out.close()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Matched-schema fixture generator for scale-up evidence runs.

The driver ships read-only fixtures at sf{0.001,0.01,0.1} (TESTDATA.md).
VERDICT r3's top ask is an sf1 datapoint: replay the headliners at 10×
sf0.1 so the 100 TB scaling claims rest on a measured exponent instead of
docstrings. This generator reproduces the documented schemas and value
domains (FIXTURES.md — types, ranges, distributions, the 31-word document
vocabulary, unit-norm 64-d embeddings) at any scale factor, seed-42
deterministic. It does NOT byte-reproduce the driver's data (its generator
is not in-repo) — for scaling ratios and Spark↔DuckDB parity that is
irrelevant: both engines read the same files.

Usage: python tools/gen_fixtures.py [SF] [OUTDIR]
       (defaults: SF=1.0, OUTDIR=.scratch/fixtures/sf1 — fixtures must NOT
       live at .scratch/<basename> itself: queries run against a fixture
       dir write their scratch output to .scratch/<basename(sf_dir)>/,
       which would collide with the fixture files)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DAY_MS = 86_400_000


def _write(outdir: str, name: str, table: pa.Table) -> None:
    os.makedirs(outdir, exist_ok=True)
    # ~256k-row row groups: a single file still splits across Spark tasks
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"),
                   row_group_size=262_144)
    print(f"  {name}: {table.num_rows} rows")


def _midnight_ms(rng, n, lo_day: str, hi_day: str):
    lo = np.datetime64(lo_day).astype("datetime64[D]").astype(np.int64)
    hi = np.datetime64(hi_day).astype("datetime64[D]").astype(np.int64)
    days = rng.integers(lo, hi + 1, n)
    return (days * DAY_MS).astype("datetime64[ms]")


def generate(sf: float, outdir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    # row counts: linear in sf, anchored to the driver's sf0.1 counts
    n_supp = max(10, int(10_000 * sf))
    n_cust = max(150, int(150_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1_500, int(1_500_000 * sf))
    n_li = max(6_000, int(6_000_000 * sf))
    n_ev = max(1_000, int(1_000_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))
    n_user = max(15, int(15_000 * sf))

    i32 = pa.int32()
    print(f"generating sf={sf} → {outdir}")

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), i32),
        "r_name": regions,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), i32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], i32),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), i32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), i32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(segs)[rng.integers(0, 5, n_cust)],
    }))
    adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
    types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    ai, ni = rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(ai, ni)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(types)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), i32),
        "p_retailprice": np.round(900 + rng.uniform(0, 100, n_part), 2),
    }))
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _midnight_ms(rng, n_ord, "1995-01-01", "2001-08-01"),
        "o_orderpriority": np.array(prios)[rng.integers(0, 5, n_ord)],
    }))
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": np.sort(rng.integers(0, n_ord, n_li)),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), i32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _midnight_ms(rng, n_li, "1995-01-02", "2001-11-04"),
    }))
    etypes = ["click", "error", "purchase", "signup", "view"]
    span_us = 30 * 86_400_000_000
    ts = np.sort(rng.integers(0, span_us, n_ev)) + np.datetime64(
        "2024-01-01"
    ).astype("datetime64[us]").astype(np.int64)
    _write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": np.array(etypes)[rng.integers(0, 5, n_ev)],
        "value": np.round(np.abs(rng.normal(0, 80, n_ev)), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))
    vocab = np.array([
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ])
    langs = np.array(["de", "en", "es", "fr", "zh"])
    lang_p = np.array([0.14, 0.42, 0.15, 0.15, 0.14])
    doc_lens = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in doc_lens]
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.choice(5, n_doc, p=lang_p)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))
    V = rng.normal(0, 1, (n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(V.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), i32),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default = os.path.join(repo, ".scratch", "fixtures", f"sf{sf:g}")
    outdir = sys.argv[2] if len(sys.argv) > 2 else default
    generate(sf, outdir)

#!/usr/bin/env python
"""Resumable full-registry oracle-parity replay with per-key logging.

The pytest replay (tests/test_oracle_parity.py) is the canonical gate;
this runner exists for the LONG scale factors (sf1+) where a single run
spans hours: it writes one JSON line per key to the --log file as it
goes (key, status, seconds), skips keys already green in the log on
restart, and orders keys CHEAPEST-FIRST by their sf0.1 reputation so a
time-boxed run maximizes covered keys. Same comparison semantics as the
pytest gate (it imports conftest's assert_matches_oracle).

Usage:
    python tools/parity_replay.py --sf-dir .scratch/fixtures/sf1 \
        --log .scratch/logs/parity_sf1.jsonl [--skip-tags streaming]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--log", required=True)
    ap.add_argument("--only-prefix", default=None)
    ap.add_argument(
        "--only-keys",
        default=None,
        help="comma-separated exact keys to replay (targeted re-verification "
        "of a round's touched keys at a large SF)",
    )
    ap.add_argument(
        "--skip",
        default="",
        help="comma-separated keys to record as skipped (e.g. declared "
        "quadratic-exact baselines whose large-SF run is hours by design)",
    )
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_TEST_SF"] = args.sf_dir
    import duckdb

    import conftest as C  # noqa: E402  (tests/conftest — reuses the gate)
    from atlas_migration_repo_spark import registry as R
    from atlas_migration_repo_spark.catalog import TABLES, table_path
    from atlas_migration_repo_spark.registry import QUERIES, load_all_modules
    from atlas_migration_repo_spark.session import get_spark

    load_all_modules()
    done: set[str] = set()
    if os.path.exists(args.log):
        with open(args.log) as fh:
            for line in fh:
                rec = json.loads(line)
                # a prior skip is a standing decision (declared
                # quadratic-exact baselines), not work to retry — honoring
                # it on resume keeps a relaunch from silently grinding an
                # hours-by-design oracle the log already excludes
                # witness_pass: the key is verified by an in-log witness
                # line (tools/knn_witness.py / cc_witness.py) — audited by
                # tests/test_docs_freshness.py; don't grind its
                # quadratic SQL oracle too
                if rec.get("status") in ("pass", "skipped", "witness_pass"):
                    done.add(rec["key"])
    spark = get_spark(app_name="parity-replay")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(args.sf_dir, t)}')"
        )
    keys = sorted(QUERIES)
    if args.only_prefix:
        prefixes = tuple(p for p in args.only_prefix.split(",") if p)
        keys = [k for k in keys if k.startswith(prefixes)]
    if args.only_keys:
        want = {k for k in args.only_keys.split(",") if k}
        missing = want - set(keys)
        if missing:
            raise SystemExit(f"--only-keys not in registry: {sorted(missing)}")
        keys = [k for k in keys if k in want]
    # cheapest-first: non-LLM relational keys before the heavy dedup/sim
    # families, so a time-boxed run covers the most keys
    def cost_bucket(k: str) -> int:
        qd = QUERIES[k]
        if any(
            k.startswith(p)
            for p in ("dedup_", "sim_", "corpus_", "tokenizer_", "embed_")
        ):
            return 2
        if "streaming" in qd.tags or k.startswith("stream"):
            return 1
        return 0

    keys.sort(key=lambda k: (cost_bucket(k), k))
    skip = {k for k in args.skip.split(",") if k}
    undeclared = skip - set(R.DECLARED_PARITY_SKIPS)
    if undeclared:
        raise SystemExit(
            f"--skip keys {sorted(undeclared)} have no registered reason; "
            "add them to registry.DECLARED_PARITY_SKIPS (CI audits every "
            "committed skip line against it)"
        )
    log = open(args.log, "a", buffering=1)
    n_pass = n_fail = 0
    for k in keys:
        if k in done:
            continue
        if k in skip:
            log.write(
                json.dumps(
                    {
                        "key": k,
                        "status": "skipped",
                        "reason": R.DECLARED_PARITY_SKIPS[k],
                    }
                )
                + "\n"
            )
            continue
        qd = QUERIES[k]
        t0 = time.time()
        try:
            if qd.oracle is None:
                df = qd.fn(spark, args.sf_dir)
                assert df.columns and df.count() >= 0
            else:
                C.assert_matches_oracle(spark, con, qd, args.sf_dir)
            status, err = "pass", None
            n_pass += 1
        except Exception as e:  # noqa: BLE001 - recorded, run continues
            status, err = "fail", str(e)[:400]
            n_fail += 1
        log.write(
            json.dumps(
                {
                    "key": k,
                    "status": status,
                    "sec": round(time.time() - t0, 2),
                    **({"error": err} if err else {}),
                }
            )
            + "\n"
        )
    log.write(
        json.dumps(
            {"summary": True, "passed": n_pass, "failed": n_fail,
             "skipped_done": len(done), "sf_dir": args.sf_dir}
        )
        + "\n"
    )
    log.close()


if __name__ == "__main__":
    main()

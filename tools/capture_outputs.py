#!/usr/bin/env python
"""Capture canonical bit-exact digests of query outputs — the old-vs-new
equivalence harness for same-semantics rewrites (r11 decimal→mantissa
conversions). Usage:

    python tools/capture_outputs.py OUT.json KEY[,KEY...] SF_DIR[,SF_DIR...]

Digest: sha256 over sorted repr rows with doubles rendered via float.hex()
(bit-exact) — two runs match iff every cell is identical to the bit.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def canon(v):
    if isinstance(v, float):
        return float.hex(v)
    return repr(v)


def digest(df):
    rows = df.collect()
    lines = sorted("|".join(canon(v) for v in r) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return {"n": len(lines), "sha": h.hexdigest(), "schema": str(df.schema)}


def main():
    out_path, keys_arg, sfs_arg = sys.argv[1], sys.argv[2], sys.argv[3]
    keys = keys_arg.split(",")
    sf_dirs = sfs_arg.split(",")
    from atlas_migration_repo_spark.registry import QUERIES, load_all_modules
    from atlas_migration_repo_spark.session import get_spark

    load_all_modules()
    spark = get_spark(app_name="capture-outputs")
    out = {}
    for sf in sf_dirs:
        for k in keys:
            out[f"{k}@{sf}"] = digest(QUERIES[k].fn(spark, sf))
            print(f"{k}@{sf}: {out[f'{k}@{sf}']['sha'][:16]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()

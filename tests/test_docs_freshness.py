"""Freshness guards for generated artifacts: the committed plan audit
must cover the LIVE registry, so a PLANS.md regenerated one commit
before a key landed can never silently under-audit (VERDICT r6 "wrong"
#2 — graph_shortest_cost was missing from the 461-key sweep)."""

from __future__ import annotations

import re
from pathlib import Path

from atlas_migration_repo_spark.registry import QUERIES, load_all_modules

REPO = Path(__file__).resolve().parent.parent


def test_plans_audit_covers_registry():
    load_all_modules()
    text = (REPO / "PLANS.md").read_text()
    m = re.search(r"<!-- sweep-registry-keys: (\d+); swept: (\d+) -->", text)
    assert m, (
        "PLANS.md lacks the machine-checkable sweep stamp; regenerate "
        "with `python -m atlas_migration_repo_spark.plans.report <sf_dir>`"
    )
    declared, swept = int(m.group(1)), int(m.group(2))
    assert declared == len(QUERIES), (
        f"PLANS.md was generated against a {declared}-key registry but "
        f"the live registry has {len(QUERIES)} keys — regenerate it"
    )
    assert swept == declared, (
        f"{declared - swept} queries errored during the sweep; the audit "
        "is incomplete"
    )


def test_survey_addendum_covers_registry():
    """SURVEY.md §2.11 is auto-generated from the registry; its declared
    totals must match the live registry exactly."""
    load_all_modules()
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(
        r"declares \*\*(\d+) queries\*\*, \*\*(\d+) with exact DuckDB "
        r"value oracles\*\*",
        text,
    )
    assert m, "SURVEY.md lacks the §2.11 auto-generated totals line"
    total = int(m.group(1))
    with_oracle = int(m.group(2))
    assert total == len(QUERIES)
    assert with_oracle == sum(1 for q in QUERIES.values() if q.oracle)


def test_plans_sweep_has_no_flagged_plans():
    """The committed plan audit must carry ZERO non-allow-listed
    cartesian/nested-loop findings: a key whose plan legitimately uses a
    broadcast nested loop gets an _NLJ_ALLOWED entry (with its linearity
    argument) in the same commit that adds the key — round-7 session-3
    caught corpus_shuffle_epochs shipping un-allow-listed."""
    text = (REPO / "PLANS.md").read_text()
    assert "NOT allow-listed" not in text, (
        "PLANS.md carries flagged plans; either fix the plan or add a "
        "justified _NLJ_ALLOWED entry in plans/report.py and regenerate"
    )


def test_parity_skip_lines_are_declared():
    """Every "skipped" line in every committed PARITY_*.jsonl must name a
    key registered in DECLARED_PARITY_SKIPS (VERDICT r8 "next" #6) — a
    scale-replay skip is a standing engineering decision with a written
    justification, not a convention the next round can silently widen.
    (tools/parity_replay.py refuses undeclared --skip keys up front and
    stamps the registered reason into new lines; pre-r9 lines carry no
    reason field and are accepted by key alone.)"""
    import json

    from atlas_migration_repo_spark.registry import DECLARED_PARITY_SKIPS

    logs = sorted(REPO.glob("PARITY_*.jsonl"))
    assert logs, "no parity logs committed"
    # a skip is also acceptable when a LATER committed log at the same
    # scale resolved the key (pass or witness_pass) — e.g. the r7 sf1
    # skip of embed_dedup_clusters, witness-passed in the r8 sf1 log
    resolved: dict[str, set[str]] = {}
    skips: list[tuple[str, str, str]] = []
    for log in logs:
        scale = log.name.split("_r")[0]
        for raw in log.read_text().splitlines():
            try:
                rec = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if rec.get("status") in ("pass", "witness_pass"):
                resolved.setdefault(scale, set()).add(rec["key"])
            elif rec.get("status") == "skipped":
                skips.append((log.name, scale, rec["key"]))
    assert skips, "no skip lines found to audit"
    for log_name, scale, key in skips:
        assert key in DECLARED_PARITY_SKIPS or key in resolved.get(
            scale, set()
        ), (
            f"{log_name}: skip for {key!r} has no registered reason in "
            "registry.DECLARED_PARITY_SKIPS and no later pass at the "
            "same scale"
        )


def test_witness_lines_cite_hash_verified_substrate():
    """The witness rule (VERDICT r7 "next" #8, endorsed from the round-8
    plan): a cc_witness-style verification is only as strong as its
    substrate, so every `witness_pass` line in every committed
    PARITY_*.jsonl must name a substrate key that the SAME log
    hash-verifies (`status: pass`) at the same scale. A witness whose
    substrate has no hash evidence in its own log fails CI."""
    import json

    logs = sorted(REPO.glob("PARITY_*.jsonl"))
    assert logs, "no parity logs committed"
    load_all_modules()
    checked = 0
    for log in logs:
        passed_keys = set()
        witness_passed = set()
        witnesses = []
        for raw in log.read_text().splitlines():
            try:
                rec = json.loads(raw)
            except json.JSONDecodeError:
                continue
            if rec.get("status") == "pass":
                passed_keys.add(rec["key"])
            elif rec.get("status") == "witness_pass":
                witness_passed.add(rec["key"])
                witnesses.append(rec)
        for w in witnesses:
            substrate = w.get("substrate")
            if substrate is None:
                # pre-r8 lines carry the substrate only in prose: accept
                # exactly one registry key named in the witness text
                named = [
                    k for k in QUERIES if k in (w.get("witness") or "")
                ]
                assert len(named) == 1, (
                    f"{log.name}: witness for {w['key']} names "
                    f"{len(named)} registry keys in its text — add an "
                    "explicit 'substrate' field"
                )
                substrate = named[0]
            if substrate == "numpy-float64-exact-recompute":
                # engine-free exact recompute over the raw parquet
                # (tools/knn_witness.py) — needs no in-log key, but must
                # declare full coverage, not a sample
                assert w.get("rows_compared", 0) > 0, (
                    f"{log.name}: recompute witness for {w['key']} "
                    "declares no coverage"
                )
            else:
                # key substrate: hash-passed, or itself witness-passed in
                # the SAME log (a chain — each link is audited here too)
                assert substrate in passed_keys | witness_passed, (
                    f"{log.name}: witness for {w['key']} rests on "
                    f"{substrate!r}, which has neither a hash-pass nor a "
                    "witness-pass line in the same log"
                )
            checked += 1
    assert checked >= 1, "no witness lines found to audit"

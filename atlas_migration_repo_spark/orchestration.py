"""Offline Airflow DAG-spec generator (/root/reference/README.md:9
"Scheduler - Airflow").

The reference names Airflow as its scheduler; this environment has no
Airflow installation, so the orchestration layer is modeled the honest,
testable way: a pure-Python generator that emits a DECLARATIVE DAG spec — a
plain JSON-serializable dict with one extract → transform → load chain per
Salesforce object, watermark-driven incremental predicates, and explicit
dependencies. A deployment turns each task row into the Airflow operator of
its choice (the dict deliberately names only generic operator kinds); every
property of the DAG — ids, ordering, templated SOQL, acyclicity — is
unit-testable with zero scheduler imports.

Scale notes: per-object extracts are independent DAG branches, so a
1000-object migration fans out to Airflow's parallelism cap; each extract
task carries the base-62 Id partition predicates from ObjectSpec, so one
task maps to N parallel Bulk-API range reads exactly like the JDBC-style
predicated read in sources/salesforce.py.
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from dataclasses import dataclass

from atlas_migration_repo_spark.sources.salesforce import ObjectSpec

# Airflow's templating macro for the schedule window start, rendered at run
# time — the watermark predicate becomes "SystemModstamp > <last window>",
# making every scheduled run an incremental extract.
_WATERMARK_MACRO = "{{ data_interval_start.isoformat() }}"


@dataclass(frozen=True)
class SinkSpec:
    """Where one object's extracted rows land (partitioned parquet)."""

    root: str  # e.g. "s3a://bucket/atlas" or a local staging root
    fmt: str = "parquet"
    partition_by: tuple[str, ...] = ()

    def path(self, object_name: str) -> str:
        return f"{self.root.rstrip('/')}/{object_name.lower()}"


def dag_spec(
    dag_id: str,
    objects: Sequence[ObjectSpec],
    sink: SinkSpec,
    schedule: str = "@daily",
    extract_partitions: int = 8,
    retries: int = 2,
    uniform_sync: bool = False,
) -> dict:
    """Build the declarative DAG dict: for each object an
    ``extract_<obj> -> transform_<obj> -> load_<obj>`` chain plus a final
    fan-in ``publish`` barrier (and, with ``uniform_sync=True`` on a
    Delta sink, a metadata-only UniForm maintenance task after it so
    Iceberg readers see each run's commits). Objects with a watermark field get a
    templated incremental SOQL predicate; the rest re-extract fully.

    The result is pure data (asserted JSON-round-trippable) — no Airflow
    objects, no scheduler import, nothing that needs a live org.
    """
    if not objects:
        raise ValueError("dag_spec needs at least one ObjectSpec")
    names = [o.name for o in objects]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate object names: {names}")

    tasks: list[dict] = []
    for obj in objects:
        incremental = obj.watermark_field is not None
        soql = obj.soql(since=_WATERMARK_MACRO if incremental else None)
        extract_id = f"extract_{obj.name.lower()}"
        transform_id = f"transform_{obj.name.lower()}"
        load_id = f"load_{obj.name.lower()}"
        tasks.append(
            {
                "task_id": extract_id,
                "kind": "extract",
                "object": obj.name,
                "soql": soql,
                "incremental": incremental,
                "watermark_field": obj.watermark_field,
                "partition_predicates": obj.partition_predicates(extract_partitions),
                "depends_on": [],
            }
        )
        tasks.append(
            {
                "task_id": transform_id,
                "kind": "transform",
                "object": obj.name,
                "schema": [list(f) for f in obj.fields],
                "depends_on": [extract_id],
            }
        )
        tasks.append(
            {
                "task_id": load_id,
                "kind": "load",
                "object": obj.name,
                "sink_path": sink.path(obj.name),
                "format": sink.fmt,
                "partition_by": list(sink.partition_by),
                "mode": "append" if incremental else "overwrite",
                "depends_on": [transform_id],
            }
        )
    tasks.append(
        {
            "task_id": "publish",
            "kind": "barrier",
            "depends_on": [f"load_{o.name.lower()}" for o in objects],
        }
    )
    if uniform_sync:
        if sink.fmt == "delta":
            # metadata-only per-table maintenance after the load barrier:
            # sync_iceberg_metadata_from_delta makes each run's new Delta
            # commits visible to Iceberg readers (repeat runs no-op)
            tasks.append(
                {
                    "task_id": "uniform_sync",
                    "kind": "maintenance",
                    "op": "sync_iceberg_metadata_from_delta",
                    "paths": [sink.path(o.name) for o in objects],
                    "depends_on": ["publish"],
                }
            )
        elif sink.fmt == "hudi":
            # same contract for Hudi landings: the grafted _delta_log
            # follows each run's timeline commits (repeat runs no-op)
            tasks.append(
                {
                    "task_id": "uniform_sync",
                    "kind": "maintenance",
                    "op": "sync_delta_log_from_hudi",
                    "paths": [sink.path(o.name) for o in objects],
                    "depends_on": ["publish"],
                }
            )
        else:
            raise ValueError(
                "uniform_sync keeps a secondary protocol tree current over "
                f"a DELTA or HUDI sink; sink format is {sink.fmt!r}"
            )
    if sink.fmt == "hudi":
        # Hudi landings carry their own table services: fold any MOR
        # logs, then retire superseded file slices. Both are no-ops on
        # an append-only run and never touch savepointed files.
        tasks.append(
            {
                "task_id": "hudi_table_services",
                "kind": "maintenance",
                "op": "compact_then_clean",
                "paths": [sink.path(o.name) for o in objects],
                "depends_on": (
                    ["uniform_sync"] if uniform_sync else ["publish"]
                ),
            }
        )

    spec = {
        "dag_id": dag_id,
        "schedule": schedule,
        "default_args": {"retries": retries, "retry_exponential_backoff": True},
        "max_active_runs": 1,  # watermark correctness: runs must not overlap
        "catchup": True,  # missed windows re-extract their own interval
        "tasks": tasks,
    }
    _validate(spec)
    return spec


def _validate(spec: dict) -> None:
    """Structural invariants: unique ids, resolvable deps, acyclic, and
    JSON-serializable (the whole point of a declarative spec)."""
    ids = [t["task_id"] for t in spec["tasks"]]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate task ids: {ids}")
    known = set(ids)
    for t in spec["tasks"]:
        bad = [d for d in t["depends_on"] if d not in known]
        if bad:
            raise ValueError(f"{t['task_id']} depends on unknown tasks {bad}")
    # Kahn topological check — a cycle means the spec can never schedule
    indeg = {i: 0 for i in ids}
    succ: dict[str, list[str]] = {i: [] for i in ids}
    for t in spec["tasks"]:
        for d in t["depends_on"]:
            indeg[t["task_id"]] += 1
            succ[d].append(t["task_id"])
    ready = [i for i, n in indeg.items() if n == 0]
    seen = 0
    while ready:
        seen += 1
        for s in succ[ready.pop()]:
            indeg[s] -= 1
            if indeg[s] == 0:
                ready.append(s)
    if seen != len(ids):
        raise ValueError("dependency cycle in DAG spec")
    json.dumps(spec)  # must be pure data


def lineage_spec(objects: Sequence[ObjectSpec], sink: SinkSpec) -> dict:
    """Column-level lineage for the migration: one record per migrated
    field, tracing ``salesforce://<Object>.<Field>`` (with its Salesforce
    wire type) through the extract→transform→load task chain to the sink
    column (with the Spark type the connector maps it to — the same
    ``ObjectSpec.spark_schema`` the staging read enforces, so lineage can
    never disagree with the actual read schema).

    This is the governance artifact a migration audit asks for ("where did
    this S3 column come from, and what touched it?") in the same offline,
    JSON-pure, scheduler-agnostic shape as ``dag_spec``: pure data, fully
    unit-testable, no live org or catalog service required. Dataset-level
    edges are included so coarse lineage consumers don't have to re-derive
    them from the column records.
    """
    columns: list[dict] = []
    datasets: list[dict] = []
    for obj in objects:
        schema = obj.spark_schema()
        target = sink.path(obj.name)
        datasets.append(
            {
                "source": f"salesforce://{obj.name}",
                "target": f"{target} ({sink.fmt})",
                "via": [
                    f"extract_{obj.name.lower()}",
                    f"transform_{obj.name.lower()}",
                    f"load_{obj.name.lower()}",
                ],
                "incremental": obj.watermark_field is not None,
            }
        )
        for (fname, ftype), sfield in zip(obj.fields, schema.fields):
            columns.append(
                {
                    "source": f"salesforce://{obj.name}.{fname}",
                    "source_type": ftype.lower(),
                    "target": f"{target}/{fname}",
                    "target_type": sfield.dataType.simpleString(),
                    "nullable": sfield.nullable,
                }
            )
    spec = {"datasets": datasets, "columns": columns}
    json.dumps(spec)  # must be pure data, like dag_spec
    return spec


def demo_atlas_objects() -> tuple[ObjectSpec, ...]:
    """The canonical demo object set for the migration DAG: one watermarked
    CDC object, one filtered full-refresh object, one small full-refresh
    lookup — the three extract shapes a real migration mixes."""
    return (
        ObjectSpec(
            name="Atlas_Order__c",
            fields=(
                ("Id", "id"),
                ("Name", "string"),
                ("Amount__c", "currency"),
                ("Status__c", "picklist"),
                ("SystemModstamp", "datetime"),
            ),
            watermark_field="SystemModstamp",
        ),
        ObjectSpec(
            name="Atlas_Customer__c",
            fields=(
                ("Id", "id"),
                ("Name", "string"),
                ("Region__c", "picklist"),
                ("IsDeleted", "boolean"),
            ),
            where="IsDeleted = false",
        ),
        ObjectSpec(
            name="Atlas_Region__c",
            fields=(("Id", "id"), ("Name", "string")),
        ),
    )


def main(argv: Sequence[str] | None = None) -> None:
    """CLI: print the declarative migration DAG spec as JSON.

    Usage: python -m atlas_migration_repo_spark.orchestration \
               [--dag-id ID] [--sink ROOT] [--schedule CRON] [--partitions N]
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--dag-id", default="atlas_migration")
    ap.add_argument("--sink", default="s3a://example-bucket/atlas")
    ap.add_argument("--schedule", default="@daily")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument(
        "--lineage",
        action="store_true",
        help="print the column-level lineage spec instead of the DAG spec",
    )
    args = ap.parse_args(argv)
    sink = SinkSpec(root=args.sink, partition_by=("load_date",))
    if args.lineage:
        print(json.dumps(lineage_spec(demo_atlas_objects(), sink), indent=2))
        return
    spec = dag_spec(
        args.dag_id,
        demo_atlas_objects(),
        sink,
        schedule=args.schedule,
        extract_partitions=args.partitions,
    )
    print(json.dumps(spec, indent=2))


if __name__ == "__main__":
    main()

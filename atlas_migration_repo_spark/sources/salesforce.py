"""Salesforce object extraction boundary (design; /root/reference/README.md:3).

The reference's purpose is migrating "ATLAS objects" from Salesforce to
cloud storage with PySpark. No fixture or credentials exist here, so this
module is the *connector boundary*: everything that can be computed and
tested offline (SOQL generation, partition predicates, schema mapping) is
real; everything that needs a live org is a thin, clearly-gated call.

Scale design: Salesforce Bulk API 2.0 paginates by PK; the extractor
splits an object into ``num_partitions`` disjoint Id/timestamp ranges so a
1000-executor cluster ingests in parallel, each task fetching its own
range — the standard JDBC-style predicated parallel read, applied to SOQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Salesforce SOAP/Bulk field type → Spark SQL type (public API docs)
SOQL_TYPE_MAP: dict[str, T.DataType] = {
    "id": T.StringType(),
    "string": T.StringType(),
    "textarea": T.StringType(),
    "picklist": T.StringType(),
    "reference": T.StringType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "currency": T.DecimalType(18, 2),
    "percent": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
}


@dataclass(frozen=True)
class ObjectSpec:
    """Declarative description of one Salesforce object to migrate."""

    name: str  # e.g. "Account" or "Atlas_Object__c"
    fields: tuple[tuple[str, str], ...]  # (field name, salesforce type)
    where: str | None = None  # optional SOQL predicate
    watermark_field: str | None = None  # e.g. "SystemModstamp" for CDC

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f, SOQL_TYPE_MAP[t.lower()], True) for f, t in self.fields]
        )

    def soql(self, since: str | None = None) -> str:
        cols = ", ".join(f for f, _ in self.fields)
        preds = []
        if self.where:
            preds.append(f"({self.where})")
        if since and self.watermark_field:
            preds.append(f"{self.watermark_field} > {since}")
        where = f" WHERE {' AND '.join(preds)}" if preds else ""
        return f"SELECT {cols} FROM {self.name}{where}"

    def partition_predicates(self, num_partitions: int) -> list[str]:
        """Disjoint Id-suffix ranges for parallel extraction. Salesforce Ids
        are base-62; bucketing on the last character gives ~uniform splits
        without knowing the keyspace."""
        alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        chunks = [alphabet[i::num_partitions] for i in range(num_partitions)]
        return [
            "(" + " OR ".join(f"Id LIKE '%{c}'" for c in chunk) + ")" for chunk in chunks
        ]


@dataclass
class SalesforceExtractor:
    """Extract → DataFrame via a JDBC bridge (e.g. a SOQL JDBC driver) or a
    Bulk-API CSV staging area. Live paths raise until configured — there is
    deliberately no mock org."""

    spark: SparkSession
    jdbc_url: str | None = None
    jdbc_options: dict[str, str] = field(default_factory=dict)
    staging_dir: str | None = None  # where Bulk API CSV exports land

    def read(self, spec: ObjectSpec, num_partitions: int = 8) -> DataFrame:
        if self.jdbc_url:
            reader = (
                self.spark.read.format("jdbc")
                .option("url", self.jdbc_url)
                .option("query", spec.soql())
                .option("numPartitions", str(num_partitions))
            )
            for k, v in self.jdbc_options.items():
                reader = reader.option(k, v)
            return reader.load()
        if self.staging_dir:
            # Bulk API 2.0 job results land as CSV in the staging dir;
            # explicit schema — no inference in core paths
            return (
                self.spark.read.schema(spec.spark_schema())
                .option("header", "true")
                .csv(f"{self.staging_dir}/{spec.name}")
            )
        raise NotImplementedError(
            "no live Salesforce connectivity in this environment: configure "
            "jdbc_url (SOQL-over-JDBC bridge) or staging_dir (Bulk API CSV export)"
        )


# -- Change Data Capture envelope (public CDC event shape) -------------------
# A Salesforce CDC event is a JSON payload whose ChangeEventHeader carries
# changeType (CREATE/UPDATE/DELETE/UNDELETE), recordIds, commitTimestamp
# (epoch millis) and entityName; changed fields ride at the top level next
# to the header. The staged-replay pipeline (operators/etl.py::
# pipeline_cdc_merge) synthesizes and consumes exactly this envelope.

def cdc_event_schema(fields: "list[tuple[str, T.DataType]]") -> T.StructType:
    """Explicit read schema for staged CDC JSON: the ChangeEventHeader
    struct plus the entity's changed-field columns (no inference — core
    ingest paths always declare schemas)."""
    header = T.StructType(
        [
            T.StructField("changeType", T.StringType()),
            T.StructField("entityName", T.StringType()),
            T.StructField("recordIds", T.ArrayType(T.StringType())),
            T.StructField("commitTimestamp", T.LongType()),
        ]
    )
    return T.StructType(
        [T.StructField("ChangeEventHeader", header)]
        + [T.StructField(name, dtype, True) for name, dtype in fields]
    )

"""ATLAS-Migration-repo, re-expressed as a PySpark-native analytics engine.

The reference (Santhosh-5521/ATLAS-Migration-repo, /root/reference/README.md:1-9)
is a capability contract: a PySpark ETL/migration engine — extract typed tabular
objects, transform with DataFrames, land columnar data on object storage
(/root/reference/README.md:3,6,7). This package implements that contract
Spark-first: every operator is declarative DataFrame/SQL so Catalyst + Tungsten
choose the physical strategy, and each operator is designed to survive a
1000-executor / 100 TB deployment (partition-aware shuffles, broadcast dims,
no driver-side materialization).

Layout
------
- ``session``    — SparkSession factory (UTC, AQE, tuned shuffle partitions)
- ``catalog``    — fixture table loader + schema declarations
- ``registry``   — the named-query registry driving __spark_entry__ and tests
- ``operators/`` — relational operators (scans, filters, joins, aggs, windows…)
- ``functions/`` — scalar/array/map/JSON function surface + UDF tier
- ``sources/``   — CSV/JSON ingestion and partitioned parquet sinks
- ``streaming/`` — Structured Streaming operators (windows, dedup, stateful)
- ``llm/``       — LLM-data-pipeline ops (dedup, similarity, text, multimodal)
"""

from atlas_migration_repo_spark.registry import QUERIES, QueryDef, query

__all__ = ["QUERIES", "QueryDef", "query"]
__version__ = "0.1.0"

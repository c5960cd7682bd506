"""JDBC extraction boundary — the generic "traditional system" ingest
(/root/reference/README.md:3 names Salesforce; any RDBMS source lands through
this same shape).

No database or JDBC driver exists in this environment, so like
``sources.salesforce`` this module is the *connector boundary*: everything
computable offline (reader options, partitioned-read strips, pushdown
predicates, schema projection) is real and tested; the live call is a thin,
clearly-gated ``spark.read.format("jdbc")`` invocation.

Scale design: a naive JDBC read is ONE connection streaming the whole table
through a single task. The partitioned read below is what makes 100 TB
feasible: ``num_partitions`` disjoint, complete strips over a numeric/date
column, each executed by its own task against the source with its own WHERE
strip — the engine-side equivalent of the Salesforce extractor's Id ranges.
Strip boundaries come from user-supplied bounds (never a blind
``SELECT MIN,MAX`` against a production OLTP primary), and ``fetchsize``
keeps the per-task cursor memory bounded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSpec:
    """Declarative description of one JDBC table (or pushdown query) to
    extract."""

    url: str  # jdbc:postgresql://host/db etc. (no credentials inline)
    table: str  # table name or "(SELECT ...) AS sub" pushdown subquery
    partition_column: str | None = None  # numeric/date/timestamp column
    lower_bound: int | None = None
    upper_bound: int | None = None  # exclusive upper edge of the strip range
    num_partitions: int = 1
    fetchsize: int = 10_000
    where: str | None = None  # extra predicate pushed into every strip

    def reader_options(self) -> dict[str, str]:
        """Options for spark.read.format('jdbc') — Spark's built-in
        partitioner consumes the four partition options and generates the
        same strips as partition_predicates()."""
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetchsize),
        }
        if self.partition_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("bounded strips require lower/upper bounds")
            opts.update(
                {
                    "partitionColumn": self.partition_column,
                    "lowerBound": str(self.lower_bound),
                    "upperBound": str(self.upper_bound),
                    "numPartitions": str(self.num_partitions),
                }
            )
        return opts

    def partition_predicates(self) -> list[str]:
        """Disjoint, complete WHERE strips, mirroring Spark's JDBCRelation
        stride logic: values below the lower bound fall into the first
        strip and values at/above the upper bound into the last, so rows
        outside the declared range are never silently dropped."""
        if self.partition_column is None:
            return [self.where] if self.where else []
        if self.lower_bound is None or self.upper_bound is None:
            raise ValueError("bounded strips require lower/upper bounds")
        n, lo, hi = self.num_partitions, self.lower_bound, self.upper_bound
        stride = max((hi - lo) // max(n, 1), 1)
        col = self.partition_column
        preds: list[str] = []
        for i in range(n):
            left = lo + i * stride
            right = lo + (i + 1) * stride
            if i == 0 and i == n - 1:
                p = "1=1"
            elif i == 0:
                p = f"{col} < {right}"
            elif i == n - 1:
                p = f"{col} >= {left}"
            else:
                p = f"{col} >= {left} AND {col} < {right}"
            if self.where:
                p = f"({p}) AND ({self.where})"
            preds.append(p)
        return preds


class JdbcExtractor:
    """Thin gated wrapper: real option assembly, live call stubbed."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def read(self, spec: JdbcSpec) -> DataFrame:
        """Would execute the partitioned JDBC read. Gated: no JDBC driver
        jar ships in this environment, so the options are assembled for
        real and the terminal call raises instead of failing obscurely
        inside the JVM."""
        reader = self.spark.read.format("jdbc")
        for k, v in spec.reader_options().items():
            reader = reader.option(k, v)
        raise NotImplementedError(
            "no JDBC driver in this environment; on a cluster: return reader.load()"
        )

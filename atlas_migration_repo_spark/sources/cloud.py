"""S3/S3A configuration surface (/root/reference/README.md:7 "Storage -
cloud object storage").

The reference lands extracted objects in cloud object storage; this
sandbox has no object store, so the runnable piece is the CONFIG surface:
one helper that sets the standard ``fs.s3a.*`` Hadoop keys on a live
session from caller-supplied arguments (never hardcoded buckets or
credentials — LEAKCHECK-clean by construction). Write paths then target
``s3a://<bucket>/...`` with zero code changes, locally they stay file://.

Scale notes baked into the defaults:
- magic committer: S3 has no atomic rename; the classic FileOutputCommitter
  does O(files) copy-delete on commit and can surface partial output. The
  S3A "magic" committer writes task output as uncompleted multipart uploads
  and completes them on job commit — atomic, zero-rename, the required
  choice for 1000-executor parquet sinks.
- connection pool sized to executor parallelism: each parquet writer task
  holds an S3 connection; the default pool (96) throttles a 32-core
  executor writing partitioned output.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def configure_s3(
    spark: SparkSession,
    bucket: str,
    *,
    endpoint: str | None = None,
    region: str | None = None,
    credentials_provider: str | None = None,
    path_style_access: bool = False,
    magic_committer: bool = True,
    max_connections: int = 256,
) -> dict[str, str]:
    """Set the standard S3A keys on ``spark`` and return what was set.

    ``bucket`` scopes committer config to one bucket (per-bucket keys are
    how S3A supports mixed-store jobs); ``credentials_provider`` is the
    fully-qualified provider class the deployment uses (instance profile,
    WebIdentity, …) — no secrets ever pass through here.
    """
    if not bucket or "/" in bucket:
        raise ValueError(f"bucket must be a bare bucket name, got {bucket!r}")
    conf: dict[str, str] = {
        "spark.hadoop.fs.s3a.connection.maximum": str(max_connections),
        "spark.hadoop.fs.s3a.path.style.access": str(path_style_access).lower(),
    }
    if endpoint:
        conf["spark.hadoop.fs.s3a.endpoint"] = endpoint
    if region:
        conf["spark.hadoop.fs.s3a.endpoint.region"] = region
    if credentials_provider:
        conf["spark.hadoop.fs.s3a.aws.credentials.provider"] = credentials_provider
    if magic_committer:
        conf.update(
            {
                "spark.hadoop.fs.s3a.committer.name": "magic",
                f"spark.hadoop.fs.s3a.bucket.{bucket}.committer.magic.enabled": "true",
                # committer BINDING classes ship in the spark-hadoop-cloud
                # module; Spark validates them at set-time, so without that
                # JAR on the classpath they can only be recommended (the
                # returned dict is the spark-defaults recipe), not applied.
                "spark.sql.sources.commitProtocolClass": (
                    "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
                ),
                "spark.sql.parquet.output.committer.class": (
                    "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
                ),
            }
        )
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            if not k.startswith("spark.sql."):
                raise  # fs.s3a.* keys are always settable; never swallow those
    return conf


def s3_path(bucket: str, key: str) -> str:
    """Canonical s3a:// URI for a bucket/key pair."""
    return f"s3a://{bucket}/{key.lstrip('/')}"

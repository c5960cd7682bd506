"""End-to-end corpus-cleaning composite (SURVEY.md §2.10 north star):
the full training-data preparation pipeline as ONE declarative plan —
quality filter → exact dedup → near-dup cluster canonicalization →
token accounting. Each stage reuses the standalone operator's exact
semantics (text_quality, dedup_exact, dedup_clusters), so the composite
is the integration test of the whole §2.10 family.

Scale shape: the quality filter is a scan-level projection (no shuffle);
exact dedup is one hash-groupBy; the near-dup canonical set comes from
dedup_clusters (inverted-index pair join + iterative min-label CC) and
is joined back as a left-semi — at 100 TB the semi join's right side is
the canonical-id list, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.llm.dedup import _JACCARD_ORACLE, dedup_clusters
from atlas_migration_repo_spark.llm.text import words
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query

_QUALITY_TAU = 0.2
_SQL_SCORE = "LEAST(1.0, LEN(w) / 64.0) * (LEN(LIST_FILTER(w, x -> LENGTH(x) > 4)) * 1.0 / LEN(w))"


@query(
    "pipeline_corpus_clean",
    oracle=f"""
    WITH RECURSIVE t AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS w FROM documents),
    qual AS (
      SELECT doc_id, text,
             CAST(LEN(w) AS INT) AS n_tokens,
             {sql_r4(_SQL_SCORE)} AS quality_score
      FROM t WHERE {_SQL_SCORE} > {_QUALITY_TAU}
    ),
    ex AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
      FROM qual
    ),
    kept AS (SELECT doc_id, n_tokens, quality_score FROM ex WHERE rn = 1),
    pairs AS ({_JACCARD_ORACLE}),
    edges AS (
      SELECT da AS a, db AS b FROM pairs
      UNION
      SELECT db AS a, da AS b FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    lab AS (SELECT a AS doc_id, LEAST(MIN(b), a) AS cluster_id FROM reach GROUP BY a)
    SELECT k.doc_id, k.n_tokens, k.quality_score
    FROM kept k LEFT JOIN lab l ON k.doc_id = l.doc_id
    WHERE COALESCE(l.cluster_id, k.doc_id) = k.doc_id
    ORDER BY k.doc_id
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning end-to-end: drop low-quality docs (composite score
    ≤ τ, same formula as text_quality), collapse exact duplicates (one
    survivor per text-MD5), then keep only near-dup cluster canonicals
    (dedup_clusters' min-doc_id representative, computed on the full
    corpus so the canonical choice is stable regardless of upstream
    filters). Returns the surviving docs with token counts and scores —
    the manifest a tokenizer run would consume."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(words())
    long_ratio = (
        F.size(F.filter(words(), lambda x: F.length(x) > 4)) * F.lit(1.0) / n_tok
    )
    score = F.least(F.lit(1.0), n_tok / F.lit(64.0)) * long_ratio
    qual = d.where(score > _QUALITY_TAU).select(
        "doc_id",
        "text",
        n_tok.cast("int").alias("n_tokens"),
        r4(score).alias("quality_score"),
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        qual.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "n_tokens", "quality_score")
    )
    canon = (
        dedup_clusters(spark, sf_dir)
        .where(F.col("is_canonical"))
        .select(F.col("doc_id").alias("cid"))
    )
    return (
        kept.join(F.broadcast(canon), kept.doc_id == F.col("cid"), "left_semi")
        .orderBy("doc_id")
    )

"""Trainable corpus quality classifier: distributed logistic regression.

The LLM family's quality stage so far is heuristic (text_quality's
composite score); production corpus pipelines train a lightweight
classifier (the fastText-style quality filter) instead. This module
implements that stage's training loop Spark-first: full-batch gradient
descent where each step is ONE distributed aggregation over the feature
table — the classic treeAggregate shape (map-side partial sums, tiny
final reduce) that scales to any corpus size, with the weight vector (4
doubles) living on the driver because it is the algorithm's sequential
state, not data.

Determinism at any topology: per-row gradient/loss terms are doubles
(deterministic expressions), each term is cast to DECIMAL(38,18) before
summing, and decimal aggregation is exact and order-independent — so the
learned weights are bit-identical under any shuffle-partition count or
executor layout (the same msum discipline catalog.msum documents, at
higher scale). Both queries are iterative, hence rows-only under the
driver gate, with loss-descent and score-consistency invariants in
tests/test_operators.py.

Demo task: predict lang == 'en' from length statistics. On the synthetic
fixture the label is (by construction) nearly independent of the
features, so the model converges toward the base rate — which is exactly
what the loss-curve query makes visible: cross-entropy falls from ln 2
at w = 0 toward the label entropy. The machinery, not the fixture AUC,
is the deliverable; a real pipeline swaps in discriminative features
(stopword ratios, LM perplexity, n-gram hits) with zero plan changes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.llm.text import SQL_LANGID_PRED, text_langid
from atlas_migration_repo_spark.registry import query

LOGREG_STEPS = 12
LOGREG_LR = 1.5
_EPS = 1e-12


def _features(d: DataFrame) -> DataFrame:
    """doc_id, binary label, and 3 length-statistic features (+bias)."""
    n_words = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("y"),
        F.log1p(F.col("n_chars")).alias("x1"),
        F.log1p(n_words).alias("x2"),
        (F.col("n_chars") / n_words).alias("x3"),
    )


def _flit(v: float) -> str:
    """Exact double literal for one-parse SQL: repr() is the shortest
    round-trip decimal and CAST(string AS DOUBLE) parses it back to the
    identical bits (java.lang.Double.parseDouble is correctly rounded),
    then constant-folds — same Literal the old F.lit(v) built."""
    return f"CAST('{v!r}' AS DOUBLE)"


def _prob_sql(w: list[float]) -> str:
    """σ(w·x) as ONE-parse SQL text, clamped for log — the expression
    tree F.lit/F.exp chains built before r10, without their ~100
    driver⇄JVM round trips per GD step (measured: the 12-step training
    loop spent 5-12 s in construction, 0.2 s executing; see
    OPTIMIZATION_r10.md)."""
    z = (
        f"({_flit(w[0])} + {_flit(w[1])} * x1 + "
        f"{_flit(w[2])} * x2 + {_flit(w[3])} * x3)"
    )
    p = f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + EXP(-{z})))"
    return f"GREATEST(LEAST({p}, {_flit(1.0 - _EPS)}), {_flit(_EPS)})"


def _prob(w: list[float]) -> Column:
    """σ(w·x) as a literal-weight column expression, clamped for log."""
    return F.expr(_prob_sql(w))


def _dsum_sql(c: str) -> str:
    """Order-independent sum: per-row round to DECIMAL(38,18), exact add."""
    return f"SUM(CAST({c} AS DECIMAL(38,18)))"


def _standardize(feat: DataFrame) -> DataFrame:
    """Z-score each feature with globally-computed moments (one decimal-
    accumulated pass → deterministic literals), the standard conditioning
    step that lets one learning rate fit all features. At corpus scale
    this is a single map-side-combined aggregation."""
    names = ("x1", "x2", "x3")
    row = feat.agg(
        *[F.expr(_dsum_sql(x)).alias(f"s_{x}") for x in names],
        *[F.expr(_dsum_sql(f"{x} * {x}")).alias(f"q_{x}") for x in names],
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = float(row["n"])
    cols = [F.col("doc_id"), F.col("y")]
    for x in names:
        mean = float(row[f"s_{x}"]) / n
        var = max(float(row[f"q_{x}"]) / n - mean * mean, _EPS)
        cols.append(((F.col(x) - F.lit(mean)) / F.lit(math.sqrt(var))).alias(x))
    return feat.select(*cols)


def train_logreg(
    feat: DataFrame, steps: int = LOGREG_STEPS, lr: float = LOGREG_LR
) -> list[tuple[int, float, list[float]]]:
    """Full-batch GD; returns [(step, mean_loss_before_step, w_after)].

    Each step is one aggregation job: 4 decimal gradient sums + the
    decimal loss sum + a count. n is constant but re-counted inside the
    same agg (free) to keep the step a single pass.
    """
    w = [0.0, 0.0, 0.0, 0.0]
    history: list[tuple[int, float, list[float]]] = []
    xs = ["CAST(1.0 AS DOUBLE)", "x1", "x2", "x3"]
    for step in range(1, steps + 1):
        # one-parse SQL per aggregate expression (same trees the
        # F.lit/F.log chains built; see _prob_sql) — construction, not
        # math: gradients/losses are bit-identical
        p = _prob_sql(w)
        err = f"({p} - y)"
        loss = (
            f"(-(y * LN({p}) + "
            f"(CAST(1.0 AS DOUBLE) - y) * LN(CAST(1.0 AS DOUBLE) - {p})))"
        )
        row = feat.agg(
            *[
                F.expr(_dsum_sql(f"{err} * {x}")).alias(f"g{k}")
                for k, x in enumerate(xs)
            ],
            F.expr(_dsum_sql(loss)).alias("l"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        n = float(row["n"])
        w = [w[k] - lr * float(row[f"g{k}"]) / n for k in range(4)]
        history.append((step, float(row["l"]) / n, list(w)))
    return history


@query("quality_logreg_train", tags=("llm",))
def quality_logreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training curve: per-step mean cross-entropy (measured before
    the step's update) and the weight vector after it. Deterministic on
    any partitioning (decimal-accumulated gradients), so the whole loss
    curve is replayable bit-for-bit."""
    feat = _standardize(_features(load(spark, sf_dir, "documents"))).persist()
    try:
        hist = train_logreg(feat)
    finally:
        feat.unpersist()
    rows = [(s, l, w[0], w[1], w[2], w[3]) for s, l, w in hist]
    return spark.createDataFrame(
        rows,
        "step INT, mean_loss DOUBLE, w_bias DOUBLE, w_log_chars DOUBLE, "
        "w_log_words DOUBLE, w_avg_span DOUBLE",
    )


@query("quality_logreg_score", tags=("llm",))
def quality_logreg_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained filter to every document: probability, the
    accept/reject decision at the 0.5 threshold, and whether it matched
    the label. Scoring is a pure literal-weight projection — one corpus
    scan, no shuffle, embarrassingly parallel at any scale."""
    feat = _standardize(_features(load(spark, sf_dir, "documents"))).persist()
    try:
        w = train_logreg(feat)[-1][2]
        p = _prob(w)
        return feat.select(
            "doc_id",
            F.col("y").cast("int").alias("label"),
            r4(p).alias("score"),
            (p >= 0.5).alias("accepted"),
            ((p >= 0.5) == (F.col("y") == 1.0)).alias("correct"),
        )
    finally:
        feat.unpersist()


def expected_initial_loss() -> float:
    """ln 2 — the w=0 cross-entropy, used by the descent invariant test."""
    return math.log(2.0)


@query(
    "quality_confusion_matrix",
    oracle=f"""
    WITH pred AS ({SQL_LANGID_PRED}),
    t AS (SELECT lang AS cls, COUNT(*) AS n_true FROM pred GROUP BY 1),
    p AS (SELECT pred_lang AS cls, COUNT(*) AS n_pred FROM pred GROUP BY 1),
    hit AS (
      SELECT lang AS cls, COUNT(*) AS tp FROM pred
      WHERE lang = pred_lang GROUP BY 1
    ),
    m AS (
      SELECT cls.cls,
             CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
             CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
             CAST(COALESCE(hit.tp, 0) AS BIGINT) AS tp
      FROM (SELECT cls FROM t UNION SELECT cls FROM p) cls
      LEFT JOIN t USING (cls) LEFT JOIN p USING (cls)
      LEFT JOIN hit USING (cls)
    ),
    pr AS (
      SELECT cls, n_true, n_pred, tp,
             CAST(tp AS DOUBLE) / NULLIF(n_pred, 0) AS pv,
             CAST(tp AS DOUBLE) / NULLIF(n_true, 0) AS rv
      FROM m
    )
    SELECT cls, n_true, n_pred, tp,
           ROUND(pv, 4) + 0.0 AS prec,
           ROUND(rv, 4) + 0.0 AS recall,
           ROUND(2.0 * pv * rv / NULLIF(pv + rv, 0.0), 4) + 0.0 AS f1
    FROM pr
    """,
)
def quality_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 of the text_langid predictor
    against the documents table's gold `lang` labels — the evaluation
    every classifier-driven corpus filter (language router, quality
    gate) reports before its threshold is trusted. Composes text_langid
    so the prediction rule is shared, not re-stated; the oracle embeds
    the same SQL (text.SQL_LANGID_PRED) for the identical reason.

    Classes are the union of observed gold and predicted labels (so a
    class that is only ever predicted — 'und' — still gets a row, with
    recall NULL on both sides via NULLIF). Precision/recall/F1 divide
    exact integers as doubles — correctly-rounded identically in both
    engines — then land on the r4 grid.

    Plan: the langid scan is one pass (pure array expressions, no
    shuffle); the three aggregates reduce to ≤|classes| rows each with
    map-side combine, and everything after operates on ≤6-row frames —
    at 100 TB this is a corpus scan plus driver-trivial metric algebra."""
    pred = text_langid(spark, sf_dir).select("lang", "pred_lang")
    t = pred.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    p = pred.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    hit = (
        pred.where(F.col("lang") == F.col("pred_lang"))
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("tp"))
    )
    classes = t.select("cls").union(p.select("cls")).distinct()
    m = (
        classes.join(t, "cls", "left")
        .join(p, "cls", "left")
        .join(hit, "cls", "left")
        .select(
            "cls",
            F.coalesce("n_true", F.lit(0)).cast("long").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
        )
    )
    pv = F.col("tp").cast("double") / F.nullif(F.col("n_pred"), F.lit(0))
    rv = F.col("tp").cast("double") / F.nullif(F.col("n_true"), F.lit(0))
    m = m.withColumn("pv", pv).withColumn("rv", rv)
    return m.select(
        "cls",
        "n_true",
        "n_pred",
        "tp",
        r4(F.col("pv")).alias("prec"),
        r4(F.col("rv")).alias("recall"),
        r4(
            2.0 * F.col("pv") * F.col("rv")
            / F.nullif(F.col("pv") + F.col("rv"), F.lit(0.0))
        ).alias("f1"),
    )

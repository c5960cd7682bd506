"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The reference names no tokenizer (its repo is the 9-line README,
/root/reference/README.md:1-9); these operators extend the LLM
training-data family (SURVEY.md §2.10) with the one text-pipeline stage the
family still lacked: *learning* a subword vocabulary from the corpus, not
just counting whitespace/regex tokens (text_tokens) or scoring text
(text_quality / text_lm_score).

Design — the classic BPE trainer re-expressed Spark-first:

1. The corpus collapses to a WORD-FREQUENCY table once (`split` + explode +
   one hash groupBy). Every later round works on this vocabulary-sized
   relation, never the corpus again — at 100 TB of text the word-freq table
   is ~10⁷ rows (megabytes per partition), so K merge rounds cost K small
   distributed jobs after ONE corpus-scale shuffle.
2. Each round: adjacent symbol pairs per word come from a `transform` over
   `slice(syms, 1, n-1)` (pure JVM higher-order functions), weighted by the
   word count, aggregated with one vocabulary-sized groupBy; the argmax
   pair is a deterministic `(count DESC, left ASC, right ASC)` top-1 —
   a one-row collect, which is the *algorithm's* sequential dependency,
   not a driver-side data loop.
3. The merge applies to every word via `F.aggregate` — a left fold with a
   one-symbol lookbehind carried in the accumulator struct, which gives
   exactly the greedy left-to-right, skip-after-merge semantics of the
   standard BPE `merge_pair` scan (e.g. rule (a,a) on "aaaa" → "aa","aa").
   No Python executes per row; the fold is whole-stage-codegen'd.
4. `localCheckpoint` after each round truncates the otherwise K-deep
   nested-fold lineage (same discipline as dedup_clusters / embed_kmeans).

Encoding then NEVER re-runs merges over the corpus: the trainer's final
state already maps every distinct word to its merged symbol sequence, so
encoding = re-tokenize + one broadcast join word→n_subtokens + a per-doc
sum. That vocabulary-join shape is what makes BPE encoding linear and
shuffle-light at corpus scale.

Both queries are deterministic (seedless) but iterative, hence rows-only
under the driver gate (__spark_entry__.py:35-37) with exact expected-merge
assertions on a hand-checkable corpus in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query

# Merge rounds learned by the trainer. Small because each round is a full
# (vocab-sized) job and the fixture vocabulary saturates quickly; a real
# 32k-vocab run changes only this constant, not the plan shape.
N_MERGES = 8

# Driver-side merge-loop gate (r10 perf): when the word-frequency table —
# the ONLY state the merge rounds touch — holds at most this many distinct
# words, it is collected once and the K merge rounds run as plain Python
# over it, replacing 3·K sequential vocabulary-sized Spark jobs (pair
# count + argmax collect + checkpoint per round) with ONE collect. This is
# how production BPE trainers work (word counts fit memory; the corpus
# does not): the corpus-scale stage — explode + word groupBy — stays
# distributed and identical, and the cutover is decided by the actual
# distinct-word count via limit(cap+1).collect(), never by corpus size.
# Above the cap (10⁷-word web-scale vocabularies) the distributed rounds
# run unchanged. Equivalence of the two paths is pinned by
# tests/test_operators.py::test_bpe_driver_path_matches_distributed.
BPE_DRIVER_VOCAB_CAP = 65_536


def _parse_driver_cap() -> int:
    """Parse SPARK_GRAFT_BPE_DRIVER_VOCAB once at import (ADVICE r10: the
    per-call re-read raised an uncaught ValueError on a malformed value);
    a value that does not parse falls back to the default loudly."""
    import os
    import warnings

    raw = os.environ.get("SPARK_GRAFT_BPE_DRIVER_VOCAB")
    if raw is None:
        return BPE_DRIVER_VOCAB_CAP
    try:
        return int(raw)
    except ValueError:
        warnings.warn(
            f"SPARK_GRAFT_BPE_DRIVER_VOCAB={raw!r} is not an integer; "
            f"using the default cap {BPE_DRIVER_VOCAB_CAP}",
            stacklevel=1,
        )
        return BPE_DRIVER_VOCAB_CAP


_BPE_DRIVER_CAP = _parse_driver_cap()


def _bpe_driver_cap() -> int:
    return _BPE_DRIVER_CAP


def _chars(word: Column) -> Column:
    """Word → array of single-character symbols (initial BPE alphabet)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )


def _word_freq(d: DataFrame) -> DataFrame:
    """(word, cnt, syms) — the corpus collapsed to word frequencies.

    The ONLY corpus-scale stage: explode + one hash groupBy with map-side
    partial counts. Everything after is vocabulary-sized.
    """
    w = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return w.withColumn("syms", _chars(F.col("word")))


def _pair_counts(wf: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count (JVM-side)."""
    pairs = wf.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS l, syms[i + 1] AS r))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").alias("c")
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b via a fold.

    Accumulator = (out array, one-symbol lookbehind). When the lookbehind
    is `a` and the current symbol is `b`, the merged token is emitted and
    the lookbehind clears — so the merged token cannot immediately re-merge
    as the RIGHT side within the same round, exactly the skip-2 scan of the
    reference BPE algorithm.
    """
    merged = a + b
    init = F.struct(
        F.expr("CAST(array() AS ARRAY<STRING>)").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("prev")),
            )
            .when(
                (acc["prev"] == F.lit(a)) & (x == F.lit(b)),
                F.struct(
                    F.array_append(acc["out"], F.lit(merged)).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["out"], acc["prev"]).alias("out"),
                    x.alias("prev"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.array_append(acc["out"], acc["prev"])
        )

    return F.aggregate(syms, init, step, finish)


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Driver twin of _apply_merge: greedy left-to-right (a, b) → a+b with
    the one-symbol lookbehind that clears after a merge — the identical
    skip-after-merge scan, expressed over a Python list."""
    out: list[str] = []
    prev: str | None = None
    for x in syms:
        if prev is None:
            prev = x
        elif prev == a and x == b:
            out.append(a + b)
            prev = None
        else:
            out.append(prev)
            prev = x
    if prev is not None:
        out.append(prev)
    return out


def _train_bpe_driver(
    vocab: list[tuple[str, int, list[str]]], n_merges: int
) -> list[tuple[str, str, int]]:
    """The K merge rounds over a collected word-frequency table. Pure
    integer pair counts; the argmax tie-break (count DESC, l ASC, r ASC)
    compares Python strings, whose code-point order equals Spark's
    UTF8String byte order (UTF-8 preserves code-point order), so the
    learned sequence is identical to the distributed rounds'. Mutates
    ``vocab`` rows in place to their merged symbol lists."""
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for _w, cnt, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for row in vocab:
            row[2][:] = _merge_word(row[2], a, b)
    return merges


def train_bpe(
    wf: DataFrame, n_merges: int = N_MERGES
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` merges; return (merges, final word table).

    merges = [(left, right, weighted_pair_count), ...] in learned order.
    The per-round one-row collect is the algorithm's inherent sequential
    step (each merge depends on the previous round's symbols); all heavy
    work stays distributed — except when the vocabulary itself fits the
    driver (limit-probed against BPE_DRIVER_VOCAB_CAP), where the rounds
    run as plain Python over the collected word table: one job instead of
    3·K sequential vocabulary-sized jobs, identical merges (equivalence
    pinned in tests). The corpus-scale stage (the word-frequency groupBy
    feeding ``wf``) is unchanged either way.
    """
    cap = _bpe_driver_cap()
    if cap > 0:
        # Probe and collect in ONE job, but ship only (word, cnt) — the
        # syms array is list(word) by construction (_chars splits at
        # codepoints, exactly Python's str iteration), so an above-cap
        # vocabulary no longer pays a cap-sized collect of symbol arrays
        # it then discards (ADVICE r10).
        head = wf.select("word", "cnt").limit(cap + 1).collect()
        if len(head) <= cap:
            vocab = [
                (r["word"], int(r["cnt"]), list(r["word"])) for r in head
            ]
            merges = _train_bpe_driver(vocab, n_merges)
            spark = wf.sparkSession
            out = spark.createDataFrame(
                [(w, c, s) for w, c, s in vocab],
                "word STRING, cnt BIGINT, syms ARRAY<STRING>",
            )
            return merges, out
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(wf)
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((a, b, c))
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), a, b)).localCheckpoint()
    return merges, wf


@query("tokenizer_bpe_merges", tags=("llm",))
def tokenizer_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over the documents corpus: rank, the
    merged symbol pair, and the weighted pair frequency that won the round.

    Deterministic (argmax tie-broken lexicographically) but iterative, so
    rows-only under the driver gate; exact merges are asserted on a
    hand-checked corpus in tests/test_operators.py::test_bpe_known_merges.
    """
    merges, _ = train_bpe(_word_freq(load(spark, sf_dir, "documents")))
    rows = [
        (i + 1, a, b, a + b, c) for i, (a, b, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


@query("tokenizer_bpe_encode", tags=("llm",))
def tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the learned merges and report per-doc
    token statistics: whitespace words, BPE subword tokens, characters, and
    the chars-per-token compression ratio.

    Scale shape: the trainer's final word table IS the encoder — each
    distinct word already carries its merged segmentation, so encoding is
    re-tokenize + vocabulary join + per-doc sum. The join strategy is
    left to AQE: a 32k-entry vocabulary broadcasts, a 10⁷-word table (at
    the edge of broadcast memory) falls back to a shuffled hash join —
    either way vocab ≪ corpus and the corpus is touched twice total
    (train word-count, encode join); merges never re-run over documents.
    """
    docs = load(spark, sf_dir, "documents")
    _, wf = train_bpe(_word_freq(docs))
    vocab = wf.select(
        "word",
        F.size("syms").alias("n_sub"),
        F.length("word").cast("long").alias("wchars"),
    )
    tokens = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.length("word") > 0)
    return (
        tokens.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_tokens_bpe"),
            F.sum("wchars").alias("n_word_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens_bpe",
            "n_word_chars",
            r4(F.col("n_word_chars") / F.col("n_tokens_bpe")).alias(
                "chars_per_token"
            ),
        )
    )


OOV_VOCAB_K = 16  # top-K word vocabulary (fixture: half the 31-word corpus)


@query(
    "tokenizer_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w
        ORDER BY c DESC, w LIMIT {OOV_VOCAB_K}
      )
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS INT) AS n_tokens,
           CAST(COUNT(CASE WHEN v.w IS NULL THEN 1 END) AS INT) AS n_oov,
           {sql_r4('COUNT(CASE WHEN v.w IS NULL THEN 1 END) * 1.0 / COUNT(*)')}
             AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY t.doc_id
    """,
)
def tokenizer_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage report: per-document out-of-vocabulary rate
    against the corpus's own top-K word vocabulary — the sizing probe a
    tokenizer pipeline runs BEFORE committing to a vocab budget (how much
    of the corpus does a K-entry table actually cover?).

    Plan: ONE corpus tokenize + vocab-bounded groupBy builds the frequency
    table; the top-K cut is a deterministic (count DESC, word ASC) limit
    whose K rows collect to the driver (the established vocab-sized
    collect, kilobytes at any corpus size) and return as an IN-list
    literal, so the per-document pass is a pure array filter in
    whole-stage codegen with NO second shuffle — at 100 TB: two corpus
    scans, one vocab-sized exchange, zero joins. The integer n_oov /
    n_tokens ratio divides once, so both engines branch identically."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    freq = (
        d.select(F.explode(w).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(OOV_VOCAB_K)
    )
    vocab = [r["w"] for r in freq.collect()]
    # staged projections (shingles() perf contract, text.py): inline, the
    # oov filter-fold over the IN-list ran twice per row (n_oov + rate)
    wa = F.col("w")
    n_oov = F.size(F.filter(wa, lambda x: ~x.isin(*vocab)))
    return (
        d.select("doc_id", w.alias("w"))
        .select("doc_id", F.size(wa).alias("n_tokens"), n_oov.alias("n_oov"))
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            r4(F.col("n_oov") * F.lit(1.0) / F.col("n_tokens")).alias("oov_rate"),
        )
    )

"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10 +
north-star text ops: language-ID, quality scoring, token counting,
fingerprinting).

Everything here is built-in array/string expressions — tokenization,
shingling, and fingerprinting run inside whole-stage codegen with NO
shuffle until the final aggregate. At 100 TB each of these is a single
scan + one low-cardinality aggregate (vocab- or lang-bounded), which is
as cheap as a distributed text pass can be.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from atlas_migration_repo_spark.catalog import load, r4
from atlas_migration_repo_spark.oracle import sql_r4
from atlas_migration_repo_spark.registry import query

def words() -> Column:
    """Tokenized text column (built lazily — Column construction needs an
    active SparkContext, so no module-level constants)."""
    return F.split(F.col("text"), " ")

# word-level 3-gram shingles, entirely array-side (no explode/shuffle).
#
# PERF CONTRACT (r10): pass an ATTRIBUTE column (a projected `w`, via
# `tokenized()`), never `words()` directly. Spark's higher-order-function
# lambdas are evaluated interpreted, and an expression referenced inside
# the lambda body is RE-EVALUATED per array element per reference — with
# `words()` inline that is 3 fresh `split(text)` calls per shingle
# (~300 per 100-word doc; measured 9× the whole explode's cost at sf0.1).
# With an attribute the references are array lookups. The projection
# boundary survives the optimizer: CollapseProject keeps an alias that a
# consumer references more than once unless it is trivially cheap, and
# every consumer here references `w` at least four times.
def shingles(words: Column) -> Column:
    # The coalesce carries NO runtime branch (the CASE is already
    # never-null: a null `words` makes the WHEN predicate null, which
    # routes to the ELSE []) — it exists to make the STATIC nullability
    # false. Without it, a downstream filter over a shingle-derived
    # column (jaccard ≥ τ, score > τ, …) lets InferFiltersFromConstraints
    # push `isnotnull(size(<this whole expression>))` below the projection
    # that computes it, re-evaluating the shingle transform INLINE in a
    # Filter — with the split no longer attribute-bound, i.e. the exact
    # interpreted re-split pathology the perf contract above exists to
    # prevent (measured r10: +1.5 s on dedup_ngram_jaccard's verify stage
    # alone, both broadcast sides paying an inline-split shingle pass).
    # Non-nullable ⇒ the inferred isnotnull is trivially true ⇒ pruned.
    return F.coalesce(
        F.when(
            F.size(words) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
        F.array().cast("array<string>"),
    )


def tokenized(d: DataFrame, *keep: str) -> DataFrame:
    """(keep..., w = words()) with the split in its OWN projection, so
    downstream higher-order lambdas bind `w` as an attribute — see the
    shingles() perf contract above."""
    return d.select(*keep, words().alias("w"))


def shingle_rows(d: DataFrame) -> DataFrame:
    """(doc_id, shingle): per-doc DISTINCT word-3-gram shingles, exploded —
    the shared relation behind the dedup/decontamination family, built via
    tokenized() so the shingle lambda binds an attribute."""
    return tokenized(d, "doc_id").select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("w")))).alias("shingle")
    )


def shingle_counts(d: DataFrame, alias: str = "n") -> DataFrame:
    """(doc_id, n): per-doc distinct-shingle count, computed array-side per
    row (no explode, no shuffle), attribute-bound like shingle_rows."""
    return tokenized(d, "doc_id").select(
        "doc_id", F.size(F.array_distinct(shingles(F.col("w")))).alias(alias)
    )


SQL_SHINGLES = (
    "LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w)-2), i -> w[i]||' '||w[i+1]||' '||w[i+2])"
)


@query(
    "text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_r4('AVG(n_chars)')} AS avg_chars,
           {sql_r4("AVG(LEN(STRING_SPLIT(text, ' ')))")} AS avg_tokens,
           CAST(COUNT(CASE WHEN LENGTH(text) = n_chars THEN 1 END) AS BIGINT) AS n_chars_valid
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats; n_chars_valid doubles as a golden check
    (fixture guarantees n_chars == length(text))."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r4(F.avg("n_chars")).alias("avg_chars"),
        r4(F.avg(F.size(words()))).alias("avg_tokens"),
        F.count_if(F.length("text") == F.col("n_chars")).alias("n_chars_valid"),
    )


@query(
    "text_wordcount",
    oracle="""
    SELECT lang, word, COUNT(*) AS n
    FROM (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
    GROUP BY lang, word
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic wordcount per language (vocab-bounded output)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(words()).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_ngram",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(text, ' ')) AS word,
             GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS pos
      FROM documents
    )
    SELECT bigram, COUNT(*) AS n
    FROM (SELECT word || ' ' || LEAD(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
          FROM t)
    WHERE bigram IS NOT NULL
    GROUP BY bigram
    """,
)
def text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global bigram counts. Spark side builds bigrams array-side (zero
    pre-aggregate shuffle); the oracle uses the lead-window formulation."""
    d = load(spark, sf_dir, "documents")
    w = F.col("w")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        tokenized(d)  # attribute-bound lambda: see shingles() perf contract
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_tfidf",
    tags=("bench",),
    oracle=f"""
    WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
    tf  AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
    df  AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
    n   AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS score
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, {sql_r4('score')} AS tfidf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, word) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit count-based TF-IDF (not HashingTF — exact and auditable),
    top-3 terms per document. df join is vocab-sized → broadcast."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words()).alias("word"))
    # The corpus is tokenized, shuffled, and aggregated exactly ONCE:
    # tf materializes through localCheckpoint, so the df branch, the
    # scoring join, and the window all read the SAME computed relation
    # instead of duplicating the scan+explode+shuffle subtree. (Catalyst
    # ReuseExchange does not fire across these two consumers — verified
    # against executed plans — so the old "df derived from tf" shape
    # re-tokenized the corpus twice; this was the worst headline scaler,
    # 3.1x wall at 10x data, VERDICT r6 #4. With the checkpoint: ~2.4x,
    # measured interleaved at sf1.) No repartition before the aggregate:
    # the groupBy's partial (map-side) hash agg collapses repeated
    # (doc, word) tokens where they are scanned, so the ONE tf exchange
    # carries distinct pairs, not raw token rows (2.3× fewer rows at
    # sf0.1: 270,704 tokens → ≤116,231 pairs; guide §2.3 aggregate-
    # before-shuffle — the previous doc_id repartition shuffled every
    # token row and then still lost its partitioning at the checkpoint
    # boundary, so the window re-exchanged anyway). The checkpoint is
    # eager, so bench timings include it — the fn is constructed fresh
    # inside every timed run.
    tf = (
        tok.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("word").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "word", r4(F.col("score")).alias("tfidf"))
    )


_STOP = {
    "de": ("der", "die", "und", "das", "ist"),
    "en": ("the", "of", "and", "to", "in"),
    "es": ("el", "los", "que", "una", "como"),
    "fr": ("le", "les", "et", "une", "dans"),
    "zh": ("的", "是", "了", "在", "我"),
}


def _sql_hits(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in _STOP[lang])
    return f"LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ({inlist})))"


# One SELECT producing (doc_id, lang, pred_lang, hits) — shared verbatim by
# the text_langid oracle and quality_confusion_matrix's, so the prediction
# rule the metrics are computed against can never drift from the predictor.
SQL_LANGID_PRED = f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_sql_hits('de')} AS h_de, {_sql_hits('en')} AS h_en,
             {_sql_hits('es')} AS h_es, {_sql_hits('fr')} AS h_fr,
             {_sql_hits('zh')} AS h_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN GREATEST(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
                WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
                WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
                WHEN h_fr = GREATEST(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           CAST(GREATEST(h_de, h_en, h_es, h_fr, h_zh) AS INT) AS hits
    FROM scored
"""


@query("text_langid", oracle=SQL_LANGID_PRED)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram heuristic family): count hits
    against per-language stopword sets, argmax with alphabetical tie-break,
    'und' when no evidence. Pure array expressions — no Python, no shuffle."""
    d = load(spark, sf_dir, "documents")
    def stop_hits(stops: tuple[str, ...]) -> Column:
        # closure factory, NOT a default-arg lambda: a 2-parameter lambda
        # would be misread by F.filter as its (element, index) form
        return F.size(F.filter(words(), lambda w: w.isin(*stops)))

    hits = {lang: stop_hits(stops) for lang, stops in _STOP.items()}
    mx = F.greatest(*hits.values())
    pred = F.when(mx == 0, "und")
    for lang in sorted(_STOP):  # alphabetical first-match == oracle CASE order
        pred = pred.when(hits[lang] == mx, lang)
    return d.select(
        "doc_id",
        "lang",
        pred.otherwise("zh").alias("pred_lang"),
        mx.cast("int").alias("hits"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, STRING_SPLIT(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(LEN(w) AS INT) AS n_tokens,
           {sql_r4('CAST(n_chars AS DOUBLE) / LEN(w)')} AS avg_token_span,
           {sql_r4('LEN(LIST_FILTER(w, x -> LENGTH(x) > 4)) * 1.0 / LEN(w)')} AS long_token_ratio,
           {sql_r4('LEAST(1.0, LEN(w) / 64.0) * (LEN(LIST_FILTER(w, x -> LENGTH(x) > 4)) * 1.0 / LEN(w))')} AS quality_score
    FROM t
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: token count, mean token span, long-token
    ratio, and a composite score ∈ [0,1] (length-saturating × lexical
    richness) — the filter-stage primitive of a training-data pipeline."""
    d = load(spark, sf_dir, "documents")
    # staged projections (shingles() perf contract): tokenize once; inline,
    # every n_tok/long_ratio reference re-ran the split and the filter fold
    w = F.col("w")
    n_tok = F.col("_n")
    long_ratio = F.col("_long")
    return (
        tokenized(d, "doc_id", "n_chars")
        .select(
            "doc_id",
            "n_chars",
            F.size(w).alias("_n"),
            (F.size(F.filter(w, lambda x: F.length(x) > 4)) * F.lit(1.0) / F.size(w)).alias("_long"),
        )
        .select(
            "doc_id",
            n_tok.cast("int").alias("n_tokens"),
            r4(F.col("n_chars").cast("double") / n_tok).alias("avg_token_span"),
            r4(long_ratio).alias("long_token_ratio"),
            r4(F.least(F.lit(1.0), n_tok / F.lit(64.0)) * long_ratio).alias("quality_score"),
        )
    )


@query(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS ws_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+')) AS INT) AS re_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_pair_estimate
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex word pieces,
    and the chars/4 budget heuristic."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(words()).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+|[0-9]+")).cast("int").alias("re_tokens"),
        F.ceil(F.length("text") / 4.0).alias("byte_pair_estimate"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    SELECT doc_id,
           array_to_string(
             LIST_SORT(LIST_TRANSFORM({SQL_SHINGLES}, s -> MD5(s)))[1:3], ','
           ) AS fingerprint
    FROM t
    WHERE LEN(w) >= 3
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: the 3 lexicographically
    smallest MD5s over word-3-gram shingles, serialized to one CSV string
    (hex digests — no float formatting involved) so the driver's scalar
    hash gate can compare it. Near-identical docs share fingerprint
    entries → groupable at scale without pairwise compares."""
    d = load(spark, sf_dir, "documents")
    sh = shingles(F.col("w"))
    return (
        tokenized(d, "doc_id")
        .where(F.size(F.col("w")) >= 3)
        .select(
            "doc_id",
            F.array_join(
                F.slice(F.array_sort(F.transform(sh, F.md5)), 1, 3), ","
            ).alias("fingerprint"),
        )
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    s AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM t WHERE LEN(w) >= 3)
    SELECT doc_id,
           CAST(LEN(sh) AS INT) AS n_ngrams,
           CAST(LEN(list_distinct(sh)) AS INT) AS n_unique,
           {sql_r4('1.0 - LEN(list_distinct(sh)) * 1.0 / LEN(sh)')} AS rep_ratio
    FROM s
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score: fraction of word-3-grams that are
    repeats (1 - unique/total) — the boilerplate/spam signal used to
    drop template-generated text from training corpora. Pure array
    expressions per row; no shuffle at any scale."""
    d = load(spark, sf_dir, "documents")
    # three projection steps: w, then the shingle array, then the sizes —
    # each alias is multiply-referenced downstream, so CollapseProject
    # keeps every boundary and the shingle array builds ONCE per row
    # (inline, `sh` was re-evaluated once per size/ratio reference)
    n = F.col("n_ngrams")
    u = F.col("n_unique")
    return (
        tokenized(d, "doc_id")
        .where(F.size(F.col("w")) >= 3)
        .select("doc_id", shingles(F.col("w")).alias("sh"))
        .select(
            "doc_id",
            F.size("sh").alias("n_ngrams"),
            F.size(F.array_distinct("sh")).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_unique",
            r4(F.lit(1.0) - u * F.lit(1.0) / n).alias("rep_ratio"),
        )
    )


@query(
    "text_zipf",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS freq
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
      GROUP BY word
    ),
    r AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank,
             MAX(freq) OVER () AS max_freq
      FROM wc
    )
    SELECT CAST(rank AS INT) AS rank, word, freq,
           {sql_r4('freq * rank * 1.0 / max_freq')} AS zipf_c
    FROM r WHERE rank <= 30
    """,
)
def text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency profile: top-30 tokens with rank·freq/max_freq
    — flat zipf_c ≈ Zipfian corpus, a distribution-drift check for
    corpus ingestion. The vocab-sized aggregate is one shuffle; the
    ranking window runs on the tiny vocab table in a single partition."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(words()).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "word")
    return (
        wc.withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("max_freq", F.max("freq").over(Window.partitionBy()))
        .where(F.col("rank") <= 30)
        .select(
            "rank",
            "word",
            "freq",
            r4(F.col("freq") * F.col("rank") * 1.0 / F.col("max_freq")).alias("zipf_c"),
        )
    )


_EMAIL_RE = "[a-z0-9#]+@[a-z.]+"
_PHONE_RE = "555-[0-9]+"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH notes AS (
      SELECT c_custkey,
             'contact ' || LOWER(c_name) || '@example.com or ' ||
             LOWER(c_name) || '@corp.net phone 555-' ||
             CAST(c_custkey AS VARCHAR) AS note
      FROM customer
    )
    SELECT c_custkey,
           REGEXP_REPLACE(REGEXP_REPLACE(note, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted,
           CAST(LEN(REGEXP_EXTRACT_ALL(note, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(note, '{_PHONE_RE}')) AS INT) AS n_phones
    FROM notes
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the scrubbing step a training-data (or CCPA/GDPR
    migration) pipeline runs before text leaves the trust boundary:
    regex-mask emails and phone-like tokens, and count what was masked
    per record for the audit log. The fixture corpus carries no PII, so
    the note column is synthesized deterministically from customer rows;
    the redaction itself is regexp_replace in whole-stage codegen — a
    pure scan at any scale. Patterns are shared verbatim with the oracle
    (ASCII-only, identical in Java and RE2 regex dialects)."""
    c = load(spark, sf_dir, "customer")
    note = F.concat(
        F.lit("contact "),
        F.lower("c_name"),
        F.lit("@example.com or "),
        F.lower("c_name"),
        F.lit("@corp.net phone 555-"),
        F.col("c_custkey").cast("string"),
    )
    return c.select(
        "c_custkey",
        F.regexp_replace(
            F.regexp_replace(note, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        F.regexp_count(note, F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(note, F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
    )


@query(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g') AS norm_text,
           CAST(LEN(STRING_SPLIT(REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g'),
                                 ' ')) AS INT) AS n_tokens
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — lowercase, trim, collapse internal
    whitespace — the first stage of every dedup/quality pipeline (hash
    and shingle comparisons are only meaningful post-normalization).
    Pure string expressions in whole-stage codegen; a Unicode NFC pass
    would slot in here as one more JVM-side function at identical
    cost shape."""
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).alias("n_tokens"),
    )


@query(
    "text_lm_score",
    oracle="""
    WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
    ug AS (SELECT word, COUNT(*) AS cnt FROM tok GROUP BY word),
    n AS (SELECT COUNT(*) AS n_total FROM tok),
    scored AS (
      SELECT t.doc_id,
             FLOOR(LN(CAST(ug.cnt AS DOUBLE) / CAST(n.n_total AS DOUBLE)) * 10000 + 0.5) AS q
      FROM tok t JOIN ug USING (word) CROSS JOIN n
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           (CAST(SUM(CAST(q AS DECIMAL(30,8))) AS DOUBLE) / 10000.0)
             / CAST(COUNT(*) AS DOUBLE) AS lm_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (CCNet-style perplexity
    filtering, reduced to its distributable core): train corpus unigram
    probabilities in one pass, then score each document by mean token
    log-probability. High-|logprob| docs are gibberish/outliers; the
    score feeds the quality-filter stage of a training-data pipeline.

    Scale shape: the LM itself is the vocab-sized unigram table —
    broadcast to every executor, so scoring is scan + broadcast-join +
    per-doc agg (one shuffle on doc_id). Per-token log-probs are
    floor-quantized to 4dp (the shared-grid trick, see ts_ewma) so the
    per-doc mean is an EXACT decimal sum — order-independent, hence
    deterministic under any partitioning, which is what makes the score
    reproducible run-to-run at 100 TB."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words()).alias("word"))
    ug = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    n = tok.agg(F.count(F.lit(1)).alias("n_total"))
    logp = F.log(F.col("cnt").cast("double") / F.col("n_total").cast("double"))
    scored = (
        tok.join(F.broadcast(ug), "word")
        .crossJoin(F.broadcast(n))
        .select("doc_id", F.floor(logp * 10000 + 0.5).alias("q"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        # r11: q is an exact long — the decimal detour added nothing;
        # Σq as a long is exact (|Σq| ≤ n_tokens·~2e5 ≪ 2^63) and
        # long→double is the identical correctly-rounded conversion.
        (
            (F.sum("q").cast("double") / 10000.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("lm_logprob"),
    )


@query(
    "text_lm_bigram",
    oracle="""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
           FROM t, UNNEST(GENERATE_SERIES(1, LEN(w)-1)) AS s(i)),
    c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS cnt1 FROM bg GROUP BY w1),
    scored AS (
      SELECT bg.doc_id,
             FLOOR(LN(CAST(cnt2 AS DOUBLE) / CAST(cnt1 AS DOUBLE)) * 10000 + 0.5) AS q
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           (CAST(SUM(CAST(q AS DECIMAL(30,8))) AS DOUBLE) / 10000.0)
             / CAST(COUNT(*) AS DOUBLE) AS lm_bigram_logprob
    FROM scored GROUP BY doc_id
    """,
)
def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional LM score: mean log P(w_i | w_{i-1}) per doc
    with probabilities estimated from the corpus itself — the
    next-fidelity step after text_lm_score's unigram model (repetitive
    or shuffled-word gibberish scores low here even when its unigrams
    look normal). Same scale shape: both count tables are vocab²-bounded
    → broadcast; per-token log-probs floor-quantize to the shared 4dp
    grid so the per-doc mean is an exact, order-independent decimal sum."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", words().alias("w"))
    bg = t.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
    ).select(
        "doc_id",
        F.element_at("w", F.col("i")).alias("w1"),
        F.element_at("w", F.col("i") + 1).alias("w2"),
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("cnt1"))
    logp = F.log(F.col("cnt2").cast("double") / F.col("cnt1").cast("double"))
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .select("doc_id", F.floor(logp * 10000 + 0.5).alias("q"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # r11: long sum of the exact quantized q (see text_lm_score)
        (
            (F.sum("q").cast("double") / 10000.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("lm_bigram_logprob"),
    )


@query(
    "text_bm25",
    oracle=f"""
    WITH tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
    tf  AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
    dl  AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
    df  AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n   AS (SELECT COUNT(*) AS n_docs, AVG(LEN(STRING_SPLIT(text, ' '))) AS avgdl
            FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             LN((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / n.avgdl)) AS score
      FROM tf JOIN df USING (word) JOIN dl USING (doc_id) CROSS JOIN n
    )
    SELECT doc_id, word, {sql_r4('score')} AS bm25
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, word) AS rn
          FROM scored)
    WHERE rn <= 3
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring (k1=1.2, b=0.75, Lucene-form idf), top-3
    terms per document — the ranking-function upgrade of text_tfidf with
    document-length normalization. Same single-tokenize scale shape as
    tfidf: df derives from the (doc,word) tf relation so ReuseExchange
    shares its shuffle, and both the df table (vocab-sized) and the
    (n_docs, avgdl) scalar broadcast to the score join. Ranking compares
    raw doubles (bit-identical in both engines); rounding happens only on
    the emitted score."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words()).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    dl = d.select("doc_id", F.size(words()).alias("dl"))
    n = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(words())).alias("avgdl"),
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    score = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "word", r4(F.col("score")).alias("bm25"))
    )


@query(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
      FROM documents
    )
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ARRAY_TO_STRING((LIST_SORT(LIST(doc_id)))[1:5], ',') AS posting_head
    FROM tok GROUP BY word
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index construction: word → document frequency + the head
    of its sorted posting list (serialized, first 5 doc ids) — the core
    IR structure behind keyword search and the candidate generator for
    retrieval pipelines. Postings build as one distinct + one groupBy
    (both map-side combining); slicing the sorted array keeps the emitted
    row scalar-only for the hash gate. At corpus scale posting lists
    shard by word hash, and the head-slice pattern is exactly how a
    sampled index preview stays bounded."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words()).alias("word")).distinct()
    return tok.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 5), ","
        ).alias("posting_head"),
    )


@query(
    "text_char_trigrams",
    oracle="""
    WITH tri AS (
      SELECT lang,
             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LENGTH(text) - 2, 0)),
                                   i -> SUBSTR(text, i, 3))) AS tg
      FROM documents
    ),
    counted AS (
      SELECT lang, tg, COUNT(*) AS n
      FROM tri GROUP BY lang, tg
    )
    SELECT lang, tg, n
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY n DESC, tg) AS rn
          FROM counted)
    WHERE rn <= 10
    """,
)
def text_char_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language profiles: the top-10 most frequent
    3-char substrings per language — the classic n-gram-profile
    representation language identifiers rank against (text_langid's
    stopword heuristic is the word-level shortcut; this is the
    character-level model it approximates). Trigrams explode array-side
    from a sequence of offsets (no Python), counts combine map-side, and
    the per-lang top-10 uses the WindowGroupLimit rank-filter shape."""
    d = load(spark, sf_dir, "documents")
    tg = d.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 2, F.lit(0))),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("tg"),
    )
    counted = tg.groupBy("lang", "tg").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "tg")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("lang", "tg", "n")
    )


@query(
    "text_word_pmi",
    oracle=f"""
    WITH tok AS (SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
                 FROM documents),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM tok),
    uni AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    pair AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c12
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2
      HAVING COUNT(*) >= 20
    )
    SELECT w1, w2, CAST(c12 AS BIGINT) AS n_docs_both,
           {sql_r4('LN((c12 * 1.0 * n.nd) / (ua.c * 1.0 * ub.c))')} AS pmi
    FROM pair JOIN uni ua ON pair.w1 = ua.w
              JOIN uni ub ON pair.w2 = ub.w
              CROSS JOIN n
    """,
)
def text_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between word pairs co-occurring in
    documents (support ≥ 20): PMI = ln(P(a,b)/(P(a)P(b))) over document
    incidence — the collocation detector that separates 'genuinely
    paired' terms from merely frequent ones, and the statistical core of
    phrase mining. Same doc-keyed pair join as basket_affinity (bounded
    by per-doc vocabulary, never corpus²); unigram counts broadcast;
    every probability divides exact integer counts so the single LN is
    the only float op."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words()).alias("w")).distinct()
    nd = tok.agg(F.countDistinct("doc_id").alias("nd"))
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    a = tok.select(F.col("doc_id").alias("k"), F.col("w").alias("w1"))
    b = tok.select(F.col("doc_id").alias("k"), F.col("w").alias("w2"))
    pair = (
        a.join(b, "k")
        .where(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= 20)
    )
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    return (
        pair.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("n_docs_both"),
            r4(
                F.log(
                    (F.col("c12") * 1.0 * F.col("nd"))
                    / (F.col("ca") * 1.0 * F.col("cb"))
                )
            ).alias("pmi"),
        )
    )

@query(
    "text_js_divergence",
    oracle=f"""
    WITH cnt AS (
      SELECT lang, w, COUNT(*) AS c
      FROM (SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      GROUP BY lang, w
    ),
    tot AS (SELECT lang, SUM(c) AS n FROM cnt GROUP BY lang),
    pairs AS (
      SELECT a.lang AS la, b.lang AS lb
      FROM (SELECT DISTINCT lang FROM documents) a
      JOIN (SELECT DISTINCT lang FROM documents) b ON a.lang < b.lang
    ),
    pair_counts AS (
      SELECT p.la, p.lb, cnt.w,
             SUM(CASE WHEN cnt.lang = p.la THEN cnt.c ELSE 0 END) AS ca,
             SUM(CASE WHEN cnt.lang = p.lb THEN cnt.c ELSE 0 END) AS cb
      FROM pairs p JOIN cnt ON cnt.lang = p.la OR cnt.lang = p.lb
      GROUP BY p.la, p.lb, cnt.w
    ),
    terms AS (
      SELECT pc.la, pc.lb,
             (pc.ca * 1.0 / ta.n) AS pa,
             (pc.cb * 1.0 / tb.n) AS pb
      FROM pair_counts pc
      JOIN tot ta ON ta.lang = pc.la
      JOIN tot tb ON tb.lang = pc.lb
    ),
    quantized AS (
      SELECT la, lb,
             CAST(FLOOR((CASE WHEN pa > 0 THEN pa * LN(2.0 * pa / (pa + pb)) ELSE 0.0 END
                       + CASE WHEN pb > 0 THEN pb * LN(2.0 * pb / (pa + pb)) ELSE 0.0 END)
                        * 100000000 + 0.5) AS BIGINT) AS tq
      FROM terms
    )
    SELECT la AS lang_a, lb AS lang_b,
           (CAST(SUM(CAST(tq AS DECIMAL(30,8))) AS DOUBLE) / 100000000.0) / 2.0
             AS jsd_nats
    FROM quantized GROUP BY la, lb
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between language unigram distributions —
    the symmetric, bounded distribution distance corpus-mixing pipelines
    use to measure domain gaps (corpus_mix_weights' quality signal). Per
    word: p·ln(2p/(p+q)) + q·ln(2q/(p+q)), halved after summing. Each
    term is computed from identical doubles in both engines (integer
    count ratios), then floor-quantized to the 1e-8 grid so the per-pair
    sum is an exact, order-independent decimal — the lm_score
    discipline applied to a 500-term reduction. Pair×word counts come
    from one conditional aggregate over a broadcast 10-row pair table;
    nothing materializes the vocab² cross."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("lang", F.explode(words()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    langs = d.select("lang").distinct()
    pairs = (
        langs.select(F.col("lang").alias("la"))
        .join(langs.select(F.col("lang").alias("lb")), F.col("la") < F.col("lb"))
    )
    pair_counts = (
        F.broadcast(pairs)
        .join(cnt, (cnt.lang == F.col("la")) | (cnt.lang == F.col("lb")))
        .groupBy("la", "lb", "w")
        .agg(
            F.sum(F.when(F.col("lang") == F.col("la"), F.col("c")).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("lang") == F.col("lb"), F.col("c")).otherwise(0)).alias("cb"),
        )
    )
    ta = tot.select(F.col("lang").alias("la"), F.col("n").alias("na"))
    tb = tot.select(F.col("lang").alias("lb"), F.col("n").alias("nb"))
    terms = (
        pair_counts.join(F.broadcast(ta), "la")
        .join(F.broadcast(tb), "lb")
        .select(
            "la",
            "lb",
            (F.col("ca") * 1.0 / F.col("na")).alias("pa"),
            (F.col("cb") * 1.0 / F.col("nb")).alias("pb"),
        )
    )
    term = (
        F.when(F.col("pa") > 0, F.col("pa") * F.log(2.0 * F.col("pa") / (F.col("pa") + F.col("pb")))).otherwise(0.0)
        + F.when(F.col("pb") > 0, F.col("pb") * F.log(2.0 * F.col("pb") / (F.col("pa") + F.col("pb")))).otherwise(0.0)
    )
    quantized = terms.select(
        "la", "lb", F.floor(term * 100000000 + 0.5).cast("bigint").alias("tq")
    )
    return quantized.groupBy(
        F.col("la").alias("lang_a"), F.col("lb").alias("lang_b")
    ).agg(
        # r11: tq is an exact long (≤ ~1.4e8 per term; Σ ≪ 2^63) — plain
        # long sum, identical correctly-rounded double.
        ((F.sum("tq").cast("double") / 100000000.0) / 2.0).alias("jsd_nats")
    )


_GOPHER_STOPS = ("the", "a", "of", "to", "in")  # fixture-calibrated stop set
_GOPHER_SQL_STOPS = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)


@query(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(LEN(w) AS INT) AS n_words,
           {sql_r4('LIST_AGGREGATE(LIST_TRANSFORM(w, x -> LENGTH(x) * 1.0), '
                   "'sum') / LEN(w)")} AS mean_word_len,
           {sql_r4('LEN(LIST_FILTER(w, x -> x IN (' + _GOPHER_SQL_STOPS + '))) '
                   '* 1.0 / LEN(w)')} AS stop_frac,
           {sql_r4('LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w)')} AS distinct_frac,
           (LEN(w) BETWEEN 10 AND 5000
            AND LIST_AGGREGATE(LIST_TRANSFORM(w, x -> LENGTH(x) * 1.0), 'sum')
                / LEN(w) BETWEEN 3.0 AND 10.0
            AND LEN(LIST_FILTER(w, x -> x IN ({_GOPHER_SQL_STOPS})))
                * 1.0 / LEN(w) >= 0.02
            AND LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w) >= 0.2) AS gopher_keep
    FROM t
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (the published Rae et al. 2021
    repetition/quality heuristics, bounds calibrated to the fixture's
    31-word vocabulary): word-count window, mean-word-length window,
    minimum stop-word fraction, minimum lexical diversity, and the
    composite keep decision a pretraining pipeline filters on.

    All four signals are pure array expressions over the tokenized text —
    per-row folds in whole-stage codegen, zero shuffles at any corpus
    size; at 100 TB this is a single scan whose output feeds the corpus
    funnel (pipeline_corpus_clean) as one more cheap stage.

    Determinism: every ratio is an exact-integer numerator/denominator
    divided once (the per-row fold order is the array order in BOTH
    engines), so the keep-decision comparisons branch on bit-identical
    doubles; r4 rounding is display-only."""
    # staged projections (shingles() perf contract): tokenize once, fold
    # each signal once, then round/branch on the attributes — inline, the
    # split and the aggregate/filter folds re-ran per reference (~15
    # evaluations per row across the outputs and the keep decision).
    # Values are unchanged: keep branches on the RAW signals, r4 stays
    # display-only.
    w = F.col("w")
    mean_len = (
        F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x) * 1.0)
        / F.size(w)
    )
    stop_frac = (
        F.size(F.filter(w, lambda x: x.isin(*_GOPHER_STOPS))) * F.lit(1.0) / F.size(w)
    )
    distinct_frac = F.size(F.array_distinct(w)) * F.lit(1.0) / F.size(w)
    keep = (
        F.col("n_words").between(10, 5000)
        & F.col("_mean").between(3.0, 10.0)
        & (F.col("_stop") >= 0.02)
        & (F.col("_dist") >= 0.2)
    )
    return (
        tokenized(load(spark, sf_dir, "documents"), "doc_id")
        .select(
            "doc_id",
            F.size(w).alias("n_words"),
            mean_len.alias("_mean"),
            stop_frac.alias("_stop"),
            distinct_frac.alias("_dist"),
        )
        .select(
            "doc_id",
            "n_words",
            r4(F.col("_mean")).alias("mean_word_len"),
            r4(F.col("_stop")).alias("stop_frac"),
            r4(F.col("_dist")).alias("distinct_frac"),
            keep.alias("gopher_keep"),
        )
    )

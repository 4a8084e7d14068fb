"""Text-analysis operators for training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language
identification, quality scoring, token counting, and document
fingerprinting over a ``documents(doc_id, text, ...)`` table. Everything
here is built-in-function Spark (JVM, whole-stage codegen) — no Python
in the hot path — and aggregates/derives per row, so it parallelizes
embarrassingly at any scale.

Each operator has an exactly-equivalent DuckDB oracle; expressions are
written with identical operation order on both sides so results are
bit-deterministic (integer-derived double divisions, md5 hex digests,
regex token counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: BPE-ish tokenizer: word runs or single non-space punctuation — the
#: standard pre-tokenization regex shape used before byte-pair merges.
TOKEN_REGEX = r"\w+|[^\w\s]"

#: Tiny multilingual stopword table for the language-ID heuristic.
_LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("the", "and", "of", "is")),
    ("es", ("el", "la", "los", "que")),
    ("de", ("der", "die", "und", "nicht")),
    ("fr", ("le", "les", "et", "est")),
)

_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def _ws_tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (split on space runs)."""
    return F.split(F.trim(col), " +")


def _space_doubled(col: Column) -> Column:
    """Lower/trim text, double every space run, pad with one space.

    Every whitespace token ends up flanked by its own spaces, so a
    pattern ``" (w1|w2) "`` matches a token exactly once with no
    overlap between adjacent tokens — letting ``regexp_count`` replace
    an interpreted higher-order ``filter(tokens, isin)`` (lambda
    functions are CodegenFallback and ~40x slower here; the regex stays
    inside whole-stage codegen).
    """
    return F.concat(
        F.lit(" "), F.regexp_replace(F.lower(F.trim(col)), " +", "  "), F.lit(" ")
    )


def _marker_count(col: Column, markers: tuple[str, ...]) -> Column:
    """Number of whitespace tokens of ``col`` equal to any marker word."""
    return F.regexp_count(_space_doubled(col), F.lit(" (" + "|".join(markers) + ") "))


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document counting stats: chars, whitespace tokens, BPE-ish
    tokens, punctuation chars, mean token length."""
    text = F.col("text")
    toks = _ws_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    return docs.select(
        "doc_id",
        n_chars.alias("chars"),
        n_tokens.alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).alias("bpe_tokens"),
        F.length(F.regexp_replace(text, r"[\w\s]", "")).alias("punct_chars"),
        (n_chars.cast("double") / n_tokens).alias("avg_token_len"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic (deterministic CASE chain).

    Counts per-language marker stopwords among the whitespace tokens and
    picks the first language (in fixed order) with the strictly highest
    count; ``und`` (undetermined) when no marker appears.

    The argmax is a single ``array_max`` over ``struct(count, -index,
    lang)`` entries plus an ``(0, 1, 'und')`` sentinel: highest count
    wins, ties go to the earliest language, all-zero goes to the
    sentinel — and each per-language count expression is evaluated
    exactly once per row (a ``greatest`` + CASE chain re-evaluates every
    count ~3x).
    """
    text = F.col("text")
    entries = [
        F.struct(
            _marker_count(text, markers).alias("cnt"),
            F.lit(-idx).alias("prio"),
            F.lit(lang).alias("lang"),
        )
        for idx, (lang, markers) in enumerate(_LANG_MARKERS)
    ]
    entries.append(
        F.struct(F.lit(0).alias("cnt"), F.lit(1).alias("prio"), F.lit("und").alias("lang"))
    )
    best = F.array_max(F.array(*entries))
    return docs.select("doc_id", best.getField("lang").alias("lang_guess"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality in [0,1]: favors mid-length docs with
    low punctuation density and a sane stopword ratio (the classic
    pre-training corpus filters, each a cheap columnar expression)."""
    text = F.col("text")
    toks = _ws_tokens(F.lower(text))
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    n_stop = _marker_count(text, _STOPWORDS).cast("double")
    n_punct = F.length(F.regexp_replace(text, r"[\w\s]", "")).cast("double")
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tokens
    length_term = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of case/punctuation-normalized text.

    The normalized form (lowercase, non-alphanumeric runs collapsed to
    single spaces) makes the fingerprint stable under formatting-only
    edits — the key for normalized exact-dedup.
    """
    normalized = F.trim(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " ")
    )
    return docs.select("doc_id", F.md5(normalized).alias("fp"))


# ---------------------------------------------------------------------------
# registry entries (documents table)
# ---------------------------------------------------------------------------


@register(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS chars,
           len(string_split_regex(trim(text), ' +')) AS ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS bpe_tokens,
           length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS punct_chars,
           CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), ' +')) AS avg_token_len
    FROM documents
    """,
    description="token counting / char stats (north-star text analysis)",
    covers=("N-text",),
)
def text_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents"))


def _lang_oracle() -> str:
    count_exprs = {
        lang: (
            "len(list_filter(string_split_regex(trim(lower(text)), ' +'), "
            f"t -> list_contains({list(markers)}, t)))"
        )
        for lang, markers in _LANG_MARKERS
    }
    best = "greatest(" + ", ".join(count_exprs.values()) + ")"
    case = "'und'"
    for lang, _ in reversed(_LANG_MARKERS):
        case = (
            f"CASE WHEN {count_exprs[lang]} = best AND best > 0 "
            f"THEN '{lang}' ELSE {case} END"
        )
    return f"""
    WITH scored AS (SELECT doc_id, text, {best} AS best FROM documents)
    SELECT doc_id, {case} AS lang_guess FROM scored
    """


@register(
    "lang_id",
    oracle=_lang_oracle(),
    description="stopword-marker language identification heuristic",
    covers=("N-text",),
)
def lang_id_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'),
                t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
             / CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) AS stop_ratio,
           0.4 * least(CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) / 64.0, 1.0)
           + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
                      / CAST(length(text) AS DOUBLE))
           + 0.3 * least(CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'),
                t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
             / CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) * 4.0, 1.0) AS quality
    FROM documents
    """,
    description="pre-training quality filter heuristic (length, punct "
    "density, stopword ratio)",
    covers=("N-text",),
)
def quality_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
    FROM documents
    """,
    description="normalized md5 content fingerprint",
    covers=("N-text",),
)
def fingerprint_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


def token_frequencies(docs: DataFrame, k: int = 100) -> DataFrame:
    """Top-k corpus token frequencies — the vocabulary-building pass.

    Explode whitespace tokens, hash-aggregate counts, take the global
    top-k via ORDER BY + LIMIT (``TakeOrderedAndProject`` — partial
    top-k per partition, no global sort). One shuffle on the token;
    at 100 TB the partial map-side counts collapse the long tail before
    it ever crosses the network, and skewed stop-tokens stay single-key
    cheap because the payload is just a count.
    """
    toks = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " +")
        ).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(k)
    )


@register(
    "token_frequencies",
    oracle="""
    SELECT tok, COUNT(*) AS freq
    FROM (
      SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
      FROM documents
    )
    GROUP BY tok
    ORDER BY freq DESC, tok ASC
    LIMIT 100
    """,
    description="corpus vocabulary statistics: global top-100 token "
    "frequencies (explode -> hash agg -> top-k, no global sort)",
    covers=("N-text",),
)
def token_frequencies_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_frequencies(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

#: Dialect-portable PII patterns: every construct here (classes, +, {m,n},
#: alternation) parses identically under Java regex (Spark) and RE2-style
#: (DuckDB) — no backrefs, no lookaround, so both engines match the same
#: spans. Email stays deliberately simple (the training-data scrub goal is
#: recall on obvious PII, not RFC 5322).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact obvious PII (emails, phone-shaped numbers).

    Adds per-doc match counts and a ``clean_text`` column with matches
    replaced by type tags — the standard pre-training scrub pass. All
    regexp work is JVM-side columnar (regexp_count / regexp_replace);
    no Python per row, stateless, so it composes with any partitioning
    at any corpus size.
    """
    t = F.col(text_col)
    cleaned = F.regexp_replace(
        F.regexp_replace(t, F.lit(PII_EMAIL), F.lit("<EMAIL>")),
        F.lit(PII_PHONE),
        F.lit("<PHONE>"),
    )
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phones"),
        F.length(cleaned).alias("clean_chars"),
        F.md5(cleaned).alias("clean_fp"),
    )


@register(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones,
           length(regexp_replace(regexp_replace(text, '{PII_EMAIL}',
                  '<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g'))
             AS clean_chars,
           md5(regexp_replace(regexp_replace(text, '{PII_EMAIL}',
               '<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g')) AS clean_fp
    FROM documents
    """,
    description="training-pipeline op: PII detection + redaction (emails, "
    "phone shapes) with per-doc counts and a fingerprint of the redacted "
    "text proving both engines produce byte-identical scrubbed output; "
    "dialect-portable regexes, all JVM-side columnar",
    covers=("N-text",),
)
def pii_scrub_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pii_scrub(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# TF-IDF term salience
# ---------------------------------------------------------------------------


def top_terms(docs: DataFrame, min_token_len: int = 4) -> DataFrame:
    """Most salient term per document by a TF-IDF-style score.

    Score = tf / (df + 1): term frequency within the doc, discounted by
    corpus document frequency. The classic ``tf * ln(N/df)`` is avoided
    deliberately — ``ln`` is libm-dependent and not correctly-rounded,
    so cross-engine results could differ in the last ulp and flip
    rankings; the rational surrogate is exact integer arithmetic until
    one final division, bit-identical everywhere, and induces the same
    ordering for fixed N. Short tokens (< ``min_token_len`` chars) are
    dropped as stopword-ish noise.

    Scale: explode -> two hash aggregates (per-doc-term tf, per-term df)
    -> broadcast-friendly df join -> per-doc top-1 via ROW_NUMBER. The
    df table is vocabulary-sized (zipf-bounded), far smaller than the
    corpus; the window partitions by doc_id — no global sort.
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("tok"),
    ).filter(F.length("tok") >= min_token_len)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = (
        toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        "tf",
        "df",
        (F.col("tf").cast("double") / (F.col("df") + F.lit(1))).alias("score"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("tok").alias("top_term"), "tf", "df", "score")
    )


@register(
    "top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
      FROM documents
    ), toks4 AS (
      SELECT doc_id, tok FROM toks WHERE length(tok) >= 4
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks4 GROUP BY doc_id, tok
    ), df AS (
      SELECT tok, COUNT(*) AS df
      FROM (SELECT DISTINCT doc_id, tok FROM toks4) GROUP BY tok
    ), scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) / (df.df + 1) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) / (df.df + 1) DESC, tf.tok ASC
             ) AS rn
      FROM tf JOIN df USING (tok)
    )
    SELECT doc_id, tok AS top_term, tf, df, score
    FROM scored WHERE rn = 1
    """,
    description="TF-IDF-style term salience: most distinctive term per "
    "document via tf/(df+1) — a deterministic rational idf surrogate "
    "(ln is libm-dependent across engines); explode -> tf/df aggregates "
    "-> vocabulary join -> per-doc top-1 window",
    covers=("N-text",),
)
def top_terms_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_terms(load_table(spark, sf_dir, "documents"))

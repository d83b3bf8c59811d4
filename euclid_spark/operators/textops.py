"""Text analysis operators (SURVEY.md §2.C7-C10) over documents.

All pure column expressions (regex + array higher-order functions): no
UDFs, whole-stage codegen end-to-end, embarrassingly parallel per row —
the shape that scales linearly to 100 TB of documents. Every operator is
oracle-checked: the heuristics are defined only with functions both
engines implement identically (md5, regex classes, array filters).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from euclid_spark.functions.hashing import DIGEST_PRIME
from euclid_spark.functions.text import normalized_text, words

# BPE-ish tokenizer: letter runs, digit runs, single punctuation marks.
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Synthetic marker-word language heuristic (vocabulary-calibrated; the
# operator shape — per-language evidence scores + argmax — is what a real
# n-gram language ID computes).
LANG_MARKERS = {
    "de": ("scan", "merge", "part"),
    "en": ("the", "fast", "key"),
    "es": ("order", "sort", "table"),
    "fr": ("window", "small", "hash"),
    "zh": ("join", "data", "row"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _nonempty_words() -> F.Column:
    return F.filter(words("text"), lambda w: w != "")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — whitespace and regex token counts per document."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(_nonempty_words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).alias(
            "n_re_tokens"
        ),
        F.length("text").alias("n_chars_actual"),
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — quality scoring from length / alpha-ratio / stopword-ratio,
    the standard pre-training corpus filter signals."""
    docs = _docs(spark, sf_dir)
    ws = _nonempty_words()
    n_words = F.size(ws)
    alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", "")) / F.length("text")
    stop_n = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = F.when(n_words > 0, stop_n / n_words).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.5) * alpha
        + F.lit(0.3) * (1 - stop_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), n_words / F.lit(50.0))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(alpha, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 — marker-word language scores + deterministic argmax
    (ties resolve in lexicographic language order)."""
    docs = _docs(spark, sf_dir)
    ws = _nonempty_words()
    def _score(markers: tuple[str, ...]) -> F.Column:
        # nb: F.filter lambdas must take exactly one arg (a second would
        # be interpreted as the element index)
        return F.size(F.filter(ws, lambda w: w.isin(*markers)))

    scores = {lang: _score(m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    pred = F.lit(None).cast("string")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    out = docs.select(
        "doc_id",
        "lang",
        *[scores[lg].alias(f"s_{lg}") for lg in langs],
        pred.alias("predicted"),
    )
    return out.withColumn("label_match", F.col("predicted") == F.col("lang"))


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 — document fingerprints: full md5 of the canonical text, a
    64-bit hex prefix, and a rolling polynomial hash over the word
    sequence (order-sensitive, unlike the digest in functions/hashing —
    two docs with the same words in different order differ here)."""
    docs = _docs(spark, sf_dir)
    norm = normalized_text("text")
    word_h = lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")  # noqa: E731
    rolling = F.aggregate(
        _nonempty_words(),
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_h(w)) % DIGEST_PRIME,
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.substring(F.md5(norm), 1, 16).alias("fp64"),
        rolling.alias("fp_rolling"),
    )


TFIDF_TOP = 5


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 — top TF-IDF terms per document. Term frequencies and document
    frequencies are two hash aggregates over the exploded words; the
    corpus size joins in as a broadcast single-row aggregate (no
    driver-side count()). Ranking uses the rounded score + term tiebreak
    so the oracle reproduces the exact row set."""
    docs = _docs(spark, sf_dir)
    w = docs.select("doc_id", F.explode(_nonempty_words()).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = w.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.agg(F.count("*").alias("nd"))
    scored = (
        tf.join(df_, "word")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("nd") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= TFIDF_TOP)
        .select("doc_id", "word", "tf", "tfidf", "rn")
    )


# PII patterns, kept to syntax Java regex and RE2 (DuckDB) treat
# identically: no backrefs, no lookaround.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_IDRUN = r"\d{6,}"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 — PII scrubbing, the compliance pass every training corpus
    runs before release: emails, IPv4 literals, and long digit runs
    (ids/phones) are replaced with typed placeholder tags, counts
    reported per doc. Pure regexp column expressions — codegen'd,
    per-row parallel; the md5 of the redacted text rides along so the
    oracle verifies the FULL output without hauling text through the
    compare."""
    docs = _docs(spark, sf_dir)
    low = F.lower(F.col("text"))
    red = F.regexp_replace(low, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_IDRUN, "<ID>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(PII_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(low, F.lit(PII_IPV4), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(low, F.lit(PII_IDRUN), 0)).alias("n_idrun"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    )


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 — unigram language-model score, the cheap perplexity filter
    used for corpus curation: mean log p(word) under the corpus's own
    unigram distribution (docs full of rare/garbage tokens score low).
    Two hash aggregates (corpus frequencies, per-doc means) + one join
    shuffled on `word` — word frequency is Zipf-skewed, but the join
    carries only (word, logp), and the per-doc mean re-shuffles on
    doc_id, so no single reducer sees a hot word's full document list."""
    docs = _docs(spark, sf_dir)
    w = docs.select("doc_id", F.explode(_nonempty_words()).alias("word"))
    tot = w.agg(F.count("*").alias("total"))
    freq = (
        w.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .select("word", F.log(F.col("cnt") / F.col("total")).alias("logp"))
    )
    return (
        w.join(freq, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.avg("logp"), 4).alias("avg_logprob"),
        )
    )


QUERIES = {
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "text_fingerprint": text_fingerprint,
    "text_tfidf_topk": text_tfidf_topk,
    "text_pii_redact": text_pii_redact,
    "text_unigram_logprob": text_unigram_logprob,
}

_WS = r"list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '), w -> w <> '')"
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


def _marker_score(lang: str) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({_WS}, w -> list_contains({lst}, w)))"


_LANGS = sorted(LANG_MARKERS)
_BEST = "greatest(" + ", ".join(_marker_score(lg) for lg in _LANGS) + ")"
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN {_marker_score(lg)} = {_BEST} THEN '{lg}'" for lg in _LANGS
    )
    + " END"
)

ORACLES = {
    "text_pii_redact": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text), '{PII_EMAIL}'))
                    AS INT) AS n_email,
               CAST(len(regexp_extract_all(lower(text), '{PII_IPV4}'))
                    AS INT) AS n_ipv4,
               CAST(len(regexp_extract_all(lower(text), '{PII_IDRUN}'))
                    AS INT) AS n_idrun,
               md5(regexp_replace(regexp_replace(regexp_replace(lower(text),
                   '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_IPV4}', '<IP>', 'g'),
                   '{PII_IDRUN}', '<ID>', 'g')) AS redacted_md5,
               CAST(length(regexp_replace(regexp_replace(regexp_replace(
                   lower(text),
                   '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_IPV4}', '<IP>', 'g'),
                   '{PII_IDRUN}', '<ID>', 'g')) AS INT) AS redacted_len
        FROM documents
    """,
    "text_unigram_logprob": f"""
        WITH w AS (SELECT doc_id, unnest({_WS}) AS word FROM documents),
        tot AS (SELECT COUNT(*) AS total FROM w),
        freq AS (
            SELECT word, ln(COUNT(*) * 1.0 / (SELECT total FROM tot)) AS logp
            FROM w GROUP BY word
        )
        SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               ROUND(AVG(f.logp), 4) AS avg_logprob
        FROM w JOIN freq f ON w.word = f.word
        GROUP BY w.doc_id
    """,
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({_WS}) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS INT)
                   AS n_re_tokens,
               CAST(length(text) AS INT) AS n_chars_actual
        FROM documents
    """,
    "text_quality_score": f"""
        SELECT doc_id,
               CAST(len({_WS}) AS INT) AS n_words,
               ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                     * 1.0 / length(text), 4) AS alpha_ratio,
               ROUND(CASE WHEN len({_WS}) > 0
                     THEN len(list_filter({_WS}, w -> list_contains({_STOP_LIST}, w)))
                          * 1.0 / len({_WS}) ELSE 0.0 END, 4) AS stop_ratio,
               ROUND(0.5 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                            * 1.0 / length(text))
                   + 0.3 * (1 - CASE WHEN len({_WS}) > 0
                     THEN len(list_filter({_WS}, w -> list_contains({_STOP_LIST}, w)))
                          * 1.0 / len({_WS}) ELSE 0.0 END)
                   + 0.2 * least(1.0, len({_WS}) / 50.0), 4) AS quality
        FROM documents
    """,
    "text_lang_id": f"""
        SELECT doc_id, lang,
               {", ".join(f"CAST({_marker_score(lg)} AS INT) AS s_{lg}" for lg in _LANGS)},
               {_PRED} AS predicted,
               {_PRED} = lang AS label_match
        FROM documents
    """,
    "text_tfidf_topk": f"""
        WITH w AS (
            SELECT doc_id, unnest({_WS}) AS word FROM documents
        ),
        tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
               FROM w GROUP BY 1, 2),
        dfreq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
        nd AS (SELECT COUNT(*) AS nd FROM documents),
        scored AS (
            SELECT doc_id, word, tf,
                   ROUND(tf * ln(nd * 1.0 / df), 4) AS tfidf
            FROM tf JOIN dfreq USING (word) CROSS JOIN nd
        )
        SELECT doc_id, word, tf, tfidf, rn FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, word) AS INT) AS rn
            FROM scored
        ) WHERE rn <= {TFIDF_TOP}
    """,
    "text_fingerprint": rf"""
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
               substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 16)
                   AS fp64,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform({_WS},
                           w -> CAST('0x' || substr(md5(w), 1, 8) AS BIGINT))),
                   (acc, h) -> (acc * 31 + h) % {DIGEST_PRIME}) AS fp_rolling
        FROM documents
    """,
}

"""Text analysis operators for training-data pipelines.

Beyond the reference surface: language ID (stopword-list n-gram heuristic),
quality scoring, token counting and document fingerprinting — each a pure
built-in Column composition (JVM-side, codegen-friendly) with an exact
ANSI-SQL twin for the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import (
    content_fingerprint,
    mean_word_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)

# Tiny function-word lists per language — the classic cheap language-ID
# heuristic (score = fraction of tokens in each list, argmax wins). Shared
# constant between the Spark expression and the generated oracle SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "para", "por", "con"],
}


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences ("packs"):
    documents are hash-bucketed, deterministically ordered within each
    bucket (portable md5 hash, then id), and chunked by exclusive running
    token count — ``pack_id = floor(prev_cum / budget)`` within the bucket.
    The chunking step every LLM-pretraining pipeline runs before example
    construction.

    Semantics: running-total packing, not optimal bin packing — a document
    straddling the boundary overflows its pack by at most its own length
    (pipelines truncate or shift at materialization). Deterministic across
    runs, engines and partitionings.

    Scale: the only shuffle is the bucket partition; parallelism =
    ``n_buckets`` (raise it so one bucket ≈ one task), no global sort.
    Output: id, token_col, bucket, pack_id, cum_tokens.
    """
    from pyspark.sql import Window

    from ..functions import hash64

    h = hash64(F.col(id_col).cast("string"), seed="pack")
    base = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias(token_col),
        h.alias("__h"),
        F.pmod(h, F.lit(n_buckets)).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.asc("__h"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return base.select(
        id_col,
        token_col,
        "bucket",
        F.floor((cum - F.col(token_col)) / F.lit(budget)).alias("pack_id"),
        cum.alias("cum_tokens"),
    )


def _contains_any(words: list[str]):
    # NB: F.filter treats a two-parameter lambda as (element, index) — a
    # `lambda t, w=words:` default would be silently overridden by the index
    # column. Close over the list via this factory instead.
    return lambda t: t.isin(words)


def lang_scores(col: Column) -> dict[str, Column]:
    toks = tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, _contains_any(words))) / n
        for lang, words in LANG_STOPWORDS.items()
    }


def detect_lang(col: Column, min_score: float = 0.05) -> Column:
    """Argmax over per-language stopword hit-rates; 'und' (undetermined) when
    no language clears ``min_score``. Ties broken by fixed language order —
    the oracle SQL uses the same CASE chain, so ties agree."""
    scores = lang_scores(col)
    # explicit argmax (fixed order en > de > fr > es on ties): lang wins when
    # it clears the threshold, strictly beats every earlier language, and
    # beats-or-ties every later one.
    langs = list(scores)
    result = F.lit("und")
    for lang in reversed(langs):
        prior = [l for l in langs if langs.index(l) < langs.index(lang)]
        is_max = scores[lang] > F.lit(min_score)
        for p in prior:
            is_max = is_max & (scores[lang] > scores[p])
        for q in langs[langs.index(lang) + 1 :]:
            is_max = is_max & (scores[lang] >= scores[q])
        result = F.when(is_max, F.lit(lang)).otherwise(result)
    return result


# PII patterns shared between the Spark expressions and the oracle SQL.
# Regex subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround; alternation preference and
# \b word boundaries agree between the engines. Replacement order matters
# (email before IP so the address never partially matches a later pattern).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}|\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts on the raw text (pre-redaction), each a
    single JVM ``regexp_count`` — the audit side of the scrubber."""
    return {
        name: F.regexp_count(col, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def scrub_pii(col: Column) -> Column:
    """Redact PII spans in pattern order. Pure chained ``regexp_replace``
    (codegen, no Python) — at 100 TB this is a map-only pass, no shuffle."""
    out = col
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document: total bigrams, the most
    frequent bigram's share, and the distinct-token ratio. High top-bigram
    share / low distinct ratio → boilerplate or degenerate text.

    Scale: bigrams explode → groupBy(doc, bigram) → groupBy(doc) — two
    shuffles on uniform keys (doc id dominates the key), no all-pairs and no
    global ordering. The distinct-token ratio is a pure scalar expression
    (``array_distinct``) computed in the scan stage.

    Ratios are canonicalized with FLOOR(x·10⁶)/10⁶ rather than ROUND: counts
    per document are often powers of two, putting m/2^k exactly on a .5
    rounding boundary where Spark (HALF_UP) and DuckDB (nearbyint) disagree;
    floor of the identical double is bit-reproducible.
    """
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        toks.alias("__w"),
        (
            F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("__distinct_ratio"),
    )
    bigrams = base.select(
        id_col,
        "__distinct_ratio",
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.concat(
                        F.element_at("__w", i), F.lit(" "), F.element_at("__w", i + 1)
                    ),
                ),
            ).otherwise(F.array(F.lit("")))
        ).alias("__bigram"),
    )
    per_bigram = bigrams.groupBy(id_col, "__distinct_ratio", "__bigram").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    flo = lambda c: F.floor(c * 1000000) / F.lit(1000000.0)  # noqa: E731
    return (
        per_bigram.groupBy(id_col, "__distinct_ratio")
        .agg(
            F.sum(F.when(F.col("__bigram") != "", F.col("__cnt"))
                  .otherwise(F.lit(0))).alias("n_bigrams"),
            F.max(F.when(F.col("__bigram") != "", F.col("__cnt"))
                  .otherwise(F.lit(0))).alias("__top"),
        )
        .select(
            id_col,
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            flo(
                F.col("__top") / F.greatest(F.col("n_bigrams"), F.lit(1))
            ).alias("top_bigram_share"),
            flo(F.col("__distinct_ratio")).alias("distinct_token_ratio"),
        )
    )


def profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document text profile: token count, punctuation ratio, stopword
    ratio, mean word length, quality score, content fingerprint, detected
    language."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_word_len(t), 6).alias("mean_word_len"),
        quality_score(t).alias("quality"),
        content_fingerprint(t).alias("fingerprint"),
        detect_lang(t).alias("lang_guess"),
    )

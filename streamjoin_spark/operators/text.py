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

"""Portable scalar-function layer.

The reference defines no scalar functions of its own — everything from
``pyspark.sql.functions`` passes through (SURVEY.md §2 'Scalar functions').
This engine keeps that pass-through and adds a small set of *portable*
expression builders used by the corpus operators (dedup / similarity / text
analysis). "Portable" means each builder has a bit-identical ANSI-SQL twin
that DuckDB evaluates, so every operator built from them is verifiable by
the driver's differential oracle.

All builders return ``pyspark.sql.Column`` trees of built-in JVM functions —
no Python UDFs — so they stay inside whole-stage codegen and vectorize at
scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "hash64",
    "tokens",
    "token_count",
    "normalize_text",
    "content_fingerprint",
    "punct_ratio",
    "stopword_ratio",
    "mean_word_len",
    "quality_score",
    "STOPWORDS_EN",
]


def hash64(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit hash as a signed long, identical across engines:
    ``conv(substr(md5(seed || x), 1, 15), 16, 10)`` — DuckDB twin:
    ``('0x' || substr(md5(seed || x), 1, 15))::BIGINT``.

    15 hex digits = 60 bits, always positive, no signed-overflow divergence.
    Used for minhash/LSH where the *hash values themselves* must agree with
    the oracle; hot paths that don't need cross-engine parity should prefer
    ``F.xxhash64`` (one JVM op, no string round-trip).
    """
    payload = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Canonical text form: lowercase, trim, collapse whitespace. DuckDB twin
    uses the same regexp_replace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def content_fingerprint(col: Column) -> Column:
    """Document fingerprint = md5 of normalized text (exact-dup key)."""
    return F.md5(normalize_text(col))


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty-safe. DuckDB twin:
    ``regexp_split_to_array(trim(lower(x)), '\\s+')``."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (the 'BPE-ish' upper bound is ~1.3× this for
    English; we report the exact whitespace count so the oracle matches)."""
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


# GPT-2-style pre-tokenizer, simplified to the engine-portable core: a
# letter run, a digit run, or a single non-alnum-non-space char each count
# as one token — the standard cheap proxy for BPE token budgets (BPE then
# splits rare words further; this is the pre-merge floor).
SUBWORD_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_token_count(col: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex — pure codegen
    (``regexp_count``). DuckDB twin:
    ``len(regexp_extract_all(x, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))``
    (RE2 spells the class with [:space:]; match semantics verified
    identical)."""
    return F.regexp_count(col, F.lit(SUBWORD_RE)).cast("long")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


STOPWORDS_EN = (
    "the a an and or of to in is are was were be been it this that for on with as at by "
).split()


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords — high values indicate natural
    prose, very low values indicate tables/code/noise."""
    sw = stopwords or STOPWORDS_EN
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards moderate length, prose
    punctuation levels, and a natural stopword ratio. Deliberately simple and
    closed-form so the oracle can evaluate the identical expression."""
    n = token_count(col).cast("double")
    length_term = F.least(n / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    return F.round((length_term + punct_term + sw_term) / 3, 4)


def to_ddl(schema) -> str:
    """StructType → DDL string (reference utils.toDDL, elzyme/utils.py:4,
    which round-trips through the JVM DataType): PySpark's native
    ``StructType.toDDL`` where available, else composed from field
    simpleStrings."""
    if hasattr(schema, "toDDL"):
        return schema.toDDL()
    return ",".join(
        f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields
    )

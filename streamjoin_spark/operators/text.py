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


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding token-window chunking: split each document into overlapping
    chunks of ``window`` whitespace tokens every ``stride`` tokens — the
    example-construction step of a pretraining pipeline (context windows
    with overlap so no span is seen only at a boundary). The trailing
    partial chunk is kept.

    Output: id, ``chunk_idx`` (0-based), ``chunk_tokens`` (length of this
    chunk), ``chunk_text`` (tokens re-joined by single spaces; real
    pipelines would carry token ids — same shape).

    Scale posture: pure codegen — tokenize, ``sequence`` of start offsets,
    one ``explode`` (fan-out ~n_tokens/stride per doc, data-proportional),
    ``slice`` + ``array_join``; no shuffle at all, no Python. ANSI note:
    ``sequence(0, n-1, stride)`` is guarded by the empty-text filter so the
    start never exceeds the stop.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = tokens(F.col(text_col))
    base = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            toks.alias("__toks"),
            F.size(toks).alias("__n"),
        )
    )
    start = F.explode(
        F.sequence(F.lit(0), F.col("__n") - F.lit(1), F.lit(stride))
    ).alias("__start")
    return base.select(id_col, "__toks", "__n", start).select(
        id_col,
        (F.col("__start") / F.lit(stride)).cast("long").alias("chunk_idx"),
        F.least(F.lit(window), F.col("__n") - F.col("__start"))
        .cast("long")
        .alias("chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + F.lit(1), F.lit(window)),
            " ",
        ).alias("chunk_text"),
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


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: training documents that share at least one
    word n-gram with any evaluation document — the overlap check every
    pretraining pipeline runs against its eval sets before training.

    Returns one row per contaminated training doc: ``(id_col,
    n_shared_shingles, n_eval_docs)`` — how many distinct n-grams leak and
    how many eval docs they touch.

    Scale: the eval side is shingled and *broadcast* (eval sets are tiny
    relative to the corpus — millions of n-grams at most), so the check is
    a map-side broadcast join over the training shingles: no shuffle of
    the corpus at all, then one groupBy on the (small) hit set.
    """
    from .dedup import _shingle_frame

    tr = _shingle_frame(train, text_col, id_col, n)
    ev = (
        _shingle_frame(eval_df, text_col, id_col, n)
        .select(F.col("__id").alias("__eval_id"), "shingle")
    )
    hits = tr.join(F.broadcast(ev), "shingle")
    return hits.groupBy(F.col("__id").alias(id_col)).agg(
        F.countDistinct("shingle").alias("n_shared_shingles"),
        F.countDistinct("__eval_id").alias("n_eval_docs"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unigram-LM fluency score (the cheap end of CCNet-style perplexity
    filtering): train a unigram model on the corpus itself, score each
    document by its average token log-probability. Outliers (very negative
    = rare-token soup, near-zero = degenerate repetition of common tokens)
    are filter candidates.

    Returns ``(id_col, n_tokens, avg_logprob)``.

    Cross-engine determinism: per-token-type log-probs are ROUNDed to 6 dp
    and multiplied by exact integer in-doc counts as DECIMAL, so the
    per-doc sum is order-insensitive; the final average is
    floor-canonicalized. A 1-ulp ``ln`` divergence cannot move a 6 dp
    rounding of an irrational value in practice.

    Scale: one shuffle to count (doc, token) pairs, one map-side-combined
    vocab aggregation, vocab log-probs broadcast back (a web-scale vocab is
    ~10⁷ rows — comfortably broadcastable; swap for a shuffle join beyond
    that). No full-corpus re-shuffle for scoring.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    dt = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = dt.groupBy("__tok").agg(F.sum("__c").alias("__cnt"))
    tot = vocab.agg(F.sum("__cnt").cast("double").alias("__total"))
    lp = vocab.join(F.broadcast(tot)).select(
        "__tok",
        F.round(
            F.log(F.col("__cnt").cast("double") / F.col("__total")), 6
        ).cast("decimal(18,6)").alias("__lp"),
    )
    scored = (
        dt.join(F.broadcast(lp), "__tok")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.col("__c").cast("decimal(18,0)") * F.col("__lp")).alias("__s"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        (
            F.floor(
                F.col("__s").cast("double") / F.col("n_tokens") * 1000000
            )
            / F.lit(1000000.0)
        ).alias("avg_logprob"),
    )


def collocations(
    df: DataFrame,
    k: int = 30,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """PMI collocation mining: the top-k adjacent token pairs by pointwise
    mutual information ``ln((n_ab/B) / ((n_a/T)·(n_b/T)))`` — the classic
    multiword-expression detector (tokenizer vocabulary curation, stopword
    discovery).

    Ranking compares the floor-canonicalized PMI (6 dp) with the bigram as
    tiebreaker, so a 1-ulp ``ln`` divergence between engines cannot
    reorder the result. ``min_count`` suppresses noise pairs.

    Scale: bigram and unigram counting are two map-side-combined shuffles;
    the unigram table broadcasts back onto the (min_count-filtered) bigram
    frame; the tail is a distributed TakeOrdered.
    """
    toks = df.select(tokens(F.col(text_col)).alias("__w"))
    uni = (
        toks.select(F.explode("__w").alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    tot = uni.agg(F.sum("__n").alias("__T"))
    bi = toks.select(
        F.explode(
            F.when(
                F.size("__w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__w") - 1),
                    lambda i: F.struct(
                        F.element_at("__w", i).alias("a"),
                        F.element_at("__w", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("__p")
    ).select(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
    pairs = (
        bi.groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("double").alias("__nab"))
        .where(F.col("__nab") >= min_count)
    )
    btot = bi.agg(F.count(F.lit(1)).cast("double").alias("__btot"))
    scored = (
        pairs.join(F.broadcast(uni.withColumnRenamed("__t", "__a")
                   .withColumnRenamed("__n", "__na")), "__a")
        .join(F.broadcast(uni.withColumnRenamed("__t", "__b")
              .withColumnRenamed("__n", "__nb")), "__b")
        .join(F.broadcast(tot))
        .join(F.broadcast(btot))
        .select(
            F.concat(F.col("__a"), F.lit(" "), F.col("__b")).alias("bigram"),
            F.col("__nab").cast("long").alias("n_pair"),
            (
                F.floor(
                    F.log(
                        (F.col("__nab") / F.col("__btot"))
                        / (
                            (F.col("__na") / F.col("__T"))
                            * (F.col("__nb") / F.col("__T"))
                        )
                    )
                    * 1000000
                )
                / F.lit(1000000.0)
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)


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


def source_quota(
    df: DataFrame,
    group_cols,
    n: int,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Per-source document quota — the domain-cap step of a web-scale
    curation pipeline (CommonCrawl-style corpora are dominated by a few
    hot domains; capping per-source keeps the mixture diverse): keep the
    ``n`` best rows per group by ``score_col`` descending, ties broken by
    ``id_col`` ascending (deterministic, engine-portable). Adds ``rnk``
    (1-based within the group).

    Scale: one shuffle on the group columns; the ranking window holds one
    group per task — the same physics as latest_per_key, generalized to
    top-n. No global sort, no collect.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= n)
    )


def passage_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 20,
) -> DataFrame:
    """Passage-granular exact deduplication (the C4 / RefinedWeb move:
    dedup at sub-document granularity, then reassemble documents from
    their surviving passages — repeated boilerplate vanishes while unique
    prose stays).

    Documents are split into consecutive non-overlapping ``passage_tokens``
    windows; the FIRST global occurrence of each distinct passage (by
    (doc id, position)) survives, later repeats are dropped; documents are
    rebuilt from surviving passages in order. Output: id, ``n_passages``,
    ``n_kept``, ``text_clean``.

    Scale posture (100 TB): split/explode is map-only off the scan; one
    shuffle on the passage hash for the first-occurrence window (groups are
    duplicate-set-sized, tiny); one shuffle back on doc id to reassemble.
    No self-join, no all-pairs anywhere. ANSI-safe: the index sequence is
    guarded for empty token lists (Spark 4 ``sequence`` throws on
    start > stop).
    """
    from pyspark.sql import Window

    P = passage_tokens
    # two-step projection: materialize the token array before the passage
    # transform references it — an inline tokens(text) inside the lambda
    # re-splits the document once per passage (see winnow_fingerprints)
    docs = docs.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__tk"),
    )
    toks = F.col("__tk")
    npass = F.ceil(F.size(toks).cast("double") / F.lit(float(P))).cast("int")
    idx = F.when(npass > 0, F.sequence(F.lit(1), npass)).otherwise(
        F.array().cast("array<int>")
    )
    pass_arr = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * P + 1, P))
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(pass_arr).alias("__pos0", "passage")
    ).select(id_col, (F.col("__pos0") + 1).alias("pos"), "passage")
    w = Window.partitionBy(F.md5(F.col("passage"))).orderBy(
        F.asc(id_col), F.asc("pos")
    )
    ranked = exploded.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rn") == 1,
                                F.struct("pos", "passage"),
                            )
                        )
                    ),
                    lambda s: s["passage"],
                ),
            ).alias("text_clean"),
        )
    )


def distinctive_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_n: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Per-group distinctive vocabulary: the ``top_n`` tokens ranked by a
    log-free TF-IDF surrogate ``score = tf_group · n_groups / df_groups``
    (how much more a term belongs to this group than to a typical one) —
    the per-source keyword report a corpus audit reads. Output: group,
    token, ``tf`` (count in group), ``df`` (groups containing it),
    ``score`` (6 dp floor).

    Log-free on purpose: ln/log10 are the one libm surface where engines
    can drift a ulp; the rational surrogate ranks identically to
    tf·(1/df) within a group and stays bit-stable cross-engine.

    Scale: explode → one (group, token) count shuffle; document frequency
    is a second aggregate over the (group, token) counts (already tiny);
    per-group top-n via a window over the scored counts. ``min_df``
    drops hapax noise before ranking.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    tf = toks.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_groups = docs.agg(
        F.countDistinct(F.col(group_col)).alias("__ng")
    )  # 1-row broadcast, no driver action
    scored = (
        tf.join(dfreq, "token")
        .where(F.col("tf") >= min_df)
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "score",
            F.floor(
                F.col("tf").cast("double") * F.col("__ng")
                / F.col("df")
                * F.lit(1e6)
            )
            / F.lit(1e6),
        )
    )
    w = Window.partitionBy("grp").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= top_n)
        .select(F.col("grp").alias(group_col), "token", "tf", "df", "score")
    )


def dsir_logratio(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169 —
    Data Selection for LMs via Importance Resampling, hashed-ngram tier):
    score every document by its average unigram log-likelihood ratio
    between a TARGET-domain LM (rows where ``target`` is true — e.g. a
    trusted source) and the full-corpus LM. High scores = documents that
    look like the target domain; resample by these weights to shift a raw
    corpus toward it. Both LMs are add-1 smoothed over the shared vocab so
    tokens unseen in the target stay finite.

    Returns ``(id_col, n_tokens, dsir_score)``.

    Cross-engine determinism (same contract as ``unigram_logprob``):
    per-token-type log-probs are ROUNDed to 6 dp as DECIMAL, the ratio is
    their exact decimal difference, per-doc sums multiply by exact integer
    counts, and the final average is floor-canonicalized.

    Scale posture (100 TB): one (doc, token) count shuffle, one
    map-side-combined vocab aggregation carrying both corpus and target
    counts in the same pass (no second scan), vocab log-ratios broadcast
    back for map-only scoring. The corpus is never re-shuffled to score.
    """
    toks = df.select(
        F.col(id_col),
        target.alias("__is_t"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    )
    dt = toks.groupBy(id_col, "__tok").agg(F.count(F.lit(1)).alias("__c"))
    vocab = toks.groupBy("__tok").agg(
        F.count(F.lit(1)).alias("__cs"),
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("__ct"),
    )
    tot = vocab.agg(
        F.sum("__cs").cast("double").alias("__S"),
        F.sum("__ct").cast("double").alias("__T"),
        F.count(F.lit(1)).cast("double").alias("__V"),
    )
    lr = vocab.join(F.broadcast(tot)).select(
        "__tok",
        (
            F.round(
                F.log(
                    (F.col("__ct") + 1).cast("double") / (F.col("__T") + F.col("__V"))
                ),
                6,
            ).cast("decimal(18,6)")
            - F.round(
                F.log(
                    (F.col("__cs") + 1).cast("double") / (F.col("__S") + F.col("__V"))
                ),
                6,
            ).cast("decimal(18,6)")
        ).alias("__lr"),
    )
    scored = (
        dt.join(F.broadcast(lr), "__tok")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_tokens"),
            F.sum(F.col("__c").cast("decimal(18,0)") * F.col("__lr")).alias("__s"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        (
            F.floor(F.col("__s").cast("double") / F.col("n_tokens") * 1000000)
            / F.lit(1000000.0)
        ).alias("dsir_score"),
    )


def classifier_weights(n_buckets: int = 512, seed: str = "qclf") -> list[float]:
    """Deterministic md5-seeded weight table in [-1, 1] — the stand-in for
    a trained hashed-bag-of-words classifier's weight vector (fastText /
    DCLM-style quality filter). Reproducible everywhere, no RNG state; swap
    in real trained weights for production use."""
    import hashlib

    out = []
    for b in range(n_buckets):
        h = int(hashlib.md5(f"{seed}_{b}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def hashed_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
    weights: list[float] | None = None,
    bias: float = 0.0,
    threshold: float = 0.0,
    seed: str = "qclf",
    extra_cols: "list[str] | tuple[str, ...]" = (),
) -> DataFrame:
    """FastText/DCLM-style quality-classifier scoring: a linear model over
    hashed bag-of-words features, the standard learned quality filter of
    LLM pretraining pipelines (e.g. DCLM's fastText filter; GPT-3/LLaMA's
    LR quality classifiers). Each token hashes to one of ``n_buckets``
    weight slots (hashing trick — vocabulary-free, OOV-safe); the document
    score is the mean slot weight plus bias (mean pooling, exactly
    fastText's linear layer), and ``keep`` thresholds it.

    ``weights`` is the trained weight vector (defaults to the
    deterministic ``classifier_weights`` table so results are
    oracle-checkable without a training run).

    Scale posture (100 TB): the weight table is ONE array literal of
    ``n_buckets`` doubles shipped with the plan — scoring is a map-only
    codegen expression over the corpus scan (hash → element_at → left-fold
    sum), no shuffle, no Python, no vocabulary join. This is the shape a
    learned filter must have to run over a full crawl.

    Cross-engine determinism: the md5-parity token hash (``functions.
    hash64``) is identical in DuckDB; the weight sum is a strict left fold
    of identical literals; the mean is division-derived and therefore
    FLOOR-canonicalized to 6 dp (repo invariant — never ROUND a division).

    Output: ``(id_col, *extra_cols, n_tokens, qc_score, keep)``; empty
    documents score exactly ``bias``. ``extra_cols`` ride through untouched
    (row-local — safe inside a Stream source transform).
    """
    from ..functions import hash64

    w = weights if weights is not None else classifier_weights(n_buckets, seed)
    wlit = F.lit([float(x) for x in w])
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    slot = lambda t: F.element_at(  # noqa: E731
        wlit, (F.pmod(hash64(t, seed), F.lit(n_buckets)) + 1).cast("int")
    )
    s = F.aggregate(
        F.transform(toks, slot), F.lit(0.0), lambda acc, x: acc + x
    )
    n = F.size(toks)
    score = F.when(
        n > 0,
        F.floor((F.lit(float(bias)) + s / n) * 1e6) / 1e6,
    ).otherwise(F.floor(F.lit(float(bias)) * 1e6) / 1e6)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        n.cast("long").alias("n_tokens"),
        score.alias("qc_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def gopher_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style heuristic quality rules (Rae et al. 2021, Table A1 —
    the rule bundle FineWeb/Dolma/RefinedWeb all re-derive): per document,
    the word-level repetition-free gates with an explicit flag per rule so
    a curation run can report WHY documents fail, plus the conjunction
    ``keep``. Rules: word count in [min_words, max_words]; mean word
    length in [min, max]; symbol-to-word ratio (# and ... marks) ≤ max;
    fraction of words containing an alphabetic character ≥ min; at least
    ``min_stop_hits`` of the 8 canonical English function words present.

    All flags are pure codegen Column expressions off one scan — no
    shuffle, no Python, no join; at 100 TB this is a map-only pass you
    fold into the ingest scan. Ratios are division-derived and therefore
    FLOOR-canonicalized to 6 dp (repo invariant).

    Output: ``(id_col, n_words, mean_word_len, symbol_ratio, alpha_frac,
    stop_hits, word_count_ok, mean_len_ok, symbol_ok, alpha_ok,
    stopword_ok, keep)``.
    """
    STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    n = F.size(toks)
    canon = lambda x: F.floor(x * 1e6) / 1e6  # noqa: E731
    mwl = F.when(
        n > 0,
        canon(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / n
        ),
    ).otherwise(F.lit(0.0))
    hash_marks = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#")))
    ellipses = (
        F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("...")))
    ) / 3
    sym = F.when(n > 0, canon((hash_marks + ellipses) / n)).otherwise(F.lit(0.0))
    alpha = F.when(
        n > 0,
        canon(F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n),
    ).otherwise(F.lit(0.0))
    hits = sum(
        F.array_contains(toks, sw).cast("int") for sw in STOPS
    )
    out = df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        alpha.alias("alpha_frac"),
        hits.cast("long").alias("stop_hits"),
    )
    flags = out.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias(
            "word_count_ok"
        ),
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("mean_len_ok"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("symbol_ok"),
        (F.col("alpha_frac") >= min_alpha_frac).alias("alpha_ok"),
        (F.col("stop_hits") >= min_stop_hits).alias("stopword_ok"),
    )
    return flags.select(
        "*",
        (
            F.col("word_count_ok")
            & F.col("mean_len_ok")
            & F.col("symbol_ok")
            & F.col("alpha_ok")
            & F.col("stopword_ok")
        ).alias("keep"),
    )


def perplexity_bands(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 3,
) -> DataFrame:
    """CCNet-style perplexity banding (Wenzek et al. 2020): split each
    language's documents into ``n_bands`` fluency bands (head / middle /
    tail for 3) by their unigram-LM score, the step CCNet uses to keep the
    head and discard or down-sample the tail.

    The quantile boundaries are computed WITHOUT a per-language global
    sort — the pattern that survives 100 TB: scores (already
    floor-canonicalized by ``unigram_logprob``) are binned at 2 dp, one
    tiny (lang, bin) count aggregate is cumulated from the best bin down
    (a window over ~hundreds of bins per language, not over documents),
    the ``n_bands-1`` threshold bins fall out of a conditional max, and
    every document is banded map-only against its language's broadcast
    thresholds. Band boundaries have histogram resolution (documents
    sharing a 0.01-wide score bin land in the same band) — the standard
    trade of distributed quantile bucketing, deterministic cross-engine.

    Output: ``(id_col, lang_col, n_tokens, avg_logprob, band)`` with
    ``band`` in 1..n_bands (1 = most fluent). Empty documents follow
    ``unigram_logprob``'s convention (the empty string counts as one
    token, so they score like a rare-token singleton).
    """
    from pyspark.sql import Window

    lm = unigram_logprob(df, text_col=text_col, id_col=id_col)
    scored = lm.join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    ).withColumn("__bin", F.floor(F.col("avg_logprob") * 100).cast("long"))
    bins = scored.groupBy(lang_col, "__bin").agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc("__bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy(lang_col))
    )
    # threshold bin for band i: the LARGEST bin whose from-the-top
    # cumulative count reaches ceil(i·n/n_bands) (integer-exact ceil)
    th = cum.groupBy(lang_col).agg(
        *[
            F.max(
                F.when(
                    F.col("__cum")
                    >= F.floor((F.col("__n") * i + (n_bands - 1)) / n_bands),
                    F.col("__bin"),
                )
            ).alias(f"__t{i}")
            for i in range(1, n_bands)
        ]
    )
    banded = scored.join(F.broadcast(th), lang_col)
    band = F.lit(n_bands)
    for i in range(n_bands - 1, 0, -1):
        band = F.when(F.col("__bin") >= F.col(f"__t{i}"), i).otherwise(band)
    return banded.select(
        id_col, lang_col, "n_tokens", "avg_logprob", band.alias("band")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    extra_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm): hash every k-token shingle with the
    cross-engine ``hash64`` law, slide a w-hash window over each document,
    and select each window's minimum hash — RIGHTMOST occurrence on ties,
    the paper's rule, which lets adjacent windows reselect the same
    fingerprint and yields density ~2/(w+1). Guarantee: any shared token
    run of length ≥ w + k - 1 contributes at least one shared selected
    fingerprint — the local, position-robust overlap primitive exact-dup
    md5 fingerprints can't provide (a shared paragraph inside otherwise
    different documents still collides).

    Pure codegen per row: shingle hashes, windows and the rightmost-argmin
    are array expressions (``sequence``/``slice``/``array_min``; the
    rightmost tiebreak is ``array_position`` over the REVERSED window —
    leftmost in the reversal). ANSI-guarded for docs shorter than k tokens
    or w hashes (they emit nothing). Output: one row per selected
    ``(doc_id, pos, fp)`` with ``pos`` the 1-based shingle index.

    100 TB: map-only fan-out (~2·n_tokens/(w+1) rows per doc), zero
    shuffle here; consumers group/join on ``fp``, a uniform 60-bit key.
    """
    from ..functions import hash64, tokens
    from .spread import spread_scan

    # two-step projection ON PURPOSE: materialize the token array as a
    # real attribute before the shingle transform references it — an
    # inline `tokens(text)` inside the lambda is re-evaluated PER ELEMENT
    # (the whole document re-splits once per shingle: measured 4.5×
    # slower at sf0.1). Same pattern as dedup._shingle_frame.
    extra_cols = list(extra_cols)
    # spread_scan (r12): the per-window argmin expressions below are the
    # expensive stage — an under-split scan would run them on one core
    # (measured 2.30 → 0.39 s at sf0.1); no-op on well-split inputs
    df = spread_scan(
        df.select(F.col(id_col), F.col(text_col), *extra_cols), id_col
    )
    tk = df.select(
        F.col(id_col),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__tk"),
        *extra_cols,
    )
    n = F.size(F.col("__tk"))
    hs = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: hash64(F.concat_ws(" ", F.slice(F.col("__tk"), i, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    base = tk.select(F.col(id_col), hs.alias("__h"), *extra_cols)
    nh = F.size(F.col("__h"))
    win = lambda j: F.slice(F.col("__h"), j, w)  # noqa: E731
    sel = F.when(
        nh >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nh - (w - 1)),
                lambda j: F.struct(
                    (
                        j + w
                        - F.array_position(
                            F.reverse(win(j)), F.array_min(win(j))
                        ).cast("int")
                    ).cast("int").alias("pos"),
                    F.array_min(win(j)).alias("fp"),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,fp:bigint>>"))
    return base.select(
        F.col(id_col), F.explode(sel).alias("__s"), *extra_cols
    ).select(
        id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"),
        *extra_cols,
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_fp_df: float | int | None = 0.5,
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` distinct winnowed
    fingerprints — MOSS-style overlap detection: robust to reordering and
    surrounding edits (any shared run of w+k-1 tokens fingerprints), the
    plagiarism/near-boilerplate tier between exact dedup and Jaccard.

    Join key is the fingerprint itself (uniform 60-bit equi-join, never
    all-pairs); ``max_fp_df`` is the hot-fingerprint guard (the
    hot-shingle cap physics: a fingerprint shared by m docs contributes m²
    pairs, and universal boilerplate carries no overlap signal) — a
    broadcast anti-join drops fingerprints above the document-frequency
    cap (fraction of the corpus when ≤ 1, absolute otherwise); ``None``
    disables. Output: ``doc_a < doc_b, n_shared``.
    """
    # the fingerprint stage (an md5 per k-gram) feeds FOUR consumers below
    # (df-frequency agg, the anti-join probe, both self-join sides) —
    # persist the small (doc, fp) frame so it computes once (the ppjoin
    # shingle-frame precedent; ~2 selected fps per w+1 tokens, so this is
    # a fraction of the corpus text size)
    # r13: cached ALREADY hash(fp)-partitioned — hash(fp) satisfies the
    # (__id, fp) dedup clustering, and the DF-frequency aggregate plus
    # BOTH self-join legs key on fp, so every post-cache consumer reads
    # the one stored layout instead of re-exchanging (guide §2.4;
    # InMemoryRelation keeps outputPartitioning). AQE sizes the exchange.
    fps = (
        winnow_fingerprints(df, text_col, id_col, k, w)
        .select(F.col(id_col).alias("__id"), "fp")
        .repartition(F.col("fp"))
        .dropDuplicates(["__id", "fp"])
        .persist()
    )
    if max_fp_df is not None:
        dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        if max_fp_df <= 1:
            total = df.select(
                F.countDistinct(F.col(id_col)).alias("__n")
            )
            hot = dfreq.crossJoin(F.broadcast(total)).where(
                F.col("__df") > F.col("__n") * F.lit(float(max_fp_df))
            )
        else:
            hot = dfreq.where(F.col("__df") > F.lit(int(max_fp_df)))
        fps = fps.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a = fps.select(F.col("__id").alias("doc_a"), "fp")
    b = fps.select(F.col("__id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )

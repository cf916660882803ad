"""Text retrieval operators: BM25 scoring over a document corpus.

Beyond the reference surface (the reference has no text search at all) —
the retrieval step of a training-data pipeline: score documents against a
term query with BM25 and keep the top-k.

Scale posture: the corpus is tokenized and *filtered to query terms before
any shuffle* (the exploded frame is |terms|-bounded per document), term
document-frequencies and the global (N, avgdl) scalars are 1-to-few-row
broadcasts, and the final top-k is a distributed TakeOrdered — no global
window, no driver-side collect. At 100 TB the only full-corpus pass is the
scan+explode map stage; everything after operates on the tiny matched
subset.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import token_count, tokens

__all__ = ["bm25_topk", "rrf_fuse"]


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: ``score(d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl))`` with the standard smoothed
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``.

    Cross-engine determinism: per-(doc, term) contributions are ROUNDed to
    6 dp and summed as DECIMAL (order-insensitive), then the doc score is
    rounded to 4 dp — ranking and the oracle compare the *rounded* score
    with ``id_col`` as tiebreaker, so a 1-ulp ``ln`` divergence between
    JVM ``Math.log`` and libm cannot reorder the result.

    Output: id_col, n_terms_matched, score — the k best, score desc.
    """
    terms = [t.lower() for t in query_terms]
    base = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("__w"),
        token_count(F.col(text_col)).cast("double").alias("__dl"),
    )
    # global scalars: corpus size and mean document length (exact integer
    # sum divided once -> deterministic double)
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("__dl") / F.count(F.lit(1))).alias("__avgdl"),
    )
    # explode only the matching tokens: per-document output is bounded by
    # the query length, so the shuffle below is tiny regardless of corpus
    matched = base.select(
        id_col,
        "__dl",
        F.explode(F.filter("__w", lambda t: t.isin(terms))).alias("__term"),
    )
    tf = matched.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    dfreq = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log(
        (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    contrib = F.round(
        idf
        * F.col("__tf")
        * (k1 + 1.0)
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))),
        6,
    ).cast("decimal(18,6)")
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum(contrib).cast("double"), 4).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (hybrid
    retrieval: lexical BM25 + vector ANN, the standard fusion in RAG
    pipelines; Cormack et al. 2009): ``score(d) = Σ_legs 1/(c + rank)``,
    with a missing leg contributing 0. Each input carries (id_col, rank)
    with rank 1-based; output: id, per-leg ranks (``rank_0``..), raw
    ``rrf_score``, top-k by (score desc, id).

    Deterministic: ranks are integers, every engine evaluates the identical
    1/(c+r) doubles in the same left-to-right addition order; callers that
    need bit-stable output floor-canonicalize the score (the driver query
    does).

    Scale posture: the legs are already top-k lists (bounded by k·n_legs
    rows, bytes not gigabytes), so the fusion joins are broadcast-trivial —
    the heavy lifting happened inside each leg's own distributed top-k.
    """
    fused = None
    for i, leg in enumerate(ranked):
        leg_i = leg.select(F.col(id_col), F.col("rank").alias(f"rank_{i}"))
        fused = leg_i if fused is None else fused.join(leg_i, id_col, "full_outer")
    score = None
    for i in range(len(ranked)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"rank_{i}").cast("double")),
            F.lit(0.0),
        )
        score = term if score is None else score + term
    out = fused.withColumn("rrf_score", score)
    return out.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)

"""Deduplication operators.

Two families:

1. **Engine-internal dedup** — the per-key latest-change pick the incremental
   runtime uses on every microbatch (reference: row_number over
   PK/sequence windows, elzyme/joins.py:388-395, 556-561), exposed here as a
   first-class operator (``latest_per_key``), plus the anti-join used in
   merge resolution (elzyme/joins.py:715,741).

2. **Corpus-scale document dedup** for training-data pipelines (beyond the
   reference surface): exact content dedup, MinHash-LSH, SimHash, n-gram
   Jaccard and embedding-cosine near-dup live in this module as well (see
   the minhash/simhash/jaccard functions below).

All operators are declarative DataFrame compositions — no Python UDFs in the
hot path — so they scale by partitioning: the window dedup shuffles once on
the key columns; at 100 TB you pre-partition/bucket the table by the same
keys to make it shuffle-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# rounds taken by the most recent connected_components call, per algorithm
# ("label"/"star") — bench telemetry; see connected_components
LAST_CC_ROUNDS: dict[str, int] = {}


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """Keep the latest row per key: ``row_number() over (partition by keys
    order by order_by desc) = 1`` (reference: elzyme/joins.py:388-395).

    One shuffle on ``keys``; survives scale-up because the window never
    materializes more than a partition's rows per task.
    """
    ordering = [F.desc(c) if descending else F.asc(c) for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def anti_join(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (reference uses left_anti
    during merge resolution, elzyme/joins.py:715,741)."""
    return left.join(right, condition, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return left.join(right, condition, "left_semi")


# ---------------------------------------------------------------------------
# corpus-scale document dedup (training-data pipeline extensions)
# ---------------------------------------------------------------------------
def normalize_text(col: Column) -> Column:
    """Canonical text form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: md5 of normalized text → keep the lowest id per
    content group, annotate group size.

    Scale path: the md5 group-by is a single shuffle on a uniformly
    distributed hash key — no skew by construction; at 100 TB this is the
    cheapest possible full-corpus dedup.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("content_md5")
    return (
        df.select(F.col(id_col), fp)
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dup groups with >1 member (the actionable subset)."""
    return exact_dedup(df, text_col, id_col).where(F.col("n_copies") > 1)


# ---------------------------------------------------------------------------
# shingling (shared by MinHash-LSH and n-gram Jaccard)
# ---------------------------------------------------------------------------
def _shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int, dedup: bool = True
) -> DataFrame:
    """(id, shingle) pairs — the set representation of each doc (distinct
    per doc when ``dedup``, raw occurrences otherwise).

    Built-ins only (sequence/slice/array_join run in whole-stage codegen);
    docs with fewer than n tokens are filtered *before* sequence() so the
    bounds are always valid under ANSI mode. DuckDB twin:
    ``list_transform(generate_series(1, len(w)-n+1), i ->
    array_to_string(w[i:i+n-1], ' '))``.

    r12: per-doc dedup happens INSIDE the row (array_distinct before the
    explode) — a doc's shingles all live in its own array, so this is
    exactly dropDuplicates([__id, shingle]) minus the full exchange that
    the post-explode dropDuplicates paid (one shuffle of the whole
    occurrence frame removed from every set-semantics consumer — guide
    §2.4; identical output set). Duplicate-INSENSITIVE consumers (minhash
    min() aggregates, a downstream global distinct) pass ``dedup=False``:
    the optimizer was already deleting the old redundant dropDuplicates
    under them (RemoveRedundantAggregates), so for those paths
    array_distinct would be pure added per-row cost, not a saved shuffle.
    r12: the (id, text) input is spread_scan-guarded — an under-split
    scan (one parquet row group) would otherwise run the whole shingle
    fan-out AND every consumer's per-shingle hashing (12 minhash md5s,
    hash64 per occurrence) on one core; hash(id) layout means a
    downstream per-doc groupBy (minhash signatures) re-uses the
    exchange. No-op on well-split inputs (guide §2.5).
    """
    from ..functions import tokens
    from .spread import spread_scan

    df = spread_scan(df.select(F.col(id_col), F.col(text_col)), id_col)
    out = df.select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
    out = out.where(F.size("__w") >= n)
    shingles = F.expr(
        f"transform(sequence(1, size(__w) - {n - 1}), i -> array_join(slice(__w, i, {n}), ' '))"
    )
    if dedup:
        shingles = F.array_distinct(shingles)
    return out.select("__id", F.explode(shingles).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: float | int | None = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: explode shingles → self-join on
    shingle → |A∩B| per pair → J = inter / (|A|+|B|−inter) ≥ threshold.

    Scale guard: a shingle shared by k docs contributes k² candidate pairs,
    so ultra-common shingles (boilerplate) turn the self-join quadratic and
    skew its shuffle. ``max_shingle_df`` drops shingles whose document
    frequency exceeds the cap (a fraction of the corpus when ≤ 1, absolute
    otherwise) *before* the join; sizes are computed over the capped
    shingle universe so Jaccard stays internally consistent. Such shingles
    carry no near-dup signal — two docs similar only through boilerplate
    are not near-dups. ``None`` disables the guard (exact-oracle tier).

    Output columns: doc_a, doc_b, jaccard.
    """
    sized = _ngram_pair_frames(df, text_col, id_col, n, max_shingle_df)
    out = sized.select(
        "doc_a",
        "doc_b",
        # division-derived float: FLOOR-canonicalize (never ROUND) so
        # Spark and DuckDB agree bit-for-bit at .xxx5 boundaries
        (
            F.floor(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    return out


def _ngram_pair_frames(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    max_shingle_df: float | int | None,
) -> DataFrame:
    """Shared candidate machinery for the exact n-gram pair scorers:
    shingle explode → optional hot-shingle DF cap → self-join on shingle →
    per-pair intersection counts joined with both docs' (capped) shingle
    set sizes. Returns ``(doc_a, doc_b, inter, sz_a, sz_b)``."""
    sh = _shingle_frame(df, text_col, id_col, n)
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        if max_shingle_df <= 1:
            total = df.select(F.countDistinct(F.col(id_col)).alias("__n"))
            hot = dfreq.crossJoin(F.broadcast(total)).where(
                F.col("__df") > F.col("__n") * F.lit(float(max_shingle_df))
            )
        else:
            hot = dfreq.where(F.col("__df") > F.lit(int(max_shingle_df)))
        # the hot set is tiny by construction — broadcast anti-join, no
        # extra shuffle of the shingle frame
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sh = sh.persist()
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    # No broadcast hint on the per-doc size frames: |docs| rows is
    # corpus-sized (100 TB ⇒ billions of ids), so a broadcast here OOMs the
    # driver. The join key is the doc id — a plain shuffle join is bounded
    # and usually co-partitioned with `inter`'s groupBy output anyway.
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.__id"))
        .join(sb, F.col("doc_b") == F.col("sb.__id"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.col("sa.sz").alias("sz_a"),
            F.col("sb.sz").alias("sz_b"),
        )
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: float | int | None = 0.5,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: C = |A∩B| / min(|A|, |B|) ≥
    threshold — the asymmetric-duplication detector Jaccard misses. A short
    article fully quoted inside a long page has tiny Jaccard (the union is
    dominated by the long side) but containment ≈ 1; this is the news-wire
    / quotation / wrapper-page dedup case (Broder's containment measure,
    "On the resemblance and containment of documents", 1997).

    Same candidate machinery, hot-shingle cap and scale posture as
    ``ngram_jaccard_pairs`` (one shingle-keyed self-join, unhinted
    id-keyed size joins — nothing corpus-sized broadcasts); the score is
    division-derived and FLOOR-canonicalized. Output: doc_a, doc_b,
    ``containment``, ``sz_a``, ``sz_b`` (the sizes tell which side is the
    contained one).
    """
    sized = _ngram_pair_frames(df, text_col, id_col, n, max_shingle_df)
    return sized.select(
        "doc_a",
        "doc_b",
        (
            F.floor(
                F.col("inter") / F.least(F.col("sz_a"), F.col("sz_b")) * F.lit(1e6)
            )
            / F.lit(1e6)
        ).alias("containment"),
        "sz_a",
        "sz_b",
    ).where(F.col("containment") >= threshold)


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: h_i = min over shingles of
    md5(i || '|' || shingle). Using the lexicographic min of the md5 *hex
    string* keeps the signature bit-identical in any engine with md5 —
    the uniformity MinHash needs doesn't care that the order is lexicographic.

    One explode + one groupBy with ``num_hashes`` min() aggregates — a single
    shuffle on doc id, map-side partial mins keep it small.
    """
    # dedup=False: min() is duplicate-insensitive, so per-doc shingle
    # dedup is pure wasted work on this path (r12 — the optimizer already
    # deleted the old dropDuplicates here via RemoveRedundantAggregates)
    sh = _shingle_frame(df, text_col, id_col, shingle_n, dedup=False)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(F.col("__id").alias(id_col)).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_size: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: signature split into
    ``num_hashes / band_size`` bands, each band hashed; docs sharing any
    (band, hash) bucket become a candidate pair.

    Scale: the bucket join shuffles on (band, band_hash) — uniformly
    distributed by construction; candidate output is the sparse survivor
    set, never the O(n²) cross product. Output: doc_a, doc_b (distinct).
    """
    buckets = _lsh_buckets(df, text_col, id_col, num_hashes, band_size, shingle_n)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def _lsh_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    band_size: int,
    shingle_n: int,
) -> DataFrame:
    """(__id, band, bh) bucket memberships — the shared banding step of
    ``minhash_lsh_pairs`` and ``minhash_lsh_star_edges``."""
    assert num_hashes % band_size == 0
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = num_hashes // band_size
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(",", *[f"h{b * band_size + j}" for j in range(band_size)])
            ).alias("bh"),
        )
        for b in range(n_bands)
    ]
    return sigs.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*band_structs)).alias("x")
    ).select("__id", "x.band", "x.bh")


def minhash_lsh_star_edges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_size: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """Connectivity-equivalent LSH edges for connected-components feeds:
    one star edge (bucket-min doc → member) per bucket membership instead
    of ``minhash_lsh_pairs``' all-pairs-within-bucket output.

    Sharing a bucket is an equivalence-generating relation for CC: a
    bucket of k docs is connected by its k−1 star edges exactly as by its
    k(k−1)/2 pairs, so the component labeling downstream is IDENTICAL
    (oracle-verified against the pair-fed closure) while the candidate
    volume drops from Σk² to Σk — the term that explodes on hot buckets
    at corpus scale (guide §2.3: shuffle decisions, not payload). The
    plan is also one exchange cheaper: a single hash(band, bh) layout
    serves the bucket-min aggregate AND the membership join, vs the pair
    self-join plus its doc-pair dedup exchange. Use the pairs operator
    when the pairs themselves are the product; use this to label
    clusters. Output: ``doc_a`` (bucket min), ``doc_b`` (member),
    ``doc_a != doc_b``, duplicates possible across bands (CC dedups).
    """
    buckets = _lsh_buckets(
        df, text_col, id_col, num_hashes, band_size, shingle_n
    ).repartition(F.col("band"), F.col("bh"))
    mins = buckets.groupBy("band", "bh").agg(F.min("__id").alias("m"))
    return (
        buckets.join(mins, ["band", "bh"])
        .where(F.col("__id") != F.col("m"))
        .select(F.col("m").alias("doc_a"), F.col("__id").alias("doc_b"))
    )


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Training documents sharing ANY exact ``n``-gram with an eval corpus
    — the GPT-3 13-gram decontamination rule (Brown et al. 2020, App. C),
    the EXACT-overlap complement to the MinHash-based
    ``minhash_lsh_pairs_between`` contamination scan: fuzzy matching
    finds near-duplicate eval documents, this finds verbatim eval
    passages quoted inside otherwise-unrelated training docs (the leak
    n-gram Jaccard's symmetric denominator misses).

    Output: ``(id_col, n_hit_ngrams)`` — the contaminated training docs
    with their count of distinct shared n-grams (filter or join-anti the
    corpus against it to scrub).

    Scale: the eval side reduces to its DISTINCT n-gram set and is
    broadcast (eval suites are 1e3-1e6 grams — trivially broadcastable
    next to a 100 TB train side); the train side is one map-only shingle
    fan-out + a broadcast semi-ish join + a doc-keyed count — the train
    corpus is never shuffled except on its own doc id."""
    # eval side: the global .distinct() makes per-doc dedup redundant
    # (duplicate-insensitive consumer — see _shingle_frame)
    ev = (
        _shingle_frame(eval_df, text_col, id_col, n, dedup=False)
        .select("shingle")
        .distinct()
    )
    tr = _shingle_frame(train, text_col, id_col, n)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
        .select(F.col("__id").alias(id_col), "n_hit_ngrams")
    )


def minhash_lsh_pairs_between(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_size: int = 3,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-corpus LSH candidate pairs: documents of ``left`` that share
    any (band, bucket-hash) with a document of ``right`` — document-level
    contamination detection between a training corpus and a benchmark/eval
    set (the MinHash complement to ``text.decontaminate``'s exact n-gram
    overlap: near-dup rather than verbatim leakage). Same hash law and
    banding as ``minhash_lsh_pairs``, so the candidate semantics match the
    within-corpus operator exactly.

    Scale posture (100 TB × small eval set): both sides reduce to band
    buckets (constant fan-out per doc); the join shuffles on the uniform
    (band, bh) key. When ``right`` is eval-sized, AQE broadcasts its bucket
    frame and the corpus never shuffles at all.

    Output: ``left_id, right_id`` (distinct).
    """
    def buckets(df: DataFrame, out: str) -> DataFrame:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
        n_bands = num_hashes // band_size
        structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[f"h{b * band_size + j}" for j in range(band_size)]
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
        return sigs.select(
            F.col(id_col).alias(out), F.explode(F.array(*structs)).alias("x")
        ).select(out, "x.band", "x.bh")

    assert num_hashes % band_size == 0
    lb = buckets(left, "left_id")
    rb = buckets(right, "right_id")
    return (
        lb.join(rb, ["band", "bh"])
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 32

# Auto-refinement thresholds for signature_pairs(refine_over="auto").
# Per-bucket qualifiers: occupancy — a bucket of m rows costs ~m²/2
# candidate verifications unrefined vs ~n_seg·m explode rows refined, so
# the per-bucket break-even sits near m ≈ 2·n_seg (10 at the default
# radius 4; scaled by n_seg = max_hamming + 1, the fan-out multiplier);
# diversity — refinement splits only DISTINCT signatures (an
# identical-signature duplicate cluster shares every sub-segment —
# measured 1.17× anti-win, SCALING.md), so a bucket qualifies only when
# its average signature multiplicity m/d stays under
# REFINE_AUTO_MAX_DUP_RATIO (a RELATIVE test — an absolute distinct-count
# floor would exclude every mid-size diverse bucket by construction;
# measured r7 at 100×: the 33k buckets of occupancy 2-160 carry 54M of
# the 255M candidate mass, and leaving them cold made auto 2.3× slower
# than refine-everything).
# Engage gate: the split plan itself costs a few fixed shuffles (~2.5 s
# measured at sf0.1) REGARDLESS of how much it saves, so refinement only
# engages when the qualifying buckets' summed candidate mass Σ m(m−1)/2
# is large enough that the verify stage it shrinks dominates that fixed
# cost (sf0.1 image: 0.6M qualifying candidates verify in well under the
# overhead → stays cold; the 100× sweep's 2.5e8-candidate set is a
# measured multi-× win → engages).
REFINE_AUTO_OCCUPANCY = 2
REFINE_AUTO_MAX_DUP_RATIO = 4
REFINE_AUTO_CANDIDATES = 5_000_000

# Cache lifecycle for the persisted block frames signature_pairs leaves
# behind (the probe/split plan references them, so they cannot be
# unpersisted at construction): a bounded FIFO registry. Eviction is
# SAFE — unpersisting a frame a still-lazy plan references just makes
# that plan recompute the signature derivation — so a long-lived service
# calling signature_pairs repeatedly holds at most _SIG_CACHE_LIMIT
# cached frames, and release_signature_caches() drops them all (e.g.
# after the pair frames have materialized). r8 review finding.
_SIG_CACHE_LIMIT = 8
_SIG_CACHES: list = []


def _register_sig_cache(df: DataFrame) -> None:
    _SIG_CACHES.append(df)
    while len(_SIG_CACHES) > _SIG_CACHE_LIMIT:
        old = _SIG_CACHES.pop(0)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass


def release_signature_caches() -> int:
    """Unpersist every block frame signature_pairs has cached this
    session; returns how many were released. Call after the pair frames
    have materialized (or whenever memory matters more than re-deriving
    signatures on a re-run)."""
    n = 0
    while _SIG_CACHES:
        try:
            _SIG_CACHES.pop().unpersist()
            n += 1
        except Exception:  # noqa: BLE001
            pass
    return n


_HIGH_NIBBLE = ["8", "9", "a", "b", "c", "d", "e", "f"]


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash per document from token md5s: bit b is the sign of the
    token-frequency-weighted sum of (±1) where +1 ⇔ the high bit of hex
    nibble b of md5(token) is set. Emitted as a '0'/'1' string so hamming
    distance is a per-character comparison in any engine.

    One explode + one groupBy(doc) with 32 conditional-sum aggregates —
    single shuffle, map-side combine. NOT spread_scan-guarded (r12,
    measured): one md5 per token with map-side partial sums is light
    enough that the added exchange loses to the single-split scan
    (0.75 vs 0.87 s alternating A/B at sf0.1) — unlike the 12-md5-per-
    shingle minhash fan-out where the guard wins 2.3×.
    """
    from ..functions import tokens

    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    ).where(F.col("w") != "")
    h = F.md5(F.col("w"))
    bit_sums = [
        F.sum(
            F.when(F.substring(h, b + 1, 1).isin(_HIGH_NIBBLE), 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("__id").agg(*bit_sums)
    bits = F.concat(
        *[F.when(F.col(f"s{b}") > 0, "1").otherwise("0") for b in range(SIMHASH_BITS)]
    )
    return agg.select(F.col("__id").alias(id_col), bits.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    algorithm: str = "label",
) -> DataFrame:
    """Resolve near-dup candidate pairs into duplicate clusters:
    ``(node, label)`` where label = the minimum node id in the connected
    component — the canonical-representative step every dedup pipeline
    needs after pair-finding (keep ``label``, drop the rest). Works for
    any orderable id type — long doc ids *and* the string ids a real
    corpus usually carries (min/least order strings lexicographically).

    ``algorithm="label"`` (default) is min-label propagation: each round
    every node takes the min of its own and its neighbors' labels;
    converges in O(component diameter) rounds. Near-dup components are
    clique-ish (an LSH bucket pairs all members), so 2-4 rounds is
    typical. ``algorithm="star"`` is alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): O(log² n) rounds on ANY graph shape — use it when
    components can be long paths/trees (e.g. transitive fuzzy-match
    chains) rather than LSH cliques.

    Both raise after ``max_iter`` instead of returning a partially
    converged labeling. Scale: each round is two key-partitioned
    shuffles bounded by |E|; the convergence probe is a limit-1
    existence check — O(1) driver rows, type-agnostic (an earlier
    label-SUM probe was silently wrong for string ids: SUM of strings
    is NULL, exiting after one round unconverged).
    """
    if algorithm == "star":
        labels, rounds = _cc_star(pairs, src, dst, max_iter)
    elif algorithm == "label":
        labels, rounds = _cc_label(pairs, src, dst, max_iter)
    else:
        raise ValueError(f"algorithm must be 'label' or 'star', got {algorithm!r}")
    # round-count telemetry: CC runs its loop eagerly (convergence probes
    # are actions), so callers — bench.py in particular — can read how many
    # rounds the last call took and tell iteration-count variance apart
    # from host noise in round-over-round timings
    LAST_CC_ROUNDS[algorithm] = rounds
    return labels


def _cc_label(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> tuple[DataFrame, int]:
    """Min-label propagation; returns (labels, rounds)."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        # co-partition by the per-round join key BEFORE the dedup: hash(b)
        # satisfies the (a, b) clustering dropDuplicates needs (same b ⇒
        # same partition), so the dedup costs no second exchange and the
        # persisted frame is already laid out for every round's
        # edges.b == labels.node join — the per-round |E| shuffle the
        # unpartitioned cache paid is gone (guide §2.4; r12). No explicit
        # partition count: AQE sizes it from the data.
        .repartition(F.col("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    labels = None
    try:
        for rounds in range(1, max_iter + 1):
            if rounds == 1:
                # round-1 shortcut (r13): the initial labeling is the
                # identity (label == node), so the neighbor-min of the
                # first round is just min(b) per a — the |E|⋈|V| join
                # (and a |V| distinct + cache for the init labels) is
                # algebraically redundant. Every node appears as `a`
                # (edges are symmetrized), so the groupBy covers the
                # full node set the old init frame did.
                new_label = F.least(F.col("node"), F.col("nbr_min"))
                flagged = (
                    edges.groupBy(F.col("a").alias("node"))
                    .agg(F.min("b").alias("nbr_min"))
                    .select(
                        "node",
                        new_label.alias("label"),
                        (F.col("nbr_min") < F.col("node")).alias("__chg"),
                    )
                    .localCheckpoint(eager=True)
                )
                changed = flagged.where(F.col("__chg")).limit(1).count()
                labels = flagged.drop("__chg")
                if changed == 0:
                    return labels, rounds
                continue
            nbr = (
                edges.alias("e")
                .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
                .groupBy(F.col("e.a").alias("node"))
                .agg(F.min("label").alias("nbr_min"))
            )
            # localCheckpoint (not persist): iterative loops grow the
            # LOGICAL plan every round — persist truncates re-execution but
            # analysis cost still compounds; checkpointing truncates lineage
            # so round r+1 plans against a flat scan
            new_label = F.least(
                F.col("l.label"),
                F.coalesce(F.col("n.nbr_min"), F.col("l.label")),
            )
            # labels only ever decrease and are never null, so the fixpoint
            # is exactly "no row changed" — carry the changed flag OUT of
            # the same join instead of re-joining new vs old per round
            # (saves one |V|-sized equi-join job every round); the probe is
            # then a limit-1 scan of the checkpointed frame, exact for
            # every id type (numeric, string, binary)
            flagged = (
                labels.alias("l")
                .join(nbr.alias("n"), "node", "left")
                .select(
                    F.col("node"),
                    new_label.alias("label"),
                    (new_label < F.col("l.label")).alias("__chg"),
                )
                .localCheckpoint(eager=True)
            )
            changed = flagged.where(F.col("__chg")).limit(1).count()
            labels = flagged.drop("__chg")
            if changed == 0:
                return labels, rounds
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()


def _cc_star(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star contraction (Kiveris et al. 2014);
    returns (labels, rounds). Each round:

    - **large-star**: every node u hangs its strictly-larger neighbors off
      ``m = min(Γ(u) ∪ {u})`` — long tails collapse toward component
      minima at doubling speed;
    - **small-star**: every node u re-points its ≤-neighbors (and itself)
      at that same m — flattening the partial trees into stars.

    Fixpoint = the edge set stops changing, at which point edges form
    stars centered at component minima and the labeling is one
    ``min(neighbor)`` aggregate. O(log² n) rounds worst case vs
    O(diameter) for min-label propagation — the right tool when pair
    chains are path-shaped (transitive fuzzy matches), not LSH cliques.

    Scale: every step is an |E|-bounded groupBy/join on node keys; the
    convergence probe is two limit-1 ``exceptAll`` existence checks.
    """
    raw = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
    )
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .dropDuplicates(["node"])
        .persist()
    )
    edges = raw.dropDuplicates(["u", "v"]).persist()
    edges_n: int | None = None  # carried from the previous round's probe

    def _sym(e: DataFrame) -> DataFrame:
        # repartition by u BEFORE the dedup: hash(u) satisfies the (u, v)
        # clustering, so dedup adds no exchange and both consumers of a
        # sym frame (the groupBy("u") inside _min_nbr and the join on
        # "u") read the one layout — the two identical subtrees also
        # collapse into one exchange + ReusedExchange (guide §2.4; r12)
        return (
            e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            .repartition(F.col("u"))
            .dropDuplicates(["u", "v"])
        )

    def _min_nbr(sym: DataFrame) -> DataFrame:
        return (
            sym.groupBy("u")
            .agg(F.min("v").alias("nbr_min"))
            .withColumn("m", F.least(F.col("u"), F.col("nbr_min")))
        )

    try:
        for rounds in range(1, max_iter + 1):
            # large-star: (v, m) for v ∈ Γ(u), v > u
            sym = _sym(edges)
            large = (
                sym.join(_min_nbr(sym).select("u", "m"), "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .where(F.col("u") != F.col("v"))
                # no dropDuplicates here (r12): directed's greatest/least
                # remap is 1:1 on these rows (m < v strictly, so greatest
                # is always old v, least always m) and directed dedups
                # right after — the old dedup was a redundant |E|
                # exchange + aggregate every round
            )
            # small-star on larger→smaller directed edges: (v, m) for the
            # ≤-neighborhood ∪ {u} of each u
            directed = (
                large.select(
                    F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"),
                )
                # same layout trick as _sym: one hash(u) exchange serves
                # the dedup, the _min_nbr groupBy and the join on "u"
                .repartition(F.col("u"))
                .dropDuplicates(["u", "v"])
            )
            mn = _min_nbr(directed).select("u", "m")
            small = (
                directed.join(mn, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(mn.select(F.col("u"), F.col("m").alias("v")))
                .where(F.col("u") != F.col("v"))
                .dropDuplicates(["u", "v"])
                .localCheckpoint(eager=True)
            )
            # equal counts + one empty difference ⇒ multiset equality:
            # the count probes are cheap aggregates over checkpointed
            # frames and short-circuit the (shuffling) exceptAll entirely
            # on non-final rounds. The previous round's edge count is
            # CARRIED, not recomputed — it was this round's small.count()
            # one iteration ago, so each round pays exactly one count
            # action (halves probe actions; bench-variance hygiene)
            small_n = small.count()
            if edges_n is None:
                edges_n = edges.count()
            stable = (
                small_n == edges_n
                and small.exceptAll(edges).limit(1).count() == 0
            )
            edges, edges_n = small, small_n
            if stable:
                sym = _sym(edges)
                labels = (
                    nodes.join(
                        sym.groupBy(F.col("u").alias("node")).agg(
                            F.min("v").alias("nbr_min")
                        ),
                        "node",
                        "left",
                    )
                    .select(
                        "node",
                        F.least(
                            F.col("node"), F.coalesce("nbr_min", "node")
                        ).alias("label"),
                    )
                )
                return labels, rounds
        raise RuntimeError(
            f"connected_components(star) did not converge in {max_iter} rounds"
        )
    finally:
        edges.unpersist()
        nodes.unpersist()


def _hamming(sa: Column, sb: Column, n_bits: int = SIMHASH_BITS) -> Column:
    """Hamming distance between two '0'/'1' bit strings: parse 32-bit
    chunks with ``conv(_, 2, 10)`` and count ``bit_count(a XOR b)`` —
    2·⌈n/32⌉ integer ops per pair instead of one substring-compare per bit
    (r12 optimization; the old 64-term when-chain also tripled plan size in
    every caller). Identical counts for binary strings by construction;
    cast back to int so output schemas are unchanged."""
    terms = []
    pos = 1
    while pos <= n_bits:
        ln = min(32, n_bits - pos + 1)
        ia = F.conv(F.substring(sa, pos, ln), 2, 10).cast("long")
        ib = F.conv(F.substring(sb, pos, ln), 2, 10).cast("long")
        terms.append(F.bit_count(ia.bitwiseXOR(ib)))
        pos += ln
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total.cast("int")


def signature_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bits: int = SIMHASH_BITS,
    max_hamming: int = 4,
    blocked: bool = True,
    refine_over: int | str | None = "auto",
) -> DataFrame:
    """Pairs of ids whose fixed-width bit-string signatures are within
    ``max_hamming`` — the generic pigeonhole machinery behind
    ``simhash_pairs`` (text) and ``image_neardup_pairs`` (perceptual
    hashes): ``n_bits`` split into ``max_hamming + 1`` segments; two
    signatures within the radius must agree exactly on at least one
    segment, so candidates are the per-segment bucket joins (uniform-key
    equi-join, never O(n²)), and exact hamming filters them — IDENTICAL
    output to all-pairs, blocking is a guarantee not a heuristic.
    ``blocked=False`` keeps the all-pairs formulation as the small-scale
    correctness oracle. Output: ``doc_a < doc_b, hamming``.

    ``refine_over``: LOSSLESS hot-bucket refinement (the multi-index-
    hashing second level). A segment value shared by m items contributes
    m²/2 candidates; when the signature space is vocabulary-limited
    (measured: 100× synthetic corpus, image candidates grew ~23× per 10×
    data while TRUE pairs grew 11.8× — SCALING.md), hot buckets dominate
    the verify stage. Hot buckets re-block on the COMPLEMENT bits: a
    true pair agreeing exactly on segment s has all ≤ max_hamming errors
    in the remaining bits, so pigeonholing THOSE into ``max_hamming + 1``
    sub-segments guarantees one exact sub-match — candidates shrink
    ~(sub-bucket fraction)× with zero recall loss (identical-signature
    clusters stay quadratic, as their output is). Costs one bucket-count
    shuffle over the (tiny) signature frame and (max_hamming+1)× fan-out
    on hot rows only. Applicability boundary (both measured at the 100×
    sweep, SCALING.md): a hot bucket of DIVERSE signatures colliding on
    one segment refines 9.9×; a hot bucket that is a genuine duplicate
    CLUSTER (identical signatures — they share every sub-segment too)
    cannot shrink and pays the fan-out for nothing (audio: 1.17× slower,
    identical output) — exact-dup upstream is the fix there, not better
    blocking.

    Modes (output is byte-identical in all of them — this knob is purely
    a physical plan choice):

    - ``"auto"`` (default): self-tuning. One small driver-side probe over
      the cached block frame (n_docs × (max_hamming+1) short rows) finds
      the buckets past the per-bucket break-even — occupancy above
      ``REFINE_AUTO_OCCUPANCY * (max_hamming + 1)`` AND average signature
      multiplicity m/d under ``REFINE_AUTO_MAX_DUP_RATIO`` (the measured
      diverse-vs-duplicate signal: identical-signature duplicate clusters
      are irreducible and never engage). Refinement engages only when
      those buckets' summed candidate mass Σ m(m−1)/2 exceeds
      ``REFINE_AUTO_CANDIDATES`` — below that the split plan's fixed
      shuffle cost outweighs any verify saving, and the EXACT unrefined
      plan runs instead (over the same cache, so the probe pass is not
      wasted). Within-plan, exactly the qualifying buckets refine.
      Two deliberate costs of auto, for callers that compose plans
      without executing them: construction runs ONE bounded Spark job
      (the probe — for multimodal signatures that includes the upstream
      decode pass; pass an int or ``None`` to keep construction fully
      lazy), and the block frame stays cached for the session (the
      probe's decode feeds the returned plan; tiny when the probe
      declines — n_docs×(max_hamming+1) short rows — and needed by the
      split plan when it engages; MEMORY_AND_DISK, evictable under
      pressure). The cache is lifecycle-managed: at most
      ``_SIG_CACHE_LIMIT`` block frames stay persisted (older ones are
      unpersisted FIFO — their plans just recompute), and
      ``release_signature_caches()`` drops them all once the pair
      frames have materialized.
    - ``int k``: manual override — refine every bucket with occupancy
      > k regardless of diversity (the r6 gate query pins k=1 to force
      the 100×-scale path at sf0.1).
    - ``None``: never refine.
    """
    a, b = sigs.alias("a"), sigs.alias("b")
    if not blocked:
        cand = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}")).select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"a.{sig_col}").alias("sim_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col(f"b.{sig_col}").alias("sim_b"),
        )
    else:
        n_seg = max_hamming + 1
        segs, pos, seg_meta = [], 1, []
        for s in range(n_seg):
            ln = n_bits // n_seg + (1 if s < n_bits % n_seg else 0)
            segs.append(
                F.struct(
                    F.lit(s).alias("seg"),
                    F.substring(sig_col, pos, ln).alias("sv"),
                )
            )
            seg_meta.append((s, pos, ln))
            pos += ln
        blocks = sigs.select(
            F.col(id_col), F.col(sig_col), F.explode(F.array(*segs)).alias("x")
        ).select(id_col, sig_col, F.col("x.seg").alias("seg"), F.col("x.sv").alias("sv"))
        # one hash(seg, sv) layout serves EVERY consumer of the block frame
        # (r13, guide §2.4): the candidate self-join legs, the auto-probe /
        # refine bucket-count aggregates, and the hot/cold split join all
        # key on (seg, sv) — repartitioning once here (cached below in the
        # auto/refine modes; InMemoryRelation keeps outputPartitioning)
        # deletes their per-consumer exchanges. No explicit partition
        # count: AQE sizes it from the data.
        blocks = blocks.repartition(F.col("seg"), F.col("sv"))

        def pair_join(ba, bb, extra=None):
            on = (
                (F.col("a.seg") == F.col("b.seg"))
                & (F.col("a.sv") == F.col("b.sv"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            )
            if extra is not None:
                on = on & extra
            return ba.alias("a").join(bb.alias("b"), on).select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"a.{sig_col}").alias("sim_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                F.col(f"b.{sig_col}").alias("sim_b"),
            )

        refine = refine_over
        auto_cond = (F.col("__bdf") > REFINE_AUTO_OCCUPANCY * n_seg) & (
            F.col("__bdist") * REFINE_AUTO_MAX_DUP_RATIO > F.col("__bdf")
        )
        if refine == "auto":
            # Driver-side adaptivity: the refinement's split plan carries
            # extra shuffles (bucket-count join, two self-joins, a union
            # dedup) that cost real time even when the hot side is EMPTY
            # (measured +1.5-2 s at sf0.1, where p99 occupancy is 2.0 and
            # nothing ever refines). So probe the bucket counts with one
            # small aggregate action over the cached block frame — tiny
            # by construction: n_docs × (max_hamming+1) short rows — and
            # take the EXACT unrefined plan when no bucket exceeds both
            # the occupancy and diversity thresholds. The probe's decode
            # pass is not wasted: the pair join reads the same cache.
            blocks = blocks.persist()
            _register_sig_cache(blocks)
            auto_counts = blocks.groupBy("seg", "sv").agg(
                F.count(F.lit(1)).alias("__bdf"),
                F.countDistinct(sig_col).alias("__bdist"),
            )
            hot_mass = (
                auto_counts.where(auto_cond)
                .agg(
                    F.sum(
                        F.col("__bdf") * (F.col("__bdf") - 1) / F.lit(2.0)
                    ).alias("__mass")
                )
                .collect()[0]["__mass"]
            )  # bounded collect: exactly one row
            refine = (
                "auto"
                if hot_mass is not None and hot_mass > REFINE_AUTO_CANDIDATES
                else None
            )
        if refine is None:
            cand = pair_join(blocks, blocks).dropDuplicates(["doc_a", "doc_b"])
        else:
            # the split plan references the block frame from several
            # subtrees (bucket counts + cold/hot legs of two self-joins);
            # without a cache each subtree re-evaluates the signature
            # derivation — for multimodal callers that is the Arrow decode
            # pass itself, re-run up to 5× (measured ~1.8 s at sf0.1).
            # (the auto probe already persisted; don't double-mark)
            if refine_over != "auto":
                blocks = blocks.persist()
                _register_sig_cache(blocks)
            if refine == "auto":
                # the probe's OWN aggregate splits the plan — the engage
                # decision and the in-plan hot/cold classification must
                # stay in lockstep by construction, not by parallel
                # definitions (the dup-ratio guard keeps duplicate
                # clusters cold even when other buckets engage)
                n_cols = ["__bdf", "__bdist"]
                counts = auto_counts
                hot_cond = auto_cond
            else:
                n_cols = ["__bdf"]
                counts = blocks.groupBy("seg", "sv").agg(
                    F.count(F.lit(1)).alias("__bdf")
                )
                hot_cond = F.col("__bdf") > int(refine)
            sized = blocks.join(counts, ["seg", "sv"]).select(
                id_col, sig_col, "seg", "sv", *n_cols
            )
            cold = sized.where(~hot_cond).drop(*n_cols)
            hot = sized.where(hot_cond).drop(*n_cols)

            # complement bits of segment s, as one CASE expression; then
            # its (max_hamming+1)-way sub-split — all per-seg geometry is
            # folded into literal offsets (pure codegen, no UDFs)
            def comp_expr():
                e = None
                for s, p, ln in seg_meta:
                    branch = F.concat(
                        F.substring(sig_col, 1, p - 1),
                        F.substring(sig_col, p + ln, n_bits - (p - 1) - ln),
                    )
                    e = (
                        F.when(F.col("seg") == s, branch)
                        if e is None
                        else e.when(F.col("seg") == s, branch)
                    )
                return e

            sub_structs = []
            for j in range(n_seg):
                sub = None
                for s, _p, ln in seg_meta:
                    m = n_bits - ln
                    sp = sum(
                        m // n_seg + (1 if i < m % n_seg else 0)
                        for i in range(j)
                    ) + 1
                    sl = m // n_seg + (1 if j < m % n_seg else 0)
                    branch = F.substring(F.col("__comp"), sp, sl)
                    sub = (
                        F.when(F.col("seg") == s, branch)
                        if sub is None
                        else sub.when(F.col("seg") == s, branch)
                    )
                sub_structs.append(
                    F.struct(F.lit(j).alias("sseg"), sub.alias("ssv"))
                )
            refined = (
                hot.withColumn("__comp", comp_expr())
                .select(
                    id_col, sig_col, "seg", "sv",
                    F.explode(F.array(*sub_structs)).alias("y"),
                )
                .select(
                    id_col, sig_col, "seg", "sv",
                    F.col("y.sseg").alias("sseg"),
                    F.col("y.ssv").alias("ssv"),
                )
            )
            hot_pairs = pair_join(
                refined, refined,
                extra=(F.col("a.sseg") == F.col("b.sseg"))
                & (F.col("a.ssv") == F.col("b.ssv")),
            )
            cand = (
                pair_join(cold, cold)
                .unionByName(hot_pairs)
                .dropDuplicates(["doc_a", "doc_b"])
            )
    return cand.select(
        "doc_a",
        "doc_b",
        _hamming(F.col("sim_a"), F.col("sim_b"), n_bits).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 4,
    blocked: bool = True,
    refine_over: int | str | None = "auto",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming — the SimHash
    front-end over the generic ``signature_pairs`` pigeonhole machinery
    (see there for why blocking is lossless and what ``refine_over``
    buys on vocabulary-limited corpora)."""
    return signature_pairs(
        simhash(df, text_col, id_col),
        id_col=id_col,
        sig_col="simhash",
        n_bits=SIMHASH_BITS,
        max_hamming=max_hamming,
        blocked=blocked,
        refine_over=refine_over,
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: Sequence[str] = (),
    prefix_len: int = 32,
    max_dist: int = 5,
    max_block: int = 1000,
) -> DataFrame:
    """Blocked fuzzy matching: candidate pairs whose normalized-text prefixes
    are within ``max_dist`` Levenshtein edits, compared only inside blocks
    (``block_cols``, e.g. language + length band) — the classic blocking
    trade: recall is bounded by the blocking key (pairs split across blocks
    are never compared), in exchange for never running edit distance across
    the full cross product. Output: ``id_a < id_b, dist``.

    Scale posture: the self-join is per-block, and blocks larger than
    ``max_block`` rows are dropped entirely (the hot-block guard — same
    physics as the hot-shingle document-frequency cap above: a degenerate
    block, e.g. empty-text docs, would otherwise go quadratic). Levenshtein
    runs on fixed-length prefixes so each comparison is O(prefix_len^2)
    JVM-side (`levenshtein` is codegen; no Python).

    Blocking keys are required: with no ``block_cols`` the whole corpus is
    one block, so the hot-block cap would silently drop EVERY row (any
    input > max_block) and return zero pairs — that foot-gun is a
    ValueError instead.
    """
    block_cols = list(block_cols)
    if not block_cols:
        raise ValueError(
            "fuzzy_pairs requires block_cols (e.g. language + length band): "
            "an unblocked corpus is one global block — quadratic below "
            f"max_block and silently empty above it (max_block={max_block})"
        )
    base = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).alias(f"__b{i}") for i, c in enumerate(block_cols)],
        F.substring(normalize_text(F.col(text_col)), 1, prefix_len).alias("__pfx"),
    )
    bkeys = [f"__b{i}" for i in range(len(block_cols))]
    sized = base.withColumn(
        "__bn", F.count(F.lit(1)).over(Window.partitionBy(*bkeys))
    ).where(F.col("__bn") <= max_block)
    left = sized.select(
        *bkeys, F.col("__id").alias("id_a"), F.col("__pfx").alias("__pa")
    )
    right = sized.select(
        *bkeys, F.col("__id").alias("id_b"), F.col("__pfx").alias("__pb")
    )
    return (
        left.join(right, bkeys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("__pa", "__pb"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ ``threshold`` pairs via PPJoin-style prefix
    filtering (Xiao et al., WWW 2008) — same output as
    ``ngram_jaccard_pairs`` with ``max_shingle_df=None`` (no lossy cap),
    but candidates come only from docs sharing a shingle in their
    *prefixes*: each doc's shingles are sorted by a global rarity order
    (document frequency asc, shingle asc) and only the first
    ``|S| - ceil(t·|S|) + 1`` participate in the candidate self-join.
    The prefix-filter theorem guarantees no false negatives, so the
    verification step makes the result exact.

    Scale posture (100 TB): the candidate join runs on prefix shingles
    only — and a shingle's position in every doc's order GROWS with its
    document frequency, so boilerplate (the k² blow-up in the naive
    self-join) is structurally excluded from prefixes of large docs
    instead of lossily capped. Shuffles: shingle-df groupBy, one id-keyed
    groupBy whose array_sort yields the per-doc rarity ranks AND the
    verification sets (no rank window — its per-partition sort buffers
    over the full occurrence frame were the 1000× heap hazard,
    SCALING.md), prefix self-join on shingle; candidates pass PPJoin's
    length
    + positional filters in-join, then verification — two id-keyed joins
    attaching each candidate pair's shingle SET as an array, with the
    intersection counted by codegen ``array_intersect`` per pair — no
    (pair × shingle) re-explosion (that form measured ~5× slower).

    The PPJoin+ *aggregated pair-level* positional bound
    (``c + min(|A|−lrₐ, |B|−lr_b) ≥ ⌈t/(1+t)·(|A|+|B|)⌉`` over a pair's
    shared prefix tokens) is PROVABLY row-neutral here: under a
    consistent global token order it is implied by the per-occurrence
    positional filter already in the join, on every corpus — shared
    prefix tokens w₁<…<w_c have ranks a₁≤a_c−(c−1) (order restriction
    preserves order), so the first surviving occurrence's bound
    ``1+min(|A|−a₁, |B|−b₁)`` ≥ the aggregate's
    ``c+min(|A|−a_c, |B|−b_c)``; a pair reaching aggregation always
    passes (the r4 "0 of 125k candidates cut" measurement was
    structural, not a corpus artifact; pinned by
    tests/test_corpus_ops.py::test_ppjoin_pair_bound_dominated). It is
    still EVALUATED in the plan: head-to-head at sf0.1 the with-filter
    form runs ~15-20% faster end-to-end — the extra trivially-true
    predicate changes nothing row-wise but shifts AQE's stage shaping
    over the candidate aggregate favorably (measured 4×, both orders) —
    so we keep it as a zero-row-cost plan hint, not as a pruner. The
    genuinely stronger PPJoin+ cut is the recursive suffix filter, which
    needs globally-ordered suffix arrays per pair — here the exact
    ``array_intersect`` verification already has the full sets in hand
    at that point, so it would only re-derive what one codegen
    expression settles.

    Output columns: doc_a, doc_b, jaccard (FLOOR-canonicalized to 6 dp).
    """
    cands, sets = _ppjoin_candidates(
        df, text_col, id_col, n, threshold, with_bound_cols=True
    )
    candidates = cands.where(_ppjoin_pair_bound(threshold)).select(
        "doc_a", "doc_b"
    )
    va = sets.select(
        F.col("__id").alias("doc_a"), F.col("__set").alias("__sa")
    )
    vb = sets.select(
        F.col("__id").alias("doc_b"), F.col("__set").alias("__sb")
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    return (
        candidates.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # division-derived float: FLOOR-canonicalize (never ROUND) so
            # Spark and DuckDB agree bit-for-bit at .xxx5 boundaries
            (
                F.floor(
                    inter
                    / (F.size("__sa") + F.size("__sb") - inter).cast("double")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _ppjoin_pair_bound(threshold: float) -> Column:
    """The PPJoin+ aggregated pair-level positional bound over the columns
    ``_ppjoin_candidates(..., with_bound_cols=True)`` emits. Provably
    implied by the in-join per-occurrence positional filter (see
    ``prefix_jaccard_pairs`` — it cuts zero rows on any corpus), but
    still evaluated in the production plan as a zero-cost AQE
    stage-shaping hint; split out so the dominance theorem has an
    executable regression fence (VERDICT r4 #4, resolved as a proof
    rather than a cut)."""
    return (
        F.col("__c")
        + F.least(
            F.col("__sza") - F.col("__lra"), F.col("__szb") - F.col("__lrb")
        )
        >= F.ceil(
            F.lit(threshold / (1.0 + threshold))
            * (F.col("__sza") + F.col("__szb")).cast("double")
            - F.lit(1e-9)
        )
    )


def _ppjoin_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    with_bound_cols: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(deduped candidate pairs after the in-join length + positional
    filters, per-doc shingle sets). Internal backbone of
    ``prefix_jaccard_pairs``. ``with_bound_cols=True`` additionally
    aggregates the PPJoin+ pair-bound inputs (``__c`` surviving shared
    prefix tokens, last ranks, sizes) — the PRODUCTION path:
    ``prefix_jaccard_pairs`` applies ``_ppjoin_pair_bound`` as a
    zero-row-cost AQE plan-shaping hint (~15-20% stage win measured; the
    bound is structurally implied by the in-join positional filter, so it
    never changes the row set — proven by the hypothesis property pin in
    tests/test_plans.py). ``with_bound_cols=False`` is the variant used in
    tests to prove that row-neutrality (same pairs, no bound buffers)."""
    sh = _shingle_frame(df, text_col, id_col, n).persist()
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    # Per-doc rarity ranking WITHOUT a rank window (r6 VERDICT task 7):
    # collect each doc's (df, shingle) structs and array_sort them —
    # struct comparison is field-by-field, so this IS the (df asc,
    # shingle asc) global rarity order, and the element position IS the
    # old window's row_number. One id-keyed groupBy replaces BOTH the
    # sort window (whose per-partition sort buffers over ~500M occurrence
    # rows GC-stalled the default single-JVM heap at 1000× — SCALING.md)
    # and the separate verification-set collect: the hash aggregate
    # spills by GROUP, each group bounded by one doc's shingle count, and
    # the prefix self-join input is sliced to prefix length BEFORE the
    # explode instead of filtered after it.
    docs_arr = (
        sh.join(dfreq, "shingle")
        .groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__df"), F.col("shingle")))
            ).alias("__toks")
        )
        .persist()
    )
    sets = docs_arr.select(
        "__id", F.transform("__toks", lambda x: x["shingle"]).alias("__set")
    )
    # prefix length |S| - ceil(t·|S|) + 1 ∈ [1, |S|] for t ∈ (0, 1], so
    # the ANSI slice bounds are always valid
    plen = (
        F.size("__toks")
        - F.ceil(F.lit(threshold) * F.size("__toks"))
        + F.lit(1)
    ).cast("int")
    prefix = (
        docs_arr.select(
            "__id",
            F.size("__toks").alias("sz"),
            F.slice(
                F.transform("__toks", lambda x: x["shingle"]), F.lit(1), plen
            ).alias("__prefix"),
        )
        .select(
            "__id", "sz", F.posexplode("__prefix").alias("__pos", "shingle")
        )
        .select(
            "__id", "shingle", "sz", (F.col("__pos") + F.lit(1)).alias("__rn")
        )
    )
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    sza, szb = F.col("pa.sz"), F.col("pb.sz")
    # PPJoin's two candidate cuts, both evaluated inside the join so the
    # pair never materializes. Each bound gets a 1e-9 slack so a 1-ulp-high
    # float can only RELAX it (a tighter-than-exact bound would silently
    # drop true pairs — superset-or-bust):
    # - length filter: J >= t  ⇒  min(|A|,|B|) >= t·max(|A|,|B|)
    # - positional filter: the matching token's suffix lengths upper-bound
    #   the overlap, which must reach ceil(t/(1+t)·(|A|+|B|))
    length_ok = F.least(sza, szb).cast("double") >= (
        F.lit(threshold) * F.greatest(sza, szb).cast("double") - F.lit(1e-9)
    )
    min_overlap = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (sza + szb).cast("double")
        - F.lit(1e-9)
    )
    pos_ok = (
        F.lit(1) + F.least(sza - F.col("pa.__rn"), szb - F.col("pb.__rn"))
        >= min_overlap
    )
    # Pair-level aggregated positional filter (the PPJoin+ candidate cut,
    # Xiao et al. WWW 2008 §4, in its tightest groupBy form): the global
    # rarity order is CONSISTENT across docs, so every common token
    # ordering before the last shared prefix token is itself a shared
    # prefix token — hence overlap ≤ (#shared prefix tokens) +
    # min(|A| − last_rn_A, |B| − last_rn_B). The per-occurrence pos_ok
    # above prunes inside the join; this exact pair bound then replaces
    # dropDuplicates with a same-shuffle groupBy — zero extra cost — and
    # cuts candidates on size-varied corpora before the set-verification
    # joins (on uniform-size corpora like the synthetic fixture it is
    # slack and inert; measured honestly in BASELINE.md).
    joined = pa.join(
        pb,
        (F.col("pa.shingle") == F.col("pb.shingle"))
        & (F.col("pa.__id") < F.col("pb.__id"))
        & length_ok
        & pos_ok,
    ).groupBy(
        F.col("pa.__id").alias("doc_a"), F.col("pb.__id").alias("doc_b")
    )
    extra = (
        [
            F.max("pa.__rn").alias("__lra"),
            F.max("pb.__rn").alias("__lrb"),
            F.max("pa.sz").alias("__sza"),
            F.max("pb.sz").alias("__szb"),
        ]
        if with_bound_cols
        else []
    )
    cands = joined.agg(F.count(F.lit(1)).alias("__c"), *extra)
    return cands, sets

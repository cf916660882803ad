"""Driver contract for the spark-graft builder (PySpark target).

Every query routes through the streamjoin_spark engine's builder API (the
batch twin of each operator — SURVEY.md §2), so a hash-match against the
DuckDB oracle verifies the engine itself, not hand-written Spark.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamjoin_spark import Stream

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _prep(spark: SparkSession) -> None:
    # Oracle comparison requires identical timestamp semantics (DuckDB is
    # UTC-naive) and benefits from AQE; both are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


# Per-session READER memo (r13, guide §6 listing/metadata cost): every
# `spark.read.parquet` pays a driver-side file listing + footer schema
# inference (~0.1-0.15 s here; at real scale a full object-store listing),
# re-paid on EVERY query construction — ~2-3 calls per query × 280 timed
# constructions dominated the sub-second bench tail. The memo holds the
# lazy DataFrame (an unexecuted PLAN — no rows, no results, nothing
# persisted): every action still scans the parquet files, so this is
# metadata reuse, not result caching. Keyed per SparkSession (weak — dies
# with the session) × (sf_dir, table).
_READERS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    cache = _READERS.setdefault(spark, {})
    df = cache.get((sf_dir, name))
    if df is not None:
        return df
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's reader rejects without the legacy conf) and TIMESTAMP(µs);
        # adapt to whichever physical type this dataset carries.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] in ("bigint", "long"):
            # nanos-as-long: integer division — ns magnitudes overflow double
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dict(df.dtypes)["ts"] == "timestamp_ntz":
            # keep output schemas on TIMESTAMP (LTZ) as in the nanos path;
            # session tz is UTC so the instants are identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    cache[(sf_dir, name)] = df
    return df


def _s(spark, sf_dir, name, pks, renames=None, seq=None) -> Stream:
    df = _t(spark, sf_dir, name)
    for old, new in (renames or {}).items():
        df = df.withColumnRenamed(old, new)
    s = Stream.fromDataFrame(df, name).primaryKeys(*pks)
    if seq:
        s = s.sequenceBy(*seq)
    return s


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-stage join chain + aggregation (the reference's deepest
    tested topology, RunTests.py:29-54) on sf0.001."""
    _prep(spark)
    sf_dir = "/root/testdata/sf0.001"
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    )
    return (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .join(l, "inner")
        .onKeys("o_orderkey")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toDF()
    )


# ---------------------------------------------------------------------------
# queries — one entry per implemented operator (SURVEY.md §2)
# ---------------------------------------------------------------------------
def q_join_inner(spark, sf_dir):
    """J1: incremental equi-join's batch twin — inner join on keys with
    duplicate-key drop."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    return (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .select(
            c["c_custkey"], c["c_name"], c["c_mktsegment"],
            o["o_orderkey"], o["o_totalprice"], o["o_orderstatus"],
        )
        .toDF()
    )


def q_join_left(spark, sf_dir):
    """J1 left variant: unmatched customers kept with null order columns."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    return (
        c.join(o, "left")
        .onKeys("c_custkey")
        .select(c["c_custkey"], c["c_name"], o["o_orderkey"], o["o_totalprice"])
        .toDF()
    )


def q_join_right(spark, sf_dir):
    """J1 right variant."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    return (
        o.join(c, "right")
        .onKeys("c_custkey")
        .select(c["c_custkey"], c["c_name"], o["o_orderkey"], o["o_totalprice"])
        .toDF()
    )


def q_join_theta(spark, sf_dir):
    """J2: theta join from the expression AST (equality + inequality),
    mirroring the reference's JoinTestComplex1 condition shape."""
    _prep(spark)
    p = _s(spark, sf_dir, "part", ["p_partkey"])
    l = _s(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return (
        p.join(l, "inner")
        .on((p["p_partkey"] == l["l_partkey"]) & (p["p_size"] < 10))
        .select(p["p_partkey"], p["p_size"], l["l_orderkey"], l["l_quantity"])
        .toDF()
    )


def q_join_chain3(spark, sf_dir):
    """J9: three-way join chain (stage→stream composition) + aggregation."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    )
    return (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .join(l, "inner")
        .onKeys("o_orderkey")
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toDF()
    )


def q_select_transform(spark, sf_dir):
    """P1-P3: projection with stream-scoped aliases and a source-level
    ``.to()`` transform (computed year column)."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"]).to(
        lambda df: df.withColumn("o_year", F.year("o_orderdate"))
    )
    c = _s(spark, sf_dir, "customer", ["c_custkey"], renames={"c_custkey": "o_custkey"})
    return (
        o.join(c, "inner")
        .onKeys("o_custkey")
        .select(
            o["o_orderkey"],
            o["o_year"],
            o["o_totalprice"].alias("price"),
            c["c_name"].alias("customer_name"),
        )
        .toDF()
    )


def q_drop_column(spark, sf_dir):
    """P5: side-aware drop on join output."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    n = _s(spark, sf_dir, "nation", ["c_nationkey"], renames={"n_nationkey": "c_nationkey"})
    return (
        c.join(n, "inner")
        .onKeys("c_nationkey")
        .drop(c["c_acctbal"])
        .drop(n["n_regionkey"])
        .toDF()
    )


def q_union(spark, sf_dir):
    """U1: union of a join pipeline's output with another DataFrame."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"])
    o2 = _s(spark, sf_dir, "orders", ["o_orderkey"])
    low = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") < 1000)
        .select("o_orderkey", "o_totalprice")
    )
    return (
        o.join(o2, "inner")
        .onKeys("o_orderkey")
        .select(o["o_orderkey"], o["o_totalprice"])
        .to(lambda df: df.where(F.col("o_totalprice") >= 1000))
        .union(low)
        .toDF()
    )


def q_set_ops(spark, sf_dir):
    """Relational set operations beyond UNION: customers holding an urgent
    order INTERSECT building-segment customers, and EXCEPT them — tagged
    and unioned into one frame. Both compile to Spark aggregate/anti-join
    plans (no sort-based distinct), both sides semantically DISTINCT."""
    _prep(spark)
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    building = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    both = urgent.intersect(building).select(
        "c_custkey", F.lit("both").alias("tag")
    )
    only_urgent = urgent.exceptAll(building).select(
        "c_custkey", F.lit("urgent_only").alias("tag")
    )
    return both.unionByName(only_urgent)


def q_agg_sum_count(spark, sf_dir):
    """A1: additive grouped aggregation (sum/count)."""
    _prep(spark)
    l = _s(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .toDF()
    )


def q_agg_avg_min_max(spark, sf_dir):
    """A2: non-additive aggregates (avg/min/max) — built-in combine recipes
    where the reference requires hand-written .reduce()."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"])
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .toDF()
    )


def q_join_then_agg(spark, sf_dir):
    """A3 chain: join → groupBy staging composition."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    return (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .toDF()
    )


def q_agg_then_join(spark, sf_dir):
    """A3 chain: groupBy → join (aggregate becomes a keyed stream)."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    totals = o.groupBy("c_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("cust_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tstream = totals.stage("cust_totals")
    return (
        tstream.join(c, "inner")
        .onKeys("c_custkey")
        .select(c["c_custkey"], c["c_name"], tstream["cust_total"], tstream["n_orders"])
        .toDF()
    )


def q_dedup_latest_per_key(spark, sf_dir):
    """J6/W1: latest change per key via row_number window — the engine's
    per-key change dedup exposed as an operator (events: latest event per
    user)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import latest_per_key

    ev = _t(spark, sf_dir, "events")
    return latest_per_key(
        ev, keys=["user_id"], order_by=["ts", "event_id"]
    ).select("user_id", "event_id", "ts", "event_type", "value")


def q_anti_join(spark, sf_dir):
    """J7: anti-join (customers with no orders)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import anti_join

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return anti_join(c, o, c["c_custkey"] == o["o_custkey"]).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape: wide grouped aggregation over lineitem (bench anchor)."""
    _prep(spark)
    l = _s(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).to(
        lambda df: df.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    )
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .toDF()
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape: selective 3-way join + agg (bench anchor)."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"]).to(
        lambda df: df.where(F.col("c_mktsegment") == "BUILDING")
    )
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"}).to(
        lambda df: df.where(F.col("o_orderdate") < F.lit("1995-03-15"))
    )
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    ).to(lambda df: df.where(F.col("l_shipdate") > F.lit("1995-03-15")))
    return (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .join(l, "inner")
        .onKeys("o_orderkey")
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .toDF()
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join chain through region/nation (bench anchor;
    small dims broadcast)."""
    _prep(spark)
    r = _s(spark, sf_dir, "region", ["r_regionkey"]).to(
        lambda df: df.where(F.col("r_name") == "ASIA")
    )
    n = _s(spark, sf_dir, "nation", ["n_nationkey"], renames={"n_regionkey": "r_regionkey"})
    c = _s(spark, sf_dir, "customer", ["c_custkey"], renames={"c_nationkey": "n_nationkey"})
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    )
    return (
        r.join(n, "inner")
        .onKeys("r_regionkey")
        .join(c, "inner")
        .onKeys("n_nationkey")
        .join(o, "inner")
        .onKeys("c_custkey")
        .join(l, "inner")
        .onKeys("o_orderkey")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .toDF()
    )



# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Exact content dedup groups (md5 of normalized text)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark, sf_dir):
    """3-gram Jaccard near-dup pairs at J >= 0.3."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.3)


def q_dedup_containment(spark, sf_dir):
    """3-gram containment pairs at C >= 0.8 — the asymmetric-inclusion
    detector (short doc quoted inside a long one) Jaccard misses."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.8
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(12) + LSH banding (4 bands x 3) candidate pairs."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), num_hashes=12, band_size=3, shingle_n=3
    )


def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash signature per document."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"))


# shared by the Spark query and its DuckDB oracle — 2^planes buckets bound
# the candidate-pair volume (50k vectors: 4 planes → ~156M pairs, 6 → ~39M)
_NEARDUP_PLANES = 6


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs — LSH-bucketed scale tier
    (cos >= 0.35); the exact tier is covered by unit tests."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=0.35, n_planes=_NEARDUP_PLANES, dim=64,
    )


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 10."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5)


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed approximate top-5 (hyperplane signs, 4 planes)."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import lsh_bucket_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucket_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, n_planes=4, dim=64
    )


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-flat approximate top-5: fixed-K md5-ordered centroid sample
    (k-bounded at any corpus size), nearest-list assignment, nprobe=2
    probing (operators/similarity.py ivf_topk)."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=2
    )


def q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ approximate top-5: product-quantized inverted lists (m=8
    subspaces, 16 sample codewords each), asymmetric full-query vs
    reconstructed-corpus scoring (operators/similarity.py ivf_pq_topk)."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import ivf_pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5,
        n_centroids=16, nprobe=2, dim=64, m=8, ksub=16, code_step=31,
    )


def q_quality_classifier(spark, sf_dir):
    """FastText/DCLM-style hashed linear quality classifier: mean pooled
    hashed-bag-of-words weights + bias, keep = score >= 0
    (operators/text.py hashed_classifier_score)."""
    _prep(spark)
    from streamjoin_spark.operators.text import hashed_classifier_score

    return hashed_classifier_score(
        _t(spark, sf_dir, "documents"), n_buckets=512, bias=0.0, threshold=0.0
    )


def q_gopher_filters(spark, sf_dir):
    """Gopher-rule heuristic quality gates with per-rule flags
    (operators/text.py gopher_filters); thresholds loosened to the
    synthetic corpus's scale so the flags are non-vacuous."""
    _prep(spark)
    from streamjoin_spark.operators.text import gopher_filters

    return gopher_filters(
        _t(spark, sf_dir, "documents"), min_words=30, min_stop_hits=1
    )


def q_mixture_temperature(spark, sf_dir):
    """sqrt-temperature source-mixing weights (operators/skew.py
    mixture_temperature): p ∝ share^0.5, integer-micro-unit exact."""
    _prep(spark)
    from streamjoin_spark.operators.skew import mixture_temperature

    return mixture_temperature(_t(spark, sf_dir, "documents"), group_col="lang")


def q_ann_recall(spark, sf_dir):
    """Recall@5 of the LSH tier vs the exact tier per query — the ANN
    tuning harness (operators/similarity.py ann_recall)."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        lsh_bucket_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    return ann_recall(
        cosine_topk(emb, q, k=5),
        lsh_bucket_topk(emb, q, k=5, n_planes=4, dim=64),
        k=5,
    )


def q_text_profile(spark, sf_dir):
    """Per-document text profile: tokens, ratios, quality, fingerprint,
    language guess."""
    _prep(spark)
    from streamjoin_spark.operators.text import profile

    return profile(_t(spark, sf_dir, "documents"))


def q_text_quality_by_source(spark, sf_dir):
    """Corpus rollup: mean quality + token volume per source."""
    _prep(spark)
    from streamjoin_spark.operators.text import profile

    docs = _t(spark, sf_dir, "documents")
    p = profile(docs).join(docs.select("doc_id", "source"), "doc_id")
    # Mean via an exact DECIMAL sum of per-row-rounded qualities: double AVG
    # is summation-order-sensitive at the last ulp, which flips the 4 dp
    # digit across engines. Per-row ROUND parity is bit-exact (text_profile).
    q4 = F.round(F.col("quality"), 4).cast("decimal(18,4)")
    return p.groupBy("source").agg(
        F.round(
            F.sum(q4).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_multimodal_image_features(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (decode stubbed deterministically; plumbing is production-shaped)."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import image_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return image_features(docs, decode="fake")


def q_multimodal_image_neardup(spark, sf_dir):
    """Perceptual-hash image near-dup pairs (hamming <= 4): Arrow-batched
    phash + pigeonhole-blocked pairing
    (operators/multimodal.py image_neardup_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import image_neardup_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return image_neardup_pairs(docs, max_hamming=4, decode="fake")


def q_ngram_decontaminate(spark, sf_dir):
    """GPT-3-style exact 13-gram decontamination (dedup.ngram_decontaminate,
    Brown et al. 2020 App. C): train = docs with doc_id % 7 != 0, eval =
    the rest; output the contaminated train docs with their distinct
    shared-13-gram counts. Eval grams broadcast; train never shuffles
    except on its own doc id."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 7 != 0)
    ev = docs.where(F.col("doc_id") % 7 == 0)
    return ngram_decontaminate(train, ev, n=13)


def q_multimodal_image_neardup_refined(spark, sf_dir):
    """The image pairing with the HOT-BUCKET REFINEMENT engaged
    (signature_pairs refine_over — the lossless multi-index-hashing second
    level, r6; measured 9.9× on the 100× sweep, SCALING.md note 5).
    refine_over=1 forces every bucket through the complement-bit
    re-pigeonhole, so this gate entry proves losslessness against the SAME
    DuckDB oracle as the unrefined query — identical output by
    construction, now pinned cross-engine."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import image_neardup_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return image_neardup_pairs(docs, max_hamming=4, decode="fake",
                               refine_over=1)


def q_multimodal_audio_neardup(spark, sf_dir):
    """Energy-diff audio fingerprints (64 bits, 4-byte windows) paired at
    hamming <= 3 via pigeonhole blocking
    (operators/multimodal.py audio_neardup_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import audio_neardup_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return audio_neardup_pairs(
        docs, bytes_per_window=4, n_bits=64, max_hamming=3, decode="fake"
    )


def q_multimodal_video_neardup(spark, sf_dir):
    """Frame-fingerprint video near-dup: 8 fixed-offset key frames per
    payload, phash each, pair videos sharing >= 2 distinct frame
    fingerprints (operators/multimodal.py video_neardup_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import video_neardup_pairs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return video_neardup_pairs(
        docs, frame_bytes=64, n_frames=8, min_shared=2, decode="fake"
    )


def q_lag_features(spark, sf_dir):
    """Per-user lag/lead feature prep: previous/next event values and the
    step delta (operators/windows.py lag_lead_features); order is the
    deterministic (ts, event_id) total order."""
    _prep(spark)
    from streamjoin_spark.operators.windows import lag_lead_features

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return lag_lead_features(
        ev, ["user_id"], ["ts", "event_id"], "value", lags=(1, 2), leads=(1,)
    ).select(
        "event_id", "user_id", "value",
        "value_lag1", "value_lag2", "value_lead1", "value_delta",
    )


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-activity week, then
    distinct active users per (cohort, weeks-since-cohort) cell — the
    classic growth-analytics triangle. Two shuffles (per-user first-week
    agg; cell agg). ``firsts`` is PER-USER (unbounded at 100 TB), so it is
    deliberately NOT broadcast-hinted — both sides shuffle on user_id (the
    same key the distinct just partitioned by, so the exchange reuses the
    partitioning) and AQE may still pick broadcast when the user table is
    actually small. Week arithmetic stays on week-truncated dates so the
    day-diff is exactly divisible by 7."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    firsts = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("week").cast("date"), F.col("cohort_week").cast("date"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week_n"),
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            "week_n",
            "active_users",
        )
    )


def q_merge_intervals(spark, sf_dir):
    """Overlap-union of event spans per event type (operators/temporal.py
    merge_intervals): each event covers [ts, ts+value*60] seconds; touching
    or overlapping spans merge into the type's coverage windows. One key-partitioned
    ordered window (running max-end) + one groupBy — no self-join, no
    explode. Span bounds are epoch-double sums (division-free, identical
    across engines — the sessionize lesson)."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import merge_intervals

    ev = _t(spark, sf_dir, "events")
    spans = ev.select(
        "event_type",
        "event_id",
        F.col("ts").cast("double").alias("span_start"),
        (F.col("ts").cast("double") + F.col("value") * F.lit(60.0)).alias(
            "span_end"
        ),
    )
    return merge_intervals(
        spans, ["event_type"], "span_start", "span_end", "event_id"
    )


def q_token_stats(spark, sf_dir):
    """Token-budget accounting per language: whitespace token count vs the
    BPE-ish pre-tokenizer count (functions.subword_token_count — letter
    runs / digit runs / punctuation singletons, pure regexp_count codegen).
    The subword/whitespace ratio is the standard cheap estimator for how a
    corpus will expand under a real BPE tokenizer. Division-derived ratio
    is FLOOR-canonicalized per the float invariants."""
    _prep(spark)
    from streamjoin_spark.functions import subword_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        token_count(F.col("text")).alias("ws"),
        subword_token_count(F.col("text")).alias("sw"),
    )
    sum_ws = F.sum("ws").cast("long")
    sum_sw = F.sum("sw").cast("long")
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        sum_ws.alias("ws_tokens"),
        sum_sw.alias("sw_tokens"),
        F.when(
            sum_ws > 0,
            F.floor(sum_sw / sum_ws * F.lit(10000.0)) / F.lit(10000.0),
        ).alias("subword_ratio"),
    )


def q_multimodal_audio_features(spark, sf_dir):
    """Windowed audio feature extraction (operators/multimodal.py
    audio_features): blob → fixed-size analysis windows JVM-side (sequence
    + explode + binary substr) → Arrow-batched per-window RMS/ZCR. Decode
    stubbed deterministically (hex-md5); the window plan, byte slicing,
    batch shape and schema are production-real."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import audio_features

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return audio_features(docs, bytes_per_window=100)


def q_frame_sample(spark, sf_dir):
    """Frame-sampling plan: one row per sampled frame timestamp (declarative
    explode — parallelism across frames, not videos)."""
    _prep(spark)
    from streamjoin_spark.operators.multimodal import frame_sample_plan

    fake_videos = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") / 50.0).alias("duration_s")
    ).where(F.col("doc_id") < 50)
    return frame_sample_plan(fake_videos, every_n_seconds=1.0)



def q_events_hourly_rollup(spark, sf_dir):
    """Time-bucketed rollup over the event stream (tumbling-window analog —
    the reference has no event-time windows by design, README.md:2-3; this
    is the batch twin of a windowed aggregation)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # per-row-rounded DECIMAL sum (float invariant): exact and
            # summation-order-free on both engines
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def q_hopping_rollup(spark, sf_dir):
    """Hopping-window rollup (1h windows every 15min): each event in 4
    overlapping windows, epoch-second starts
    (operators/temporal.py hopping_rollup)."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import hopping_rollup

    return hopping_rollup(
        _t(spark, sf_dir, "events"), size_s=3600, slide_s=900
    )


def q_agg_count_distinct(spark, sf_dir):
    """Non-additive aggregate (count distinct) — served by the dirty-group
    recomputation path incrementally."""
    _prep(spark)
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


def q_topk_per_group(spark, sf_dir):
    """Window ranking: top-3 orders by price per customer (W1 surface as a
    user-facing operator)."""
    _prep(spark)
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the event stream (30-minute inactivity
    boundary): classic lag + cumulative-sum window composition. Scale: one
    shuffle on user_id; each session id is assigned without materializing
    per-user state."""
    _prep(spark)
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # ts.cast("double") keeps the fractional seconds (exact parity with
    # DuckDB epoch(ts)); unix_timestamp truncates to whole seconds and can
    # split sessions differently near the 1800 s boundary.
    ts_s = F.col("ts").cast("double")
    gap = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    # Sum per-row-rounded values as DECIMAL so the total is independent of
    # partial-aggregation order (double SUM is order-sensitive at the ulp).
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
        .cast("double")
        .alias("session_value"),
    )


def q_asof_join(spark, sf_dir):
    """Backward as-of join: each purchase event matched to the user's most
    recent click at-or-before it (union + ordered-window algorithm — one
    shuffle on user_id, no range join; operators/temporal.py)."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts",
        how="left", right_order="event_id",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("event_id_right").alias("click_id"),
        F.round("value", 4).alias("click_value"),
    )


def q_range_join(spark, sf_dir):
    """Banded range join: purchase within 2 h after a view/click by the same
    user (interval buckets → equi-join; operators/temporal.py)."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    src = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("src_id"),
        "user_id",
        F.col("ts").cast("double").alias("lo"),
        (F.col("ts").cast("double") + 7200.0).alias("hi"),
    )
    dst = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("dst_id"),
        "user_id",
        F.col("ts").cast("double").alias("p"),
    )
    out = range_join(
        src, dst, keys=["user_id"], lower="lo", upper="hi", point="p",
        bucket_width=7200.0, include_lower=False,
    )
    return out.select(
        "src_id", "dst_id", F.round(F.col("p") - F.col("lo"), 3).alias("gap_s")
    )


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 shape: selective scan + global aggregate. The three
    predicates and the two-column projection reach the parquet scan
    (PushedFilters/ReadSchema) — the canonical pushdown/pruning check."""
    _prep(spark)
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 — join
    chain through the engine builder, ranking tie-broken by custkey."""
    _prep(spark)
    from pyspark.sql.window import Window

    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    )
    base = (
        c.join(o, "inner")
        .onKeys("c_custkey")
        .join(l, "inner")
        .onKeys("o_orderkey")
        .toDF()
        .where(F.col("l_returnflag") == "R")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # distributed top-k (TakeOrdered, no global single-partition window),
    # then rank only the 20 survivors
    top = base.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return top.withColumn("rk", F.row_number().over(w)).select(
        "c_custkey", "c_name", "revenue", "rk"
    )


def q_salted_join(spark, sf_dir):
    """Skew-resilient shuffled join (operators/skew.py): probe rows salted
    deterministically, build side replicated n_salts×, join on key+salt —
    result identical to the plain join, verified by an unsalted oracle."""
    _prep(spark)
    from streamjoin_spark.operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(l, o, on=["l_orderkey"], how="inner", n_salts=8)
    return j.groupBy("o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_skew_agg(spark, sf_dir):
    """Two-phase salted aggregation (operators/skew.py): partials on
    (group, salt), exact recombination per group — equals plain groupBy."""
    _prep(spark)
    from streamjoin_spark.operators.skew import salted_agg

    l = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        l,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", F.col("l_quantity")),
            "n_rows": ("count", F.lit(1)),
            "min_price": ("min", F.col("l_extendedprice")),
            "max_price": ("max", F.col("l_extendedprice")),
            "avg_discount": ("avg", F.col("l_discount")),
        },
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        "sum_qty",
        "n_rows",
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
        F.round("avg_discount", 6).alias("avg_discount"),
    )


def q_train_val_split(spark, sf_dir):
    """Deterministic, engine-portable train/val assignment by md5-hash
    bucket of doc_id (operators/skew.py deterministic_split) — reproducible
    across runs, engines and partitionings, unlike randomSplit."""
    _prep(spark)
    from streamjoin_spark.operators.skew import deterministic_split

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_split(docs, "doc_id", {"train": 90, "val": 10})


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): the deepest chain in the suite —
    supplier ⋈ lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ nation, five
    builder stages. Scale posture: both nation legs are pre-filtered to the
    two nations of interest *before* joining (each a 2-row broadcast that
    acts as a semi-filter), the shipdate predicate is pushed into the
    lineitem scan via a source transform, and only the (A,A)/(B,B) combo
    exclusion remains post-join."""
    _prep(spark)
    nations = ("NATION_1", "NATION_2")
    s = _s(spark, sf_dir, "supplier", ["s_suppkey"])
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey", "l_suppkey": "s_suppkey"},
    ).to(
        lambda df: df.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31"))
        )
    )
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    n1 = _s(
        spark, sf_dir, "nation", ["s_nationkey"],
        renames={"n_nationkey": "s_nationkey", "n_name": "supp_nation"},
    ).to(lambda df: df.where(F.col("supp_nation").isin(*nations)))
    n2 = _s(
        spark, sf_dir, "nation", ["c_nationkey"],
        renames={"n_nationkey": "c_nationkey", "n_name": "cust_nation"},
    ).to(lambda df: df.where(F.col("cust_nation").isin(*nations)))
    return (
        s.join(l, "inner").onKeys("s_suppkey")
        .join(o, "inner").onKeys("o_orderkey")
        .join(c, "inner").onKeys("c_custkey")
        .join(n1, "inner").onKeys("s_nationkey")
        .join(n2, "inner").onKeys("c_nationkey")
        .to(
            lambda df: df.where(
                F.col("supp_nation") != F.col("cust_nation")
            ).withColumn("l_year", F.year("l_shipdate").cast("long"))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toDF()
    )


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): agg → join → max-of-aggregate filter.
    The max is computed once (1-row frame) and broadcast back as a filter —
    no global window, no second scan of lineitem."""
    _prep(spark)
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey", "l_suppkey": "s_suppkey"},
    ).to(
        lambda df: df.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
    )
    s = _s(spark, sf_dir, "supplier", ["s_suppkey"])

    def keep_max(df):
        mx = df.groupBy().agg(F.max("total_revenue").alias("__mx"))
        return (
            df.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
            .drop("__mx")
        )

    return (
        l.groupBy("s_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
        .join(s, "inner").onKeys("s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
        .to(keep_max)
        .toDF()
    )


def q_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing over the corpus (operators/text.py
    pack_sequences): hash-bucketed, deterministically ordered, chunked by
    running token count — the pre-tokenization packing step of an LLM
    training pipeline."""
    _prep(spark)
    from streamjoin_spark.functions import token_count
    from streamjoin_spark.operators.text import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, "n_tokens", budget=512, n_buckets=8)


def q_chunk_documents(spark, sf_dir):
    """Sliding token-window chunking (operators/text.py chunk_tokens):
    every document split into overlapping 64-token chunks every 48 tokens —
    the context-window example-construction step of a pretraining pipeline.
    Pure codegen (tokenize → sequence → explode → slice → array_join), no
    shuffle, no Python; fan-out is data-proportional (~n_tokens/stride
    chunks per doc)."""
    _prep(spark)
    from streamjoin_spark.operators.text import chunk_tokens

    docs = _t(spark, sf_dir, "documents")
    return chunk_tokens(docs, "text", "doc_id", window=64, stride=48)


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): seven tables — part-filtered
    lineitem fact, supplier-nation leg for the share flag, customer-nation-
    region leg to restrict the market. All five dimension legs broadcast
    (part is filtered selectively; nation/region are tiny); the share is a
    conditional-sum ratio per order year."""
    _prep(spark)
    target_nation = "NATION_3"
    p = _s(spark, sf_dir, "part", ["p_partkey"]).to(
        lambda df: df.where(F.col("p_type") == "PROMO")
    )
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey", "l_suppkey": "s_suppkey",
                 "l_partkey": "p_partkey"},
    )
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"}).to(
        lambda df: df.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") <= F.lit("1996-12-31"))
        )
    )
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    s = _s(spark, sf_dir, "supplier", ["s_suppkey"])
    n1 = _s(
        spark, sf_dir, "nation", ["s_nationkey"],
        renames={"n_nationkey": "s_nationkey", "n_name": "supp_nation",
                 "n_regionkey": "supp_regionkey"},
    )
    n2 = _s(
        spark, sf_dir, "nation", ["c_nationkey"],
        renames={"n_nationkey": "c_nationkey", "n_name": "cust_nation",
                 "n_regionkey": "r_regionkey"},
    )
    r = _s(
        spark, sf_dir, "region", ["r_regionkey"],
    ).to(lambda df: df.where(F.col("r_name") == "ASIA"))
    # per-row-rounded DECIMAL sums: the ratio is order-insensitive (double
    # SUM drifts at the last ulp across partial-aggregation orders)
    vol = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        p.join(l, "inner").onKeys("p_partkey").broadcast("left")
        .join(o, "inner").onKeys("o_orderkey")
        .join(c, "inner").onKeys("c_custkey")
        .join(s, "inner").onKeys("s_suppkey")
        .join(n1, "inner").onKeys("s_nationkey")
        .join(n2, "inner").onKeys("c_nationkey")
        .join(r, "inner").onKeys("r_regionkey")
        .to(lambda df: df.withColumn("o_year", F.year("o_orderdate").cast("long")))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == target_nation, vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                4,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toDF()
    )


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left join so
    zero-order customers count, per-customer aggregation, then a second
    aggregation over the counts — the agg-of-agg histogram pattern."""
    _prep(spark)
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    o = _s(
        spark, sf_dir, "orders", ["o_orderkey"],
        renames={"o_custkey": "c_custkey"},
    ).to(lambda df: df.where(F.col("o_orderpriority") != "1-URGENT"))
    return (
        c.join(o, "left").onKeys("c_custkey")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .toDF()
    )


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution: MinHash-LSH candidate pairs → connected
    components (min-label propagation, operators/dedup.py
    connected_components) → every document labeled with its cluster's
    canonical (minimum) doc id; singletons label themselves. The keep/drop
    decision of a dedup pipeline falls out directly (keep ⇔ doc_id ==
    cluster_id). Oracle: recursive-CTE transitive closure. r12: CC is fed
    minhash_lsh_star_edges — k−1 star edges per LSH bucket instead of the
    k(k−1)/2 pairs, identical connectivity hence identical labels
    (oracle-pinned); the pairs themselves are a separate declared query."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import (
        connected_components,
        minhash_lsh_star_edges,
    )

    docs = _t(spark, sf_dir, "documents")
    labels = connected_components(minhash_lsh_star_edges(docs))
    return (
        docs.select("doc_id")
        .join(labels, docs["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )


def q_dedup_clusters_star(spark, sf_dir):
    """Duplicate-cluster resolution via alternating large/small-star
    contraction (operators/dedup.py _cc_star; Kiveris et al. 2014) —
    O(log² n) rounds on ANY component shape vs min-label's O(diameter),
    the variant to reach for when pair chains are path-shaped (transitive
    fuzzy matches) rather than LSH cliques. Identical labeling to
    q_dedup_clusters, same recursive-CTE oracle; same r12 star-edge feed
    (connectivity-equivalent, oracle-pinned)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import (
        connected_components,
        minhash_lsh_star_edges,
    )

    docs = _t(spark, sf_dir, "documents")
    labels = connected_components(minhash_lsh_star_edges(docs), algorithm="star")
    return (
        docs.select("doc_id")
        .join(labels, docs["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("cluster_id"),
        )
    )


def q_weighted_sample(spark, sf_dir):
    """Weighted sampling without replacement (operators/skew.py
    weighted_sample — Efraimidis-Spirakis exponential sort): 100 documents
    per language sampled ∝ n_chars, deterministic hash-uniform draws, the
    quality/mixture-weighting primitive of a training-data pipeline. One
    shuffle on lang; the float rank key never leaves the plan."""
    _prep(spark)
    from streamjoin_spark.operators.skew import weighted_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_sample(docs, ["lang"], 100, "n_chars", ["doc_id"])


def q_stratified_sample(spark, sf_dir):
    """Stratified sampling: exactly 200 events per event_type, chosen by a
    deterministic engine-portable hash order (operators/skew.py
    sample_per_group) — stable across runs, engines and partitionings."""
    _prep(spark)
    from streamjoin_spark.operators.skew import sample_per_group

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return sample_per_group(ev, ["event_type"], 200, ["event_id"])


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS subquery → left-semi join (operators/dedup.py
    semi_join) — probe side never multiplies, and the lineitem scan prunes to
    the two columns the condition needs (ReadSchema)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import semi_join

    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    matched = semi_join(
        o, l,
        (o["o_orderkey"] == l["l_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional (CASE) aggregation through the
    engine builder — priority split per return flag."""
    _prep(spark)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = _s(spark, sf_dir, "orders", ["o_orderkey"])
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    ).to(
        lambda df: df.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
    )
    return (
        o.join(l, "inner")
        .onKeys("o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .toDF()
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share — selective lineitem scan joined
    to part (dimension side broadcast), global conditional aggregate."""
    _prep(spark)
    p = _s(spark, sf_dir, "part", ["p_partkey"], renames={"p_partkey": "l_partkey"})
    l = _s(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).to(
        lambda df: df.where(
            (F.col("l_shipdate") >= F.lit("1996-09-01"))
            & (F.col("l_shipdate") < F.lit("1996-12-01"))
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = l.join(p, "inner").onKeys("l_partkey").toDF()
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape: HAVING via agg → filter → two-stage join chain (the
    engine's agg→join staging composition), large-quantity orders with their
    customers."""
    _prep(spark)
    l = _s(
        spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
        renames={"l_orderkey": "o_orderkey"},
    )
    o = _s(spark, sf_dir, "orders", ["o_orderkey"], renames={"o_custkey": "c_custkey"})
    c = _s(spark, sf_dir, "customer", ["c_custkey"])
    big = (
        l.groupBy("o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .to(lambda df: df.where(F.col("sum_qty") > 300))
        .stage("big_orders")
    )
    return (
        big.join(o, "inner")
        .onKeys("o_orderkey")
        .join(c, "inner")
        .onKeys("c_custkey")
        .select(
            c["c_custkey"], c["c_name"],
            big["o_orderkey"], o["o_orderdate"], o["o_totalprice"], big["sum_qty"],
        )
        .toDF()
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of brand×quantity bands as a theta-join
    condition from the expression AST (`&`/`|` composition)."""
    _prep(spark)
    p = _s(spark, sf_dir, "part", ["p_partkey"])
    l = _s(spark, sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def band(brand, lo, hi):
        return (
            (p["p_brand"] == brand)
            & (l["l_quantity"] >= lo)
            & (l["l_quantity"] <= hi)
        )

    cond = (p["p_partkey"] == l["l_partkey"]) & (
        band("Brand#12", 1, 11) | band("Brand#23", 10, 20) | band("Brand#5", 20, 30)
    )
    joined = p.join(l, "inner").on(cond).toDF()
    return joined.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier): correlated-MIN subquery — for each
    size-15 part, the European supplier(s) offering the lowest unit price.
    No partsupp table in this dataset, so lineitem serves as the
    part↔supplier offer list (unit price = extendedprice/quantity).
    Scale posture: the filtered part set and the supplier⋈nation⋈region leg
    are both broadcast; the per-part MIN is a map-side-combined groupBy
    broadcast back as a filter — no global window, one fact shuffle."""
    _prep(spark)
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") == 15)
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_acctbal", "n_name"
        )
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey", "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .join(F.broadcast(p), "l_partkey")
        .join(F.broadcast(eu), "l_suppkey")
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(F.min("unit_price").alias("__min_price"))
        .select(F.col("l_partkey").alias("__best_partkey"), "__min_price")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("__best_partkey"))
            & (F.col("unit_price") == F.col("__min_price")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name", "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            # FLOOR canonicalization, not ROUND: ext/qty often lands exactly
            # on a .xxxx5 shortest-repr boundary where Spark (BigDecimal
            # HALF_UP on the shortest repr) and DuckDB (x*10^4 → nearbyint)
            # disagree; floor of the identical double is bit-reproducible.
            (F.floor(F.col("unit_price") * 10000) / F.lit(10000.0)).alias(
                "min_unit_price"
            ),
        )
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): name-LIKE filtered part ⋈
    lineitem ⋈ supplier ⋈ nation ⋈ orders, profit per supplier nation per
    order year. No ps_supplycost in this dataset — cost proxy is
    0.5·p_retailprice·l_quantity. All dimension legs broadcast; per-row
    ROUNDed DECIMAL sum for cross-engine order-insensitive totals."""
    _prep(spark)
    p = _s(
        spark, sf_dir, "part", ["p_partkey"], renames={"p_partkey": "l_partkey"}
    ).to(lambda df: df.where(F.col("p_name").like("%red%")))
    l = _s(spark, sf_dir, "lineitem", ["o_orderkey", "l_linenumber"],
           renames={"l_orderkey": "o_orderkey", "l_suppkey": "s_suppkey"})
    s = _s(spark, sf_dir, "supplier", ["s_suppkey"])
    n = _s(spark, sf_dir, "nation", ["s_nationkey"],
           renames={"n_nationkey": "s_nationkey"})
    o = _s(spark, sf_dir, "orders", ["o_orderkey"])
    profit = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity"),
        4,
    ).cast("decimal(18,4)")
    return (
        p.join(l, "inner").onKeys("l_partkey").broadcast("left")
        .join(s, "inner").onKeys("s_suppkey")
        .join(n, "inner").onKeys("s_nationkey")
        .join(o, "inner").onKeys("o_orderkey")
        .to(lambda df: df.withColumn("o_year", F.year("o_orderdate").cast("long")))
        .groupBy("n_name", "o_year")
        .agg(
            F.round(F.sum(profit).cast("double"), 2).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .toDF()
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part value vs a scalar-subquery
    threshold (fraction of the global total). No partsupp — value is lineitem
    revenue from suppliers in one region. Exact DECIMAL partial sums; the
    1-row global total is broadcast back as a filter."""
    _prep(spark)
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    per_part = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(eu), "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("__value"))
    )
    total = per_part.agg(
        (F.sum("__value").cast("double") * F.lit(0.001)).alias("__threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("__value").cast("double") > F.col("__threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("__value").cast("double"), 2).alias("part_value"),
        )
    )


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (supplier count by part attrs): NOT-IN exclusion
    (anti-join against negative-balance suppliers — the 'complaints' analog)
    + COUNT(DISTINCT supplier) per (brand, type, size) via the lineitem
    part↔supplier link. Part filter broadcast; distinct-count is a two-level
    shuffle on uniform keys."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import anti_join

    p = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
        )
        .select(
            F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type", "p_size"
        )
    )
    excl = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("__bad_suppkey"))
    )
    pl = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), "l_partkey")
    )
    kept = anti_join(pl, excl, F.col("l_suppkey") == F.col("__bad_suppkey"))
    return (
        kept.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity revenue): correlated AVG subquery —
    lineitems below 20% of their part's average quantity. The per-part
    average is a map-side-combined groupBy broadcast back onto the fact;
    exact DECIMAL sum for the one-row total."""
    _prep(spark)
    p = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    lp = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), "l_partkey")
    )
    thresh = lp.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("__qty_limit")
    )
    small = lp.join(F.broadcast(thresh), "l_partkey").where(
        F.col("l_quantity") < F.col("__qty_limit")
    )
    dec = F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)")
    return small.agg(
        F.round(F.sum(dec).cast("double") / F.lit(7.0), 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (part promotion): nested-IN chain — suppliers who
    shipped more than a threshold of 'blue%' parts in 1997, resolved as
    agg → filter → left-semi join (operators/dedup.py semi_join). Part set
    broadcast; the qualifying-supplier set is tiny and broadcast into the
    semi probe."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import semi_join

    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("blue%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(p), "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    s = _t(spark, sf_dir, "supplier")
    qualified = semi_join(
        s, shipped, F.col("s_suppkey") == F.col("l_suppkey")
    )
    return qualified.select(
        "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal")
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS /
    NOT-EXISTS double correlation — late lineitems (no receipt/commit dates
    in this dataset; late = shipped >60 days after order date) on finished
    orders where ANOTHER supplier shares the order but NO other supplier was
    also late. Both probes are semi/anti joins on (orderkey) with a
    supplier-inequality conjunct; top 10 by wait count via distributed
    TakeOrdered, ties broken by name."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import anti_join, semi_join

    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    others = l.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("r_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    shared = semi_join(
        late, others,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey")),
    )
    sole_late = anti_join(
        shared, late_others,
        (F.col("l_orderkey") == F.col("r_orderkey"))
        & (F.col("l_suppkey") != F.col("r_suppkey")),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): scalar AVG-subquery
    threshold + NOT-EXISTS anti-join — rich customers from a nation set
    (the phone-prefix analog) with no orders since 1999 (every customer in
    this dataset has at least one order ever, so the dormancy cutoff plays
    the classic 'no orders' role). Threshold computed as an exact DECIMAL
    sum over positive balances divided once (one double op,
    order-insensitive); the 1-row threshold is broadcast."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import anti_join

    nations = [1, 3, 5, 7, 9, 11, 13]
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    dec = F.round(F.col("c_acctbal"), 2).cast("decimal(18,2)")
    thr = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("__avg_bal")
    )
    rich = c.join(F.broadcast(thr)).where(F.col("c_acctbal") > F.col("__avg_bal"))
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select(F.col("o_custkey").alias("__o_custkey"))
    )
    noorder = anti_join(rich, o, F.col("c_custkey") == F.col("__o_custkey"))
    return (
        noorder.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(dec).cast("double"), 2).alias("totacctbal"),
        )
    )


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing (operators/text.py PII_PATTERNS): per-pattern audit
    counts + redacted text fingerprint. The corpus has no organic PII, so a
    deterministic synthetic suffix (email / SSN / IPv4 derived from doc_id,
    built identically in the oracle SQL) is appended first — the scrubber
    then has real spans to find. Map-only (chained regexp codegen), no
    shuffle at any scale."""
    _prep(spark)
    from streamjoin_spark.functions import content_fingerprint
    from streamjoin_spark.operators.text import pii_counts, scrub_pii

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sid = F.col("doc_id").cast("string")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"), sid, F.lit("@mail.example.com ssn "),
        F.lpad((F.col("doc_id") * 7 % 900 + 100).cast("string"), 3, "0"),
        F.lit("-42-"),
        F.lpad((F.col("doc_id") * 13 % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        (F.col("doc_id") * 3 % 256).cast("string"),
    )
    wdf = d.select("doc_id", synth.alias("__synth"))
    cts = pii_counts(F.col("__synth"))
    clean = scrub_pii(F.col("__synth"))
    return wdf.select(
        "doc_id",
        cts["email"].alias("n_email"),
        cts["phone"].alias("n_phone"),
        cts["ssn"].alias("n_ssn"),
        cts["ipv4"].alias("n_ip"),
        F.length(clean).cast("long").alias("clean_len"),
        content_fingerprint(clean).alias("clean_fp"),
    )


def q_repetition_profile(spark, sf_dir):
    """Gopher-style repetition signals (operators/text.py
    repetition_profile): top-bigram share + distinct-token ratio per doc —
    the boilerplate/degenerate-text gate of a pretraining pipeline."""
    _prep(spark)
    from streamjoin_spark.operators.text import repetition_profile

    return repetition_profile(_t(spark, sf_dir, "documents"))


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 retrieval top-k (operators/retrieval.py bm25_topk):
    corpus filtered to query terms before any shuffle, df/N/avgdl broadcast,
    distributed TakeOrdered tail."""
    _prep(spark)
    from streamjoin_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), ["spark", "hash", "merge"], k=15
    )


def q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (operators/graph.py) over the symmetrized
    supplier↔customer order graph (customer nodes offset by 10⁶ to
    disambiguate the id spaces). 3 rounds, each two |E|-bounded shuffles;
    contributions summed as exact integer micro-units so the oracle's
    unrolled-CTE ranks hash-match bit-for-bit."""
    _prep(spark)
    from streamjoin_spark.operators.graph import pagerank

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    edges = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000000) + F.col("o_custkey")).alias("dst"),
    )
    return pagerank(edges, iters=3, symmetrize=True)


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/text.py contamination_report):
    training docs sharing a 4-gram with the held-out eval slice
    (doc_id % 50 == 0). Eval shingles broadcast — the corpus is never
    shuffled for the check."""
    _prep(spark)
    from streamjoin_spark.operators.text import contamination_report

    d = _t(spark, sf_dir, "documents")
    ev = d.where(F.col("doc_id") % 50 == 0)
    tr = d.where(F.col("doc_id") % 50 != 0)
    return contamination_report(tr, ev, n=4)


def q_perplexity_bands(spark, sf_dir):
    """CCNet-style per-language fluency bands (1=head..3=tail) from the
    unigram-LM score — quantile bucketing by histogram thresholds, no
    per-language global sort (operators/text.py perplexity_bands)."""
    _prep(spark)
    from streamjoin_spark.operators.text import perplexity_bands

    return perplexity_bands(_t(spark, sf_dir, "documents"))


def q_robust_outliers(spark, sf_dir):
    """Median/MAD outlier flags per event_type — histogram-threshold
    medians, no per-group sort (operators/profiling.py robust_outliers)."""
    _prep(spark)
    from streamjoin_spark.operators.profiling import robust_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return robust_outliers(ev, ["event_type"], "value", k=5.0)


def q_lm_logprob(spark, sf_dir):
    """Unigram-LM fluency scores (operators/text.py unigram_logprob) — the
    cheap tier of CCNet-style perplexity filtering, self-trained on the
    corpus."""
    _prep(spark)
    from streamjoin_spark.operators.text import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


def q_profile_orders(spark, sf_dir):
    """ANALYZE-style column profile (operators/profiling.py
    profile_columns): nulls / exact distinct / min / max / mean for three
    orders columns in ONE scan (multi-DISTINCT lowers to a single Expand +
    two-level partial agg); the long-form unpivot runs on the 1-row
    aggregate."""
    _prep(spark)
    from streamjoin_spark.operators.profiling import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"), ["o_totalprice", "o_orderkey", "o_custkey"]
    )


def q_histogram_totalprice(spark, sf_dir):
    """Equal-width value histogram (operators/profiling.py histogram):
    clamped bucket assignment in pure double arithmetic, one
    map-side-combined groupBy on a ≤20-value key."""
    _prep(spark)
    from streamjoin_spark.operators.profiling import histogram

    return histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", lo=0.0, hi=500000.0,
        n_buckets=20,
    )


def q_collocations(spark, sf_dir):
    """PMI collocation mining (operators/text.py collocations): top
    adjacent-pair PMI with floor-canonicalized scores and bigram
    tiebreak."""
    _prep(spark)
    from streamjoin_spark.operators.text import collocations

    return collocations(_t(spark, sf_dir, "documents"), k=30, min_count=5)


def q_zorder_key(spark, sf_dir):
    """Z-order clustering key (operators/layout.py): OPTIMIZE ZORDER
    analog — min/max-normalize each clustered column (one agg pass, 1-row
    broadcast), bit-interleave into one key. The follow-up
    repartitionByRange(z_key) gives every file tight min/max zones on ALL
    clustered columns; here the key itself is hash-verified."""
    _prep(spark)
    from streamjoin_spark.operators.layout import with_zorder_key

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    out = with_zorder_key(o, ["o_custkey", "o_totalprice"], bits=8)
    return out.select("o_orderkey", "z_key")


def q_zonemap_prune(spark, sf_dir):
    """Zone-map data skipping (operators/layout.py zone_map/prune_zones):
    Z-order orders by (custkey, totalprice), cut the Z-range into 64
    contiguous zones (top 6 bits of the 16-bit key — each zone is a tight
    hyper-rectangle in both clustered dimensions), compute per-zone
    min/max/count of o_custkey, and annotate the min/max-pruning verdict
    for ``o_custkey BETWEEN 100 AND 300`` — the file-skipping decision a
    scan planner makes from parquet footers after a Z-order write. One
    map-side combinable agg; the zone map itself is 64 rows."""
    _prep(spark)
    from streamjoin_spark.operators.layout import (
        prune_zones,
        with_zorder_key,
        zone_map,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    keyed = with_zorder_key(o, ["o_custkey", "o_totalprice"], bits=8)
    zoned = keyed.withColumn("zone", F.shiftright(F.col("z_key"), 10))
    zm = zone_map(zoned, "zone", ["o_custkey"])
    return prune_zones(zm, "o_custkey", 100, 300)


def q_source_quota(spark, sf_dir):
    """Per-source document quota (operators/text.py source_quota) — the
    domain-cap step of web-corpus curation: keep the 50 highest-quality
    docs per source (quality desc, doc_id tiebreak). One shuffle on
    source; ranking window holds one source per task."""
    _prep(spark)
    from streamjoin_spark.operators.text import profile, source_quota

    docs = _t(spark, sf_dir, "documents")
    p = profile(docs).join(docs.select("doc_id", "source"), "doc_id")
    out = source_quota(
        p.select("doc_id", "source", "quality"),
        ["source"], 50, "quality", "doc_id",
    )
    return out.select("doc_id", "source", "quality", "rnk")


def q_rolling_avg(spark, sf_dir):
    """Rolling 3-row window per user (operators/windows.py rolling_agg):
    moving average + sliding sum, ROWS frame with a unique tiebreaker."""
    _prep(spark)
    from streamjoin_spark.operators.windows import rolling_agg

    ev = _t(spark, sf_dir, "events")
    out = rolling_agg(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        aggs={
            "mov_avg": ("avg", F.col("value")),
            "mov_sum": ("sum", F.col("value")),
        },
        preceding=2,
    )
    return out.select(
        "user_id", "event_id",
        F.round("mov_avg", 4).alias("mov_avg"),
        F.round("mov_sum", 4).alias("mov_sum"),
    )


def q_cumulative_value(spark, sf_dir):
    """Running totals per user (operators/windows.py cumulative_agg)."""
    _prep(spark)
    from streamjoin_spark.operators.windows import cumulative_agg

    ev = _t(spark, sf_dir, "events")
    out = cumulative_agg(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        aggs={
            "run_value": ("sum", F.col("value")),
            "run_events": ("count", F.lit(1)),
        },
    )
    return out.select(
        "user_id", "event_id",
        F.round("run_value", 4).alias("run_value"),
        F.col("run_events"),
    )


def q_percentiles(spark, sf_dir):
    """Exact continuous percentiles per group (Spark `percentile` ↔ DuckDB
    `quantile_cont`, both linear-interpolation) through the engine's agg
    builder."""
    _prep(spark)
    o = _s(spark, sf_dir, "orders", ["o_orderkey"])
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .toDF()
    )


def q_approx_quantiles(spark, sf_dir):
    """Mergeable approx-quantile sketch (operators/sketches.py
    quantile_sketch — fixed-grid histogram, the KLL/t-digest role with an
    exact cross-engine oracle): per-returnflag p25/p50/p90/p99 of
    l_extendedprice from 512-bin partials. No global sort — two map-side
    combinable group aggs plus one ≤512-row-per-group cumulative window;
    the partials merge associatively (per-partition/per-day rollup), which
    exact percentiles (q_percentiles) fundamentally cannot. Division-
    derived edge doubles are emitted raw on both engines (identical IEEE
    expression trees), per the float invariant."""
    _prep(spark)
    from streamjoin_spark.operators.sketches import approx_quantiles

    l = _t(spark, sf_dir, "lineitem")
    return approx_quantiles(
        l, "l_extendedprice", [0.25, 0.5, 0.9, 0.99],
        group_cols=["l_returnflag"], n_bins=512,
    )


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary-size planning: the top-100 corpus tokens with rank and
    CUMULATIVE coverage share — the curve a tokenizer-budget decision reads
    ('how much of the stream does a 32k vocab cover?'). Distributed top-k
    (TakeOrdered) bounds the ranked set to k rows BEFORE the cumulative
    window, so the only ordered window runs over 100 rows, not the token
    stream; the corpus total is a 1-row broadcast. Division-derived share
    is FLOOR-canonicalized per the float invariant."""
    _prep(spark)
    from pyspark.sql.window import Window

    from streamjoin_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(100)
    total = toks.agg(F.count(F.lit(1)).alias("__total"))
    w = (
        Window.orderBy(F.desc("n"), F.asc("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.desc("n"), F.asc("tok"))).cast("long"))
        .withColumn(
            "cum_share",
            F.floor(
                F.sum("n").over(w).cast("double") / F.col("__total") * 1e6
            ) / F.lit(1e6),
        )
        .select("rank", "tok", "n", "cum_share")
    )


def q_token_topk(spark, sf_dir):
    """Corpus token frequency: explode whitespace tokens, count, distributed
    top-20 (TakeOrdered — no global single-partition window); ties broken by
    token text."""
    _prep(spark)
    from streamjoin_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("tok")).limit(20)


def q_rollup_agg(spark, sf_dir):
    """ROLLUP grouping sets over (returnflag, linestatus) — subtotal and
    grand-total rows with NULL group markers, matching ANSI semantics."""
    _prep(spark)
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_pivot_returnflag(spark, sf_dir):
    """Pivot: quantity totals per linestatus × explicit returnflag columns
    (Spark pivot ↔ oracle conditional aggregation)."""
    _prep(spark)
    l = _t(spark, sf_dir, "lineitem")
    out = l.groupBy("l_linestatus").pivot("l_returnflag", ["A", "N", "R"]).agg(
        F.round(F.sum("l_quantity"), 2)
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("qty_a"),
        F.col("N").alias("qty_n"),
        F.col("R").alias("qty_r"),
    )


def q_corpus_curation(spark, sf_dir):
    """End-to-end training-data curation pipeline: per-doc text profile
    (operators/text.py) → quality + language gate → exact-dedup keeping the
    lowest doc_id per content fingerprint (operators/dedup.py) → curated doc
    list with features. One scan of documents; dedup shuffles on the md5
    fingerprint (uniform); the quality gate prunes before the shuffle."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import exact_dedup
    from streamjoin_spark.operators.text import profile

    docs = _t(spark, sf_dir, "documents")
    prof = profile(docs, text_col="text", id_col="doc_id")
    feats = docs.select("doc_id", "text", "source").join(prof, "doc_id")
    gated = feats.where(
        (F.col("quality") >= 0.5) & (F.col("lang_guess") == "en")
    )
    groups = exact_dedup(gated, text_col="text", id_col="doc_id")
    canon = (F.col("fingerprint") == F.col("content_md5")) & (
        F.col("doc_id") == F.col("keep_id")
    )
    return gated.join(groups, canon).select(
        "doc_id", "source", "n_tokens", "quality", "fingerprint", "n_copies"
    )


def q_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch per event_type — the
    mergeable bottom-k estimator (operators/sketches.py). Deterministic
    across engines: md5-parity hashing, exact-double division."""
    _prep(spark)
    from streamjoin_spark.operators.sketches import kmv_distinct

    ev = _t(spark, sf_dir, "events")
    return kmv_distinct(ev, ["event_type"], "user_id", k=64)


def q_gap_fill(spark, sf_dir):
    """Time-series densify + forward fill: hourly rollup per event_type with
    missing hours materialized and sum_value carried forward
    (operators/temporal.py gap_fill — Pandas ffill / InfluxDB
    fill(previous) analog)."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import gap_fill

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # sum per-row-ROUNDed DECIMALs, then cast (float invariant): a
        # direct double SUM rounded afterwards is summation-order-sensitive
        # at the last ulp and can flip the 4 dp digit across engines
        F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )
    filled = gap_fill(
        hourly,
        keys=["event_type"],
        time_col="hour",
        step=F.expr("INTERVAL 1 HOUR"),
        agg_cols=["sum_value"],
    )
    return filled.select(
        "event_type",
        "hour",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "sum_value",
        "is_gap",
    )


def q_cube_agg(spark, sf_dir):
    """CUBE grouping sets over (returnflag, linestatus) — all 2^2 grouping
    combinations with grouping_id disambiguating aggregated-away NULLs
    (ROLLUP twin: q_rollup_agg)."""
    _prep(spark)
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
        F.grouping_id().cast("long").alias("gid"),
    )


def q_lpa_communities(spark, sf_dir):
    """Synchronous label-propagation communities (3 rounds, deterministic
    min-label tie-break) over the part co-occurrence graph
    (operators/graph.py label_propagation)."""
    _prep(spark)
    from streamjoin_spark.operators.graph import (
        cooccurrence_edges,
        label_propagation,
    )

    l = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(l, "l_orderkey", "l_partkey", min_support=2)
    return label_propagation(edges, rounds=3)


def q_triangle_count(spark, sf_dir):
    """Graph analytics: triangles in the part co-purchase graph (edge =
    two parts co-ordered in >= 2 distinct orders; operators/graph.py
    cooccurrence_edges + triangles). Support thresholding keeps the edge
    list hub-free before the wedge-closure joins."""
    _prep(spark)
    from streamjoin_spark.operators.graph import cooccurrence_edges, triangles

    l = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(l, "l_orderkey", "l_partkey", min_support=2)
    return triangles(edges)


def q_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy matching over documents: Levenshtein <= 5 on 32-char
    normalized prefixes, compared only within (lang, length-band) blocks
    with a hot-block cap (operators/dedup.py fuzzy_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import fuzzy_pairs

    docs = _t(spark, sf_dir, "documents").withColumn(
        "len_band", F.floor(F.col("n_chars") / 16).cast("long")
    )
    return fuzzy_pairs(
        docs,
        text_col="text",
        id_col="doc_id",
        block_cols=["lang", "len_band"],
        prefix_len=32,
        max_dist=5,
        max_block=1000,
    )


def q_ntile_quartiles(spark, sf_dir):
    """NTILE quartile stats per order priority — partitioned ranking window
    (never a global single-partition sort), decimal-sum avg
    canonicalization per the float invariants."""
    _prep(spark)
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    q = o.withColumn("quartile", F.ntile(4).over(w))
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        (
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(100.0)
            )
            / F.lit(100.0)
        ).alias("avg_price"),
    )


def q_cms_topk(spark, sf_dir):
    """Count-min-sketch heavy hitters over document tokens
    (operators/sketches.py): depth-3 × width-1024 counter table (broadcast),
    estimates = min over seeds, never below the true count; exact counts
    carried for the accuracy audit."""
    _prep(spark)
    from streamjoin_spark.functions import tokens
    from streamjoin_spark.operators.sketches import cms_topk

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).where(
        F.col("tok") != ""
    )
    return cms_topk(toks, "tok", k=20, depth=3, width=1024)


def q_bloom_prune(spark, sf_dir):
    """Bloom-filter runtime-prune (operators/sketches.py): lineitem probe
    filtered by a Bloom filter built over urgent orders' keys; per-flag
    candidate counts vs exact semi-join counts expose the false-positive
    margin the exact join would then resolve."""
    _prep(spark)
    from streamjoin_spark.operators.sketches import bloom_positions, bloom_prune

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    # project the probe side to the two columns this query consumes BEFORE
    # the prune (guide §2.3): the spread_scan exchange and the semi-join
    # probes then move (key, flag) instead of full 16-column rows
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    # persist the (≤ m-row) position set: the k membership semi-joins each
    # broadcast it, and uncached each build re-derived it from the orders
    # scan (3× two exchanges of the same tiny frame — r13, guide §5)
    pos = bloom_positions(o, "o_orderkey", m=65536, k=3).persist()
    cand = bloom_prune(l, pos, "l_orderkey", m=65536, k=3)
    # ONE pass (r13, guide §2.4): Bloom filters have no false negatives,
    # so every true match survives the prune — the exact-match count can
    # be taken over the PRUNED frame (the "follow with the exact join"
    # step of a runtime filter) instead of re-scanning lineitem. The
    # true-match flag is a broadcast left join on the unique order key;
    # both counts come out of one aggregate. The n_true > 0 filter keeps
    # the original inner-join semantics (a returnflag with candidates but
    # zero true matches was dropped by the join of the two aggregates).
    hit = (
        cand.join(
            F.broadcast(o.select(F.col("o_orderkey").alias("__ok"))),
            cand["l_orderkey"] == F.col("__ok"),
            "left",
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.count(F.col("__ok")).alias("n_true"),
        )
        .where(F.col("n_true") > 0)
    )
    return hit.select("l_returnflag", "n_candidates", "n_true")


def q_json_props(spark, sf_dir):
    """Semi-structured extraction: parse the events JSON payload JVM-side
    (get_json_object — codegen, no Python) and aggregate the extracted
    field per event_type. The scan prunes to (event_type, props); at scale
    this is a map-only parse feeding a map-side-combinable agg."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval with reciprocal-rank fusion (operators/retrieval.py
    rrf_fuse): a BM25 lexical top-15 and a cosine vector top-15 (query =
    embedding 0; doc ids align with vec ids) fused by 1/(60+rank).
    Per-leg rank windows run over k-bounded lists (15 rows) — the global
    orderBy there is bounded by k, not corpus size."""
    _prep(spark)
    from pyspark.sql.window import Window

    from streamjoin_spark.operators.retrieval import bm25_topk, rrf_fuse
    from streamjoin_spark.operators.similarity import cosine_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "hash", "merge"], k=15).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
    )
    vec = cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=15).select(
        F.col("neighbor_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine_sim"), F.asc("neighbor_id")))
        .alias("rank"),
    )
    # fuse ALL candidates (<= 30 rows), canonicalize the score, THEN take the
    # top-10 by the floored value — the oracle selects by the same floored
    # key, so a floor-tie at the boundary resolves identically on both sides
    fused = rrf_fuse([lex, vec], id_col="doc_id", k=30, c=60)
    return (
        fused.select(
            "doc_id",
            F.col("rank_0").alias("rank_lex"),
            F.col("rank_1").alias("rank_vec"),
            (F.floor(F.col("rrf_score") * 1000000) / F.lit(1000000.0)).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
    )


def q_rank_metrics(spark, sf_dir):
    """Relative-rank window functions (percent_rank / cume_dist) per order
    priority — partitioned windows, division-derived floats floor-
    canonicalized. Restricted to the top-50 orders per priority so the
    result set stays bounded while still exercising tie semantics."""
    _prep(spark)
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        (
            F.floor(F.percent_rank().over(w) * 1000000) / F.lit(1000000.0)
        ).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * 1000000) / F.lit(1000000.0)).alias(
            "cume"
        ),
    )
    return ranked.where(F.col("rn") <= 50).drop("rn")


def q_kmeans_clusters(spark, sf_dir):
    """SemDeDup-style semantic clustering: one Lloyd round of k-means (k=8,
    deterministic lowest-id seeds) over the embedding corpus, profiled per
    cluster (size, canonical mean distance, smallest member id).

    Scale posture: assignment is map-only (8-row centroid broadcast);
    recompute is one (cluster, dim)-key shuffle whose reduce side is k·dim
    rows; the corpus is scanned, never self-joined. Distances are strict
    left folds rounded 6 dp; centroid means and avg_dist are division-
    derived → FLOOR-canonicalized per the float invariant.
    """
    _prep(spark)
    from streamjoin_spark.operators.clustering import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans(emb, k=8, iters=1)
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.floor(
                    F.sum(F.col("dist").cast("decimal(27,6)")).cast("double")
                    / F.count(F.lit(1))
                    * F.lit(1e4)
                )
                / F.lit(1e4)
            ).alias("avg_dist"),
            F.min("vec_id").alias("min_member"),
        )
        .orderBy("cluster_id")
    )


def q_hll_distinct(spark, sf_dir):
    """HyperLogLog distinct-orderkey estimate per returnflag (b=9, m=512
    registers) with the exact count alongside for the accuracy audit.

    Scale posture: one shuffle of ≤m register rows per group (MAX combines
    map-side); registers merge across partitions/days by the same MAX — the
    running-cardinality story exact COUNT(DISTINCT) cannot offer at 100 TB.
    Estimate math is integer-exact (BIGINT Σ 2^(52-ρ)) except one division
    between identical doubles; the shipped groups sit on the raw-estimate
    branch (n ≫ 2.5m), so no ln() is evaluated.
    """
    _prep(spark)
    from streamjoin_spark.operators.sketches import hll_distinct

    l = _t(spark, sf_dir, "lineitem")
    return hll_distinct(l, ["l_returnflag"], "l_orderkey", b=9).orderBy(
        "l_returnflag"
    )


def q_funnel_events(spark, sf_dir):
    """Strict-order view→click→purchase funnel: users converting at each
    step (earliest qualifying event strictly after the previous step's
    conversion time) + conversion share of step 1. Every shuffle in the
    step chain is on user_id (exchange reuse); rates FLOOR-canonicalized.
    """
    _prep(spark)
    from streamjoin_spark.operators.funnel import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


def q_expectations_report(spark, sf_dir):
    """DLT-expectations-style data-quality report over orders: four row
    rules folded into ONE HashAggregate pass (conditional counts — no
    per-rule scans) plus a referential-integrity row (lineitem.l_orderkey
    → orders.o_orderkey, broadcast anti-join). Violation rates are
    division-derived → FLOOR-canonicalized.
    """
    _prep(spark)
    from streamjoin_spark.operators.expectations import check, fk_check

    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    report = check(
        o,
        {
            "orderkey_not_null": "o_orderkey IS NOT NULL",
            "totalprice_positive": "o_totalprice > 0",
            "high_value": "o_totalprice >= 200000",
            "date_before_2000": "o_orderdate < TIMESTAMP'2000-01-01'",
        },
    )
    orphans = fk_check(l, o, {"l_orderkey": "o_orderkey"})
    fk_row = (
        l.agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(
            F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
        )
        .select(
            F.lit("fk_lineitem_orderkey").alias("rule"),
            "n_rows",
            "n_violations",
            (
                F.floor(
                    F.col("n_violations").cast("double")
                    / F.col("n_rows")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("violation_rate"),
        )
    )
    return report.unionByName(fk_row).orderBy("rule")


def q_passage_dedup(spark, sf_dir):
    """C4/RefinedWeb-style passage-granular dedup: 20-token non-overlapping
    passages, first global occurrence survives, documents reassembled from
    surviving passages. One shuffle on the passage hash + one on doc_id —
    no self-join (operators/text.py passage_dedup)."""
    _prep(spark)
    from streamjoin_spark.operators.text import passage_dedup

    return passage_dedup(_t(spark, sf_dir, "documents"), passage_tokens=20)


def q_mixture_sample(spark, sf_dir):
    """Target-mixture data selection: exactly 60 documents at 40/30/20/10 %
    shares over four sources (largest-remainder quotas 24/18/12/6),
    members chosen by deterministic hash order — the DoReMi/Pile-style
    source-mixing primitive. One shuffle on source; quota lookup is an
    ANSI-safe literal CASE chain (skew.mixture_sample)."""
    _prep(spark)
    from streamjoin_spark.operators.skew import mixture_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_sample(
        docs,
        "source",
        {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1},
        total=60,
        id_cols=["doc_id"],
    )


def q_ppjoin_pairs(spark, sf_dir):
    """PPJoin-style prefix-filtered EXACT Jaccard pairs (n=3, t=0.5): the
    candidate self-join touches only each doc's rarity-ordered prefix
    shingles, structurally excluding boilerplate from the k² blow-up; the
    verify step makes results identical to the brute-force join — which is
    exactly what the oracle runs (dedup.prefix_jaccard_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.5
    )


def q_corr_matrix(spark, sf_dir):
    """Pearson correlations for three lineitem column pairs in ONE scan
    (single 1-row HashAggregate; map-side partials). Decimal-exact sums →
    identical doubles → IEEE-correctly-rounded sqrt, so r is bit-stable
    cross-engine (operators/profiling.py pearson_corr)."""
    _prep(spark)
    from streamjoin_spark.operators.profiling import pearson_corr

    l = _t(spark, sf_dir, "lineitem")
    return pearson_corr(
        l,
        [
            ("l_quantity", "l_extendedprice"),
            ("l_quantity", "l_discount"),
            ("l_extendedprice", "l_discount"),
        ],
    )


def q_kmv_set_ops(spark, sf_dir):
    """Theta-sketch-style set algebra from two bottom-k sketches (k=256):
    union / intersection / Jaccard estimates for the 1996-buyer vs
    1997-buyer customer sets, exact values alongside. Every sketch is a
    distributed top-k; everything downstream is ≤ k rows
    (sketches.kmv_set_ops)."""
    _prep(spark)
    from streamjoin_spark.operators.sketches import kmv_set_ops

    o = _t(spark, sf_dir, "orders")
    a = o.where(F.year("o_orderdate") == 1996)
    b = o.where(F.year("o_orderdate") == 1997)
    return kmv_set_ops(a, b, "o_custkey", k=256)


def q_hilbert_key(spark, sf_dir):
    """2-D Hilbert clustering key over (o_custkey, o_totalprice), bits=8 —
    the liquid-clustering-style upgrade over Z-order (unit-step locality,
    no Z jumps). One stats pass + a map-only 8-level projection chain;
    the level expressions are THE SAME SQL text the oracle runs
    (layout.hilbert_level_exprs)."""
    _prep(spark)
    from streamjoin_spark.operators.layout import with_hilbert_key

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return with_hilbert_key(o, ["o_custkey", "o_totalprice"], bits=8).select(
        "o_orderkey", "h_key"
    )


def q_outlier_events(spark, sf_dir):
    """Per-event-type z-score outliers (|z| ≥ 2.5, population σ): one
    moment pass + map-only scoring; decimal-exact sums → bit-stable z
    (profiling.group_outliers)."""
    _prep(spark)
    from streamjoin_spark.operators.profiling import group_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return group_outliers(ev, ["event_type"], "value", z_threshold=2.5)


def q_distinctive_terms(spark, sf_dir):
    """Per-source distinctive vocabulary: top-5 tokens by the log-free
    TF-IDF surrogate tf·n_groups/df (ln drifts a ulp cross-engine; the
    rational score ranks identically). One (group, token) count shuffle;
    n_groups is a 1-row broadcast (text.distinctive_terms)."""
    _prep(spark)
    from streamjoin_spark.operators.text import distinctive_terms

    return distinctive_terms(
        _t(spark, sf_dir, "documents"), top_n=5, min_df=2
    )


def q_semdedup_prune(spark, sf_dir):
    """SemDeDup end-to-end (clustering.semdedup, Abbas et al. 2023):
    k-means clusters bound the candidate space, intra-cluster cosine ≥ τ
    prunes to the lowest-id keeper. Pairwise work never crosses clusters —
    k grows with the corpus so the per-cluster quadratic stays bounded;
    cosine is a codegen fold, FLOOR-canonicalized (division-derived)."""
    _prep(spark)
    from streamjoin_spark.operators.clustering import semdedup

    return semdedup(_t(spark, sf_dir, "embeddings"), k=8, tau=0.8, iters=1)


def q_kcore(spark, sf_dir):
    """k-core decomposition (graph.k_core) of the part co-purchase graph:
    iterative peeling of degree<3 nodes to the stable 3-core. Each round is
    one map-side-combinable degree groupBy + two |E|-bounded semi-filters,
    localCheckpoint per round; peeling is monotone, so the fixed-unroll
    DuckDB oracle (a superset of the convergence rounds) is exact."""
    _prep(spark)
    from streamjoin_spark.operators.graph import cooccurrence_edges, k_core

    l = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(l, "l_orderkey", "l_partkey", min_support=1)
    return k_core(edges, k=3)


def q_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights (text.dsir_logratio, Xie et al. 2023):
    per-document average unigram log-likelihood ratio between the
    'src0'-domain LM and the full-corpus LM, add-1 smoothed — the
    importance-resampling score that shifts a raw corpus toward a target
    domain. One (doc, token) shuffle; both LMs accumulate in the same vocab
    pass; log-ratios broadcast back for map-only scoring."""
    _prep(spark)
    from streamjoin_spark.operators.text import dsir_logratio

    return dsir_logratio(
        _t(spark, sf_dir, "documents"), F.col("source") == F.lit("src0")
    )


def q_cross_corpus_neardup(spark, sf_dir):
    """Cross-corpus near-dup contamination (dedup.minhash_lsh_pairs_between):
    'src0' documents sharing any MinHash band bucket with a document from
    any OTHER source — the near-dup complement to the exact-ngram
    decontaminate query. Both sides reduce to constant-fan-out band
    buckets; the join shuffles on the uniform (band, bh) key (an eval-sized
    right side would broadcast)."""
    _prep(spark)
    from streamjoin_spark.operators.dedup import minhash_lsh_pairs_between

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_between(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
    )


def q_ewma_user_value(spark, sf_dir):
    """Per-user trailing EWMA of event values (operators/temporal.py ewma):
    α=0.3 over the last 8 observations ordered by (ts, event_id),
    partial-window normalized. Weights are Python-precomputed literals in
    BOTH engines (pow() is not correctly-rounded; literals cannot drift);
    sums are strict left folds; the normalization is FLOOR-canonicalized.
    One shuffle on user_id; bounded 8-value frames; map-only after."""
    _prep(spark)
    from streamjoin_spark.operators.temporal import ewma

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    out = ewma(ev, ["user_id"], ["ts", "event_id"], "value",
               alpha=0.3, window=8)
    return out.select("user_id", "event_id", "value", "ewma")


# ---------------------------------------------------------------------------
# IVM end-to-end under the oracle gate: the incremental runtime itself
# (ChangeTable CDC -> governed drain -> maintained state), driver-checkable.
# Each query builds fresh ChangeTables in a temp dir, drains the pipeline,
# applies one deterministic CDC round (update + delete + insert), drains
# again, and returns the MAINTAINED table; the DuckDB oracle computes the
# same result directly over the simulated final state — equality proves
# insert/update/delete retraction through streaming/incremental.py, not
# just the batch twins. (r4 VERDICT: "incremental pipelines are CDC-tested
# only" — these put the runtime inside the correctness gate.)
# ---------------------------------------------------------------------------
def q_ivm_exact_dedup(spark, sf_dir):
    """IVM e2e: incremental exact-dedup state after a CDC round — docs with
    doc_id % 7 == 0 rewritten (moves them between content groups), docs
    with doc_id % 11 == 3 deleted (shrinks/deletes groups, re-elects
    keep_id via dirty-group recompute). Maintained table ≡ exact_dedup of
    the final corpus (pipelines.incremental_exact_dedup)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.pipelines import incremental_exact_dedup

    # deterministic 1/3 subsample: the e2e check proves the CDC paths,
    # not throughput — keep its bench cost proportionate (same filter in
    # the oracle)
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_dedup_")
    ct = ChangeTable.create(
        spark, f"{base}/docs", docs.schema, ["doc_id"], n_buckets=8
    )
    ct.merge(docs)
    w = incremental_exact_dedup(ct, f"{base}/state")
    w.run()
    ct.merge(
        docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" rewritten")).alias("text"),
        )
    )
    ct.delete_where("doc_id % 11 = 3")
    w.run()
    return w.toDF()


def q_ivm_join_cdc(spark, sf_dir):
    """IVM e2e: incremental customer⋈orders state after a CDC round —
    customers with c_custkey % 5 == 0 re-segmented (updates fan out to all
    their order rows via the probe leg), orders with o_orderkey % 13 == 1
    deleted (join rows retract), orders with o_orderkey % 17 == 2 cloned
    under new keys (inserts join in). Maintained table ≡ the plain join
    of the final states (streaming/incremental.py _JoinStage)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    # deterministic 1/4 order subsample (see q_ivm_exact_dedup)
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_join_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"],
                o["o_orderkey"], o["o_totalprice"])
        .writeToPath(f"{base}/state")
    )
    w.run()
    cct.merge(
        cust.where(F.col("c_custkey") % 5 == 0).select(
            "c_custkey", "c_name", F.lit("MOVED").alias("c_mktsegment")
        )
    )
    oct_.delete_where("o_orderkey % 13 = 1")
    oct_.merge(
        orders.where(F.col("o_orderkey") % 17 == 2).select(
            (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
        )
    )
    w.run()
    return w.toDF()


def q_ivm_agg_cdc(spark, sf_dir):
    """IVM e2e: incremental grouped aggregation after a CDC round that
    exercises BOTH non-insert paths — orders with o_orderkey % 19 == 0
    move to a new priority group (retract from old, add to new), orders
    with o_orderkey % 13 == 1 delete (pure retraction; an all-deleted
    group must vanish, not zero out). Maintained table ≡ the aggregate of
    the final state; the decimal-sum-cast-double law keeps the float
    bit-reproducible across engines (repo invariant)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    # deterministic 1/4 order subsample (see q_ivm_exact_dedup)
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_agg_")
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    oct_.merge(orders)
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
            ).cast("double").alias("total_price"),
        )
        .writeToPath(f"{base}/state")
    )
    w.run()
    oct_.merge(
        orders.where(F.col("o_orderkey") % 19 == 0).select(
            "o_orderkey",
            F.lit("9-MOVED").alias("o_orderpriority"),
            "o_totalprice",
        )
    )
    oct_.delete_where("o_orderkey % 13 = 1")
    w.run()
    return w.toDF()



def q_ann_ivf_refined(spark, sf_dir):
    """IVF-flat with a k-means-REFINED coarse quantizer: the fixed-K
    md5-ordered sample seeds one deterministic Lloyd round (L2 assignment,
    canonical FLOOR-mean recompute — the FAISS coarse-quantizer training
    step), then the usual cosine assignment/probing runs against the
    refined centroids (operators/similarity.py refined_centroids +
    ivf_topk(refine_iters=1))."""
    _prep(spark)
    from streamjoin_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), k=5,
        n_centroids=8, nprobe=2, refine_iters=1,
    )



def _winnow_sel_sql(k: int, w: int) -> str:
    """Shared winnowing-selection CTE chain (DuckDB): token k-gram hash64
    rolling hashes, w-hash windows, rightmost-min selection — the SQL twin
    of operators/text.py winnow_fingerprints."""
    return rf"""
        wbase AS (SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            t -> t <> '') AS tk
            FROM documents),
        wh AS (SELECT doc_id,
                 CASE WHEN len(tk) >= {k} THEN
                   list_transform(generate_series(1, len(tk) - {k - 1}),
                     i -> ('0x' || substr(md5(array_to_string(
                              tk[i:i+{k - 1}], ' ')), 1, 15))::BIGINT)
                 ELSE CAST([] AS BIGINT[]) END AS hs
              FROM wbase),
        wwnd AS (SELECT doc_id, j, hs[j:j+{w - 1}] AS win
                 FROM wh, UNNEST(generate_series(1,
                      GREATEST(len(hs) - {w - 1}, 0))) t(j)),
        wsel AS (SELECT doc_id,
                        CAST(j + {w} - list_position(list_reverse(win),
                                 list_min(win)) AS INT) AS pos,
                        list_min(win) AS fp
                 FROM wwnd)
    """


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) rolling-hash document fingerprints: k-gram hash64
    hashes, w-window rightmost-min selection — the local, position-robust
    fingerprint tier (operators/text.py winnow_fingerprints)."""
    _prep(spark)
    from streamjoin_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), k=4, w=5
    )


def q_winnow_overlap(spark, sf_dir):
    """MOSS-style overlap pairs: documents sharing >= 2 distinct winnowed
    fingerprints, hot-fingerprint DF cap at 50% of the corpus
    (operators/text.py winnow_overlap_pairs)."""
    _prep(spark)
    from streamjoin_spark.operators.text import winnow_overlap_pairs

    return winnow_overlap_pairs(
        _t(spark, sf_dir, "documents"), k=4, w=5, min_shared=2,
        max_fp_df=0.5,
    )



def q_ivm_chain_cdc(spark, sf_dir):
    """IVM e2e, depth 3: the chained maintained-view pipeline
    (pipelines.incremental_dedup_chain — fingerprint view → exact-dup
    pairs → one-hop cluster assignment, each stage consuming the previous
    maintained table's change feed) drained through a CDC round; the
    returned CLUSTER ASSIGNMENT table must equal the three-stage
    composition computed directly over the simulated final corpus."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.pipelines import incremental_dedup_chain

    # the synthetic corpus has no exact duplicates — inject deterministic
    # clones (doc_id+1000000, same text) so the chain has real groups; the
    # later CDC round rewrites/deletes across originals AND clones, which
    # splits groups and forces keeper re-election through all 3 stages
    orig = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 0)
        .select("doc_id", "text")
    )
    docs = orig.unionByName(
        orig.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
        )
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_chain_")
    ct = ChangeTable.create(
        spark, f"{base}/docs", docs.schema, ["doc_id"], n_buckets=8
    )
    ct.merge(docs)
    chain = incremental_dedup_chain(ct, f"{base}/chain")
    chain.run()
    ct.merge(
        docs.where(F.col("doc_id") % 7 == 0).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" rewritten")).alias("text"),
        )
    )
    ct.delete_where("doc_id % 11 = 3")
    chain.run()
    return chain.assign.toDF()



def q_ivm_scd2(spark, sf_dir):
    """IVM e2e: SCD Type-2 history (ChangeTable.history()) after a CDC
    round — one per-key ordered window over the delete-carrying change
    feed (changelog.py history(); the reference's CDF drops deletes,
    elzyme/streams.py:132,142, so it cannot build this at all). v1 bulk
    load, v2 segment moves (c_custkey % 28 == 0), v3 deletes
    (c_custkey % 20 == 0): updates close intervals and open new ones,
    deletes close intervals without emitting a row. The oracle rebuilds
    the same intervals from the simulated change log."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", "c_mktsegment", F.col("c_acctbal").alias("bal"))
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_scd2_")
    ct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    ct.merge(cust)                                     # v1: inserts
    ct.merge(                                          # v2: segment moves
        cust.where(F.col("c_custkey") % 28 == 0).select(
            "c_custkey", F.lit("MOVED").alias("c_mktsegment"), "bal"
        )
    )
    ct.delete_where("c_custkey % 20 = 0")              # v3: deletes
    return ct.history().select(
        "c_custkey", "c_mktsegment", "bal",
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        "is_current",
    )



def q_ivm_sessions(spark, sf_dir):
    """IVM e2e: gap-based sessionization MAINTAINED under CDC
    (pipelines.incremental_sessions — dirty-group recompute per touched
    user), after a round where timestamp edits split sessions and deletes
    shift boundaries. The oracle recomputes per-user session stats over
    the simulated final state with the window composition; the maintained
    table must equal it exactly — the late-data/merge/split cases
    watermarked streaming session windows approximate, this converges."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.pipelines import incremental_sessions

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") % 5 == 0)
        .select(
            "event_id", "user_id",
            F.col("ts").cast("double").alias("ts"), "value",
        )
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_sess_")
    ct = ChangeTable.create(
        spark, f"{base}/ev", ev.schema, ["event_id"], n_buckets=8
    )
    ct.merge(ev)
    w = incremental_sessions(ct, f"{base}/sess", ts_col="ts")
    w.run()
    ct.merge(                                       # ts edits: splits/moves
        ev.where(F.col("event_id") % 35 == 0).select(
            "event_id", "user_id",
            (F.col("ts") + F.lit(100000.0)).alias("ts"), "value",
        )
    )
    ct.delete_where("event_id % 40 = 0")            # boundary shifts
    w.run()
    return w.toDF().select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_sessions").cast("long").alias("n_sessions"),
        "total_value",
    )



def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix: for every source pair, how many
    distinct opening fingerprints (first-6-token prefix md5 — the shared
    boilerplate/mirror-opening heuristic) they share — the curation
    diagnostic for 'which feeds are mirroring each other' before mixture
    weighting. Scale: distinct (source, fp) first, then a
    fingerprint-keyed equi-join — per-fp fan-out is bounded by the source
    count (small), so the join never goes quadratic in corpus size; one
    count shuffle on the (tiny) source-pair domain."""
    _prep(spark)
    from streamjoin_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents")
    prefix = F.slice(
        F.filter(tokens(F.col("text")), lambda t: t != F.lit("")), 1, 6
    )
    v = docs.select(
        "source", F.md5(F.array_join(prefix, " ")).alias("fp")
    ).distinct()
    A, B = "a", "b"
    pairs = v.alias(A).join(
        v.alias(B),
        (F.col(f"{A}.fp") == F.col(f"{B}.fp"))
        & (F.col(f"{A}.source") < F.col(f"{B}.source")),
    )
    return pairs.groupBy(
        F.col(f"{A}.source").alias("source_a"),
        F.col(f"{B}.source").alias("source_b"),
    ).agg(F.count(F.lit(1)).alias("n_shared_fps"))



def q_source_novelty(spark, sf_dir):
    """Per-source content novelty: the fraction of a source's distinct
    3-gram shingles that appear in NO other source — the distinctiveness
    complement of source_overlap (a source with low novelty is mostly
    re-hosting others' content and should be down-weighted in the
    mixture). Scale: distinct (source, shingle) then one shingle-keyed
    count (per-shingle fan-out bounded by the source count); the ratio is
    division-derived so it is FLOOR-canonicalized on both engines (repo
    float law)."""
    _prep(spark)
    from streamjoin_spark.functions import tokens

    # NOT spread_scan-guarded (r12, measured): the shingle fan-out here
    # feeds straight into a distinct whose map-side partial agg is the
    # only pre-exchange work — alternating A/B read a wash (1.10 vs
    # 1.16 s), unlike the hash-heavy _shingle_frame consumers
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "source", tokens(F.col("text")).alias("tk")
    ).where(F.size("tk") >= 3)
    sh = base.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 2),
                lambda i: F.array_join(F.slice(F.col("tk"), i, F.lit(3)), " "),
            )
        ).alias("sh"),
    ).distinct()
    ns = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("n_src"))
    per = sh.join(ns, "sh").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("n_src") == 1, 1).otherwise(0)).alias("n_unique"),
    )
    return per.select(
        "source", "n_shingles", "n_unique",
        (
            F.floor(
                F.col("n_unique") / F.col("n_shingles") * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("novelty"),
    )



def q_dup_histogram(spark, sf_dir):
    """Duplicate-multiplicity histogram: how many exact-content groups
    exist at each copy count, and how many documents they hold — the
    one-glance dedup dashboard (what fraction of the corpus is x2, x3, …
    duplicated) that sizes the win before running cluster resolution.
    Two tiny shuffles: content-hash groupBy, then a histogram over group
    sizes (domain ≤ max multiplicity)."""
    _prep(spark)
    from streamjoin_spark.functions import normalize_text

    docs = _t(spark, sf_dir, "documents")
    groups = (
        docs.select(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )
    return groups.groupBy("n_copies").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_copies").alias("n_docs"),
    )



def q_ivm_quality_view(spark, sf_dir):
    """IVM e2e: a maintained quality-gated view — writer expectations in
    DROP mode (streaming/incremental.py _gate_expectations, the DLT
    expect_or_drop analog) over a token-count enrichment, under a CDC
    round where edits move documents ACROSS the quality boundary: a doc
    shrinking below min_tokens is DELETED from the view, one growing past
    it appears. Oracle = the enrichment of the simulated final state
    filtered by the same rule."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.functions import token_count
    from streamjoin_spark.streams import Stream

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 1)
        .select("doc_id", "text", "source")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_q_")
    ct = ChangeTable.create(
        spark, f"{base}/d", docs.schema, ["doc_id"], n_buckets=8
    )
    ct.merge(docs)

    def enrich(df):
        return df.select(
            "doc_id", "source",
            token_count(F.col("text")).alias("n_tokens"),
        )

    w = (
        Stream.fromChangeTable(ct, "docs_qv")
        .primaryKeys("doc_id")
        .to(enrich)
        .writeToPath(f"{base}/view")
        .option("expectations", {"min_tokens": "n_tokens >= 40"})
        .option("expectationsMode", "drop")
    )
    w.run()
    ct.merge(                                   # shrink some docs below 40
        docs.where(F.col("doc_id") % 21 == 1).select(
            "doc_id", F.lit("tiny doc").alias("text"), "source"
        )
    )
    ct.delete_where("doc_id % 15 = 1")
    w.run()
    return w.toDF().select("doc_id", "source", "n_tokens")



def q_bpe_pair_stats(spark, sf_dir):
    """Corpus-scale BPE tokenizer induction, step one: adjacent
    character-pair frequencies over the corpus vocabulary (the pair-count
    pass every BPE merge iteration runs; at 100 TB this is THE cost of
    vocab training). Spark-first: whitespace tokens → per-token 2-char
    substring fan-out (materialized token attribute; pair extraction via
    substring over a guarded sequence — ANSI-safe), one count shuffle on
    the pair, deterministic top-50 (count desc, pair asc). ASCII-only
    tokens so character indexing agrees across engines."""
    _prep(spark)
    from pyspark.sql.window import Window

    from streamjoin_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .where(F.col("w").rlike("^[a-z0-9]+$") & (F.length("w") >= 2))
    )
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                # w is a materialized attribute (per the transform-lambda
                # invariant); substr of an attribute is per-element cheap
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    # unpartitioned window is safe by construction: the pair domain is
    # <= 36^2 rows ([a-z0-9] alphabet), a bounded frame at any corpus size
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 50)
        .select("rank", "pair", "n")
    )



def q_ivm_metrics(spark, sf_dir):
    """IVM e2e: the observability surface itself under the gate — a
    maintained view drained with metricsPath set writes one metrics row
    per governed slice (streaming/incremental.py _note_metrics /
    _flush_metrics); the rollup over the metrics ChangeTable is fully
    deterministic (version-count chunking, insert/update/delete rows):
    3 backlog slices + 1 churn slice, 6 insert + 2 update-image + 1
    delete change rows, last commit v4, every scope on the broadcast
    rung. The reference's composite progress merge
    (elzyme/streams.py:242-314) is the analog surface."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream as _S

    base = tempfile.mkdtemp(prefix="sj_ivm_metrics_")
    schema = "id long, val double"
    src = ChangeTable.create(
        spark, f"{base}/src",
        spark.createDataFrame([], schema).schema, ["id"], n_buckets=4,
    )
    for i in range(6):
        src.merge(spark.createDataFrame([(i, float(i))], schema))
    w = (
        _S.fromChangeTable(src, "m_src")
        .primaryKeys("id")
        .to(lambda df: df)
        .writeToPath(f"{base}/view")
        .option("maxVersionsPerTrigger", 2)
        .option("metricsPath", f"{base}/metrics")
    )
    w.run()                               # 3 slices: inserts 2+2+2
    src.merge(spark.createDataFrame([(0, 99.0)], schema))  # update: pre+post
    src.delete_where("id = 1")                             # delete: 1 row
    w.run()                               # 1 slice: 3 change rows
    mt = ChangeTable(spark, f"{base}/metrics")
    return (
        mt.snapshot()
        .groupBy("stage", "rung")
        .agg(
            F.count(F.lit(1)).alias("n_slices"),
            F.sum("rows_out").alias("rows_out"),
            F.max("committed_version").alias("last_commit"),
        )
    )


def q_ivm_rebuild(spark, sf_dir):
    """IVM e2e: ``writer.rebuild()`` repairs a DIVERGED maintained view in
    place (r7 exactly-once machinery, gate-stamped r8). A join→agg view is
    maintained through a CDC round (deletes exercised), then the target is
    corrupted out-of-band TWO ways — an existing group's stored values
    overwritten, and a phantom group inserted that the view's definition
    never produces. rebuild() resets the stage watermarks and replays the
    whole history through the replay-safe recompute path (the
    applied_through floor suppresses the additive shortcut on every
    replayed range — the r8 multi-chunk-regression fix), which both
    restores the overwritten group and DELETES the phantom one (scope-diff
    emits compensating deletes). Oracle: the aggregate of the sources'
    final state — i.e. the repaired table, not the corruption."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 4 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_custkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_rebuild_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)")
            ).cast("double").alias("total_price"),
        )
        .writeToPath(f"{base}/state")
    )
    w.run()
    oct_.delete_where("o_orderkey % 13 = 1")  # CDC round: pure retraction
    w.run()
    # corrupt the managed target out-of-band: clobber one real group,
    # insert one phantom group
    tgt = ChangeTable(spark, f"{base}/state")
    tgt.merge(
        spark.createDataFrame(
            [("BUILDING", 1, 1.0), ("PHANTOM-SEGMENT", 99, 999.0)],
            "c_mktsegment string, n_orders long, total_price double",
        )
    )
    w.rebuild()
    return w.toDF()


def q_ivm_governor_rungs(spark, sf_dir):
    """IVM e2e under DEGRADED governor rungs: same maintained-join shape
    as ivm_join_cdc (different CDC mods) drained with
    ``broadcastThreshold=1k`` — every slice's Δ/scope estimate is over
    threshold, so the scope filter takes the Bloom pre-reduction and
    exact shuffle semi-join tiers of `_Governor.scoped`'s ladder instead
    of the broadcast fast path, and the Δ probe leg loses its broadcast
    hint (``_Governor.scoped`` / ``_Governor.hint``). The gate thus stamps what
    tests/test_governor.py pins structurally: rung degradation is a pure
    execution-strategy change — the maintained table is bit-identical to
    the batch join of the final states. This is the 100 TB path: a bulk
    backlog slice on a real cluster runs exactly these rungs (the r8
    1000× profile's 582 MB bulk slice recorded rung=bloom+shuffle)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_rungs_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"],
                o["o_orderkey"], o["o_totalprice"])
        .writeToPath(f"{base}/state")
        .option("broadcastThreshold", "1k")  # force the degraded rungs
    )
    w.run()
    cct.merge(
        cust.where(F.col("c_custkey") % 7 == 0).select(
            "c_custkey", "c_name", F.lit("RESEG").alias("c_mktsegment")
        )
    )
    oct_.delete_where("o_orderkey % 11 = 0")
    oct_.merge(
        orders.where(F.col("o_orderkey") % 23 == 3).select(
            (F.col("o_orderkey") + F.lit(20000000)).alias("o_orderkey"),
            "o_custkey", "o_totalprice",
        )
    )
    w.run()
    return w.toDF()


def q_ivm_optimize_vacuum(spark, sf_dir):
    """Table-maintenance surface under the gate: a table built from three
    fragmenting APPENDs (insert-only single-write commits, one dir per
    part each), churned by a MERGE update + DELETE, then
    ``compact(zorder_by=...)`` (OPTIMIZE ZORDER analog — consolidates
    every part to one z-clustered file-set, zero change rows) and
    ``vacuum(retain_versions=2)`` (drops the superseded pre-compaction
    dirs and bumps change_floor). The snapshot after both must equal the
    plain SQL over the final state — maintenance never changes content
    (reference: Delta OPTIMIZE/VACUUM semantics the engine mirrors;
    changelog.py compact/vacuum)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_optvac_")
    ct = ChangeTable.create(
        spark, f"{base}/t", orders.schema, ["o_orderkey"], n_buckets=8
    )
    for m in (0, 1, 2):  # three fragmenting appends, disjoint key classes
        ct.append(orders.where(F.col("o_orderkey") % 3 == m))
    ct.merge(
        orders.where(F.col("o_orderkey") % 19 == 0).select(
            "o_orderkey", "o_custkey",
            F.lit("X-OPT").alias("o_orderpriority"), "o_totalprice",
        )
    )
    ct.delete_where("o_orderkey % 13 = 1")
    ct.compact(zorder_by=["o_custkey", "o_orderkey"])
    ct.vacuum(retain_versions=2)
    return ct.snapshot()


def q_ivm_rebucket(spark, sf_dir):
    """Online re-bucketing under the gate (r9): ``compact(n_buckets=N)``
    re-tiers a grown table's copy-on-write granularity as a zero-change-row
    OPTIMIZE commit whose new bucket count rides the same atomic meta bump
    — the un-freeze of the creation-time ``n_buckets`` (the engine's own
    layout knob; Delta has no analog, Iceberg's bucket-transform evolution
    is the nearest public story). The cycle interleaves both directions
    (4 → 16 up-tier after a fragmenting bulk+append, 16 → 8 down-tier
    after churn) with MERGE-update, DELETE and a final vacuum; the
    snapshot must equal plain SQL over the simulated final state —
    re-bucketing never changes content, and writers after it hash into
    the new bucket space (changelog.py ``compact``; sub-part COW stats
    re-attach on every rewritten dir)."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 2)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_rebucket_")
    ct = ChangeTable.create(
        spark, f"{base}/t", orders.schema, ["o_orderkey"], n_buckets=4
    )
    ct.merge(orders.where(F.col("o_orderkey") % 3 != 2))   # bulk load
    ct.append(orders.where(F.col("o_orderkey") % 3 == 2))  # fragmenting leg
    ct.compact(n_buckets=16)                               # up-tier
    assert ct.n_buckets == 16
    ct.merge(
        orders.where(F.col("o_orderkey") % 17 == 0).select(
            "o_orderkey", "o_custkey",
            F.lit("REBKT").alias("o_orderpriority"), "o_totalprice",
        )
    )
    ct.delete_where("o_orderkey % 11 = 3")
    ct.compact(n_buckets=8)                                # down-tier
    assert ct.n_buckets == 8
    ct.vacuum(retain_versions=2)
    return ct.snapshot()


def q_ivm_read_where(spark, sf_dir):
    """Reader-side data skipping end-to-end (r10): ``read_where`` — the
    exact scoped read over the changelog substrate
    (changelog.ChangeTable.read_where / snapshot_pruned). A bounded key
    scope restricts the read to the scope's owning hash parts (the part
    ids ride the bounds probe's value collect) and, within them, to the
    split files whose footer key stats intersect the scope — the read
    twin of the r9 sub-part copy-on-write, what Delta serves from its
    transaction-log data skipping. The cycle layers bulk merge, a churn
    update and a delete first, so the scoped read must see the HEAD
    state through a multi-dir manifest with carried-forward entries.
    At 100 TB: a 64k-key probe against a 600 MB/bucket table opens ~one
    split file per owning bucket instead of every file of every part."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 3)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_readwhere_")
    ct = ChangeTable.create(
        spark, f"{base}/t", orders.schema, ["o_orderkey"], n_buckets=8
    )
    ct.merge(orders)                                       # bulk load
    ct.merge(                                              # localized churn
        orders.where(F.col("o_orderkey") % 13 == 1).select(
            "o_orderkey", "o_custkey",
            F.lit("SCOPED").alias("o_orderpriority"), "o_totalprice",
        )
    )
    ct.delete_where("o_orderkey % 19 = 7")
    keys = orders.where(F.col("o_orderkey") % 7 == 2).select("o_orderkey")
    return ct.read_where(keys, ["o_orderkey"])


def q_ivm_zorder_read(spark, sf_dir):
    """Post-ZORDER scoped reads (r10, VERDICT r9 task 5):
    ``compact(zorder_by=...)`` records the clustered dimensions as
    manifest STATS columns (changelog.compact → stats_cols_extra), so the
    z-sorted files' tight footer hyper-rectangles prune scoped reads —
    and scoped rewrites — on NON-key columns. ``read_where`` on
    ``o_custkey`` (not the primary key: no part restriction possible,
    pure file-stats pruning) after churn + ZORDER must return exactly the
    scoped rows. Before r10 the manifest carried no stats on the zorder
    dimensions and post-ZORDER tables could not prune on them at all."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 1)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_zorder_")
    ct = ChangeTable.create(
        spark, f"{base}/t", orders.schema, ["o_orderkey"], n_buckets=8
    )
    ct.merge(orders)
    ct.merge(
        orders.where(F.col("o_orderkey") % 23 == 5).select(
            "o_orderkey", "o_custkey",
            F.lit("ZORD").alias("o_orderpriority"), "o_totalprice",
        )
    )
    ct.delete_where("o_orderkey % 31 = 9")
    ct.compact(zorder_by=["o_custkey", "o_totalprice"])
    assert ct.stats_extra_cols == ("o_custkey", "o_totalprice")
    keys = (
        orders.where(F.col("o_custkey") % 50 == 3)
        .select("o_custkey")
        .distinct()
    )
    return ct.read_where(keys, ["o_custkey"])


def q_ivm_renamed_view(spark, sf_dir):
    """IVM e2e over RENAMED sources (r11, VERDICT r10 task 1): the
    reference's idiomatic pipeline renames every stream at declaration
    (reference tests/SetupInputStream.py:170-202 — rename + derived-col
    transforms on each input). Pre-r11 any ``.to`` transform silently
    disabled every reader-side scoped read in the IVM slices (sound
    full-snapshot fallback); ``streams.static_pruned`` now maps
    post-transform key columns back to base columns through the analyzed
    plan (``streams._map_cols_to_base`` — Alias/AttributeReference
    chains under row-local nodes only) and renamed slices prune like
    unrenamed ones. This runs the ivm_join_cdc shape through renamed
    streams: re-segmentation fans out via the probe leg, deletes
    retract, clones insert; the maintained table must equal the batch
    join of the final states under the RENAMED output columns. At
    100 TB the rename is free again: a localized churn slice opens ~one
    split file per owning bucket instead of both full snapshots."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 4 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_renamed_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", orders.schema, ["o_orderkey"], n_buckets=8
    )
    cct.merge(cust)
    oct_.merge(orders)
    c = (
        Stream.fromChangeTable(cct, "c")
        .primaryKeys("ck")
        .to(
            lambda df: df.withColumnRenamed("c_custkey", "ck")
            .withColumnRenamed("c_mktsegment", "seg")
        )
    )
    o = (
        Stream.fromChangeTable(oct_, "o")
        .primaryKeys("ok")
        .to(
            lambda df: df.withColumnRenamed("o_orderkey", "ok")
            .withColumnRenamed("o_custkey", "cid")
        )
    )
    w = (
        c.join(o, "inner")
        .on(c["ck"] == o["cid"])
        .select(c["ck"], c["seg"], o["ok"], o["o_totalprice"])
        .writeToPath(f"{base}/state")
    )
    w.run()
    cct.merge(
        cust.where(F.col("c_custkey") % 7 == 3).select(
            "c_custkey", "c_name", F.lit("RSEG").alias("c_mktsegment")
        )
    )
    oct_.delete_where("o_orderkey % 19 = 4")
    oct_.merge(
        orders.where(F.col("o_orderkey") % 23 == 5).select(
            (F.col("o_orderkey") + F.lit(20000000)).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
        )
    )
    w.run()
    return w.toDF()


def q_ivm_scan_where(spark, sf_dir):
    """Condition-scan file skipping e2e (r11, VERDICT r10 task 2):
    ``scan_where`` — the predicate twin of ``read_where`` — prunes a
    snapshot read by translating simple predicates on manifest-stats
    columns (eq/range/IN/null tests through AND-OR spines) into
    per-entry exclusions against the footer min/max
    (changelog._expr_may_match, the condition twin of _entry_excluded).
    The same machinery now scopes ``delete_where``'s own doomed scan —
    the retention-shaped delete in this cycle reads only
    stat-intersecting files instead of the full snapshot (pre-r11:
    ``cur_all = snapshot(v-1)`` always). The cycle layers bulk merge,
    churn, and a modulus delete, then scans a pk range over the
    multi-dir head manifest. At 100 TB a retention horizon on a stats
    column opens ~the oldest file per bucket, not the table."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 5 == 4)
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_scanwhere_")
    ct = ChangeTable.create(
        spark, f"{base}/t", orders.schema, ["o_orderkey"], n_buckets=8
    )
    ct.merge(orders)                                       # bulk load
    ct.merge(                                              # localized churn
        orders.where(F.col("o_orderkey") % 17 == 4).select(
            "o_orderkey", "o_custkey",
            F.lit("CONDED").alias("o_orderpriority"), "o_totalprice",
        )
    )
    ct.delete_where("o_orderkey % 23 = 11")   # doomed scan: cond-pruned
    return ct.scan_where(F.col("o_orderkey") < 20000)


def q_ivm_union_cdc(spark, sf_dir):
    """IVM e2e: ``.union()`` on a live join pipeline (reference
    elzyme/joins.py:861-865) — the leg is an extra root feed maintaining
    its own disjoint key-space of the shared target via its own
    _UnionLegStage (streaming/incremental.py). CDC round touches BOTH
    feeds: customers re-segment (join rows recompute), leg rows delete
    (%9) and update (%21 → 'EXT2', re-inserting any %9-deleted among
    them — merge runs after the delete). Key disjointness holds by
    construction: join rows carry o_orderkey%4==0, leg rows %4==1.
    Maintained table ≡ the batch join of final states UNION ALL the
    leg's final state."""
    _prep(spark)
    import tempfile

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.streams import Stream

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    join_orders = orders.where(F.col("o_orderkey") % 4 == 0)
    # leg key disjointness is on the JOIN's reconcile scope too (the
    # preserved side's c_custkey — a join-side slice replaces every target
    # row under its affected c_custkeys), so the leg offsets c_custkey
    # out of the customer key space, not just o_orderkey
    leg_rows = orders.where(F.col("o_orderkey") % 4 == 1).select(
        (F.col("o_custkey") + F.lit(1000000)).alias("c_custkey"),
        F.lit("EXTERNAL").alias("c_mktsegment"),
        "o_orderkey", "o_totalprice",
    )
    base = tempfile.mkdtemp(prefix="sj_ivm_union_")
    cct = ChangeTable.create(
        spark, f"{base}/c", cust.schema, ["c_custkey"], n_buckets=8
    )
    oct_ = ChangeTable.create(
        spark, f"{base}/o", join_orders.schema, ["o_orderkey"], n_buckets=8
    )
    lct = ChangeTable.create(
        spark, f"{base}/leg", leg_rows.schema,
        ["c_custkey", "o_orderkey"], n_buckets=8,
    )
    cct.merge(cust)
    oct_.merge(join_orders)
    lct.merge(leg_rows)
    c = Stream.fromChangeTable(cct, "c").primaryKeys("c_custkey")
    o = Stream.fromChangeTable(oct_, "o").primaryKeys("o_orderkey")
    leg = Stream.fromChangeTable(lct, "leg").primaryKeys(
        "c_custkey", "o_orderkey"
    )
    w = (
        c.join(o, "inner")
        .on(c["c_custkey"] == o["o_custkey"])
        .select(c["c_custkey"], c["c_mktsegment"],
                o["o_orderkey"], o["o_totalprice"])
        .union(leg)
        .writeToPath(f"{base}/state")
    )
    w.run()
    cct.merge(
        cust.where(F.col("c_custkey") % 6 == 0).select(
            "c_custkey", F.lit("MOVED6").alias("c_mktsegment")
        )
    )
    lct.delete_where("o_orderkey % 9 = 1")
    lct.merge(
        leg_rows.where(F.col("o_orderkey") % 21 == 2).select(
            "c_custkey", F.lit("EXT2").alias("c_mktsegment"),
            "o_orderkey", "o_totalprice",
        )
    )
    w.run()
    return w.toDF()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "join_inner": q_join_inner,
        "join_left": q_join_left,
        "join_right": q_join_right,
        "join_theta": q_join_theta,
        "join_chain3": q_join_chain3,
        "select_transform": q_select_transform,
        "drop_column": q_drop_column,
        "union_all": q_union,
        "set_ops": q_set_ops,
        "agg_sum_count": q_agg_sum_count,
        "agg_avg_min_max": q_agg_avg_min_max,
        "join_then_agg": q_join_then_agg,
        "agg_then_join": q_agg_then_join,
        "dedup_latest_per_key": q_dedup_latest_per_key,
        "anti_join": q_anti_join,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_containment": q_dedup_containment,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "embedding_neardup": q_embedding_neardup,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_recall": q_ann_recall,
        "ann_ivf_pq": q_ann_ivf_pq,
        "quality_classifier": q_quality_classifier,
        "gopher_filters": q_gopher_filters,
        "mixture_temperature": q_mixture_temperature,
        "text_profile": q_text_profile,
        "text_quality_by_source": q_text_quality_by_source,
        "multimodal_image_features": q_multimodal_image_features,
        "multimodal_image_neardup": q_multimodal_image_neardup,
        "multimodal_audio_neardup": q_multimodal_audio_neardup,
        "multimodal_video_neardup": q_multimodal_video_neardup,
        "lag_features": q_lag_features,
        "multimodal_audio_features": q_multimodal_audio_features,
        "token_stats": q_token_stats,
        "merge_intervals": q_merge_intervals,
        "cohort_retention": q_cohort_retention,
        "frame_sample": q_frame_sample,
        "events_hourly_rollup": q_events_hourly_rollup,
        "hopping_rollup": q_hopping_rollup,
        "agg_count_distinct": q_agg_count_distinct,
        "topk_per_group": q_topk_per_group,
        "sessionize": q_sessionize,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "salted_join": q_salted_join,
        "skew_agg": q_skew_agg,
        "train_val_split": q_train_val_split,
        "dedup_clusters": q_dedup_clusters,
        "dedup_clusters_star": q_dedup_clusters_star,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "tpch_q7": q_tpch_q7,
        "tpch_q8": q_tpch_q8,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "pack_sequences": q_pack_sequences,
        "chunk_documents": q_chunk_documents,
        "tpch_q6": q_tpch_q6,
        "tpch_q10": q_tpch_q10,
        "tpch_q4": q_tpch_q4,
        "tpch_q12": q_tpch_q12,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "tpch_q2": q_tpch_q2,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "tpch_q22": q_tpch_q22,
        "pii_scrub": q_pii_scrub,
        "repetition_profile": q_repetition_profile,
        "bm25_topk": q_bm25_topk,
        "pagerank": q_pagerank,
        "decontaminate": q_decontaminate,
        "lm_logprob": q_lm_logprob,
        "perplexity_bands": q_perplexity_bands,
        "robust_outliers": q_robust_outliers,
        "profile_orders": q_profile_orders,
        "histogram_totalprice": q_histogram_totalprice,
        "zorder_key": q_zorder_key,
        "zonemap_prune": q_zonemap_prune,
        "source_quota": q_source_quota,
        "collocations": q_collocations,
        "rolling_avg": q_rolling_avg,
        "cumulative_value": q_cumulative_value,
        "percentiles": q_percentiles,
        "approx_quantiles": q_approx_quantiles,
        "token_topk": q_token_topk,
        "vocab_coverage": q_vocab_coverage,
        "kmeans_clusters": q_kmeans_clusters,
        "hll_distinct": q_hll_distinct,
        "funnel_events": q_funnel_events,
        "expectations_report": q_expectations_report,
        "passage_dedup": q_passage_dedup,
        "mixture_sample": q_mixture_sample,
        "ppjoin_pairs": q_ppjoin_pairs,
        "corr_matrix": q_corr_matrix,
        "kmv_set_ops": q_kmv_set_ops,
        "hilbert_key": q_hilbert_key,
        "outlier_events": q_outlier_events,
        "distinctive_terms": q_distinctive_terms,
        "rollup_agg": q_rollup_agg,
        "pivot_returnflag": q_pivot_returnflag,
        "corpus_curation": q_corpus_curation,
        "kmv_distinct": q_kmv_distinct,
        "gap_fill": q_gap_fill,
        "cube_agg": q_cube_agg,
        "triangle_count": q_triangle_count,
        "lpa_communities": q_lpa_communities,
        "fuzzy_match": q_fuzzy_match,
        "ntile_quartiles": q_ntile_quartiles,
        "cms_topk": q_cms_topk,
        "bloom_prune": q_bloom_prune,
        "json_props": q_json_props,
        "hybrid_retrieval": q_hybrid_retrieval,
        "rank_metrics": q_rank_metrics,
        "semdedup_prune": q_semdedup_prune,
        "kcore": q_kcore,
        "dsir_weights": q_dsir_weights,
        "ewma_user_value": q_ewma_user_value,
        "cross_corpus_neardup": q_cross_corpus_neardup,
        "ivm_exact_dedup": q_ivm_exact_dedup,
        "ivm_join_cdc": q_ivm_join_cdc,
        "ivm_agg_cdc": q_ivm_agg_cdc,
        "ann_ivf_refined": q_ann_ivf_refined,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_overlap": q_winnow_overlap,
        "ivm_chain_cdc": q_ivm_chain_cdc,
        "ivm_scd2": q_ivm_scd2,
        "ivm_sessions": q_ivm_sessions,
        "bpe_pair_stats": q_bpe_pair_stats,
        "ivm_quality_view": q_ivm_quality_view,
        "source_overlap": q_source_overlap,
        "source_novelty": q_source_novelty,
        "dup_histogram": q_dup_histogram,
        "ivm_metrics": q_ivm_metrics,
        "multimodal_image_neardup_refined": q_multimodal_image_neardup_refined,
        "ngram_decontaminate": q_ngram_decontaminate,
        "ivm_rebuild": q_ivm_rebuild,
        "ivm_governor_rungs": q_ivm_governor_rungs,
        "ivm_optimize_vacuum": q_ivm_optimize_vacuum,
        "ivm_union_cdc": q_ivm_union_cdc,
        "ivm_rebucket": q_ivm_rebucket,
        "ivm_read_where": q_ivm_read_where,
        "ivm_zorder_read": q_ivm_zorder_read,
        # r11 — appended at the END per the frozen-ordering invariant
        "ivm_renamed_view": q_ivm_renamed_view,
        "ivm_scan_where": q_ivm_scan_where,
    }




def _hilbert_sql(bits: int = 8) -> str:
    """Oracle twin of layout.with_hilbert_key on (o_custkey, o_totalprice):
    the SAME level-expression strings (layout.hilbert_level_exprs) chained
    as CTEs — Spark and DuckDB literally execute identical text per level."""
    from streamjoin_spark.operators.layout import hilbert_level_exprs

    top = (1 << bits) - 1
    ctes = []
    prev = "h_init"
    for i, lvl in enumerate(reversed(range(bits))):
        ex, ey, ed = hilbert_level_exprs(lvl, bits)
        name = f"h_{i}"
        ctes.append(
            f"{name} AS (SELECT o_orderkey, {ex} AS hx, {ey} AS hy, "
            f"{ed} AS hd FROM {prev})"
        )
        prev = name
    chain = ",\n            ".join(ctes)
    return f"""
        WITH s AS (SELECT MIN(CAST(o_custkey AS DOUBLE)) AS lo0,
                          MAX(CAST(o_custkey AS DOUBLE)) AS hi0,
                          MIN(CAST(o_totalprice AS DOUBLE)) AS lo1,
                          MAX(CAST(o_totalprice AS DOUBLE)) AS hi1
                   FROM orders),
        h_init AS (SELECT o_orderkey,
                     CAST(CASE WHEN hi0 = lo0 THEN 0
                          ELSE LEAST(FLOOR((CAST(o_custkey AS DOUBLE) - lo0)
                                           / (hi0 - lo0) * {top + 1}),
                                     {top}) END AS BIGINT) AS hx,
                     CAST(CASE WHEN hi1 = lo1 THEN 0
                          ELSE LEAST(FLOOR((CAST(o_totalprice AS DOUBLE) - lo1)
                                           / (hi1 - lo1) * {top + 1}),
                                     {top}) END AS BIGINT) AS hy,
                     CAST(0 AS BIGINT) AS hd
              FROM orders CROSS JOIN s),
            {chain}
        SELECT o_orderkey, hd AS h_key FROM {prev}
    """


def _zorder_sql(bits: int = 8, extra_cols: tuple = ()) -> str:
    """Oracle twin of operators/layout.py with_zorder_key on
    (o_custkey, o_totalprice): bit i of column j lands at position
    i·n_cols + j — the interleave unrolled as a |-chain of shift/mask
    terms, mirroring the Spark expression tree exactly. ``extra_cols``
    ride along into the output (for the zone-map oracle)."""
    top = (1 << bits) - 1
    extra_b = "".join(f", {c}" for c in extra_cols)
    terms = " | ".join(
        f"(((b{j} >> {i}) & 1) << {i * 2 + j})"
        for j in (0, 1)
        for i in range(bits)
    )
    return f"""
        WITH s AS (SELECT MIN(CAST(o_custkey AS DOUBLE)) AS lo0,
                          MAX(CAST(o_custkey AS DOUBLE)) AS hi0,
                          MIN(CAST(o_totalprice AS DOUBLE)) AS lo1,
                          MAX(CAST(o_totalprice AS DOUBLE)) AS hi1
                   FROM orders),
        b AS (SELECT o_orderkey{extra_b},
                     CAST(CASE WHEN hi0 = lo0 THEN 0
                          ELSE LEAST(FLOOR((CAST(o_custkey AS DOUBLE) - lo0)
                                           / (hi0 - lo0) * {top + 1}),
                                     {top}) END AS BIGINT) AS b0,
                     CAST(CASE WHEN hi1 = lo1 THEN 0
                          ELSE LEAST(FLOOR((CAST(o_totalprice AS DOUBLE) - lo1)
                                           / (hi1 - lo1) * {top + 1}),
                                     {top}) END AS BIGINT) AS b1
              FROM orders CROSS JOIN s)
        SELECT o_orderkey{extra_b}, CAST({terms} AS BIGINT) AS z_key FROM b
    """


# ---------------------------------------------------------------------------
# generated oracle SQL for the corpus operators (constants shared with the
# Spark implementations so both sides are bit-identical)
# ---------------------------------------------------------------------------
_TOKS = "regexp_split_to_array(lower(trim(text)), '\\s+')"

_SHINGLE_CTE = """
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 2),
                          i -> array_to_string(w[i:i+2], ' '))) AS shingle
            FROM (SELECT doc_id, {toks} AS w FROM documents)
            WHERE len(w) >= 3
        )
    )
""".format(toks=_TOKS)

# MinHash signature + band CTEs shared by the LSH pair and cluster oracles
_MINHASH_CTES = f"""{_SHINGLE_CTE},
            sigs AS (SELECT doc_id, i, min(md5(concat(i, '|', shingle))) AS h
                     FROM sh CROSS JOIN range(12) t(i) GROUP BY doc_id, i),
            bands AS (SELECT doc_id, i // 3 AS band,
                             md5(string_agg(h, ',' ORDER BY i)) AS bh
                      FROM sigs GROUP BY doc_id, i // 3)"""

def _hll_num() -> str:
    """The α·m²·2^52 literal shared with the Spark path (b=9) — one double,
    identical on both sides (streamjoin_spark.operators.sketches)."""
    from streamjoin_spark.operators.sketches import hll_alpha_numerator

    return repr(hll_alpha_numerator(9))


_VEC_CTE = """
    v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
          FROM embeddings),
    n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
          FROM v)
"""

_COS = ("ROUND(list_sum(list_transform(generate_series(1, len({a}.e)), "
        "i -> {a}.e[i] * {b}.e[i])) / ({a}.nrm * {b}.nrm), 6)")


def _simhash_sql() -> str:
    high = "('8','9','a','b','c','d','e','f')"
    sums = ", ".join(
        f"sum(CASE WHEN substr(md5(w), {b + 1}, 1) IN {high} THEN 1 ELSE -1 END) AS s{b}"
        for b in range(32)
    )
    bits = ", ".join(f"CASE WHEN s{b} > 0 THEN '1' ELSE '0' END" for b in range(32))
    return f"""
        SELECT doc_id, concat({bits}) AS simhash FROM (
            SELECT doc_id, {sums}
            FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents)
            WHERE w <> '' GROUP BY doc_id)
    """


def _lang_case_sql() -> str:
    from streamjoin_spark.operators.text import LANG_STOPWORDS

    def score(words):
        lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
        return (f"(len(list_filter({_TOKS}, t -> list_contains({lst}, t)))"
                f" / greatest(len({_TOKS}), 1))")

    langs = list(LANG_STOPWORDS)
    whens = []
    for idx, lang in enumerate(langs):
        s = score(LANG_STOPWORDS[lang])
        conds = [f"{s} > 0.05"]
        for p in langs[:idx]:
            conds.append(f"{s} > {score(LANG_STOPWORDS[p])}")
        for q in langs[idx + 1:]:
            conds.append(f"{s} >= {score(LANG_STOPWORDS[q])}")
        whens.append("WHEN " + " AND ".join(conds) + f" THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


def _profile_sql() -> str:
    from streamjoin_spark.functions import STOPWORDS_EN

    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS_EN) + "]"
    n_tokens = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END"
    punct = ("(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"
             " / greatest(length(text), 1))")
    swr = (f"(len(list_filter({_TOKS}, t -> list_contains({sw}, t)))"
           f" / greatest(len({_TOKS}), 1))")
    mwl = (f"(list_sum(list_transform({_TOKS}, t -> length(t)))"
           f" / greatest(len({_TOKS}), 1))")
    quality = (f"ROUND((least(({n_tokens}) / 64.0, 1.0)"
               f" + (1.0 - least({punct} * 4, 1.0))"
               f" + least({swr} * 4, 1.0)) / 3, 4)")
    fp = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
    return f"""
        SELECT doc_id,
               {n_tokens} AS n_tokens,
               ROUND({punct}, 6) AS punct_ratio,
               ROUND({swr}, 6) AS stopword_ratio,
               ROUND({mwl}, 6) AS mean_word_len,
               {quality} AS quality,
               {fp} AS fingerprint,
               {_lang_case_sql()} AS lang_guess
        FROM documents
    """


def _bucket_sql(n_planes: int, dim: int) -> str:
    from streamjoin_spark.operators.similarity import hyperplanes

    cases = []
    for plane in hyperplanes(dim, n_planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]::DOUBLE[]"
        cases.append(
            "CASE WHEN list_sum(list_transform(generate_series(1, len(e)), "
            f"i -> e[i] * ({lit})[i])) >= 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(cases) + ")"


def _quality_classifier_sql(n_buckets: int = 512, seed: str = "qclf") -> str:
    """Oracle twin of text.hashed_classifier_score: identical weight-table
    literals (same Python floats, repr-injected into both engines), the
    md5-parity bucket hash, a strict left-fold sum, and the
    FLOOR-canonicalized mean (division-derived — repo invariant)."""
    from streamjoin_spark.operators.text import classifier_weights

    wlist = "[" + ", ".join(repr(x) for x in classifier_weights(n_buckets, seed)) + "]"
    bucket = (f"CAST(('0x' || substr(md5('{seed}' || w), 1, 15))::BIGINT"
              f" % {n_buckets} + 1 AS INTEGER)")
    return f"""
        WITH t AS (
            SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS tk
            FROM documents),
        s AS (
            SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                   CASE WHEN len(tk) > 0 THEN
                       FLOOR((0.0 + list_sum(list_transform(tk,
                           w -> CAST(({wlist})[{bucket}] AS DOUBLE)))
                           / len(tk)) * 1e6) / 1e6
                   ELSE FLOOR(0.0 * 1e6) / 1e6 END AS qc_score
            FROM t)
        SELECT doc_id, n_tokens, qc_score, qc_score >= 0.0 AS keep FROM s
    """


def _gopher_filters_sql(
    min_words: int = 30,
    max_words: int = 100_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_sym: float = 0.1,
    min_alpha: float = 0.8,
    min_stops: int = 1,
) -> str:
    """Oracle twin of text.gopher_filters (driver-query thresholds):
    identical left-fold sums, FLOOR-canonicalized ratios, the same
    stop-hit CASE sum."""
    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    hit_sum = " + ".join(
        f"(CASE WHEN list_contains(tk, '{s}') THEN 1 ELSE 0 END)" for s in stops
    )
    return f"""
        WITH t AS (
            SELECT doc_id, text, list_filter({_TOKS}, x -> x <> '') AS tk
            FROM documents),
        f AS (
            SELECT doc_id,
                   CAST(len(tk) AS BIGINT) AS n_words,
                   CASE WHEN len(tk) > 0 THEN
                       FLOOR(list_sum(list_transform(tk,
                           t -> CAST(length(t) AS DOUBLE)))
                           / len(tk) * 1e6) / 1e6
                   ELSE 0.0 END AS mean_word_len,
                   CASE WHEN len(tk) > 0 THEN
                       FLOOR(((length(text) - length(replace(text, '#', '')))
                              + (length(text)
                                 - length(replace(text, '...', ''))) / 3)
                             / len(tk) * 1e6) / 1e6
                   ELSE 0.0 END AS symbol_ratio,
                   CASE WHEN len(tk) > 0 THEN
                       FLOOR(len(list_filter(tk,
                               t -> regexp_matches(t, '[a-z]')))
                             / len(tk) * 1e6) / 1e6
                   ELSE 0.0 END AS alpha_frac,
                   CAST({hit_sum} AS BIGINT) AS stop_hits
            FROM t),
        g AS (
            SELECT *,
                   n_words >= {min_words} AND n_words <= {max_words}
                       AS word_count_ok,
                   mean_word_len >= {min_mwl!r} AND mean_word_len <= {max_mwl!r}
                       AS mean_len_ok,
                   symbol_ratio <= {max_sym!r} AS symbol_ok,
                   alpha_frac >= {min_alpha!r} AS alpha_ok,
                   stop_hits >= {min_stops} AS stopword_ok
            FROM f)
        SELECT *, word_count_ok AND mean_len_ok AND symbol_ok AND alpha_ok
                  AND stopword_ok AS keep
        FROM g
    """


def _corpus_oracles() -> dict[str, str]:
    cos_qc = _COS.format(a="q", b="c")
    cos_ab = _COS.format(a="a", b="b")
    return {
        "hybrid_retrieval": rf"""
            WITH base AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                                 ELSE len(regexp_split_to_array(
                                          lower(trim(text)), '\s+'))
                            END AS DOUBLE) AS dl
                FROM documents),
            stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                             SUM(dl) / COUNT(*) AS avgdl
                      FROM base),
            m AS (SELECT doc_id, dl,
                         unnest(list_filter(w,
                                x -> x IN ('spark', 'hash', 'merge'))) AS term
                  FROM base),
            tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
                   FROM m GROUP BY 1, 2, 3),
            dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
                      FROM tf GROUP BY 1),
            lexscored AS (
                SELECT tf.doc_id,
                       ROUND(CAST(SUM(CAST(ROUND(
                           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (1.0 - 0.75
                                             + 0.75 * tf.dl / s.avgdl)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE), 4) AS score
                FROM tf
                JOIN dfreq d USING (term)
                CROSS JOIN stats s
                GROUP BY tf.doc_id),
            lex AS (
                SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                            AS INTEGER) AS r
                FROM (SELECT * FROM lexscored
                      ORDER BY score DESC, doc_id LIMIT 15)),
            {_VEC_CTE.strip()},
            q AS (SELECT * FROM n WHERE vec_id = 0),
            vecscored AS (
                SELECT c.vec_id AS doc_id, {cos_qc} AS sim
                FROM q JOIN n c ON c.vec_id <> q.vec_id),
            vec AS (
                SELECT doc_id,
                       CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id)
                            AS INTEGER) AS r
                FROM (SELECT * FROM vecscored
                      ORDER BY sim DESC, doc_id LIMIT 15)),
            f AS (
                SELECT COALESCE(l.doc_id, ve.doc_id) AS doc_id,
                       l.r AS rank_lex, ve.r AS rank_vec
                FROM lex l FULL OUTER JOIN vec ve ON ve.doc_id = l.doc_id)
            SELECT doc_id, rank_lex, rank_vec,
                   FLOOR((COALESCE(1.0 / (60.0 + CAST(rank_lex AS DOUBLE)), 0.0)
                          + COALESCE(1.0 / (60.0 + CAST(rank_vec AS DOUBLE)),
                                     0.0)) * 1000000) / 1000000.0 AS rrf_score
            FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10
        """,
        "dedup_exact": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_md5,
                   min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLE_CTE},
            -- document-frequency cap (mirrors ngram_jaccard_pairs
            -- max_shingle_df=0.5): boilerplate shingles carry no signal
            hot AS (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) > 0.5 * (SELECT count(DISTINCT doc_id)
                                             FROM documents)),
            shf AS (SELECT * FROM sh
                    WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM shf a JOIN shf b
                        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT doc_a, doc_b, jaccard FROM (
                SELECT doc_a, doc_b,
                       FLOOR(i / (sa.sz + sb.sz - i) * 1000000.0)
                           / 1000000.0 AS jaccard
                FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                           JOIN sizes sb ON doc_b = sb.doc_id
            ) WHERE jaccard >= 0.3
        """,
        "dedup_containment": f"""
            WITH {_SHINGLE_CTE},
            hot AS (SELECT shingle FROM sh GROUP BY shingle
                    HAVING count(*) > 0.5 * (SELECT count(DISTINCT doc_id)
                                             FROM documents)),
            shf AS (SELECT * FROM sh
                    WHERE shingle NOT IN (SELECT shingle FROM hot)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM shf GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                      FROM shf a JOIN shf b
                        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT doc_a, doc_b, containment, sz_a, sz_b FROM (
                SELECT doc_a, doc_b,
                       FLOOR(i / least(sa.sz, sb.sz) * 1000000.0)
                           / 1000000.0 AS containment,
                       CAST(sa.sz AS BIGINT) AS sz_a,
                       CAST(sb.sz AS BIGINT) AS sz_b
                FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                           JOIN sizes sb ON doc_b = sb.doc_id
            ) WHERE containment >= 0.8
        """,
        "distinctive_terms": r"""
            WITH toks AS (SELECT grp, t AS token FROM (
                    SELECT source AS grp,
                           unnest(string_split_regex(lower(trim(text)),
                                                     '\s+')) AS t
                    FROM documents) WHERE t <> ''),
            tf AS (SELECT grp, token, COUNT(*) AS tf
                   FROM toks GROUP BY grp, token),
            dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
            ng AS (SELECT COUNT(DISTINCT source) AS ng FROM documents),
            scored AS (SELECT grp, token, tf, df,
                FLOOR(CAST(tf AS DOUBLE) * ng / df * 1000000.0)
                    / 1000000.0 AS score
                FROM tf JOIN dfq USING (token) CROSS JOIN ng
                WHERE tf >= 2)
            SELECT grp AS source, token, tf, df, score FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
                    ORDER BY score DESC, token) AS rn FROM scored)
            WHERE rn <= 5
        """,
        "outlier_events": """
            WITH s AS (SELECT event_type,
                COUNT(CASE WHEN value IS NOT NULL THEN 1 END) AS n,
                CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 4)
                              AS DECIMAL(19,6))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE), 4)
                              AS DECIMAL(19,6))
                         * CAST(ROUND(CAST(value AS DOUBLE), 4)
                                AS DECIMAL(19,6))) AS DOUBLE) AS sxx
                FROM events GROUP BY event_type)
            SELECT event_id, e.event_type, value,
                   FLOOR((ROUND(CAST(value AS DOUBLE), 4) - sx / n)
                         / sqrt(sxx / n - (sx / n) * (sx / n))
                         * 10000.0) / 10000.0 AS z
            FROM events e JOIN s ON e.event_type = s.event_type
            WHERE n > 1
              AND sxx / n - (sx / n) * (sx / n) > 0
              AND ABS((ROUND(CAST(value AS DOUBLE), 4) - sx / n)
                      / sqrt(sxx / n - (sx / n) * (sx / n))) >= 2.5
        """,
        "kmv_set_ops": """
            WITH va AS (SELECT DISTINCT o_custkey AS v FROM orders
                        WHERE year(o_orderdate) = 1996),
            vb AS (SELECT DISTINCT o_custkey AS v FROM orders
                   WHERE year(o_orderdate) = 1997),
            sa AS (SELECT ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))
                              ::BIGINT AS hv
                   FROM va ORDER BY hv LIMIT 256),
            sb AS (SELECT ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))
                              ::BIGINT AS hv
                   FROM vb ORDER BY hv LIMIT 256),
            un AS (SELECT DISTINCT hv FROM
                       (SELECT hv FROM sa UNION ALL SELECT hv FROM sb)
                   ORDER BY hv LIMIT 256),
            stats AS (SELECT COUNT(*) AS k_eff, MAX(hv) AS kth FROM un),
            rho AS (SELECT COUNT(*) AS rho FROM un
                    WHERE hv IN (SELECT hv FROM sa)
                      AND hv IN (SELECT hv FROM sb)),
            ex AS (SELECT
                (SELECT COUNT(*) FROM
                    (SELECT v FROM va UNION SELECT v FROM vb)) AS exact_union,
                (SELECT COUNT(*) FROM va
                 WHERE v IN (SELECT v FROM vb)) AS exact_intersect),
            est AS (SELECT *,
                CASE WHEN k_eff >= 256
                     THEN CAST(FLOOR(255.0 * 1152921504606846976.0
                               / CAST(GREATEST(kth, 1) AS DOUBLE)) AS BIGINT)
                     ELSE k_eff END AS est_union
                FROM stats CROSS JOIN rho CROSS JOIN ex)
            SELECT est_union,
                   CAST(FLOOR(CAST(rho AS DOUBLE) / k_eff * est_union)
                        AS BIGINT) AS est_intersect,
                   FLOOR(CAST(rho AS DOUBLE) / k_eff * 1000000.0)
                       / 1000000.0 AS jaccard_est,
                   exact_union, exact_intersect
            FROM est
        """,
        "corr_matrix": """
            WITH base AS (SELECT
                CAST(ROUND(CAST(l_quantity AS DOUBLE), 4)
                     AS DECIMAL(19,6)) AS q,
                CAST(ROUND(CAST(l_extendedprice AS DOUBLE), 4)
                     AS DECIMAL(19,6)) AS p,
                CAST(ROUND(CAST(l_discount AS DOUBLE), 4)
                     AS DECIMAL(19,6)) AS d,
                l_quantity IS NOT NULL AS qn,
                l_extendedprice IS NOT NULL AS pn,
                l_discount IS NOT NULL AS dn
                FROM lineitem),
            w AS (SELECT
                COUNT(CASE WHEN qn AND pn THEN 1 END) AS n_qp,
                CAST(SUM(CASE WHEN qn AND pn THEN q END) AS DOUBLE) AS sx_qp,
                CAST(SUM(CASE WHEN qn AND pn THEN p END) AS DOUBLE) AS sy_qp,
                CAST(SUM(CASE WHEN qn AND pn THEN q * p END) AS DOUBLE) AS sxy_qp,
                CAST(SUM(CASE WHEN qn AND pn THEN q * q END) AS DOUBLE) AS sxx_qp,
                CAST(SUM(CASE WHEN qn AND pn THEN p * p END) AS DOUBLE) AS syy_qp,
                COUNT(CASE WHEN qn AND dn THEN 1 END) AS n_qd,
                CAST(SUM(CASE WHEN qn AND dn THEN q END) AS DOUBLE) AS sx_qd,
                CAST(SUM(CASE WHEN qn AND dn THEN d END) AS DOUBLE) AS sy_qd,
                CAST(SUM(CASE WHEN qn AND dn THEN q * d END) AS DOUBLE) AS sxy_qd,
                CAST(SUM(CASE WHEN qn AND dn THEN q * q END) AS DOUBLE) AS sxx_qd,
                CAST(SUM(CASE WHEN qn AND dn THEN d * d END) AS DOUBLE) AS syy_qd,
                COUNT(CASE WHEN pn AND dn THEN 1 END) AS n_pd,
                CAST(SUM(CASE WHEN pn AND dn THEN p END) AS DOUBLE) AS sx_pd,
                CAST(SUM(CASE WHEN pn AND dn THEN d END) AS DOUBLE) AS sy_pd,
                CAST(SUM(CASE WHEN pn AND dn THEN p * d END) AS DOUBLE) AS sxy_pd,
                CAST(SUM(CASE WHEN pn AND dn THEN p * p END) AS DOUBLE) AS sxx_pd,
                CAST(SUM(CASE WHEN pn AND dn THEN d * d END) AS DOUBLE) AS syy_pd
                FROM base)
            SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
                   n_qp AS n,
                   CASE WHEN sqrt((CAST(n_qp AS DOUBLE) * sxx_qp - sx_qp * sx_qp)
                                  * (CAST(n_qp AS DOUBLE) * syy_qp - sy_qp * sy_qp)) > 0
                        THEN FLOOR((CAST(n_qp AS DOUBLE) * sxy_qp - sx_qp * sy_qp)
                             / sqrt((CAST(n_qp AS DOUBLE) * sxx_qp - sx_qp * sx_qp)
                                    * (CAST(n_qp AS DOUBLE) * syy_qp - sy_qp * sy_qp))
                             * 1000000.0) / 1000000.0 END AS r
            FROM w
            UNION ALL
            SELECT 'l_quantity', 'l_discount', n_qd,
                   CASE WHEN sqrt((CAST(n_qd AS DOUBLE) * sxx_qd - sx_qd * sx_qd)
                                  * (CAST(n_qd AS DOUBLE) * syy_qd - sy_qd * sy_qd)) > 0
                        THEN FLOOR((CAST(n_qd AS DOUBLE) * sxy_qd - sx_qd * sy_qd)
                             / sqrt((CAST(n_qd AS DOUBLE) * sxx_qd - sx_qd * sx_qd)
                                    * (CAST(n_qd AS DOUBLE) * syy_qd - sy_qd * sy_qd))
                             * 1000000.0) / 1000000.0 END
            FROM w
            UNION ALL
            SELECT 'l_extendedprice', 'l_discount', n_pd,
                   CASE WHEN sqrt((CAST(n_pd AS DOUBLE) * sxx_pd - sx_pd * sx_pd)
                                  * (CAST(n_pd AS DOUBLE) * syy_pd - sy_pd * sy_pd)) > 0
                        THEN FLOOR((CAST(n_pd AS DOUBLE) * sxy_pd - sx_pd * sy_pd)
                             / sqrt((CAST(n_pd AS DOUBLE) * sxx_pd - sx_pd * sx_pd)
                                    * (CAST(n_pd AS DOUBLE) * syy_pd - sy_pd * sy_pd))
                             * 1000000.0) / 1000000.0 END
            FROM w
        """,
        "ppjoin_pairs": f"""
            WITH {_SHINGLE_CTE},
            -- brute-force exact Jaccard, NO cap and NO prefix filter: the
            -- oracle thereby PROVES the prefix filter loses no pairs
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             count(*) AS i
                      FROM sh a JOIN sh b
                        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT doc_a, doc_b, jaccard FROM (
                SELECT doc_a, doc_b,
                       FLOOR(i / (sa.sz + sb.sz - i) * 1000000.0)
                           / 1000000.0 AS jaccard
                FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                           JOIN sizes sb ON doc_b = sb.doc_id
            ) WHERE jaccard >= 0.5
        """,
        "dedup_minhash_lsh": f"""
            WITH {_MINHASH_CTES}
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {_MINHASH_CTES},
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.band = b.band AND a.bh = b.bh
                       AND a.doc_id < b.doc_id),
            e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
            reach AS (
                SELECT a, a AS b FROM (SELECT DISTINCT a FROM e)
                UNION
                SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
            ),
            lbl AS (SELECT a AS node, min(b) AS label FROM reach GROUP BY a)
            SELECT d.doc_id, COALESCE(l.label, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN lbl l ON d.doc_id = l.node
        """,
        "weighted_sample": """
            WITH k AS (
                SELECT doc_id, lang, n_chars,
                       ln((('0x' || substr(md5('wsample' ||
                            CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
                          / 1152921504606846976.0)
                       / CAST(n_chars AS DOUBLE) AS key
                FROM documents
                WHERE n_chars IS NOT NULL AND n_chars > 0)
            SELECT doc_id, lang, n_chars, rnk FROM (
                SELECT doc_id, lang, n_chars,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY lang ORDER BY key DESC, doc_id
                       ) AS BIGINT) AS rnk
                FROM k)
            WHERE rnk <= 100
        """,
        "stratified_sample": """
            SELECT event_id, user_id, event_type, value FROM (
                SELECT event_id, user_id, event_type, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type
                           ORDER BY ('0x' || substr(md5('sample' ||
                                     CAST(event_id AS VARCHAR)), 1, 15))::BIGINT,
                                    event_id) AS rn
                FROM events) WHERE rn <= 200
        """,
        "dedup_simhash": _simhash_sql(),
        "embedding_neardup": f"""
            WITH {_VEC_CTE},
            bk AS (SELECT vec_id, e, nrm, {_bucket_sql(_NEARDUP_PLANES, 64)} AS bucket FROM n)
            SELECT doc_a, doc_b, cosine_sim FROM (
                SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                       {cos_ab} AS cosine_sim
                FROM bk a JOIN bk b
                  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ) WHERE cosine_sim >= 0.35
        """,
        "ann_cosine_topk": f"""
            WITH {_VEC_CTE},
            q AS (SELECT * FROM n WHERE vec_id < 10),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       {cos_qc} AS cosine_sim
                FROM q JOIN n c ON c.vec_id <> q.vec_id)
            SELECT query_id, neighbor_id, cosine_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn
                FROM scored) WHERE rn <= 5
        """,
        "ann_lsh_topk": f"""
            WITH {_VEC_CTE},
            b AS (SELECT vec_id, e, nrm, {_bucket_sql(4, 64)} AS bucket FROM n),
            q AS (SELECT * FROM b WHERE vec_id < 10),
            scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       {cos_qc} AS cosine_sim
                FROM q JOIN b c
                  ON q.bucket = c.bucket AND c.vec_id <> q.vec_id)
            SELECT query_id, neighbor_id, cosine_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn
                FROM scored) WHERE rn <= 5
        """,
        "ann_ivf_topk": f"""
            WITH {_VEC_CTE},
            cents AS (SELECT vec_id AS cent_id, e, nrm FROM n
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
            assign AS (
                SELECT __id, cent_id FROM (
                    SELECT a.vec_id AS __id, c.cent_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY a.vec_id
                               ORDER BY {_COS.format(a="a", b="c")} DESC,
                                        c.cent_id) AS rn
                    FROM n a CROSS JOIN cents c) WHERE rn = 1),
            probes AS (
                SELECT __id AS query_id, cent_id FROM (
                    SELECT q.vec_id AS __id, c.cent_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY {_COS.format(a="q", b="c")} DESC,
                                        c.cent_id) AS rn
                    FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
                WHERE rn <= 2),
            scored AS (
                SELECT p.query_id, a.__id AS neighbor_id,
                       {_COS.format(a="qn", b="cn")} AS cosine_sim
                FROM probes p
                JOIN assign a ON a.cent_id = p.cent_id
                JOIN n qn ON qn.vec_id = p.query_id
                JOIN n cn ON cn.vec_id = a.__id
                WHERE a.__id <> p.query_id)
            SELECT query_id, neighbor_id, cosine_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn
                FROM scored) WHERE rn <= 5
        """,
        "quality_classifier": _quality_classifier_sql(),
        "gopher_filters": _gopher_filters_sql(),
        "mixture_temperature": """
            WITH c AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY lang),
            m AS (
                SELECT lang, n_docs,
                       n_docs / (SELECT CAST(sum(n_docs) AS DOUBLE) FROM c)
                           AS share_raw
                FROM c),
            w AS (
                SELECT lang, n_docs, share_raw,
                       CAST(FLOOR(sqrt(share_raw) * 1e6) AS BIGINT) AS w6
                FROM m)
            SELECT lang, n_docs,
                   FLOOR(share_raw * 1e6) / 1e6 AS share,
                   FLOOR(w6 / (SELECT CAST(sum(w6) AS BIGINT) FROM w)
                         * 1e6) / 1e6 AS p_temp
            FROM w
        """,
        "ann_recall": f"""
            WITH {_VEC_CTE},
            bk AS (SELECT vec_id, e, nrm, {_bucket_sql(4, 64)} AS bucket
                   FROM n),
            qs AS (SELECT * FROM n WHERE vec_id < 10),
            ex AS (
                SELECT query_id, neighbor_id FROM (
                    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY {_COS.format(a="q", b="c")} DESC,
                                        c.vec_id) AS rn
                    FROM qs q JOIN n c ON c.vec_id <> q.vec_id)
                WHERE rn <= 5),
            ap AS (
                SELECT query_id, neighbor_id FROM (
                    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY {_COS.format(a="q", b="c")} DESC,
                                        c.vec_id) AS rn
                    FROM bk q JOIN bk c
                      ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
                    WHERE q.vec_id < 10)
                WHERE rn <= 5),
            hits AS (SELECT e.query_id, count(*) AS n_hits
                     FROM ex e JOIN ap USING (query_id, neighbor_id)
                     GROUP BY 1),
            base AS (SELECT DISTINCT query_id FROM ex)
            SELECT base.query_id,
                   CAST(COALESCE(n_hits, 0) AS BIGINT) AS n_hits,
                   FLOOR(COALESCE(n_hits, 0) / 5.0 * 1e6) / 1e6 AS recall
            FROM base LEFT JOIN hits USING (query_id)
        """,
        "ann_ivf_pq": f"""
            WITH {_VEC_CTE},
            samp AS (
                SELECT e, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS kk
                FROM (SELECT vec_id, e FROM v WHERE vec_id % 31 = 0
                      ORDER BY vec_id LIMIT 16)),
            cb AS (
                SELECT CAST(t.mi AS INTEGER) AS mi, kk,
                       list_transform(generate_series(1, 8),
                                      j -> e[CAST(t.mi AS INTEGER) * 8 + j]) AS cw
                FROM samp CROSS JOIN range(0, 8) t(mi)),
            dists AS (
                SELECT x.vec_id, c.mi, c.kk,
                       list_sum(list_transform(generate_series(1, 8),
                           j -> (x.e[c.mi * 8 + j] - c.cw[j])
                              * (x.e[c.mi * 8 + j] - c.cw[j]))) AS d
                FROM v x CROSS JOIN cb c),
            codes AS (
                SELECT vec_id, mi, cw FROM (
                    SELECT d.vec_id, d.mi, cb.cw,
                           ROW_NUMBER() OVER (PARTITION BY d.vec_id, d.mi
                                              ORDER BY d.d, d.kk) AS rn
                    FROM dists d JOIN cb ON cb.mi = d.mi AND cb.kk = d.kk)
                WHERE rn = 1),
            recon AS (
                SELECT vec_id, flatten(list(cw ORDER BY mi)) AS r
                FROM codes GROUP BY vec_id),
            rq AS (
                SELECT vec_id, r,
                       sqrt(list_sum(list_transform(r, x -> x * x))) AS rnrm
                FROM recon),
            cents AS (SELECT vec_id AS cent_id, e, nrm FROM n
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
            assign AS (
                SELECT __id, cent_id FROM (
                    SELECT a.vec_id AS __id, c.cent_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY a.vec_id
                               ORDER BY {_COS.format(a="a", b="c")} DESC,
                                        c.cent_id) AS rn
                    FROM n a CROSS JOIN cents c) WHERE rn = 1),
            probes AS (
                SELECT __id AS query_id, cent_id FROM (
                    SELECT q.vec_id AS __id, c.cent_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY q.vec_id
                               ORDER BY {_COS.format(a="q", b="c")} DESC,
                                        c.cent_id) AS rn
                    FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
                WHERE rn <= 2),
            scored AS (
                SELECT p.query_id, a.__id AS neighbor_id,
                       FLOOR((list_sum(list_transform(
                                  generate_series(1, len(qn.e)),
                                  i -> qn.e[i] * rr.r[i]))
                              / (qn.nrm * rr.rnrm)) * 1e6) / 1e6 AS pq_sim
                FROM probes p
                JOIN assign a ON a.cent_id = p.cent_id
                JOIN n qn ON qn.vec_id = p.query_id
                JOIN rq rr ON rr.vec_id = a.__id
                WHERE a.__id <> p.query_id)
            SELECT query_id, neighbor_id, pq_sim FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY pq_sim DESC, neighbor_id) AS rn
                FROM scored) WHERE rn <= 5
        """,
        "text_profile": _profile_sql(),
        "corpus_curation": f"""
            WITH prof AS ({_profile_sql()}),
            feats AS (
                SELECT d.doc_id, d.source, p.n_tokens, p.quality, p.fingerprint
                FROM documents d JOIN prof p ON d.doc_id = p.doc_id
                WHERE p.quality >= 0.5 AND p.lang_guess = 'en'
            ),
            keep AS (
                SELECT fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
                FROM feats GROUP BY fingerprint
            )
            SELECT f.doc_id, f.source, f.n_tokens, f.quality, f.fingerprint,
                   k.n_copies
            FROM feats f JOIN keep k
              ON f.fingerprint = k.fingerprint AND f.doc_id = k.keep_id
        """,
        "source_quota": f"""
            WITH p AS ({_profile_sql()}),
            ranked AS (
                SELECT p.doc_id, d.source, p.quality,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY d.source
                           ORDER BY p.quality DESC, p.doc_id
                       ) AS BIGINT) AS rnk
                FROM p JOIN documents d USING (doc_id))
            SELECT doc_id, source, quality, rnk
            FROM ranked WHERE rnk <= 50
        """,
        "text_quality_by_source": f"""
            WITH p AS ({_profile_sql()})
            SELECT d.source,
                   ROUND(CAST(SUM(CAST(ROUND(p.quality, 4) AS DECIMAL(18,4)))
                              AS DOUBLE) / COUNT(*), 4) AS avg_quality,
                   CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
                   COUNT(*) AS n_docs
            FROM p JOIN documents d USING (doc_id)
            GROUP BY d.source
        """,
        "multimodal_image_features": """
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   CAST(1 + (('0x' || substr(md5(text), 1, 15))::BIGINT % 4096) AS INT) AS width,
                   CAST(1 + (('0x' || substr(md5(text), 16, 15))::BIGINT % 4096) AS INT) AS height,
                   (('0x' || substr(md5(text), 18, 15))::BIGINT % 256000) / 1000.0 AS mean_luma
            FROM documents
        """,
        "multimodal_image_neardup": """
            WITH w AS (
                SELECT doc_id, unnest(list_transform(
                    generate_series(1, octet_length(encode(text)) - 3),
                    i -> substr(text, CAST(i AS INT), 4))) AS win
                FROM documents WHERE octet_length(encode(text)) >= 4),
            h2 AS (SELECT doc_id,
                          ('0x' || substr(md5(win), 1, 8))::BIGINT AS v1,
                          ('0x' || substr(md5(win), 9, 8))::BIGINT AS v2
                   FROM w),
            votes AS (
                SELECT h2.doc_id, t.k,
                       SUM(CASE WHEN (CASE WHEN t.k < 32
                                      THEN (v2 >> CAST(t.k AS INT))
                                      ELSE (v1 >> CAST(t.k - 32 AS INT))
                                 END) & 1 = 1
                                THEN 1 ELSE -1 END) AS s
                FROM h2 CROSS JOIN range(0, 64) t(k) GROUP BY 1, 2),
            grid AS (SELECT d.doc_id, t.k
                     FROM documents d CROSS JOIN range(0, 64) t(k)),
            p AS (
                SELECT g.doc_id,
                       string_agg(CASE WHEN COALESCE(votes.s, 0) > 0
                                       THEN '1' ELSE '0' END,
                                  '' ORDER BY g.k) AS phash
                FROM grid g LEFT JOIN votes
                  ON votes.doc_id = g.doc_id AND votes.k = g.k
                GROUP BY g.doc_id)
            SELECT doc_a, doc_b, hamming FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(len(list_filter(generate_series(1, 64),
                           i -> substr(a.phash, CAST(i AS INT), 1)
                              <> substr(b.phash, CAST(i AS INT), 1)))
                            AS INT) AS hamming
                FROM p a JOIN p b ON a.doc_id < b.doc_id)
            WHERE hamming <= 4
        """,
        "cohort_retention": """
            WITH w AS (SELECT DISTINCT user_id,
                              date_trunc('week', ts) AS week
                       FROM events),
            f AS (SELECT user_id, MIN(week) AS cohort_week
                  FROM w GROUP BY user_id)
            SELECT f.cohort_week,
                   CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                                  CAST(w.week AS DATE)) // 7 AS BIGINT)
                       AS week_n,
                   COUNT(DISTINCT w.user_id) AS active_users
            FROM w JOIN f USING (user_id)
            GROUP BY 1, 2
        """,
        "merge_intervals": """
            WITH s AS (SELECT event_type, event_id,
                              epoch(ts) AS span_start,
                              epoch(ts) + value * 60.0 AS span_end
                       FROM events),
            g AS (SELECT *,
                         CASE WHEN max(span_end) OVER (
                                  PARTITION BY event_type
                                  ORDER BY span_start, span_end, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) >= span_start
                              THEN 0 ELSE 1 END AS brk
                  FROM s),
            c AS (SELECT *,
                         SUM(brk) OVER (
                             PARTITION BY event_type
                             ORDER BY span_start, span_end, event_id
                             ROWS UNBOUNDED PRECEDING) AS grp
                  FROM g)
            SELECT event_type,
                   MIN(span_start) AS interval_start,
                   MAX(span_end) AS interval_end,
                   CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM c GROUP BY event_type, grp
        """,
        "token_stats": r"""
            WITH t AS (
                SELECT lang,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                                 ELSE len(regexp_split_to_array(
                                          lower(trim(text)), '\s+'))
                            END AS BIGINT) AS ws,
                       CAST(len(regexp_extract_all(text,
                            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))
                            AS BIGINT) AS sw
                FROM documents)
            SELECT lang,
                   COUNT(*) AS n_docs,
                   CAST(SUM(ws) AS BIGINT) AS ws_tokens,
                   CAST(SUM(sw) AS BIGINT) AS sw_tokens,
                   CASE WHEN SUM(ws) > 0 THEN
                       FLOOR(CAST(SUM(sw) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE)
                             * 10000.0) / 10000.0
                   END AS subword_ratio
            FROM t GROUP BY lang
        """,
        "multimodal_audio_features": """
            WITH a AS (SELECT doc_id, hex(encode(text)) AS hx
                       FROM documents),
            w AS (SELECT doc_id, hx,
                         unnest(range(0, CAST(greatest(
                             ceil((length(hx) / 2) / 100.0), 1) AS BIGINT)))
                             AS widx
                  FROM a),
            c AS (SELECT doc_id, CAST(widx AS INT) AS window_idx,
                         substr(hx, CAST(widx * 200 + 1 AS BIGINT), 200)
                             AS chunk_hex
                  FROM w)
            SELECT doc_id, window_idx,
                   CAST(length(chunk_hex) / 2 AS BIGINT) AS n_bytes,
                   (('0x' || substr(md5(chunk_hex), 1, 15))::BIGINT
                    % 100000) / 1000.0 AS rms,
                   (('0x' || substr(md5(chunk_hex), 16, 15))::BIGINT
                    % 1000) / 1000.0 AS zcr
            FROM c
        """,
        "multimodal_audio_neardup": """
            WITH a AS (SELECT doc_id, hex(encode(text)) AS hx
                       FROM documents),
            base AS (SELECT doc_id, hx,
                            CAST(least(greatest(
                                ceil((length(hx) / 2) / 4.0), 1), 65)
                                AS BIGINT) AS nw
                     FROM a),
            w AS (SELECT doc_id, hx, unnest(range(0, nw)) AS widx
                  FROM base),
            c AS (SELECT doc_id, CAST(widx AS INT) AS window_idx,
                         (('0x' || substr(md5(substr(hx,
                              CAST(widx * 8 + 1 AS BIGINT), 8)), 1, 15))
                              ::BIGINT % 100000) / 1000.0 AS rms
                  FROM w WHERE widx <= 64),
            grid AS (SELECT doc_id, nw, t.k
                     FROM base CROSS JOIN range(0, 64) t(k)),
            sig AS (
                SELECT g.doc_id,
                       string_agg(
                           CASE WHEN nxt.rms IS NOT NULL
                                 AND cur.rms IS NOT NULL THEN
                               (CASE WHEN nxt.rms > cur.rms
                                     THEN '1' ELSE '0' END)
                           ELSE CAST((('0x' || substr(
                                    md5(CAST(g.nw AS VARCHAR)),
                                    (g.k % 16) + 1, 1))::BIGINT % 2)
                                AS VARCHAR)
                           END,
                           '' ORDER BY g.k) AS afp
                FROM grid g
                LEFT JOIN c cur ON cur.doc_id = g.doc_id
                               AND cur.window_idx = g.k
                LEFT JOIN c nxt ON nxt.doc_id = g.doc_id
                               AND nxt.window_idx = g.k + 1
                GROUP BY g.doc_id)
            SELECT doc_a, doc_b, hamming FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(len(list_filter(generate_series(1, 64),
                           i -> substr(a.afp, CAST(i AS INT), 1)
                              <> substr(b.afp, CAST(i AS INT), 1)))
                            AS INT) AS hamming
                FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
            WHERE hamming <= 3
        """,
        "lag_features": """
            SELECT event_id, user_id, value,
                   LAG(value, 1) OVER w AS value_lag1,
                   LAG(value, 2) OVER w AS value_lag2,
                   LEAD(value, 1) OVER w AS value_lead1,
                   value - LAG(value, 1) OVER w AS value_delta
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "multimodal_video_neardup": """
            WITH fr AS (
                SELECT doc_id, t.f,
                       substr(text, CAST(t.f * 64 + 1 AS BIGINT), 64) AS ftxt
                FROM documents CROSS JOIN range(0, 8) t(f)),
            fr2 AS (SELECT * FROM fr WHERE length(ftxt) >= 4),
            w AS (SELECT doc_id, f, unnest(list_transform(
                       generate_series(1, length(ftxt) - 3),
                       i -> substr(ftxt, CAST(i AS INT), 4))) AS win
                  FROM fr2),
            h2 AS (SELECT doc_id, f,
                          ('0x' || substr(md5(win), 1, 8))::BIGINT AS v1,
                          ('0x' || substr(md5(win), 9, 8))::BIGINT AS v2
                   FROM w),
            votes AS (
                SELECT h2.doc_id, h2.f, t.k,
                       SUM(CASE WHEN (CASE WHEN t.k < 32
                                      THEN (v2 >> CAST(t.k AS INT))
                                      ELSE (v1 >> CAST(t.k - 32 AS INT))
                                 END) & 1 = 1
                                THEN 1 ELSE -1 END) AS s
                FROM h2 CROSS JOIN range(0, 64) t(k) GROUP BY 1, 2, 3),
            p AS (
                SELECT doc_id, f,
                       string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END,
                                  '' ORDER BY k) AS fp
                FROM votes GROUP BY 1, 2),
            dp AS (SELECT DISTINCT doc_id, fp FROM p),
            dfq AS (SELECT fp FROM dp GROUP BY fp
                    HAVING count(*) > 0.5 * (SELECT count(DISTINCT doc_id)
                                             FROM documents)),
            dpc AS (SELECT * FROM dp
                    WHERE fp NOT IN (SELECT fp FROM dfq))
            SELECT doc_a, doc_b, n_shared FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS n_shared
                FROM dpc a JOIN dpc b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            WHERE n_shared >= 2
        """,
        "frame_sample": """
            SELECT doc_id, frame_idx, CAST(frame_idx AS DOUBLE) AS frame_ts_s
            FROM (
                SELECT doc_id,
                       unnest(generate_series(0,
                           greatest(CAST(floor(n_chars / 50.0) AS INT), 0))) AS frame_idx
                FROM documents WHERE doc_id < 50)
        """,
    }


def _kcore_sql(k: int = 3, rounds: int = 20, min_support: int = 1) -> str:
    """Unrolled k-core peeling. Peeling is monotone and idempotent at the
    fixpoint, so unrolling MORE rounds than Spark's convergence count is
    exact — ``rounds`` is a verified superset of the sf0.01 round count."""
    # every u{r} is referenced three times by round r+1 — MATERIALIZED
    # keeps DuckDB from inlining the chain into 3^rounds parquet scans
    ctes = [
        "pp AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        f"""e AS MATERIALIZED (SELECT x.l_partkey AS p1, y.l_partkey AS p2
                 FROM pp x JOIN pp y ON x.l_orderkey = y.l_orderkey
                  AND x.l_partkey < y.l_partkey
                 GROUP BY 1, 2 HAVING COUNT(*) >= {min_support})""",
        "u0 AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM e"
        " UNION ALL SELECT p2, p1 FROM e)",
    ]
    prev = "u0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"k{r} AS MATERIALIZED "
            f"(SELECT a FROM {prev} GROUP BY a HAVING COUNT(*) >= {k})"
        )
        ctes.append(
            f"u{r} AS MATERIALIZED (SELECT u.a, u.b FROM {prev} u"
            f" JOIN k{r} ka ON u.a = ka.a JOIN k{r} kb ON u.b = kb.a)"
        )
        prev = f"u{r}"
    joined = ",\n            ".join(ctes)
    return f"""
        WITH {joined}
        SELECT a AS node, COUNT(*) AS core_degree
        FROM {prev} GROUP BY a HAVING COUNT(*) >= {k}
    """


def _ewma_sql(alpha: float = 0.3, window: int = 8) -> str:
    """Weights precomputed in Python and injected as identical double
    literals in both engines (shortest-repr round-trips exactly); folds via
    list_reduce (first-element seeding == a 0.0-seeded left fold because
    0.0 + x == x); normalization FLOOR-canonicalized like the Spark side."""
    ws = [alpha * (1.0 - alpha) ** d for d in range(window)]
    warr = "[" + ", ".join(repr(w) for w in ws) + "]"
    return f"""
        WITH v AS (SELECT user_id, event_id, ts, value FROM events
                   WHERE value IS NOT NULL),
        t AS (SELECT user_id, event_id, value,
                     list(value) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW
                     ) AS vals
              FROM v)
        SELECT user_id, event_id, value,
               FLOOR(list_reduce(
                         list_transform(
                             vals, (x, i) -> x * ({warr})[len(vals) - i + 1]),
                         (a, b) -> a + b)
                     / list_reduce(({warr})[1:len(vals)], (a, b) -> a + b)
                     * 1000000.0) / 1000000.0 AS ewma
        FROM t
    """


def _round4_oracles() -> dict[str, str]:
    return {
        "kcore": _kcore_sql(k=3, rounds=20, min_support=1),
        "ewma_user_value": _ewma_sql(alpha=0.3, window=8),
        "cross_corpus_neardup": f"""
            WITH {_MINHASH_CTES},
            lab AS (SELECT b.doc_id, b.band, b.bh, d.source
                    FROM bands b JOIN documents d USING (doc_id))
            SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
            FROM lab a JOIN lab b ON a.band = b.band AND a.bh = b.bh
            WHERE a.source = 'src0' AND b.source <> 'src0'
        """,
        "dsir_weights": r"""
            WITH toks AS (SELECT d.doc_id, (d.source = 'src0') AS is_t,
                                 unnest(regexp_split_to_array(
                                     lower(trim(text)), '\s+')) AS tok
                          FROM documents d),
            dt AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
            vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cs,
                             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END)
                                  AS BIGINT) AS ct
                      FROM toks GROUP BY 1),
            tot AS (SELECT CAST(SUM(cs) AS DOUBLE) AS s_tot,
                           CAST(SUM(ct) AS DOUBLE) AS t_tot,
                           CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
            lr AS (SELECT tok,
                          CAST(ROUND(ln((ct + 1) / (t_tot + v)), 6)
                               AS DECIMAL(18,6))
                        - CAST(ROUND(ln((cs + 1) / (s_tot + v)), 6)
                               AS DECIMAL(18,6)) AS lr
                   FROM vocab CROSS JOIN tot),
            s AS (SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
                         SUM(CAST(dt.c AS DECIMAL(18,0)) * lr.lr) AS s
                  FROM dt JOIN lr USING (tok) GROUP BY 1)
            SELECT doc_id, n_tokens,
                   FLOOR(CAST(s AS DOUBLE) / n_tokens * 1000000)
                       / 1000000.0 AS dsir_score
            FROM s
        """,
        "semdedup_prune": """
            WITH v AS (SELECT vec_id,
                              list_transform(embedding,
                                             x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                               AS INT) AS cluster_id, e AS c
                   FROM v ORDER BY vec_id LIMIT 8),
            s1 AS (SELECT v.vec_id, v.e, c0.cluster_id,
                          ROUND(list_sum(list_transform(
                              generate_series(1, len(v.e)),
                              i -> (v.e[i] - c0.c[i]) * (v.e[i] - c0.c[i]))),
                              6) AS dist
                   FROM v CROSS JOIN c0),
            a1 AS (SELECT vec_id, e, cluster_id FROM (
                       SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY vec_id
                           ORDER BY dist, cluster_id) AS rn FROM s1)
                   WHERE rn = 1),
            comps AS (SELECT cluster_id, i AS pos, e[i] AS x
                      FROM a1, UNNEST(generate_series(1, len(e))) AS t(i)),
            c1 AS (SELECT cluster_id, pos,
                          FLOOR(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(27,6)))
                                     AS DOUBLE)
                                / COUNT(*) * 1000000.0) / 1000000.0 AS m
                   FROM comps GROUP BY cluster_id, pos),
            cents AS (SELECT cluster_id, list(m ORDER BY pos) AS c
                      FROM c1 GROUP BY cluster_id),
            s2 AS (SELECT v.vec_id, v.e, cents.cluster_id,
                          ROUND(list_sum(list_transform(
                              generate_series(1, len(v.e)),
                              i -> (v.e[i] - cents.c[i])
                                   * (v.e[i] - cents.c[i]))), 6) AS dist
                   FROM v CROSS JOIN cents),
            a2 AS (SELECT vec_id, e, cluster_id FROM (
                       SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY vec_id
                           ORDER BY dist, cluster_id) AS rn FROM s2)
                   WHERE rn = 1),
            m AS (SELECT vec_id, cluster_id, e,
                         sqrt(list_sum(list_transform(e, x -> x * x))) AS n
                  FROM a2),
            pr AS (SELECT DISTINCT b.vec_id AS pid
                   FROM m a JOIN m b
                     ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
                   WHERE FLOOR(list_sum(list_transform(
                             generate_series(1, len(a.e)),
                             i -> a.e[i] * b.e[i]))
                         / (a.n * b.n) * 1000000.0) / 1000000.0 >= 0.8)
            SELECT m.vec_id, m.cluster_id, (pr.pid IS NULL) AS kept
            FROM m LEFT JOIN pr ON m.vec_id = pr.pid
        """,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "join_inner": """
            SELECT c.c_custkey, c.c_name, c.c_mktsegment,
                   o.o_orderkey, o.o_totalprice, o.o_orderstatus
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        """,
        "join_left": """
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        """,
        "join_right": """
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
            FROM orders o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "join_theta": """
            SELECT p.p_partkey, p.p_size, l.l_orderkey, l.l_quantity
            FROM part p JOIN lineitem l
              ON p.p_partkey = l.l_partkey AND p.p_size < 10
        """,
        "join_chain3": """
            SELECT c.c_mktsegment, o.o_orderpriority,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY c.c_mktsegment, o.o_orderpriority
        """,
        "select_transform": """
            SELECT o.o_orderkey,
                   EXTRACT(year FROM o.o_orderdate)::INT AS o_year,
                   o.o_totalprice AS price,
                   c.c_name AS customer_name
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "drop_column": """
            SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_mktsegment, n.n_name
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        """,
        "union_all": """
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 1000
            UNION ALL
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 1000
        """,
        "set_ops": """
            WITH u AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
                       WHERE o_orderpriority = '1-URGENT'),
            b AS (SELECT DISTINCT c_custkey FROM customer
                  WHERE c_mktsegment = 'BUILDING')
            SELECT c_custkey, 'both' AS tag
            FROM (SELECT c_custkey FROM u INTERSECT SELECT c_custkey FROM b)
            UNION ALL
            SELECT c_custkey, 'urgent_only' AS tag
            FROM (SELECT c_custkey FROM u EXCEPT SELECT c_custkey FROM b)
        """,
        "agg_sum_count": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "agg_avg_min_max": """
            SELECT o_orderpriority,
                   ROUND(AVG(o_totalprice), 4) AS avg_price,
                   ROUND(MIN(o_totalprice), 2) AS min_price,
                   ROUND(MAX(o_totalprice), 2) AS max_price,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "join_then_agg": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(o.o_totalprice), 2) AS total_price,
                   COUNT(*) AS n_orders
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        "agg_then_join": """
            SELECT c.c_custkey, c.c_name, t.cust_total, t.n_orders
            FROM (
                SELECT o_custkey AS c_custkey,
                       ROUND(SUM(o_totalprice), 2) AS cust_total,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY o_custkey
            ) t JOIN customer c ON t.c_custkey = c.c_custkey
        """,
        "dedup_latest_per_key": """
            SELECT user_id, event_id, ts, event_type, value
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "anti_join": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
            )
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        """,
        "tpch_q5": """
            SELECT n.n_name,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                        AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "hopping_rollup": """
            SELECT ws AS window_start, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                        AS DOUBLE) AS sum_value
            FROM (
                SELECT event_type, value,
                       CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900
                           - k * 900 AS ws,
                       epoch(ts) AS ep
                FROM events CROSS JOIN range(0, 4) t(k))
            WHERE ws + 3600 > ep
            GROUP BY 1, 2
        """,
        "agg_count_distinct": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_suppkey) AS n_suppliers,
                   COUNT(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY l_returnflag
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders) WHERE rk <= 3
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, event_id, ts, value,
                       epoch(ts) - epoch(LAG(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                FROM events),
            s AS (
                SELECT user_id, value,
                       CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
                FROM g)
            SELECT user_id, session_seq,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
                       AS session_value
            FROM s GROUP BY user_id, session_seq
        """,
        "asof_join": """
            SELECT p.event_id AS purchase_id, p.user_id,
                   c.event_id AS click_id, ROUND(c.value, 4) AS click_value
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "range_join": """
            SELECT a.event_id AS src_id, b.event_id AS dst_id,
                   ROUND(epoch(b.ts) - epoch(a.ts), 3) AS gap_s
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND epoch(b.ts) > epoch(a.ts)
             AND epoch(b.ts) <= epoch(a.ts) + 7200
            WHERE a.event_type IN ('view', 'click')
              AND b.event_type = 'purchase'
        """,
        "tpch_q6": """
            SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1994-01-01'
              AND l_shipdate < TIMESTAMP '1995-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, revenue, rk FROM (
                SELECT c_custkey, c_name, revenue,
                       ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey) AS rk
                FROM (
                    SELECT c.c_custkey, c.c_name,
                           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                               AS revenue
                    FROM customer c
                    JOIN orders o ON o.o_custkey = c.c_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                    WHERE l.l_returnflag = 'R'
                    GROUP BY c.c_custkey, c.c_name
                )
            ) WHERE rk <= 20
        """,
        "salted_join": """
            SELECT o.o_orderpriority,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "skew_agg": """
            SELECT l_returnflag,
                   SUM(l_quantity) AS sum_qty,
                   COUNT(*) AS n_rows,
                   ROUND(MIN(l_extendedprice), 2) AS min_price,
                   ROUND(MAX(l_extendedprice), 2) AS max_price,
                   ROUND(AVG(l_discount), 6) AS avg_discount
            FROM lineitem GROUP BY l_returnflag
        """,
        "tpch_q4": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate
              )
            GROUP BY o_orderpriority
        """,
        "tpch_q12": """
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l.l_returnflag
        """,
        "tpch_q14": """
            SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                 THEN l.l_extendedprice * (1 - l.l_discount)
                                 ELSE 0.0 END)
                         / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS promo_pct,
                   COUNT(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
              AND l.l_shipdate < TIMESTAMP '1996-12-01'
        """,
        "tpch_q18": """
            SELECT c.c_custkey, c.c_name, t.o_orderkey,
                   o.o_orderdate, o.o_totalprice, t.sum_qty
            FROM (
                SELECT l_orderkey AS o_orderkey,
                       ROUND(SUM(l_quantity), 2) AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING ROUND(SUM(l_quantity), 2) > 300
            ) t
            JOIN orders o ON o.o_orderkey = t.o_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        "tpch_q19": """
            SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                       AS revenue,
                   COUNT(*) AS n_items
            FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#5' AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "rolling_avg": """
            SELECT user_id, event_id,
                   ROUND(AVG(value) OVER w, 4) AS mov_avg,
                   ROUND(SUM(value) OVER w, 4) AS mov_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "cumulative_value": """
            SELECT user_id, event_id,
                   ROUND(SUM(value) OVER w, 4) AS run_value,
                   COUNT(*) OVER w AS run_events
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)
        """,
        "percentiles": """
            SELECT o_orderpriority,
                   ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
                   ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "approx_quantiles": """
            WITH src AS (
                SELECT l_returnflag, l_extendedprice AS x FROM lineitem
                WHERE l_extendedprice IS NOT NULL),
            bounds AS (
                SELECT l_returnflag,
                       CAST(MIN(x) AS DOUBLE) AS lo,
                       CAST(MAX(x) AS DOUBLE) AS hi
                FROM src GROUP BY 1),
            binned AS (
                SELECT s.l_returnflag,
                       CASE WHEN b.hi - b.lo > 0
                            THEN LEAST(CAST(FLOOR(
                                 (CAST(s.x AS DOUBLE) - b.lo)
                                 / (b.hi - b.lo) * 512.0) AS BIGINT),
                                 CAST(511 AS BIGINT))
                            ELSE 0 END AS bin,
                       b.lo, b.hi
                FROM src s JOIN bounds b USING (l_returnflag)),
            sketch AS (
                SELECT l_returnflag, bin, COUNT(*) AS cnt,
                       MIN(lo) AS lo, MIN(hi) AS hi
                FROM binned GROUP BY 1, 2),
            cum AS (
                SELECT l_returnflag, bin, lo, hi,
                       SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS c,
                       SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
                FROM sketch),
            qs AS (
                SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
                               CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)])
                       AS q)
            SELECT l_returnflag, q,
                   MIN(CASE WHEN hi > lo
                       THEN lo + CAST(bin + 1 AS DOUBLE) * (hi - lo) / 512.0
                       ELSE lo END) AS value
            FROM cum CROSS JOIN qs
            WHERE c >= CEIL(q * total)
            GROUP BY 1, 2
        """,
        "token_topk": """
            SELECT tok, COUNT(*) AS n FROM (
                SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents
            ) WHERE tok <> ''
            GROUP BY tok
            ORDER BY n DESC, tok
            LIMIT 20
        """,
        "vocab_coverage": """
            WITH toks AS (
                SELECT tok FROM (
                    SELECT unnest(string_split_regex(lower(trim(text)),
                                                     '\\s+')) AS tok
                    FROM documents
                ) WHERE tok <> ''),
            counts AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
            top AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 100),
            tot AS (SELECT COUNT(*) AS total FROM toks)
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
                        AS BIGINT) AS rank,
                   tok, n,
                   FLOOR(CAST(SUM(n) OVER (ORDER BY n DESC, tok
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS DOUBLE)
                         / total * 1000000.0) / 1000000.0 AS cum_share
            FROM top CROSS JOIN tot
        """,
        "kmeans_clusters": """
            WITH v AS (SELECT vec_id,
                              list_transform(embedding,
                                             x -> CAST(x AS DOUBLE)) AS e
                       FROM embeddings),
            c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1
                               AS INT) AS cluster_id, e AS c
                   FROM v ORDER BY vec_id LIMIT 8),
            s1 AS (SELECT v.vec_id, v.e, c0.cluster_id,
                          ROUND(list_sum(list_transform(
                              generate_series(1, len(v.e)),
                              i -> (v.e[i] - c0.c[i]) * (v.e[i] - c0.c[i]))),
                              6) AS dist
                   FROM v CROSS JOIN c0),
            a1 AS (SELECT vec_id, e, cluster_id FROM (
                       SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY vec_id
                           ORDER BY dist, cluster_id) AS rn FROM s1)
                   WHERE rn = 1),
            comps AS (SELECT cluster_id, i AS pos, e[i] AS x
                      FROM a1, UNNEST(generate_series(1, len(e))) AS t(i)),
            c1 AS (SELECT cluster_id, pos,
                          FLOOR(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(27,6)))
                                     AS DOUBLE)
                                / COUNT(*) * 1000000.0) / 1000000.0 AS m
                   FROM comps GROUP BY cluster_id, pos),
            cents AS (SELECT cluster_id, list(m ORDER BY pos) AS c
                      FROM c1 GROUP BY cluster_id),
            s2 AS (SELECT v.vec_id, cents.cluster_id,
                          ROUND(list_sum(list_transform(
                              generate_series(1, len(v.e)),
                              i -> (v.e[i] - cents.c[i])
                                   * (v.e[i] - cents.c[i]))), 6) AS dist
                   FROM v CROSS JOIN cents),
            a2 AS (SELECT vec_id, cluster_id, dist FROM (
                       SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY vec_id
                           ORDER BY dist, cluster_id) AS rn FROM s2)
                   WHERE rn = 1)
            SELECT cluster_id, COUNT(*) AS n_members,
                   FLOOR(CAST(SUM(CAST(dist AS DECIMAL(27,6))) AS DOUBLE)
                         / COUNT(*) * 10000.0) / 10000.0 AS avg_dist,
                   MIN(vec_id) AS min_member
            FROM a2 GROUP BY cluster_id ORDER BY cluster_id
        """,
        "mixture_sample": """
            WITH q AS (SELECT * FROM (VALUES ('src0', 24), ('src1', 18),
                                             ('src2', 12), ('src3', 6))
                       AS t(source, quota)),
            r AS (SELECT d.doc_id, d.source, q.quota,
                    ROW_NUMBER() OVER (PARTITION BY d.source
                        ORDER BY ('0x' || substr(md5('mixture' ||
                                  CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                                 doc_id) AS rn
                  FROM documents d JOIN q USING (source))
            SELECT doc_id, source FROM r WHERE rn <= quota
        """,
        "passage_dedup": r"""
            WITH base AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                t -> t <> '') AS w
                FROM documents),
            p AS (SELECT doc_id, i AS pos,
                     array_to_string(w[((i-1)*20+1):((i-1)*20+20)], ' ')
                         AS passage
                  FROM base, UNNEST(generate_series(1,
                       CAST(CEIL(len(w) / 20.0) AS BIGINT))) AS t(i)),
            k AS (SELECT doc_id, pos, passage,
                    ROW_NUMBER() OVER (PARTITION BY md5(passage)
                                       ORDER BY doc_id, pos) AS rn FROM p)
            SELECT doc_id, COUNT(*) AS n_passages,
                   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END, ' '
                                       ORDER BY pos), '') AS text_clean
            FROM k GROUP BY doc_id
        """,
        "expectations_report": """
            WITH o AS (
                SELECT COUNT(*) AS n_rows,
                       SUM(CASE WHEN NOT COALESCE(o_orderkey IS NOT NULL,
                                                  FALSE)
                                THEN 1 ELSE 0 END) AS v_nn,
                       SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE)
                                THEN 1 ELSE 0 END) AS v_pos,
                       SUM(CASE WHEN NOT COALESCE(o_totalprice >= 200000,
                                                  FALSE)
                                THEN 1 ELSE 0 END) AS v_hv,
                       SUM(CASE WHEN NOT COALESCE(
                                o_orderdate < TIMESTAMP '2000-01-01', FALSE)
                                THEN 1 ELSE 0 END) AS v_date
                FROM orders),
            fk AS (SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
                          (SELECT COUNT(*) FROM lineitem l
                           WHERE l.l_orderkey IS NOT NULL
                             AND l.l_orderkey NOT IN
                                 (SELECT o_orderkey FROM orders
                                  WHERE o_orderkey IS NOT NULL))
                              AS n_violations),
            tall AS (
                SELECT 'orderkey_not_null' AS rule, n_rows,
                       CAST(v_nn AS BIGINT) AS n_violations FROM o
                UNION ALL SELECT 'totalprice_positive', n_rows,
                       CAST(v_pos AS BIGINT) FROM o
                UNION ALL SELECT 'high_value', n_rows,
                       CAST(v_hv AS BIGINT) FROM o
                UNION ALL SELECT 'date_before_2000', n_rows,
                       CAST(v_date AS BIGINT) FROM o
                UNION ALL SELECT 'fk_lineitem_orderkey', n_rows,
                       n_violations FROM fk)
            SELECT rule, n_rows, n_violations,
                   FLOOR(CAST(n_violations AS DOUBLE) / n_rows * 1000000.0)
                       / 1000000.0 AS violation_rate
            FROM tall ORDER BY rule
        """,
        "funnel_events": """
            WITH s1 AS (SELECT user_id AS u, MIN(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
                   JOIN s1 ON e.user_id = s1.u
                   WHERE e.event_type = 'click' AND e.ts > s1.t
                   GROUP BY e.user_id),
            s3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
                   JOIN s2 ON e.user_id = s2.u
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                   GROUP BY e.user_id),
            tall AS (
                SELECT 1 AS step_idx, 'view' AS step,
                       (SELECT COUNT(*) FROM s1) AS users
                UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
                UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)),
            base AS (SELECT COUNT(*) AS b FROM s1)
            SELECT step_idx, step, users,
                   FLOOR(CAST(users AS DOUBLE) / b * 1000000.0)
                       / 1000000.0 AS conv_rate
            FROM tall CROSS JOIN base ORDER BY step_idx
        """,
        "hll_distinct": f"""
            WITH h AS (SELECT l_returnflag,
                    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                        ::BIGINT AS hv
                FROM lineitem),
            r AS (SELECT l_returnflag, hv % 512 AS bucket,
                         MAX(CASE WHEN hv // 512 = 0 THEN 52
                              ELSE 52 - length(bin(hv // 512)) END) AS rho
                  FROM h GROUP BY l_returnflag, hv % 512),
            s AS (SELECT l_returnflag,
                         SUM(1::BIGINT << (52 - rho)) AS s_present,
                         COUNT(*) AS present
                  FROM r GROUP BY l_returnflag),
            e AS (SELECT l_returnflag,
                         CAST(s_present + (512 - present) * (1::BIGINT << 52)
                              AS DOUBLE) AS s_total,
                         512 - present AS v
                  FROM s),
            est AS (SELECT l_returnflag, {_hll_num()} / s_total AS est_raw, v
                    FROM e),
            fin AS (SELECT l_returnflag,
                           CAST(FLOOR(CASE WHEN est_raw <= 1280.0 AND v > 0
                                THEN 512.0 * ln(512.0 / CAST(v AS DOUBLE))
                                ELSE est_raw END) AS BIGINT) AS est_distinct
                    FROM est),
            x AS (SELECT l_returnflag,
                         COUNT(DISTINCT l_orderkey) AS exact_distinct
                  FROM lineitem GROUP BY l_returnflag)
            SELECT fin.l_returnflag, est_distinct, exact_distinct
            FROM fin JOIN x USING (l_returnflag) ORDER BY l_returnflag
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   COUNT(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pivot_returnflag": """
            SELECT l_linestatus,
                   ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
                   ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
                   ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
            FROM lineitem GROUP BY l_linestatus
        """,
        "train_val_split": """
            SELECT doc_id,
                   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                             % 100 < 90
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        "tpch_q15": """
            WITH revenue AS (
                SELECT l_suppkey AS s_suppkey,
                       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT s.s_suppkey, s.s_name, r.total_revenue
            FROM supplier s JOIN revenue r USING (s_suppkey)
            WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
        """,
        "pack_sequences": f"""
            WITH t AS (SELECT doc_id,
                              CAST(CASE WHEN trim(text) = '' THEN 0
                                        ELSE len({_TOKS}) END AS BIGINT) AS n_tokens
                       FROM documents),
            h AS (SELECT doc_id, n_tokens,
                         ('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)),
                                         1, 15))::BIGINT AS hh
                  FROM t),
            c AS (SELECT doc_id, n_tokens, hh % 8 AS bucket,
                         CAST(SUM(n_tokens) OVER (
                             PARTITION BY hh % 8 ORDER BY hh, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                  FROM h)
            SELECT doc_id, n_tokens, bucket,
                   CAST(FLOOR((cum_tokens - n_tokens) / 512) AS BIGINT) AS pack_id,
                   cum_tokens
            FROM c
        """,
        "chunk_documents": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                              CAST(len({_TOKS}) AS BIGINT) AS n
                       FROM documents WHERE trim(text) <> ''),
            s AS (SELECT doc_id, toks, n,
                         unnest(range(0, n, 48)) AS start
                  FROM t)
            SELECT doc_id,
                   CAST(start // 48 AS BIGINT) AS chunk_idx,
                   CAST(least(64, n - start) AS BIGINT) AS chunk_tokens,
                   array_to_string(list_slice(toks, start + 1, start + 64),
                                   ' ') AS chunk_text
            FROM s
        """,
        "tpch_q8": """
            SELECT o_year,
                   ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                       THEN volume
                                       ELSE CAST(0 AS DECIMAL(18,4)) END)
                              AS DOUBLE)
                         / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share,
                   COUNT(*) AS n_items
            FROM (SELECT year(o.o_orderdate) AS o_year,
                         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                              AS DECIMAL(18,4)) AS volume,
                         n1.n_name AS supp_nation
                  FROM part p
                  JOIN lineitem l ON p.p_partkey = l.l_partkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
                  JOIN region r ON n2.n_regionkey = r.r_regionkey
                  WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
                    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                    AND o.o_orderdate <= TIMESTAMP '1996-12-31')
            GROUP BY o_year
        """,
        "tpch_q13": """
            SELECT c_count, COUNT(*) AS custdist
            FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                  FROM customer c
                  LEFT JOIN (SELECT * FROM orders
                             WHERE o_orderpriority <> '1-URGENT') o
                    ON c.c_custkey = o.o_custkey
                  GROUP BY c.c_custkey)
            GROUP BY c_count
        """,
        "tpch_q7": """
            SELECT supp_nation, cust_nation, l_year,
                   ROUND(SUM(volume), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                         year(l.l_shipdate) AS l_year,
                         l.l_extendedprice * (1 - l.l_discount) AS volume
                  FROM supplier s
                  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  JOIN customer c ON c.c_custkey = o.o_custkey
                  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
                  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
                    AND n2.n_name IN ('NATION_1', 'NATION_2')
                    AND n1.n_name <> n2.n_name
                    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l.l_shipdate <= TIMESTAMP '1997-12-31')
            GROUP BY 1, 2, 3
        """,
        "tpch_q2": """
            WITH eu AS (
                SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
                FROM supplier s
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                JOIN region r ON n.n_regionkey = r.r_regionkey
                WHERE r.r_name = 'EUROPE'),
            offers AS (
                SELECT l.l_partkey, eu.s_name, eu.n_name, eu.s_acctbal,
                       l.l_extendedprice / l.l_quantity AS unit_price
                FROM lineitem l
                JOIN part p ON p.p_partkey = l.l_partkey
                JOIN eu ON eu.s_suppkey = l.l_suppkey
                WHERE p.p_size = 15),
            best AS (SELECT l_partkey, MIN(unit_price) AS min_price
                     FROM offers GROUP BY l_partkey)
            SELECT o.l_partkey AS p_partkey, o.s_name, o.n_name,
                   ROUND(o.s_acctbal, 2) AS s_acctbal,
                   FLOOR(o.unit_price * 10000) / 10000.0 AS min_unit_price
            FROM offers o
            JOIN best b ON o.l_partkey = b.l_partkey
                       AND o.unit_price = b.min_price
        """,
        "tpch_q9": """
            SELECT n_name, o_year,
                   ROUND(CAST(SUM(profit) AS DOUBLE), 2) AS sum_profit,
                   COUNT(*) AS n_items
            FROM (SELECT n.n_name, year(o.o_orderdate) AS o_year,
                         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                    - 0.5 * p.p_retailprice * l.l_quantity, 4)
                              AS DECIMAL(18,4)) AS profit
                  FROM part p
                  JOIN lineitem l ON p.p_partkey = l.l_partkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                  JOIN orders o ON o.o_orderkey = l.l_orderkey
                  WHERE p.p_name LIKE '%red%')
            GROUP BY n_name, o_year
        """,
        "tpch_q11": """
            WITH eu AS (SELECT s.s_suppkey FROM supplier s
                        JOIN nation n ON s.s_nationkey = n.n_nationkey
                        JOIN region r ON n.n_regionkey = r.r_regionkey
                        WHERE r.r_name = 'ASIA'),
            per_part AS (
                SELECT l.l_partkey,
                       SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                                AS DECIMAL(18,4))) AS value
                FROM lineitem l JOIN eu ON eu.s_suppkey = l.l_suppkey
                GROUP BY l.l_partkey)
            SELECT l_partkey AS p_partkey,
                   ROUND(CAST(value AS DOUBLE), 2) AS part_value
            FROM per_part
            WHERE CAST(value AS DOUBLE) >
                  (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM per_part)
        """,
        "tpch_q16": """
            SELECT p.p_brand, p.p_type, p.p_size,
                   CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand <> 'Brand#1'
              AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
              AND l.l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
        """,
        "tpch_q17": """
            WITH lp AS (SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
                        FROM lineitem l
                        JOIN part p ON p.p_partkey = l.l_partkey
                        WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'),
            t AS (SELECT l_partkey, AVG(l_quantity) * 0.2 AS qty_limit
                  FROM lp GROUP BY l_partkey)
            SELECT ROUND(CAST(SUM(CAST(ROUND(lp.l_extendedprice, 2)
                                       AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
                         2) AS avg_yearly,
                   COUNT(*) AS n_items
            FROM lp JOIN t ON lp.l_partkey = t.l_partkey
            WHERE lp.l_quantity < t.qty_limit
        """,
        "tpch_q20": """
            WITH shipped AS (
                SELECT l.l_suppkey, SUM(l.l_quantity) AS total_qty
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                WHERE p.p_name LIKE 'blue%'
                  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l.l_suppkey
                HAVING SUM(l.l_quantity) > 300)
            SELECT s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
            FROM supplier s
            WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
        """,
        "tpch_q21": """
            WITH late AS (
                SELECT l.l_orderkey, l.l_suppkey
                FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE o.o_orderstatus = 'F'
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            SELECT s.s_name, COUNT(*) AS numwait
            FROM late l1
            JOIN supplier s ON s.s_suppkey = l1.l_suppkey
            WHERE EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name
            LIMIT 10
        """,
        "tpch_q22": """
            WITH c AS (SELECT * FROM customer
                       WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
            thr AS (SELECT CAST(SUM(CAST(ROUND(c_acctbal, 2)
                                         AS DECIMAL(18,2))) AS DOUBLE)
                           / COUNT(*) AS avg_bal
                    FROM c WHERE c_acctbal > 0.0)
            SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
                   ROUND(CAST(SUM(CAST(ROUND(c.c_acctbal, 2)
                                       AS DECIMAL(18,2))) AS DOUBLE),
                         2) AS totacctbal
            FROM c, thr
            WHERE c.c_acctbal > thr.avg_bal
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY c.c_nationkey
        """,
        "pii_scrub": r"""
            WITH s AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@mail.example.com ssn '
                            || lpad(CAST(doc_id * 7 % 900 + 100 AS VARCHAR), 3, '0')
                            || '-42-'
                            || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST(doc_id * 3 % 256 AS VARCHAR) AS synth
                FROM documents),
            r AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(synth,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS BIGINT) AS n_email,
                       CAST(len(regexp_extract_all(synth,
                           '\(\d{3}\) \d{3}-\d{4}|\d{3}-\d{3}-\d{4}'))
                           AS BIGINT) AS n_phone,
                       CAST(len(regexp_extract_all(synth,
                           '\d{3}-\d{2}-\d{4}')) AS BIGINT) AS n_ssn,
                       CAST(len(regexp_extract_all(synth,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                           AS BIGINT) AS n_ip,
                       regexp_replace(regexp_replace(regexp_replace(
                           regexp_replace(synth,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\(\d{3}\) \d{3}-\d{4}|\d{3}-\d{3}-\d{4}',
                           '<PHONE>', 'g'),
                           '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS clean
                FROM s)
            SELECT doc_id, n_email, n_phone, n_ssn, n_ip,
                   CAST(len(clean) AS BIGINT) AS clean_len,
                   md5(regexp_replace(lower(trim(clean)), '\s+', ' ', 'g'))
                       AS clean_fp
            FROM r
        """,
        "repetition_profile": r"""
            WITH base AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w,
                       CAST(len(list_distinct(
                               regexp_split_to_array(lower(trim(text)), '\s+')))
                            AS DOUBLE)
                       / greatest(len(regexp_split_to_array(lower(trim(text)),
                                                            '\s+')), 1) AS dr
                FROM documents),
            bg AS (SELECT doc_id,
                          unnest(list_transform(generate_series(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i + 1])) AS bigram
                   FROM base WHERE len(w) >= 2),
            pb AS (SELECT doc_id, bigram, COUNT(*) AS cnt
                   FROM bg GROUP BY 1, 2),
            agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                           MAX(cnt) AS top
                    FROM pb GROUP BY 1)
            SELECT b.doc_id,
                   COALESCE(a.n_bigrams, 0) AS n_bigrams,
                   FLOOR(COALESCE(CAST(a.top AS DOUBLE)
                                  / greatest(a.n_bigrams, 1), 0.0)
                         * 1000000) / 1000000.0 AS top_bigram_share,
                   FLOOR(b.dr * 1000000) / 1000000.0 AS distinct_token_ratio
            FROM base b LEFT JOIN agg a USING (doc_id)
        """,
        "bm25_topk": r"""
            WITH base AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS w,
                       CAST(CASE WHEN trim(text) = '' THEN 0
                                 ELSE len(regexp_split_to_array(
                                          lower(trim(text)), '\s+'))
                            END AS DOUBLE) AS dl
                FROM documents),
            stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                             SUM(dl) / COUNT(*) AS avgdl
                      FROM base),
            m AS (SELECT doc_id, dl,
                         unnest(list_filter(w,
                                x -> x IN ('spark', 'hash', 'merge'))) AS term
                  FROM base),
            tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
                   FROM m GROUP BY 1, 2, 3),
            dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
                      FROM tf GROUP BY 1),
            scored AS (
                SELECT tf.doc_id,
                       COUNT(*) AS n_terms_matched,
                       ROUND(CAST(SUM(CAST(ROUND(
                           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (1.0 - 0.75
                                             + 0.75 * tf.dl / s.avgdl)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE), 4) AS score
                FROM tf
                JOIN dfreq d USING (term)
                CROSS JOIN stats s
                GROUP BY tf.doc_id)
            SELECT doc_id, n_terms_matched, score
            FROM scored
            ORDER BY score DESC, doc_id
            LIMIT 15
        """,
        "pagerank": """
            WITH e0 AS (SELECT DISTINCT l.l_suppkey AS src,
                               1000000 + o.o_custkey AS dst
                        FROM lineitem l
                        JOIN orders o ON o.o_orderkey = l.l_orderkey
                        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
                          AND o.o_orderdate < TIMESTAMP '1997-01-01'),
            e AS (SELECT src, dst FROM e0
                  UNION
                  SELECT dst AS src, src AS dst FROM e0),
            nodes AS (SELECT DISTINCT node FROM
                      (SELECT src AS node FROM e
                       UNION ALL SELECT dst FROM e)),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
            deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg
                    FROM e GROUP BY src),
            r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
            c1 AS (SELECT e.dst AS node,
                          CAST(FLOOR(r.rank / d.deg * 1000000000000) AS BIGINT)
                              AS u
                   FROM e JOIN r0 r ON r.node = e.src
                          JOIN deg d ON d.src = e.src),
            s1 AS (SELECT node, CAST(SUM(u) AS BIGINT) AS s
                   FROM c1 GROUP BY node),
            r1 AS (SELECT nd.node,
                          (1.0 - 0.85) / nn.n
                          + 0.85 * (CAST(COALESCE(s1.s, 0) AS DOUBLE)
                                    / 1000000000000.0) AS rank
                   FROM nodes nd CROSS JOIN nn
                   LEFT JOIN s1 ON s1.node = nd.node),
            c2 AS (SELECT e.dst AS node,
                          CAST(FLOOR(r.rank / d.deg * 1000000000000) AS BIGINT)
                              AS u
                   FROM e JOIN r1 r ON r.node = e.src
                          JOIN deg d ON d.src = e.src),
            s2 AS (SELECT node, CAST(SUM(u) AS BIGINT) AS s
                   FROM c2 GROUP BY node),
            r2 AS (SELECT nd.node,
                          (1.0 - 0.85) / nn.n
                          + 0.85 * (CAST(COALESCE(s2.s, 0) AS DOUBLE)
                                    / 1000000000000.0) AS rank
                   FROM nodes nd CROSS JOIN nn
                   LEFT JOIN s2 ON s2.node = nd.node),
            c3 AS (SELECT e.dst AS node,
                          CAST(FLOOR(r.rank / d.deg * 1000000000000) AS BIGINT)
                              AS u
                   FROM e JOIN r2 r ON r.node = e.src
                          JOIN deg d ON d.src = e.src),
            s3 AS (SELECT node, CAST(SUM(u) AS BIGINT) AS s
                   FROM c3 GROUP BY node),
            r3 AS (SELECT nd.node,
                          (1.0 - 0.85) / nn.n
                          + 0.85 * (CAST(COALESCE(s3.s, 0) AS DOUBLE)
                                    / 1000000000000.0) AS rank
                   FROM nodes nd CROSS JOIN nn
                   LEFT JOIN s3 ON s3.node = nd.node)
            SELECT node, FLOOR(rank * 100000000) / 100000000.0 AS rank
            FROM r3
        """,
        "decontaminate": r"""
            WITH d AS (SELECT doc_id,
                              regexp_split_to_array(lower(trim(text)),
                                                    '\s+') AS w
                       FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(generate_series(1, len(w) - 3),
                                 i -> array_to_string(w[i:i+3], ' ')))
                              AS shingle
                   FROM d WHERE len(w) >= 4),
            ev AS (SELECT doc_id AS eval_id, shingle
                   FROM sh WHERE doc_id % 50 = 0),
            tr AS (SELECT * FROM sh WHERE doc_id % 50 <> 0)
            SELECT tr.doc_id,
                   COUNT(DISTINCT tr.shingle) AS n_shared_shingles,
                   COUNT(DISTINCT ev.eval_id) AS n_eval_docs
            FROM tr JOIN ev USING (shingle)
            GROUP BY tr.doc_id
        """,
        "robust_outliers": """
            WITH b AS (
                SELECT event_id, event_type, value,
                       CAST(FLOOR(value * 100.0) AS BIGINT) AS bin
                FROM events WHERE value IS NOT NULL),
            h AS (SELECT event_type, bin, count(*) AS c
                  FROM b GROUP BY 1, 2),
            cum AS (SELECT event_type, bin,
                           SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                           SUM(c) OVER (PARTITION BY event_type) AS n
                    FROM h),
            med AS (SELECT event_type,
                           MIN(CASE WHEN cum >= FLOOR((n + 1) / 2)
                                    THEN bin END) AS med
                    FROM cum GROUP BY 1),
            dev AS (SELECT h.event_type, med, abs(bin - med) AS d,
                           SUM(c) AS c
                    FROM h JOIN med USING (event_type) GROUP BY 1, 2, 3),
            dcum AS (SELECT event_type, med, d,
                            SUM(c) OVER (PARTITION BY event_type ORDER BY d
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
                            SUM(c) OVER (PARTITION BY event_type) AS n
                     FROM dev),
            mad AS (SELECT event_type, med,
                           MIN(CASE WHEN cum >= FLOOR((n + 1) / 2)
                                    THEN d END) AS mad
                    FROM dcum GROUP BY 1, 2)
            SELECT b.event_id, b.event_type, b.value,
                   med / 100.0 AS med, mad / 100.0 AS mad,
                   abs(bin - med) > 5.0 * mad AS is_outlier
            FROM b JOIN mad USING (event_type)
        """,
        "perplexity_bands": r"""
            WITH toks AS (SELECT doc_id,
                                 unnest(regexp_split_to_array(
                                     lower(trim(text)), '\s+')) AS tok
                          FROM documents),
            dt AS (SELECT doc_id, tok, COUNT(*) AS c
                   FROM toks GROUP BY 1, 2),
            vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt
                      FROM dt GROUP BY 1),
            tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
            lp AS (SELECT tok,
                          CAST(ROUND(ln(CAST(cnt AS DOUBLE) / total), 6)
                               AS DECIMAL(18,6)) AS lp
                   FROM vocab CROSS JOIN tot),
            s AS (SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
                         SUM(CAST(dt.c AS DECIMAL(18,0)) * lp.lp) AS s
                  FROM dt JOIN lp USING (tok) GROUP BY 1),
            lmout AS (
                SELECT doc_id, n_tokens,
                       FLOOR(CAST(s AS DOUBLE) / n_tokens * 1000000)
                           / 1000000.0 AS avg_logprob
                FROM s),
            sc AS (SELECT l.doc_id, d.lang, l.n_tokens, l.avg_logprob,
                          CAST(FLOOR(l.avg_logprob * 100) AS BIGINT) AS bin
                   FROM lmout l JOIN documents d USING (doc_id)),
            b AS (SELECT lang, bin, count(*) AS c FROM sc GROUP BY 1, 2),
            cum AS (SELECT lang, bin,
                           SUM(c) OVER (PARTITION BY lang ORDER BY bin DESC
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum,
                           SUM(c) OVER (PARTITION BY lang) AS n
                    FROM b),
            th AS (SELECT lang,
                          MAX(CASE WHEN cum >= FLOOR((n * 1 + 2) / 3)
                                   THEN bin END) AS t1,
                          MAX(CASE WHEN cum >= FLOOR((n * 2 + 2) / 3)
                                   THEN bin END) AS t2
                   FROM cum GROUP BY lang)
            SELECT doc_id, lang, n_tokens, avg_logprob,
                   CASE WHEN bin >= t1 THEN 1
                        WHEN bin >= t2 THEN 2
                        ELSE 3 END AS band
            FROM sc JOIN th USING (lang)
        """,
        "lm_logprob": r"""
            WITH toks AS (SELECT doc_id,
                                 unnest(regexp_split_to_array(
                                     lower(trim(text)), '\s+')) AS tok
                          FROM documents),
            dt AS (SELECT doc_id, tok, COUNT(*) AS c
                   FROM toks GROUP BY 1, 2),
            vocab AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt
                      FROM dt GROUP BY 1),
            tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
            lp AS (SELECT tok,
                          CAST(ROUND(ln(CAST(cnt AS DOUBLE) / total), 6)
                               AS DECIMAL(18,6)) AS lp
                   FROM vocab CROSS JOIN tot),
            s AS (SELECT dt.doc_id, CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
                         SUM(CAST(dt.c AS DECIMAL(18,0)) * lp.lp) AS s
                  FROM dt JOIN lp USING (tok) GROUP BY 1)
            SELECT doc_id, n_tokens,
                   FLOOR(CAST(s AS DOUBLE) / n_tokens * 1000000)
                       / 1000000.0 AS avg_logprob
            FROM s
        """,
        "profile_orders": """
            SELECT 'o_totalprice' AS col_name, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   COUNT(DISTINCT o_totalprice) AS n_distinct,
                   ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 2) AS min_val,
                   ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 2) AS max_val,
                   FLOOR(CAST(SUM(CAST(ROUND(CAST(o_totalprice AS DOUBLE), 4)
                                       AS DECIMAL(28,4))) AS DOUBLE)
                         / (COUNT(*) - SUM(CASE WHEN o_totalprice IS NULL
                                                THEN 1 ELSE 0 END))
                         * 10000) / 10000.0 AS mean_val
            FROM orders
            UNION ALL
            SELECT 'o_orderkey', COUNT(*),
                   CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   COUNT(DISTINCT o_orderkey),
                   ROUND(CAST(MIN(o_orderkey) AS DOUBLE), 2),
                   ROUND(CAST(MAX(o_orderkey) AS DOUBLE), 2),
                   FLOOR(CAST(SUM(CAST(ROUND(CAST(o_orderkey AS DOUBLE), 4)
                                       AS DECIMAL(28,4))) AS DOUBLE)
                         / (COUNT(*) - SUM(CASE WHEN o_orderkey IS NULL
                                                THEN 1 ELSE 0 END))
                         * 10000) / 10000.0
            FROM orders
            UNION ALL
            SELECT 'o_custkey', COUNT(*),
                   CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   COUNT(DISTINCT o_custkey),
                   ROUND(CAST(MIN(o_custkey) AS DOUBLE), 2),
                   ROUND(CAST(MAX(o_custkey) AS DOUBLE), 2),
                   FLOOR(CAST(SUM(CAST(ROUND(CAST(o_custkey AS DOUBLE), 4)
                                       AS DECIMAL(28,4))) AS DOUBLE)
                         / (COUNT(*) - SUM(CASE WHEN o_custkey IS NULL
                                                THEN 1 ELSE 0 END))
                         * 10000) / 10000.0
            FROM orders
        """,
        "histogram_totalprice": """
            WITH h AS (SELECT LEAST(GREATEST(FLOOR(
                           (CAST(o_totalprice AS DOUBLE) - 0.0) / 25000.0),
                           0), 19) AS bucket
                       FROM orders WHERE o_totalprice IS NOT NULL)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(0.0 AS DOUBLE)
                   + CAST(bucket AS BIGINT) * CAST(25000.0 AS DOUBLE)
                       AS bucket_lo,
                   COUNT(*) AS n
            FROM h GROUP BY bucket
        """,
        "zorder_key": _zorder_sql(bits=8),
        "hilbert_key": _hilbert_sql(bits=8),
        "zonemap_prune": f"""
            WITH zk AS ({_zorder_sql(bits=8, extra_cols=("o_custkey",))}),
            zoned AS (SELECT o_custkey, z_key >> 10 AS zone FROM zk),
            zm AS (SELECT zone, COUNT(*) AS n_rows,
                          MIN(o_custkey) AS min_o_custkey,
                          MAX(o_custkey) AS max_o_custkey
                   FROM zoned GROUP BY zone)
            SELECT zone, n_rows, min_o_custkey, max_o_custkey,
                   NOT (max_o_custkey < 100 OR min_o_custkey > 300) AS scan
            FROM zm
        """,
        "collocations": r"""
            WITH w AS (SELECT regexp_split_to_array(lower(trim(text)),
                                                    '\s+') AS w
                       FROM documents),
            uni AS (SELECT t AS tok, CAST(COUNT(*) AS DOUBLE) AS n
                    FROM (SELECT unnest(w) AS t FROM w) GROUP BY 1),
            tot AS (SELECT SUM(n) AS T FROM uni),
            bi AS (SELECT unnest(list_transform(
                              generate_series(1, len(w) - 1),
                              i -> struct_pack(a := w[i], b := w[i + 1])))
                       AS p
                   FROM w WHERE len(w) >= 2),
            pairs AS (SELECT p.a AS a, p.b AS b,
                             CAST(COUNT(*) AS DOUBLE) AS nab
                      FROM bi GROUP BY 1, 2
                      HAVING COUNT(*) >= 5),
            btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS bt FROM bi)
            SELECT pairs.a || ' ' || pairs.b AS bigram,
                   CAST(nab AS BIGINT) AS n_pair,
                   FLOOR(ln((nab / btot.bt)
                            / ((ua.n / tot.T) * (ub.n / tot.T)))
                         * 1000000) / 1000000.0 AS pmi
            FROM pairs
            JOIN uni ua ON ua.tok = pairs.a
            JOIN uni ub ON ub.tok = pairs.b
            CROSS JOIN tot CROSS JOIN btot
            ORDER BY pmi DESC, bigram
            LIMIT 30
        """,
        "rank_metrics": """
            SELECT o_orderpriority, o_orderkey,
                   FLOOR(PERCENT_RANK() OVER w * 1000000) / 1000000.0
                       AS pct_rank,
                   FLOOR(CUME_DIST() OVER w * 1000000) / 1000000.0 AS cume
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice DESC, o_orderkey)
            QUALIFY ROW_NUMBER() OVER w <= 50
        """,
        "kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT event_type,
                       ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
                FROM events),
            r AS (
                SELECT event_type, hv,
                       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                FROM h),
            g AS (
                SELECT event_type,
                       MAX(CASE WHEN rn = 64 THEN hv END) AS kth,
                       COUNT(*) AS n
                FROM r GROUP BY event_type)
            SELECT event_type,
                   CAST(CASE WHEN kth IS NOT NULL
                             THEN FLOOR(63.0 * 1152921504606846976.0
                                        / CAST(kth AS DOUBLE))
                             ELSE n END AS BIGINT) AS est_distinct,
                   CAST(n AS BIGINT) AS exact_distinct
            FROM g
        """,
        "gap_fill": """
            WITH hourly AS (
                SELECT event_type, date_trunc('hour', ts) AS hour,
                       COUNT(*) AS n_events,
                       CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                            AS DOUBLE) AS sum_value
                FROM events GROUP BY 1, 2),
            bounds AS (
                SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi
                FROM hourly GROUP BY 1),
            spine AS (
                SELECT event_type,
                       unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                FROM bounds)
            SELECT s.event_type, s.hour,
                   CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events,
                   last_value(h.sum_value IGNORE NULLS) OVER (
                       PARTITION BY s.event_type ORDER BY s.hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sum_value,
                   h.n_events IS NULL AS is_gap
            FROM spine s LEFT JOIN hourly h USING (event_type, hour)
        """,
        "cube_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   COUNT(*) AS n_rows,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "lpa_communities": """
            WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT x.l_partkey AS p1, y.l_partkey AS p2
                FROM pp x JOIN pp y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2),
            und AS MATERIALIZED (
                SELECT p1 AS a, p2 AS b FROM e
                UNION ALL SELECT p2, p1 FROM e),
            l0 AS MATERIALIZED (
                SELECT DISTINCT a AS node, a AS label FROM und),
            l1 AS MATERIALIZED (
                SELECT a AS node, label FROM (
                    SELECT u.a, l.label, COUNT(*) AS c,
                           ROW_NUMBER() OVER (
                               PARTITION BY u.a
                               ORDER BY COUNT(*) DESC, l.label) AS rn
                    FROM und u JOIN l0 l ON u.b = l.node
                    GROUP BY u.a, l.label)
                WHERE rn = 1),
            l2 AS MATERIALIZED (
                SELECT a AS node, label FROM (
                    SELECT u.a, l.label, COUNT(*) AS c,
                           ROW_NUMBER() OVER (
                               PARTITION BY u.a
                               ORDER BY COUNT(*) DESC, l.label) AS rn
                    FROM und u JOIN l1 l ON u.b = l.node
                    GROUP BY u.a, l.label)
                WHERE rn = 1),
            l3 AS MATERIALIZED (
                SELECT a AS node, label FROM (
                    SELECT u.a, l.label, COUNT(*) AS c,
                           ROW_NUMBER() OVER (
                               PARTITION BY u.a
                               ORDER BY COUNT(*) DESC, l.label) AS rn
                    FROM und u JOIN l2 l ON u.b = l.node
                    GROUP BY u.a, l.label)
                WHERE rn = 1)
            SELECT node, label AS community FROM l3
        """,
        "triangle_count": """
            WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
            e AS (
                SELECT x.l_partkey AS p1, y.l_partkey AS p2
                FROM pp x JOIN pp y
                  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
            FROM e e1
            JOIN e e2 ON e2.p1 = e1.p2
            JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
        """,
        "fuzzy_match": """
            WITH base AS (
                SELECT doc_id,
                       lang,
                       CAST(FLOOR(n_chars / 16) AS BIGINT) AS len_band,
                       substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                              1, 32) AS pfx
                FROM documents),
            sized AS (
                SELECT *, COUNT(*) OVER (PARTITION BY lang, len_band) AS bn
                FROM base)
            SELECT x.doc_id AS id_a, y.doc_id AS id_b,
                   CAST(levenshtein(x.pfx, y.pfx) AS INTEGER) AS dist
            FROM sized x JOIN sized y
              ON x.lang = y.lang AND x.len_band = y.len_band
             AND x.doc_id < y.doc_id
            WHERE x.bn <= 1000 AND y.bn <= 1000
              AND levenshtein(x.pfx, y.pfx) <= 5
        """,
        "ntile_quartiles": """
            WITH q AS (
                SELECT o_orderpriority, o_totalprice,
                       NTILE(4) OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS quartile
                FROM orders)
            SELECT o_orderpriority, CAST(quartile AS INTEGER) AS quartile,
                   COUNT(*) AS n_orders,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price,
                   FLOOR(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE) * 100.0) / 100.0 AS avg_price
            FROM q GROUP BY 1, 2
        """,
        "cms_topk": """
            WITH t AS (
                SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
                FROM documents),
            tk AS (SELECT tok FROM t WHERE tok <> ''),
            seeds AS (SELECT unnest(['cms0', 'cms1', 'cms2']) AS seed),
            cnt AS (
                SELECT seed,
                       ('0x' || substr(md5(seed || tok), 1, 15))::BIGINT % 1024
                           AS bucket,
                       COUNT(*) AS n
                FROM tk CROSS JOIN seeds GROUP BY 1, 2),
            exact AS (SELECT tok, COUNT(*) AS n FROM tk GROUP BY 1),
            probe AS (
                SELECT e.tok, e.n AS exact_n, MIN(c.n) AS est_n
                FROM exact e
                CROSS JOIN seeds s
                JOIN cnt c
                  ON c.seed = s.seed
                 AND c.bucket =
                     ('0x' || substr(md5(s.seed || e.tok), 1, 15))::BIGINT % 1024
                GROUP BY 1, 2)
            SELECT tok AS value,
                   CAST(est_n AS BIGINT) AS est_n,
                   CAST(exact_n AS BIGINT) AS exact_n
            FROM probe ORDER BY est_n DESC, value LIMIT 20
        """,
        "bloom_prune": """
            WITH bk AS (
                SELECT DISTINCT o_orderkey::VARCHAR AS kk
                FROM orders WHERE o_orderpriority = '1-URGENT'),
            pos AS (
                SELECT DISTINCT
                       ('0x' || substr(md5(s.seed || bk.kk), 1, 15))::BIGINT % 65536
                           AS position
                FROM bk CROSS JOIN
                     (SELECT unnest(['bloom0', 'bloom1', 'bloom2']) AS seed) s),
            probe AS (
                SELECT l_returnflag, l_orderkey,
                       ('0x' || substr(md5('bloom0' || l_orderkey::VARCHAR), 1, 15))::BIGINT % 65536 AS p0,
                       ('0x' || substr(md5('bloom1' || l_orderkey::VARCHAR), 1, 15))::BIGINT % 65536 AS p1,
                       ('0x' || substr(md5('bloom2' || l_orderkey::VARCHAR), 1, 15))::BIGINT % 65536 AS p2
                FROM lineitem),
            cand AS (
                SELECT l_returnflag FROM probe
                WHERE p0 IN (SELECT position FROM pos)
                  AND p1 IN (SELECT position FROM pos)
                  AND p2 IN (SELECT position FROM pos)),
            nc AS (SELECT l_returnflag, COUNT(*) AS n_candidates
                   FROM cand GROUP BY 1),
            nt AS (SELECT l_returnflag, COUNT(*) AS n_true FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                        WHERE o_orderpriority = '1-URGENT')
                   GROUP BY 1)
            SELECT nc.l_returnflag,
                   CAST(n_candidates AS BIGINT) AS n_candidates,
                   CAST(n_true AS BIGINT) AS n_true
            FROM nc JOIN nt USING (l_returnflag)
        """,
        "json_props": """
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(json_extract_string(props, '$.k')::BIGINT)
                        AS BIGINT) AS sum_k,
                   CAST(MIN(json_extract_string(props, '$.k')::BIGINT)
                        AS BIGINT) AS min_k,
                   CAST(MAX(json_extract_string(props, '$.k')::BIGINT)
                        AS BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        **_corpus_oracles(),
        **_round4_oracles(),
    }
    # the star-contraction CC variant computes the identical labeling —
    # same transitive-closure oracle
    out["dedup_clusters_star"] = out["dedup_clusters"]
    # IVM e2e oracles: DuckDB computes the result directly over the
    # SIMULATED final state (base tables + the deterministic CDC round the
    # Spark query applies through the incremental runtime) — equality is
    # the differential-CDC check, driver-stamped.
    out["ivm_exact_dedup"] = r"""
        WITH final AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' rewritten'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 3 = 0 AND doc_id % 11 <> 3)
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                   AS content_md5,
               min(doc_id) AS keep_id, count(*) AS n_copies
        FROM final GROUP BY 1
    """
    out["ivm_join_cdc"] = """
        WITH final_c AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN 'MOVED'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer),
        final_o AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_orderkey % 4 = 0 AND o_orderkey % 13 <> 1
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 17 = 2)
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM final_c c JOIN final_o o ON c.c_custkey = o.o_custkey
    """
    out["ivm_agg_cdc"] = """
        WITH final_o AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 19 = 0 THEN '9-MOVED'
                        ELSE o_orderpriority END AS o_orderpriority,
                   o_totalprice
            FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 13 <> 1)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_price
        FROM final_o GROUP BY 1
    """
    out["ann_ivf_refined"] = f"""
        WITH {_VEC_CTE},
        c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sid) - 1 AS INT)
                          AS cluster_id, e AS c
               FROM (SELECT vec_id AS sid, e FROM v
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
        s1 AS (SELECT v.vec_id, v.e, c0.cluster_id,
                      ROUND(list_sum(list_transform(
                          generate_series(1, len(v.e)),
                          i -> (v.e[i] - c0.c[i]) * (v.e[i] - c0.c[i]))),
                          6) AS dist
               FROM v CROSS JOIN c0),
        a1 AS (SELECT vec_id, e, cluster_id FROM (
                   SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY vec_id
                       ORDER BY dist, cluster_id) AS rn FROM s1)
               WHERE rn = 1),
        comps AS (SELECT cluster_id, i AS pos, e[i] AS x
                  FROM a1, UNNEST(generate_series(1, len(e))) AS t(i)),
        c1 AS (SELECT cluster_id, pos,
                      FLOOR(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(27,6)))
                                 AS DOUBLE)
                            / COUNT(*) * 1000000.0) / 1000000.0 AS m
               FROM comps GROUP BY cluster_id, pos),
        cl AS (SELECT cluster_id AS cent_id, list(m ORDER BY pos) AS e
               FROM c1 GROUP BY cluster_id),
        cents AS (SELECT cent_id, e,
                         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
                  FROM cl),
        assign AS (
            SELECT __id, cent_id FROM (
                SELECT a.vec_id AS __id, c.cent_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {_COS.format(a="a", b="c")} DESC,
                                    c.cent_id) AS rn
                FROM n a CROSS JOIN cents c) WHERE rn = 1),
        probes AS (
            SELECT __id AS query_id, cent_id FROM (
                SELECT q.vec_id AS __id, c.cent_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS.format(a="q", b="c")} DESC,
                                    c.cent_id) AS rn
                FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
            WHERE rn <= 2),
        scored AS (
            SELECT p.query_id, a.__id AS neighbor_id,
                   {_COS.format(a="qn", b="cn")} AS cosine_sim
            FROM probes p
            JOIN assign a ON a.cent_id = p.cent_id
            JOIN n qn ON qn.vec_id = p.query_id
            JOIN n cn ON cn.vec_id = a.__id
            WHERE a.__id <> p.query_id)
        SELECT query_id, neighbor_id, cosine_sim FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY cosine_sim DESC, neighbor_id) AS rn
            FROM scored) WHERE rn <= 5
    """
    out["winnow_fingerprints"] = f"""
        WITH {_winnow_sel_sql(4, 5)}
        SELECT DISTINCT doc_id, pos, fp FROM wsel
    """
    out["winnow_overlap"] = f"""
        WITH {_winnow_sel_sql(4, 5)},
        wfps AS (SELECT DISTINCT doc_id, fp FROM wsel),
        whot AS (SELECT fp FROM wfps GROUP BY fp
                 HAVING count(*) > 0.5 * (SELECT count(DISTINCT doc_id)
                                          FROM documents)),
        wff AS (SELECT * FROM wfps
                WHERE fp NOT IN (SELECT fp FROM whot))
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(*) AS n_shared
        FROM wff a JOIN wff b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING count(*) >= 2
    """
    out["ivm_chain_cdc"] = r"""
        WITH inp AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents
            WHERE doc_id % 3 = 0 AND doc_id % 10 = 0),
        final AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' rewritten'
                        ELSE text END AS text
            FROM inp WHERE doc_id % 11 <> 3),
        v AS (SELECT doc_id,
                     md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                         AS fp
              FROM final),
        p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM v a JOIN v b ON a.fp = b.fp AND a.doc_id < b.doc_id),
        m AS (SELECT doc_a AS member, doc_a AS label FROM p
              UNION ALL
              SELECT doc_b AS member, doc_a AS label FROM p)
        SELECT member, min(label) AS cluster FROM m GROUP BY 1
    """
    out["ivm_scd2"] = """
        WITH slice AS (
            SELECT c_custkey, c_mktsegment, c_acctbal AS bal,
                   (c_custkey % 28 = 0) AS moved,
                   (c_custkey % 20 = 0) AS deleted
            FROM customer WHERE c_custkey % 4 = 0),
        touched AS (
            SELECT c_custkey, c_mktsegment, bal, 1 AS ver, FALSE AS is_del
            FROM slice
            UNION ALL
            SELECT c_custkey, 'MOVED', bal, 2, FALSE FROM slice WHERE moved
            UNION ALL
            SELECT c_custkey,
                   CASE WHEN moved THEN 'MOVED' ELSE c_mktsegment END,
                   bal, 3, TRUE
            FROM slice WHERE deleted),
        iv AS (
            SELECT c_custkey, c_mktsegment, bal,
                   ver,
                   LEAD(ver) OVER (PARTITION BY c_custkey ORDER BY ver)
                       AS valid_to,
                   is_del
            FROM touched)
        SELECT c_custkey, c_mktsegment, bal,
               CAST(ver AS BIGINT) AS valid_from,
               CAST(valid_to AS BIGINT) AS valid_to,
               (valid_to IS NULL) AS is_current
        FROM iv WHERE NOT is_del
    """
    out["ivm_sessions"] = """
        WITH ev AS (
            SELECT event_id, user_id, epoch(ts) AS tss, value
            FROM events WHERE event_id % 5 = 0),
        final AS (
            SELECT event_id, user_id,
                   CASE WHEN event_id % 35 = 0 THEN tss + 100000.0
                        ELSE tss END AS tss,
                   value
            FROM ev WHERE event_id % 40 <> 0),
        g AS (
            SELECT user_id, event_id, tss, value,
                   tss - LAG(tss) OVER (
                       PARTITION BY user_id ORDER BY tss, event_id) AS gap
            FROM final),
        s AS (
            SELECT user_id, value,
                   SUM(CASE WHEN gap IS NULL OR gap > 1800.0 THEN 1 ELSE 0
                       END) OVER (
                       PARTITION BY user_id ORDER BY tss, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
               CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_value
        FROM s GROUP BY user_id
    """
    out["bpe_pair_stats"] = r"""
        WITH toks AS (
            SELECT t.w
            FROM documents,
                 UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS t(w)
            WHERE regexp_matches(t.w, '^[a-z0-9]+$') AND length(t.w) >= 2),
        pairs AS (
            SELECT w[i:i+1] AS pair
            FROM toks, UNNEST(generate_series(1, length(w) - 1)) AS g(i)),
        counted AS (
            SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs GROUP BY pair)
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair ASC) AS INT)
                   AS rank,
               pair, n
        FROM counted
        QUALIFY rank <= 50
    """
    out["ivm_quality_view"] = r"""
        WITH inp AS (
            SELECT doc_id, text, source FROM documents WHERE doc_id % 3 = 1),
        final AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 21 = 1 THEN 'tiny doc' ELSE text END
                       AS text,
                   source
            FROM inp WHERE doc_id % 15 <> 1),
        enr AS (
            SELECT doc_id, source,
                   CAST(CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(lower(trim(text)),
                                                       '\s+')) END
                        AS BIGINT) AS n_tokens
            FROM final)
        SELECT doc_id, source, n_tokens FROM enr WHERE n_tokens >= 40
    """
    out["source_overlap"] = r"""
        WITH v AS (
            SELECT DISTINCT source,
                   md5(array_to_string(
                       (list_filter(string_split_regex(lower(trim(text)),
                                                       '\s+'),
                                    t -> t <> ''))[1:6], ' ')) AS fp
            FROM documents)
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_fps
        FROM v a JOIN v b ON a.fp = b.fp AND a.source < b.source
        GROUP BY 1, 2
    """
    out["source_novelty"] = r"""
        WITH base AS (
            SELECT source,
                   list_filter(string_split_regex(lower(trim(text)), '\s+'),
                               t -> t <> '') AS tk
            FROM documents),
        sh0 AS (
            SELECT source, array_to_string(tk[i:i+2], ' ') AS sh
            FROM base,
                 UNNEST(generate_series(1, GREATEST(len(tk) - 2, 0))) g(i)
            WHERE len(tk) >= 3),
        sh AS (SELECT DISTINCT source, sh FROM sh0),
        ns AS (SELECT sh, COUNT(*) AS n_src FROM sh GROUP BY sh),
        per AS (
            SELECT s.source,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN ns.n_src = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unique
            FROM sh s JOIN ns USING (sh) GROUP BY 1)
        SELECT source, n_shingles, n_unique,
               FLOOR(n_unique / n_shingles * 1000000.0) / 1000000.0
                   AS novelty
        FROM per
    """
    out["dup_histogram"] = r"""
        WITH g AS (
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                       AS fp,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY 1)
        SELECT n_copies,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n_copies) AS BIGINT) AS n_docs
        FROM g GROUP BY n_copies
    """
    # ivm_metrics: the maintained-view drain schedule is fully
    # deterministic (version-count chunking), so the rollup is literal —
    # 3 backlog slices (2 insert rows each) + 1 churn slice
    # (update pre+post on id 0 + delete of id 1 = 3 rows), head commit v4
    out["ivm_metrics"] = r"""
        SELECT 'UnionLegStage' AS stage,
               'broadcast'     AS rung,
               CAST(4 AS BIGINT) AS n_slices,
               CAST(9 AS BIGINT) AS rows_out,
               CAST(4 AS BIGINT) AS last_commit
    """
    # the refined pairing is lossless BY CONSTRUCTION — same oracle as the
    # unrefined query (signature_pairs refine_over, r6)
    out["multimodal_image_neardup_refined"] = out["multimodal_image_neardup"]
    out["ngram_decontaminate"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
        tr AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(w) - 12),
                              i -> array_to_string(w[i:i+12], ' '))) AS shingle
                FROM t WHERE doc_id % 7 <> 0 AND len(w) >= 13)),
        ev AS (
            SELECT DISTINCT shingle FROM (
                SELECT unnest(list_transform(generate_series(1, len(w) - 12),
                              i -> array_to_string(w[i:i+12], ' '))) AS shingle
                FROM t WHERE doc_id % 7 = 0 AND len(w) >= 13))
        SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_ngrams
        FROM tr JOIN ev USING (shingle)
        GROUP BY tr.doc_id
    """
    # rebuild() converges the corrupted view back to its DEFINITION over
    # the sources' final state — the oracle is that definition; neither
    # the clobbered group value nor the phantom group appears
    out["ivm_rebuild"] = """
        WITH c AS (SELECT c_custkey, c_mktsegment FROM customer
                   WHERE c_custkey % 4 = 0),
        o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_custkey % 4 = 0 AND o_orderkey % 13 <> 1)
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))
                    AS DOUBLE) AS total_price
        FROM c JOIN o ON o.o_custkey = c.c_custkey
        GROUP BY 1
    """
    out["ivm_governor_rungs"] = """
        WITH final_c AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN 'RESEG'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer),
        final_o AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE o_orderkey % 4 = 0 AND o_orderkey % 11 <> 0
            UNION ALL
            SELECT o_orderkey + 20000000, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 23 = 3)
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM final_c c JOIN final_o o ON c.c_custkey = o.o_custkey
    """
    out["ivm_optimize_vacuum"] = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 19 = 0 THEN 'X-OPT'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 4 = 0 AND o_orderkey % 13 <> 1
    """
    out["ivm_union_cdc"] = """
        WITH final_c AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 6 = 0 THEN 'MOVED6'
                        ELSE c_mktsegment END AS c_mktsegment
            FROM customer),
        joined AS (
            SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
            FROM final_c c JOIN orders o ON c.c_custkey = o.o_custkey
            WHERE o.o_orderkey % 4 = 0),
        leg AS (
            SELECT o_custkey + 1000000 AS c_custkey,
                   CASE WHEN o_orderkey % 21 = 2 THEN 'EXT2'
                        ELSE 'EXTERNAL' END AS c_mktsegment,
                   o_orderkey, o_totalprice
            FROM orders
            WHERE o_orderkey % 4 = 1
              AND (o_orderkey % 9 <> 1 OR o_orderkey % 21 = 2))
        SELECT * FROM joined UNION ALL SELECT * FROM leg
    """
    out["ivm_rebucket"] = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 17 = 0 THEN 'REBKT'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 4 = 2 AND o_orderkey % 11 <> 3
    """
    out["ivm_read_where"] = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 13 = 1 THEN 'SCOPED'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 4 = 3 AND o_orderkey % 19 <> 7
          AND o_orderkey % 7 = 2
    """
    out["ivm_zorder_read"] = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 23 = 5 THEN 'ZORD'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 4 = 1 AND o_orderkey % 31 <> 9
          AND o_custkey % 50 = 3
    """
    out["ivm_renamed_view"] = """
        WITH final_c AS (
            SELECT c_custkey AS ck,
                   CASE WHEN c_custkey % 7 = 3 THEN 'RSEG'
                        ELSE c_mktsegment END AS seg
            FROM customer),
        final_o AS (
            SELECT o_orderkey AS ok, o_custkey AS cid, o_totalprice
            FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 19 <> 4
            UNION ALL
            SELECT o_orderkey + 20000000, o_custkey, o_totalprice
            FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 23 = 5)
        SELECT c.ck, c.seg, o.ok, o.o_totalprice
        FROM final_c c JOIN final_o o ON c.ck = o.cid
    """
    out["ivm_scan_where"] = """
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 17 = 4 THEN 'CONDED'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 5 = 4 AND o_orderkey % 23 <> 11
          AND o_orderkey < 20000
    """
    return out

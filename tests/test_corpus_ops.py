"""Corpus operators: dedup families, similarity search, text analysis,
multimodal plumbing. Small handcrafted frames — semantic checks, not scale."""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.operators import dedup, similarity, text
from streamjoin_spark.operators.multimodal import attach_media, frame_sample_plan, image_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "THE  quick brown fox jumps over the lazy dog "), # exact dup of 1 (normalized)
        (4, "completely different text about spark engines"),
        (5, "el es una que para por con los las"),            # spanish-ish
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = dedup.exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2          # docs 1 and 3 normalize identically
    assert groups[2] == 1 and groups[4] == 1
    assert len(out) == 4


def test_ngram_jaccard_finds_near_dup(docs):
    # cap disabled: a 5-doc corpus makes every shared shingle "hot"
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(
                 docs, n=3, threshold=0.3, max_shingle_df=None).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0   # exact dup → J=1
    assert (1, 2) in pairs and 0.3 <= pairs[(1, 2)] < 1.0
    assert all(a < b for a, b in pairs)


def test_ngram_hot_shingle_cap(spark):
    """The document-frequency cap drops boilerplate shingles before the
    self-join: docs similar ONLY through boilerplate stop pairing, while
    genuinely similar docs keep their pairs (computed over the capped
    shingle universe)."""
    boiler = "subscribe to our newsletter for the latest updates"
    rows = [
        (1, f"alpha beta gamma delta epsilon {boiler}"),
        (2, f"alpha beta gamma delta epsilon {boiler}"),   # true dup of 1
        (3, f"completely unrelated words here {boiler}"),
        (4, f"nothing shared with others at all {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = {(r["doc_a"], r["doc_b"])
                for r in dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.3, max_shingle_df=None).collect()}
    capped = {(r["doc_a"], r["doc_b"])
              for r in dedup.ngram_jaccard_pairs(
                  docs, n=3, threshold=0.3, max_shingle_df=3).collect()}
    # boilerplate-only pairs exist without the cap...
    assert (3, 4) in uncapped
    # ...and vanish with it, while the true dup pair survives at J=1
    assert (3, 4) not in capped
    assert (1, 2) in capped
    j12 = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(
               docs, n=3, threshold=0.3, max_shingle_df=3).collect()}[(1, 2)]
    assert j12 == 1.0


def test_minhash_lsh_candidates(docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (1, 3) in pairs            # identical shingle sets always collide
    assert not any(4 in p for p in pairs)  # unrelated doc stays out


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert all(len(v) == 32 and set(v) <= {"0", "1"} for v in sh.values())
    assert sh[1] == sh[3]             # same token multiset → same signature
    ham_12 = sum(a != b for a, b in zip(sh[1], sh[2]))
    ham_14 = sum(a != b for a, b in zip(sh[1], sh[4]))
    assert ham_12 < ham_14            # near-dup closer than unrelated


def test_simhash_pairs_threshold(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(docs, max_hamming=4).collect()}
    assert pairs[(1, 3)] == 0


def test_simhash_blocked_matches_allpairs(spark):
    """Pigeonhole bit-segment blocking is exact: two signatures within the
    hamming radius must agree on at least one of max_hamming+1 segments, so
    the blocked candidate set loses nothing — blocked output must equal the
    all-pairs oracle on a corpus with real near-dup structure."""
    base = ("spark incremental engine maintains joined views over change "
            "feeds with bounded rewrites").split()
    rows = []
    for i in range(30):
        words = list(base)
        words[i % len(words)] = f"tok{i}"          # one-word perturbations
        if i % 3 == 0:
            words.append(f"extra{i // 3}")
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for radius in (2, 4):
        blocked = {(r["doc_a"], r["doc_b"], r["hamming"])
                   for r in dedup.simhash_pairs(
                       docs, max_hamming=radius, blocked=True).collect()}
        allpairs = {(r["doc_a"], r["doc_b"], r["hamming"])
                    for r in dedup.simhash_pairs(
                        docs, max_hamming=radius, blocked=False).collect()}
        assert blocked == allpairs
        assert len(allpairs) > 0        # non-vacuous: real pairs exist


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_ordering(vecs):
    out = similarity.cosine_topk(vecs, vecs.where(F.col("vec_id") == 1), k=3)
    got = [r["neighbor_id"] for r in out.orderBy(F.desc("cosine_sim")).collect()]
    assert got == [2, 3, 4]


def test_embedding_neardup_exact(vecs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             similarity.embedding_neardup_pairs(vecs, threshold=0.95, exact=True).collect()}
    assert pairs == {(1, 2)}


def test_lsh_bucket_recall(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = similarity.cosine_topk(df, df.where(F.col("vec_id") < 5), k=3)
    approx = similarity.lsh_bucket_topk(
        df, df.where(F.col("vec_id") < 5), k=3, n_planes=2, dim=16
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # approximate results are a same-bucket subset scored identically
    assert a and all(sim is not None for sim in (r["cosine_sim"] for r in approx.collect()))
    assert len(a & e) > 0


def test_ivf_pq_matches_python_reference(spark):
    """ivf_pq_topk ≡ a pure-Python PQ reference when nprobe covers every
    inverted list: same sample codebooks, same lowest-code argmin tiebreak,
    same asymmetric (full query × reconstructed corpus) scoring."""
    import math
    import random

    rnd = random.Random(11)
    dim, m, ksub, code_step, ncent = 16, 4, 4, 7, 2
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    vec = {i: [float(np_x) for np_x in v] for i, v in rows}
    # float32 storage: round-trip through the parquet/DataFrame float type
    import struct

    vec = {
        i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
        for i, v in vec.items()
    }
    dsub = dim // m
    sample_ids = sorted(i for i in vec if i % code_step == 0)[:ksub]
    books = [
        [vec[i][mi * dsub : (mi + 1) * dsub] for i in sample_ids]
        for mi in range(m)
    ]

    def recon(v):
        out = []
        for mi in range(m):
            sub = v[mi * dsub : (mi + 1) * dsub]
            dists = []
            for cw in books[mi]:
                acc = 0.0
                for x, y in zip(sub, cw):
                    acc += (x - y) * (x - y)
                dists.append(acc)
            out.extend(books[mi][dists.index(min(dists))])
        return out

    def cos(a, b):
        dp = na = nb = 0.0
        for x, y in zip(a, b):
            dp += x * y
            na += x * x
            nb += y * y
        return math.floor(dp / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6

    expect = {}
    for q in range(3):
        scored = sorted(
            ((-cos(vec[q], recon(vec[c])), c) for c in vec if c != q),
        )[:5]
        expect[q] = [(c, -s) for s, c in scored]

    out = similarity.ivf_pq_topk(
        df, df.where(F.col("vec_id") < 3), k=5,
        n_centroids=ncent, nprobe=2, dim=dim, m=m, ksub=ksub,
        code_step=code_step,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["pq_sim"])
        )
    for q in expect:
        got_q = sorted(got[q], key=lambda t: (-t[1], t[0]))
        assert [c for c, _ in got_q] == [c for c, _ in expect[q]]
        for (_, a), (_, b) in zip(got_q, expect[q]):
            assert abs(a - b) < 1e-9


def test_text_profile_fields(docs):
    p = {r["doc_id"]: r for r in text.profile(docs).collect()}
    assert p[1]["n_tokens"] == 9
    assert p[1]["fingerprint"] == p[3]["fingerprint"]
    assert p[5]["lang_guess"] == "es"
    assert p[1]["lang_guess"] == "en"
    assert 0.0 <= p[1]["quality"] <= 1.0


def test_hashed_classifier_score_semantics(spark):
    """Mean pooling over hashed weight slots + bias; empty docs score
    exactly bias; keep thresholds the canonicalized score."""
    import hashlib
    import math

    n_buckets = 8
    weights = [0.5, -0.25, 0.125, 1.0, -1.0, 0.75, -0.5, 0.0625]
    rows = [(1, "alpha beta gamma"), (2, "   "), (3, "alpha alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in text.hashed_classifier_score(
            df, n_buckets=n_buckets, weights=weights, bias=0.25,
            threshold=0.3, seed="t",
        ).collect()
    }

    def slot(tok):
        h = int(hashlib.md5(("t" + tok).encode()).hexdigest()[:15], 16)
        return weights[h % n_buckets]

    exp1 = math.floor((0.25 + sum(map(slot, ["alpha", "beta", "gamma"])) / 3) * 1e6) / 1e6
    assert out[1]["qc_score"] == exp1
    assert out[1]["keep"] == (exp1 >= 0.3)
    assert out[2]["n_tokens"] == 0
    assert out[2]["qc_score"] == math.floor(0.25 * 1e6) / 1e6
    assert out[3]["qc_score"] == math.floor((0.25 + slot("alpha")) * 1e6) / 1e6


def test_image_features_plumbing(spark, docs):
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    out = {r["doc_id"]: r for r in image_features(payloads, decode="fake").collect()}
    assert len(out) == 5
    r = out[1]
    assert r["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert 1 <= r["width"] <= 4096 and 1 <= r["height"] <= 4096
    assert 0.0 <= r["mean_luma"] < 256.0
    # deterministic: same blob → same features
    again = {x["doc_id"]: x for x in image_features(payloads, decode="fake").collect()}
    assert again[1] == r


def test_image_features_real_decode_raises_without_pil(spark, docs):
    """decode='real' is import-guarded: without Pillow it fails with install
    guidance; with Pillow installed the same code path decodes for real
    (covered by test_real_image_decode_with_pil where the lib exists)."""
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow installed — the real path is live, not guarded")
    except ImportError:
        pass
    payloads = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    with pytest.raises(Exception, match="NotImplementedError|Pillow|PIL"):
        image_features(payloads, decode="real").collect()


def test_real_image_decode_with_pil():
    """Unit-test the real decoder where Pillow exists (skipped otherwise)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from streamjoin_spark.operators.multimodal import _real_image_decode

    buf = io.BytesIO()
    Image.new("RGB", (7, 3), (255, 255, 255)).save(buf, format="PNG")
    w, h, luma = _real_image_decode(buf.getvalue())
    assert (w, h) == (7, 3) and luma == 255.0


def test_real_audio_decode_pcm():
    """The real audio path needs only numpy: RMS and ZCR of raw s16le PCM.
    A constant-amplitude square wave at Nyquist has RMS = amplitude and
    ZCR = 1; silence has RMS 0; a trailing odd byte is dropped."""
    import struct

    from streamjoin_spark.operators.multimodal import _real_audio_decode

    square = struct.pack("<8h", *([1000, -1000] * 4))
    rms, zcr = _real_audio_decode(square)
    assert rms == pytest.approx(1000.0) and zcr == pytest.approx(1.0)
    silence = struct.pack("<4h", 0, 0, 0, 0)
    rms0, zcr0 = _real_audio_decode(silence)
    assert rms0 == 0.0 and zcr0 == 0.0
    assert _real_audio_decode(b"") == (0.0, 0.0)
    # odd trailing byte dropped, not crashed
    rms1, _ = _real_audio_decode(struct.pack("<2h", 5, 5) + b"\x01")
    assert rms1 == pytest.approx(5.0)


def test_audio_features_real_pcm_end_to_end(spark):
    """decode='real' through the full mapInPandas plumbing on PCM payloads:
    per-window RMS distinguishes a loud from a quiet blob."""
    import struct

    from streamjoin_spark.operators.multimodal import audio_features

    loud = struct.pack("<100h", *([2000, -2000] * 50))
    quiet = struct.pack("<100h", *([10, -10] * 50))
    df = spark.createDataFrame(
        [(1, loud), (2, quiet)], "doc_id long, payload binary"
    )
    out = {r["doc_id"]: r for r in
           audio_features(df, bytes_per_window=200, decode="real").collect()}
    assert out[1]["rms"] == pytest.approx(2000.0)
    assert out[2]["rms"] == pytest.approx(10.0)
    assert out[1]["zcr"] == pytest.approx(1.0)


def test_attach_media_and_frame_plan(spark):
    df = spark.createDataFrame([(1, b"abc", 2.5), (2, b"x", 0.4)],
                               "doc_id long, payload binary, duration_s double")
    m = attach_media(df, "payload", "video", "mp4").collect()[0]["media_meta"]
    assert m["media_type"] == "video" and m["n_bytes"] == 3
    plan = frame_sample_plan(df, every_n_seconds=1.0)
    rows = {(r["doc_id"], r["frame_idx"]) for r in plan.collect()}
    assert (1, 0) in rows and (1, 2) in rows and (2, 0) in rows
    assert (1, 3) not in rows


def test_connected_components_transitivity(spark):
    """Min-label propagation resolves chains and multi-edge components to
    the component minimum; disjoint components stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (7, 9)], "doc_a long, doc_b long"
    )
    labels = {r["node"]: r["label"]
              for r in dedup.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 7}
    star = {r["node"]: r["label"]
            for r in dedup.connected_components(pairs, algorithm="star").collect()}
    assert star == labels


def test_connected_components_string_ids(spark):
    """String doc ids — the common real-corpus case — must converge to the
    lexicographic component minimum on BOTH algorithms. (An earlier
    label-SUM convergence probe returned NULL for strings and silently
    exited after one round unconverged.)"""
    pairs = spark.createDataFrame(
        [("doc-b", "doc-c"), ("doc-c", "doc-d"), ("doc-d", "doc-a"),
         ("zz-1", "zz-2")],
        "doc_a string, doc_b string",
    )
    want = {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
            "doc-d": "doc-a", "zz-1": "zz-1", "zz-2": "zz-1"}
    for algo in ("label", "star"):
        got = {r["node"]: r["label"]
               for r in dedup.connected_components(pairs, algorithm=algo).collect()}
        assert got == want, algo


def test_star_beats_label_on_chain(spark):
    """A path-shaped component (transitive fuzzy-match chain): min-label
    needs O(diameter) rounds; large/small-star contracts in O(log² n).
    Same labels, strictly fewer rounds on a 16-node chain."""
    n = 16
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    lab, label_rounds = dedup._cc_label(pairs, "doc_a", "doc_b", 60)
    star, star_rounds = dedup._cc_star(pairs, "doc_a", "doc_b", 60)
    lab_m = {r["node"]: r["label"] for r in lab.collect()}
    star_m = {r["node"]: r["label"] for r in star.collect()}
    assert lab_m == star_m == {i: 0 for i in range(n)}
    assert star_rounds < label_rounds, (star_rounds, label_rounds)


def test_pack_sequences_semantics(spark):
    """Running-total packing: per bucket, pack_id = floor(prev_cum/budget);
    every pack's exclusive start is inside the budget grid and the
    assignment is deterministic under physical reordering."""
    rows = [(i, 100 + (i * 37) % 300) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = text.pack_sequences(df, "n_tokens", budget=500, n_buckets=4)
    got = out.collect()
    assert len(got) == 60
    for r in got:
        # exclusive running total before this doc lands in this pack
        assert r["pack_id"] == (r["cum_tokens"] - r["n_tokens"]) // 500
    # deterministic under repartition
    out2 = text.pack_sequences(
        df.repartition(7), "n_tokens", budget=500, n_buckets=4
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, out2.collect()))
    # packs fill: at least one bucket has multiple packs
    assert out.select("bucket", "pack_id").distinct().count() > 4


def test_pii_scrub_and_counts(spark):
    """Each PII family is counted pre-redaction and replaced post-redaction;
    clean text is untouched."""
    rows = [
        (1, "mail me at jo.doe+x@corp.example.org or call 555-123-4567"),
        (2, "ssn 123-45-6789 from host 192.168.0.1"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cts = text.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[cts[k].alias(k) for k in ("email", "phone", "ssn", "ipv4")],
            text.scrub_pii(F.col("text")).alias("clean"),
        ).collect()
    }
    assert (out[1]["email"], out[1]["phone"]) == (1, 1)
    assert out[1]["clean"] == "mail me at <EMAIL> or call <PHONE>"
    assert (out[2]["ssn"], out[2]["ipv4"]) == (1, 1)
    assert out[2]["clean"] == "ssn <SSN> from host <IP>"
    assert out[3]["clean"] == "nothing sensitive here"
    assert sum(out[3][k] for k in ("email", "phone", "ssn", "ipv4")) == 0


def test_repetition_profile_signals(spark):
    """Degenerate text maxes the top-bigram share; varied text stays low;
    sub-bigram docs report zeros instead of vanishing."""
    rows = [
        (1, "spam spam spam spam spam"),
        (2, "one two three four five six"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_profile(df).collect()}
    assert len(out) == 3
    assert out[1]["n_bigrams"] == 4 and out[1]["top_bigram_share"] == 1.0
    assert out[1]["distinct_token_ratio"] == 0.2
    assert out[2]["n_bigrams"] == 5
    assert out[2]["top_bigram_share"] == 0.2  # all bigrams distinct
    assert out[3]["n_bigrams"] == 0 and out[3]["top_bigram_share"] == 0.0


def test_bm25_ranking(spark):
    """More on-topic docs rank higher; rare terms outweigh common ones;
    output is capped at k with id tiebreak."""
    from streamjoin_spark.operators.retrieval import bm25_topk

    rows = [
        (1, "spark spark spark engine"),
        (2, "spark engine room"),
        (3, "zebra in the room"),          # rare term
        (4, "engine engine engine engine"),
        (5, "nothing relevant at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["spark", "zebra"], k=3).collect()
    assert [r["doc_id"] for r in out][:1] == [3] or out[0]["score"] > 0
    scores = {r["doc_id"]: r["score"] for r in out}
    assert len(out) == 3 and 5 not in scores
    # doc 1 (3x spark) beats doc 2 (1x spark)
    assert scores[1] > scores[2]
    # rare 'zebra' idf beats single common-term hits
    assert scores[3] > scores[2]


def test_pagerank_semantics(spark):
    """Hub node dominates a symmetrized star; ranks sum to ~1 (no dangling
    mass after symmetrization); deterministic under repartition."""
    from streamjoin_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9), (5, 6)], "src long, dst long"
    )
    out = pagerank(edges, iters=5, symmetrize=True)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert max(ranks, key=ranks.get) == 9          # the hub
    assert abs(sum(ranks.values()) - 1.0) < 1e-6   # mass conserved
    assert ranks[5] == ranks[6]                    # symmetric pair ties
    out2 = pagerank(edges.repartition(5), iters=5, symmetrize=True)
    assert {r["node"]: r["rank"] for r in out2.collect()} == ranks


def test_contamination_report(spark):
    """A training doc embedding an eval 4-gram is flagged; clean docs are
    not; counts reflect distinct leaked shingles and touched eval docs."""
    ev = spark.createDataFrame(
        [(100, "the secret eval answer is forty two")],
        "doc_id long, text string",
    )
    tr = spark.createDataFrame(
        [(1, "prefix words the secret eval answer is hidden here"),
         (2, "completely unrelated clean training text")],
        "doc_id long, text string",
    )
    out = text.contamination_report(tr, ev, n=4).collect()
    assert len(out) == 1
    r = out[0]
    # "the secret eval answer" and "secret eval answer is" both leak
    assert (r["doc_id"], r["n_shared_shingles"], r["n_eval_docs"]) == (1, 2, 1)


def test_unigram_logprob_ordering(spark):
    """Docs made of corpus-common tokens score higher (less negative) than
    rare-token docs; token counts are exact."""
    df = spark.createDataFrame(
        [(1, "common common common common"),
         (2, "common common common rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.unigram_logprob(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_collocations_pmi_ordering(spark):
    """A pair that always co-occurs outranks pairs of independent common
    tokens; min_count suppresses one-off pairs."""
    rows = [(i, "hong kong " + ("x y " if i % 2 == 0 else "y x ") * 3)
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.collocations(df, k=5, min_count=5).collect()
    assert out[0]["bigram"] == "hong kong"      # perfect collocation wins
    assert all(r["n_pair"] >= 5 for r in out)


def test_cooccurrence_edges_support_threshold(spark):
    """Edge iff the pair shares >= min_support distinct contexts; pairs are
    stored ordered p1 < p2; duplicate items within a context count once."""
    from streamjoin_spark.operators.graph import cooccurrence_edges

    rows = [(10, "a"), (10, "b"), (10, "c"), (10, "a"),
            (11, "b"), (11, "a"), (12, "c")]
    df = spark.createDataFrame(rows, "ctx long, item string")
    out = {(r["p1"], r["p2"]): r["support"]
           for r in cooccurrence_edges(df, "ctx", "item", min_support=2).collect()}
    assert out == {("a", "b"): 2}
    all_edges = {(r["p1"], r["p2"]): r["support"]
                 for r in cooccurrence_edges(df, "ctx", "item").collect()}
    assert all_edges == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_triangles_each_once(spark):
    """A 4-clique has exactly C(4,3)=4 triangles, each enumerated once with
    a < b < c; an attached pendant edge adds none."""
    from streamjoin_spark.operators.graph import triangles

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(clique + [(4, 9)], "p1 long, p2 long")
    out = sorted(tuple(r) for r in triangles(edges).collect())
    assert out == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_kmv_distinct_exact_and_estimate(spark):
    """Groups under k values report exact counts; a 1000-distinct group's
    estimate lands within 35% (k=64 => ~12.5% stddev); deterministic under
    repartition (no RNG, md5-parity hashing)."""
    from streamjoin_spark.operators.sketches import kmv_distinct

    rows = [("small", i % 10) for i in range(50)] + [
        ("big", i) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: (r["est_distinct"], r["exact_distinct"])
           for r in kmv_distinct(df, ["g"], "v", k=64).collect()}
    assert out["small"] == (10, 10)
    est, exact = out["big"]
    assert exact == 1000
    assert 650 <= est <= 1350
    out2 = {r["g"]: (r["est_distinct"], r["exact_distinct"])
            for r in kmv_distinct(df.repartition(7), ["g"], "v", k=64).collect()}
    assert out2 == out


def test_fuzzy_pairs_blocking_and_cap(spark):
    """Near-identical texts pair inside a block; different-block docs are
    never compared (recall bound, by design); an over-cap block is dropped
    entirely (the hot-block guard)."""
    from streamjoin_spark.operators.dedup import fuzzy_pairs

    rows = [(1, "b1", "the quick brown fox"), (2, "b1", "the quick brown fux"),
            (3, "b2", "the quick brown fox")]
    df = spark.createDataFrame(rows, "doc_id long, blk string, text string")
    out = [(r["id_a"], r["id_b"], r["dist"])
           for r in fuzzy_pairs(df, block_cols=["blk"], max_dist=3).collect()]
    assert out == [(1, 2, 1)]
    capped = fuzzy_pairs(df.withColumn("blk", df.blk.substr(1, 1)),
                         block_cols=["blk"], max_dist=3, max_block=2)
    assert capped.count() == 0

    # no block_cols → one global block: the cap would silently drop every
    # input larger than max_block, so it's a ValueError instead
    import pytest
    with pytest.raises(ValueError, match="block_cols"):
        fuzzy_pairs(df)


def test_cms_never_underestimates(spark):
    """CMS estimates dominate exact counts (collisions only inflate); the
    heaviest value surfaces first; deterministic under repartition."""
    from streamjoin_spark.operators.sketches import cms_topk

    rows = [("hot",)] * 50 + [(f"v{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    out = cms_topk(df, "v", k=5, width=64).collect()
    assert out[0]["value"] == "hot" and out[0]["exact_n"] == 50
    assert all(r["est_n"] >= r["exact_n"] for r in out)
    out2 = cms_topk(df.repartition(7), "v", k=5, width=64).collect()
    assert [tuple(r) for r in out2] == [tuple(r) for r in out]


def test_bloom_prune_no_false_negatives(spark):
    """Every true match survives the Bloom prune (no false negatives —
    the defining guarantee); with a roomy filter most non-members drop."""
    from streamjoin_spark.operators.sketches import bloom_positions, bloom_prune

    build = spark.createDataFrame([(i,) for i in range(50)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k long")
    pos = bloom_positions(build, "k", m=4096, k=3)
    kept = {r["k"] for r in bloom_prune(probe, pos, "k", m=4096, k=3).collect()}
    assert set(range(50)) <= kept          # no false negatives
    assert len(kept) < 400                 # bulk of non-members pruned


def test_rrf_fuse_semantics(spark):
    """Docs on both lists dominate; a missing leg contributes 0; ties break
    by id; output capped at k."""
    from streamjoin_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    vec = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    out = rrf_fuse([lex, vec], k=3).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 2                      # on both lists → highest fusion
    assert len(out) == 3
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["rank_0"] == 2 and by_id[2]["rank_1"] == 1
    assert abs(by_id[2]["rrf_score"] - (1 / 62 + 1 / 61)) < 1e-12
    # doc 1 (lex rank 1, no vec) vs doc 4 (vec rank 2, no lex): 1/61 > 1/62
    assert ids[1] == 1


def test_chunk_tokens_windows(spark):
    """Overlapping windows every `stride` tokens; trailing partial kept;
    empty/whitespace docs yield no chunks; short docs yield exactly one."""
    from streamjoin_spark.operators.text import chunk_tokens

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 tokens
            (2, "one two"),                             # 2 tokens
            (3, "   "),                                 # whitespace only
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_tokens(docs, "text", "doc_id", window=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 -> lengths 4,4,4,1
    assert [rows[(1, i)]["chunk_tokens"] for i in range(4)] == [4, 4, 4, 1]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 3)]["chunk_text"] == "w9"
    # doc 2: a single partial chunk; doc 3: absent entirely
    assert rows[(2, 0)]["chunk_text"] == "one two"
    assert {k[0] for k in rows} == {1, 2}


def test_chunk_tokens_no_shuffle(spark, sf_dir):
    """Chunking is scan -> project -> explode: no Exchange in the plan."""
    import __spark_entry__ as entry

    df = entry.q_chunk_documents(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Generate explode" in p or "Generate" in p


def test_audio_features_windows_and_parity(spark):
    """Window fan-out = ceil(n_bytes / bytes_per_window) (min 1); each
    window's features equal the hex-md5 fake decode of exactly its byte
    slice; the Python stage never sees more than bytes_per_window bytes."""
    import hashlib

    from streamjoin_spark.operators.multimodal import (
        _fake_audio_decode,
        audio_features,
    )

    payload = bytes(range(256)) * 2  # 512 bytes -> 3 windows of 200/200/112
    df = spark.createDataFrame([(7, payload), (8, b"")], "doc_id long, payload binary")
    rows = {
        (r["doc_id"], r["window_idx"]): r
        for r in audio_features(df, bytes_per_window=200).collect()
    }
    assert [rows[(7, i)]["n_bytes"] for i in range(3)] == [200, 200, 112]
    assert (8, 0) in rows and rows[(8, 0)]["n_bytes"] == 0
    for i in range(3):
        exp_rms, exp_zcr = _fake_audio_decode(payload[i * 200 : (i + 1) * 200])
        assert rows[(7, i)]["rms"] == exp_rms
        assert rows[(7, i)]["zcr"] == exp_zcr
    # decode stub contract: hex-of-bytes md5, uppercase
    h = hashlib.md5(payload[:200].hex().upper().encode()).hexdigest()
    assert rows[(7, 0)]["rms"] == (int(h[:15], 16) % 100000) / 1000.0


def test_quantile_sketch_merge_and_accuracy(spark):
    """Sketch quantiles land within one bin-width of exact; two half-corpus
    sketches merged give EXACTLY the whole-corpus sketch (the mergeability
    contract that exact percentiles lack)."""
    from streamjoin_spark.operators.sketches import (
        approx_quantiles,
        merge_quantile_sketches,
        quantile_sketch,
        quantiles_from_sketch,
    )

    rows = [(i % 2, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, x double")
    n_bins = 100
    est = {(r["g"], r["q"]): r["value"]
           for r in approx_quantiles(df, "x", [0.5, 0.9], ["g"],
                                     n_bins=n_bins).collect()}
    # group 0: evens 0..998, group 1: odds 1..999; bin width ≈ 10
    exact = {(0, 0.5): 498.0, (0, 0.9): 898.0, (1, 0.5): 499.0, (1, 0.9): 899.0}
    for k, v in exact.items():
        assert abs(est[k] - v) <= 998.0 / n_bins + 1e-9, (k, est[k], v)

    # mergeability: fixed bounds → sum of partial counts == whole-input sketch
    half_a = df.where("x < 500"); half_b = df.where("x >= 500")
    lo, hi = 0.0, 999.0
    sa = quantile_sketch(half_a, "x", ["g"], n_bins=n_bins, lo=lo, hi=hi)
    sb = quantile_sketch(half_b, "x", ["g"], n_bins=n_bins, lo=lo, hi=hi)
    merged = merge_quantile_sketches(sa, sb, ["g"])
    whole = quantile_sketch(df, "x", ["g"], n_bins=n_bins, lo=lo, hi=hi)
    m = {(r["g"], r["bin"]): r["cnt"] for r in merged.collect()}
    w = {(r["g"], r["bin"]): r["cnt"] for r in whole.collect()}
    assert m == w
    # quantiles from the merged sketch == quantiles from the whole sketch
    qm = {(r["g"], r["q"]): r["value"]
          for r in quantiles_from_sketch(merged, [0.5], ["g"]).collect()}
    qw = {(r["g"], r["q"]): r["value"]
          for r in quantiles_from_sketch(whole, [0.5], ["g"]).collect()}
    assert qm == qw


def test_quantile_sketch_degenerate_group(spark):
    """All-equal group (hi == lo): single bin, every quantile = the value."""
    from streamjoin_spark.operators.sketches import approx_quantiles

    df = spark.createDataFrame([(1, 7.5)] * 5 + [(2, 1.0), (2, 2.0)],
                               "g int, x double")
    out = {(r["g"], r["q"]): r["value"]
           for r in approx_quantiles(df, "x", [0.5], ["g"], n_bins=4).collect()}
    assert out[(1, 0.5)] == 7.5
    assert 1.0 < out[(2, 0.5)] <= 2.0


def test_source_quota_semantics(spark):
    """Keep the n best per group by (score desc, id asc); rnk is 1-based
    and deterministic under ties."""
    from streamjoin_spark.operators.text import source_quota

    rows = [(1, "a", 0.9), (2, "a", 0.9), (3, "a", 0.5), (4, "b", 0.1)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = {(r["doc_id"]): r["rnk"]
           for r in source_quota(df, ["source"], 2, "q", "doc_id").collect()}
    # tie at 0.9 broken by doc_id; doc 3 over quota; b keeps its single doc
    assert out == {1: 1, 2: 2, 4: 1}


def test_zone_map_prune_semantics(spark):
    """Per-zone min/max envelopes and the BETWEEN skip verdict: a zone
    entirely below or above the range is scan=false, overlap is true."""
    from streamjoin_spark.operators.layout import prune_zones, zone_map

    rows = [(0, 1), (0, 5), (1, 10), (1, 20), (2, 100)]
    df = spark.createDataFrame(rows, "zone long, k long")
    zm = zone_map(df, "zone", ["k"])
    got = {r["zone"]: (r["n_rows"], r["min_k"], r["max_k"], r["scan"])
           for r in prune_zones(zm, "k", 8, 30).collect()}
    assert got == {
        0: (2, 1, 5, False),     # entirely below the range → skipped
        1: (2, 10, 20, True),    # overlaps → scanned
        2: (1, 100, 100, False), # entirely above → skipped
    }


def test_hll_merge_law_and_accuracy(spark):
    """Two half-corpus register tables merged by MAX give EXACTLY the
    whole-corpus registers (the HLL merge law), and the estimate lands
    within the ~4.6 % standard error band for b=9."""
    from streamjoin_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_registers,
        merge_hll,
    )

    df = spark.range(0, 5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    out = hll_distinct(df, ["g"], "v", b=9).collect()[0]
    assert out["exact_distinct"] == 5000
    assert abs(out["est_distinct"] - 5000) / 5000 < 0.15

    half_a = df.where(F.col("id") < 3000)
    half_b = df.where(F.col("id") >= 2000)  # overlapping halves: idempotence
    merged = merge_hll(
        hll_registers(half_a, ["g"], "v"), hll_registers(half_b, ["g"], "v"), ["g"]
    )
    whole = hll_registers(df, ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
    est_m = hll_estimate(merged, ["g"]).collect()[0]["est_distinct"]
    est_w = hll_estimate(whole, ["g"]).collect()[0]["est_distinct"]
    assert est_m == est_w


def test_hll_small_group_linear_counting(spark):
    """Small cardinalities take the linear-counting branch and stay tight
    (within a few % — V is large, the branch is near-exact there)."""
    from streamjoin_spark.operators.sketches import hll_distinct

    df = spark.range(0, 40).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    out = hll_distinct(df, ["g"], "v", b=9).collect()[0]
    assert abs(out["est_distinct"] - 40) <= 3


def test_funnel_strict_order_semantics(spark):
    """A user whose click precedes every view does NOT convert; conversion
    uses the earliest qualifying event strictly after the previous step."""
    import datetime as dt

    from streamjoin_spark.operators.funnel import funnel

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1: view@1 click@2 -> converts both steps
        (1, "view", t(1)), (1, "click", t(2)),
        # u2: click@1 view@2 -> view only (click not after first view)
        (2, "click", t(1)), (2, "view", t(2)),
        # u3: view@1, click@1 (same instant -> NOT strictly after)
        (3, "view", t(1)), (3, "click", t(1)),
        # u4: click only -> not even step 1
        (4, "click", t(5)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    out = {r.step: (r.users, r.conv_rate) for r in funnel(ev, ["view", "click"]).collect()}
    assert out["view"] == (3, 1.0)
    assert out["click"][0] == 1
    assert abs(out["click"][1] - 0.333333) < 1e-9


def test_passage_dedup_first_occurrence_survives(spark):
    """A passage repeated across (and within) documents survives only at
    its first global (doc_id, pos) occurrence; docs reassemble in order."""
    from streamjoin_spark.operators.text import passage_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # passages (P=2): "a b", "c d"
            (2, "a b x y"),      # "a b" duplicate of doc1 -> dropped
            (3, "c d c d"),      # both passages duplicate doc1's "c d"
            (4, "z z"),          # unique
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in passage_dedup(docs, passage_tokens=2).collect()}
    assert (out[1].n_passages, out[1].n_kept, out[1].text_clean) == (2, 2, "a b c d")
    assert (out[2].n_passages, out[2].n_kept, out[2].text_clean) == (2, 1, "x y")
    assert (out[3].n_passages, out[3].n_kept, out[3].text_clean) == (2, 0, "")
    assert (out[4].n_passages, out[4].n_kept, out[4].text_clean) == (1, 1, "z z")


def test_prefix_jaccard_equals_bruteforce(spark):
    """The PPJoin prefix filter is lossless: identical pairs + scores to
    the uncapped brute-force join across thresholds."""
    from streamjoin_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(30):
        # overlapping sliding vocab windows -> a mix of near-dups and misses
        toks = [words[(i + j) % len(words)] for j in range(6)] + [f"u{i}"]
        rows.append((i, " ".join(toks)))
    rows.append((100, rows[0][1]))            # exact duplicate of doc 0
    rows.append((101, rows[1][1] + " extra")) # near duplicate of doc 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        brute = sorted(map(tuple, ngram_jaccard_pairs(
            docs, n=2, threshold=t, max_shingle_df=None).collect()))
        pp = sorted(map(tuple, prefix_jaccard_pairs(
            docs, n=2, threshold=t).collect()))
        assert pp == brute, t
    assert any(p[:2] == (0, 100) for p in pp) or any(
        p[:2] == (0, 100) for p in brute
    )


def test_kmv_set_ops_estimates_and_subk_exactness(spark):
    from streamjoin_spark.operators.sketches import kmv_set_ops

    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(1500, 4500).select(F.col("id").alias("v"))
    r = kmv_set_ops(a, b, "v", k=256).collect()[0]
    assert r["exact_union"] == 4500 and r["exact_intersect"] == 1500
    assert abs(r["est_union"] - 4500) / 4500 < 0.2
    assert abs(r["est_intersect"] - 1500) / 1500 < 0.35
    assert abs(r["jaccard_est"] - 1500 / 4500) < 0.12
    # sub-k inputs: the union sketch holds every hash -> exact answers
    sa = spark.range(0, 100).select(F.col("id").alias("v"))
    sb = spark.range(50, 150).select(F.col("id").alias("v"))
    r2 = kmv_set_ops(sa, sb, "v", k=256).collect()[0]
    assert r2["est_union"] == 150 and r2["est_intersect"] == 50


def test_k_core_known_graph(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle (each
    member at degree 2); the 3-core is empty. Peeling must cascade — node 4
    only drops after 5 does."""
    from streamjoin_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "p1 long, p2 long"
    )
    core2 = {(r["node"], r["core_degree"]) for r in k_core(edges, 2).collect()}
    assert core2 == {(1, 2), (2, 2), (3, 2)}
    assert k_core(edges, 3).count() == 0


def test_semdedup_prunes_near_identical(spark):
    """Two orthogonal seed vectors; each gets a near-identical higher-id
    twin. tau=0.99 prunes the twins to their min-id keepers, never across
    clusters."""
    from streamjoin_spark.operators.clustering import semdedup

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 0.001]),
            (4, [0.001, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: (r["cluster_id"], r["kept"])
        for r in semdedup(emb, k=2, tau=0.99).collect()
    }
    assert out[1][1] and out[2][1]
    assert not out[3][1] and not out[4][1]
    assert out[3][0] == out[1][0] and out[4][0] == out[2][0]


def test_dsir_ranks_target_alike_docs_higher(spark):
    """Documents sharing the target domain's vocabulary must score higher
    than documents of out-of-domain vocabulary."""
    import pyspark.sql.functions as F

    from streamjoin_spark.operators.text import dsir_logratio

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha gamma", "tgt"),
            (2, "alpha gamma gamma", "tgt"),
            (3, "alpha alpha alpha", "web"),   # target-alike
            (4, "beta beta beta", "web"),      # out-of-domain
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_logratio(docs, F.col("source") == "tgt").collect()
    }
    assert out[3] > out[4]


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from("a b c d e f".split()), min_size=2, max_size=10
            ),
            min_size=3,
            max_size=8,
        ),
        threshold=st.sampled_from([0.3, 0.5, 0.7]),
    )
    def test_prefix_jaccard_matches_python_truth(spark, docs, threshold):
        """Property pin for the PPJoin prefix/positional/pair-bound math:
        on random tiny corpora, prefix_jaccard_pairs must equal an exact
        Python computation of floor-canonicalized n-gram Jaccard — any
        over-tight candidate filter (the classic PPJoin implementation
        bug) would drop a true pair here."""
        import math

        from streamjoin_spark.operators.dedup import prefix_jaccard_pairs

        n = 2
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        sets = {
            i: {
                " ".join(toks[j: j + n])
                for j in range(len(toks) - n + 1)
            }
            for i, toks in enumerate(docs)
            if len(toks) >= n
        }
        want = {}
        ids = sorted(sets)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    continue
                j = inter / (len(sets[a]) + len(sets[b]) - inter)
                j = math.floor(j * 1e6) / 1e6
                if j >= threshold:
                    want[(a, b)] = j
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in prefix_jaccard_pairs(
                df, n=n, threshold=threshold
            ).collect()
        }
        assert got == want


def test_gopher_filters_rules(spark):
    """Each rule flag fires on its own violation; keep is the conjunction;
    empty docs fail word count with zeroed ratios."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and that is it"),
        (2, "a b c d e f g h i j k l"),                 # short words, no stops
        (3, "#### #### #### the of and ok fine"),        # symbol-heavy
        (4, ""),                                          # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.gopher_filters(
        df, min_words=5, min_mean_word_len=2.0, min_stop_hits=2
    ).collect()}

    assert out[1]["keep"] is True
    assert out[2]["mean_len_ok"] is False          # mean word len 1.0
    assert out[2]["stopword_ok"] is False
    assert out[3]["symbol_ok"] is False            # 16 '#' chars / 8 words
    assert out[3]["alpha_ok"] is False             # 4/8 words lack [a-z]
    assert out[4]["n_words"] == 0 and out[4]["keep"] is False
    assert out[4]["mean_word_len"] == 0.0


def test_mixture_temperature_upweights_tail(spark):
    """sqrt-temperature: small sources gain probability relative to their
    raw share, large sources lose; probabilities ~sum to 1."""
    from streamjoin_spark.operators.skew import mixture_temperature

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in mixture_temperature(df).collect()}
    assert out["big"]["share"] == 0.9 and out["small"]["share"] == 0.1
    assert out["small"]["p_temp"] > out["small"]["share"]
    assert out["big"]["p_temp"] < out["big"]["share"]
    assert abs(out["big"]["p_temp"] + out["small"]["p_temp"] - 1.0) < 1e-4


def test_ngram_containment_catches_inclusion(spark):
    """A short doc fully quoted inside a long page: Jaccard misses it
    (union dominated by the long side), containment flags it at 1.0."""
    quoted = "incremental engines maintain joined views over change feeds"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, quoted),
        (2, f"{filler} {quoted}"),
        (3, "entirely unrelated content about something else altogether"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jac = {(r["doc_a"], r["doc_b"]) for r in dedup.ngram_jaccard_pairs(
        df, n=3, threshold=0.5, max_shingle_df=None).collect()}
    cont = {(r["doc_a"], r["doc_b"]): r for r in dedup.ngram_containment_pairs(
        df, n=3, threshold=0.8, max_shingle_df=None).collect()}
    assert (1, 2) not in jac
    assert (1, 2) in cont
    r = cont[(1, 2)]
    assert r["containment"] == 1.0
    assert r["sz_a"] < r["sz_b"]       # the contained side is the small one
    assert not any(3 in p for p in cont)


def test_perplexity_bands_thirds(spark):
    """Per-language fluency bands: ~thirds at histogram resolution, band 1
    scores >= band 3 scores within a language, empty docs absent."""
    import random

    rnd = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rnd.choices(vocab, k=rnd.randint(5, 30))), "en")
        for i in range(60)
    ] + [(100, "", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = text.perplexity_bands(df).collect()
    # empty doc follows unigram_logprob's convention: one '' token
    empty = [r for r in out if r["doc_id"] == 100]
    assert len(empty) == 1 and empty[0]["n_tokens"] == 1
    by_band = {}
    for r in out:
        if r["doc_id"] == 100:
            continue
        by_band.setdefault(r["band"], []).append(r["avg_logprob"])
    assert set(by_band) == {1, 2, 3}
    assert min(by_band[1]) >= max(by_band[3])
    # thirds within histogram-bin resolution
    assert 10 <= len(by_band[1]) <= 30


if _HAVE_HYP:

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from("a b c d e f".split()), min_size=2, max_size=10
            ),
            min_size=3,
            max_size=8,
        ),
        threshold=st.sampled_from([0.5, 0.8, 1.0]),
    )
    def test_containment_matches_python_truth(spark, docs, threshold):
        """Property pin for containment: on random tiny corpora (cap
        disabled), ngram_containment_pairs must equal the exact Python
        C = |A∩B| / min(|A|,|B|) over distinct-shingle sets."""
        import math

        from streamjoin_spark.operators.dedup import ngram_containment_pairs

        n = 2
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        sets = {
            i: {" ".join(toks[j: j + n]) for j in range(len(toks) - n + 1)}
            for i, toks in enumerate(docs)
            if len(toks) >= n
        }
        want = {}
        ids = sorted(sets)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(sets[a] & sets[b])
                if inter == 0:
                    continue
                c = inter / min(len(sets[a]), len(sets[b]))
                c = math.floor(c * 1e6) / 1e6
                if c >= threshold:
                    want[(a, b)] = c
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in ngram_containment_pairs(
                df, n=n, threshold=threshold, max_shingle_df=None
            ).collect()
        }
        assert got == want


def test_ann_recall_math(spark):
    """Recall = |approx ∩ exact| / k with the exact tier's k as the
    denominator; queries the approx tier missed entirely score 0."""
    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (3, 31)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)],
        "query_id long, neighbor_id long",
    )
    out = {r["query_id"]: r for r in
           similarity.ann_recall(exact, approx, k=2).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["recall"] == 0.5
    assert out[2]["n_hits"] == 2 and out[2]["recall"] == 1.0
    assert out[3]["n_hits"] == 0 and out[3]["recall"] == 0.0


def test_image_neardup_phash_locality(spark):
    """The fake perceptual hash is locality-sensitive: an edited copy sits
    a few bits from its original, unrelated payloads ~half the bits away;
    blocked pairing equals all-pairs (pigeonhole is lossless)."""
    from streamjoin_spark.operators.multimodal import image_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base.replace("lazy", "hazy", 1)),   # one small edit
        (3, "completely different content with other words " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    blocked = {(r["doc_a"], r["doc_b"]): r["hamming"]
               for r in image_neardup_pairs(df, max_hamming=10).collect()}
    allp = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in image_neardup_pairs(
                df, max_hamming=10, blocked=False).collect()}
    assert blocked == allp
    assert (1, 2) in blocked and blocked[(1, 2)] <= 10
    assert not any(3 in p for p in blocked)


def test_hamming_chunked_matches_per_bit(spark):
    """The chunked conv/xor/bit_count hamming (r12 optimization) equals
    the per-bit substring-compare law for every width the operators use
    (32-bit simhash, 64-bit phash/afp) including all-equal, all-different
    and single-bit cases, and keeps the int output type."""
    import random

    from streamjoin_spark.operators.dedup import _hamming

    rng = random.Random(12)
    rows = []
    for n_bits in (32, 64):
        for _ in range(25):
            a = "".join(rng.choice("01") for _ in range(n_bits))
            b = "".join(rng.choice("01") for _ in range(n_bits))
            rows.append((n_bits, a, b))
        base = "".join(rng.choice("01") for _ in range(n_bits))
        flip = ("1" if base[0] == "0" else "0") + base[1:]
        inv = "".join("1" if c == "0" else "0" for c in base)
        rows += [(n_bits, base, base), (n_bits, base, flip), (n_bits, base, inv)]
    for n_bits in (32, 64):
        sub = [(a, b) for nb, a, b in rows if nb == n_bits]
        df = spark.createDataFrame(sub, "a string, b string")
        got = df.select(_hamming(F.col("a"), F.col("b"), n_bits).alias("h"))
        assert dict(got.dtypes)["h"] == "int"
        for (a, b), r in zip(sub, got.collect()):
            expected = sum(1 for x, y in zip(a, b) if x != y)
            assert r["h"] == expected, (a, b)


def test_fake_phash_batch_matches_per_row():
    """The batch-vectorized phash (r12 optimization: per-worker window
    memo + one scatter/matmul per batch) is bit-identical to the per-row
    md5-vote law for every payload shape, including the <4-byte all-zeros
    edge and repeated calls that hit the warm cache."""
    from streamjoin_spark.operators.multimodal import (
        _fake_phash,
        _fake_phash_batch,
    )

    blobs = [
        b"",
        b"a",
        b"abc",
        b"abcd",
        b"abcde",
        b"\x00\x00\x00\x00\x00\x00",
        b"the quick brown fox jumps over the lazy dog " * 3,
        b"the quick brown fox jumps over the hazy dog " * 3,
        bytes(range(256)) * 2,
        "unicode éß中文 payload".encode() * 4,
    ]
    expected = [_fake_phash(b) for b in blobs]
    assert _fake_phash_batch(blobs) == expected
    # second call exercises the warm _PHASH_CACHE path
    assert _fake_phash_batch(list(reversed(blobs))) == list(
        reversed(expected)
    )
    # all-empty batch
    assert _fake_phash_batch([b"", b"ab"]) == ["0" * 64, "0" * 64]
    # cap-overflow path: with the memo frozen at its current size, new
    # windows must bypass the cache (batch-local rows) with identical
    # output — the adversarial-corpus memory bound
    from streamjoin_spark.operators import multimodal as mm

    fresh = [bytes([17, x, 251, x ^ 170, 9]) for x in range(40)]
    old_cap = mm._PHASH_CACHE_CAP
    mm._PHASH_CACHE_CAP = len(mm._PHASH_CACHE)
    try:
        got = _fake_phash_batch(fresh + blobs)
        assert len(mm._PHASH_CACHE) <= mm._PHASH_CACHE_CAP
    finally:
        mm._PHASH_CACHE_CAP = old_cap
    assert got == [_fake_phash(b) for b in fresh] + expected


def test_label_propagation_splits_bridged_cliques(spark):
    """LPA vs CC on a barbell: two 4-cliques joined by one bridge edge are
    ONE connected component but TWO majority communities; tie-breaks are
    deterministic (min label)."""
    from streamjoin_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    df = spark.createDataFrame(edges, "p1 long, p2 long")

    comm = {r["node"]: r["community"]
            for r in label_propagation(df, rounds=4).collect()}
    assert len(set(comm.values())) == 2
    assert len({comm[i] for i in [1, 2, 3]}) == 1
    assert len({comm[i] for i in [11, 12, 13]}) == 1
    assert comm[1] != comm[11]

    cc = {r["node"]: r["cluster_id"] if "cluster_id" in r else r["label"]
          for r in dedup.connected_components(
              df, src="p1", dst="p2").collect()}
    assert len(set(cc.values())) == 1          # CC merges across the bridge


def test_audio_neardup_fingerprint_locality(spark):
    """Energy-diff fingerprints are prefix-stable: a recording with extra
    trailing content keeps its early windows' bits, unrelated audio lands
    far away; blocked pairing equals all-pairs."""
    from streamjoin_spark.operators.multimodal import audio_neardup_pairs

    base = "abcdefgh" * 40
    rows = [
        (1, base),
        (2, base + "XYZW" * 3),                # same prefix, longer tail
        (3, "zyxwvuts" * 40),                  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    kw = dict(bytes_per_window=4, n_bits=64, max_hamming=10)
    blocked = {(r["doc_a"], r["doc_b"]): r["hamming"]
               for r in audio_neardup_pairs(df, **kw).collect()}
    allp = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in audio_neardup_pairs(df, blocked=False, **kw).collect()}
    assert blocked == allp
    assert (1, 2) in blocked
    assert not any(3 in p for p in blocked)


def test_video_neardup_shared_frames(spark):
    """Frame-fingerprint matching: a trimmed copy (same frames, fewer)
    pairs with its original at the shared-frame count; the hot-frame cap
    drops universal boilerplate frames."""
    from streamjoin_spark.operators.multimodal import video_neardup_pairs

    seg = lambda tag: (tag * 80)[:64]          # one distinct 64-byte frame
    boiler = seg("Z")                          # frame shared by EVERYONE
    rows = [
        (1, boiler + seg("a") + seg("b") + seg("c")),
        (2, boiler + seg("a") + seg("b")),     # trimmed copy of 1
        (3, boiler + seg("x") + seg("y")),     # unrelated but same intro
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    kw = dict(frame_bytes=64, n_frames=8, min_shared=2)
    uncapped = {(r["doc_a"], r["doc_b"]): r["n_shared"]
                for r in video_neardup_pairs(
                    df, max_fp_df=None, **kw).collect()}
    assert uncapped[(1, 2)] == 3               # boiler + a + b
    # with the cap, the universal intro frame stops pairing strangers
    capped = {(r["doc_a"], r["doc_b"]): r["n_shared"]
              for r in video_neardup_pairs(df, max_fp_df=2, **kw).collect()}
    assert capped == {(1, 2): 2}               # a + b only; (1,3)/(2,3) gone


def test_audio_afp_row_local_matches_batch(spark):
    """audio_afp (row-local, the incremental pipeline's Arrow transform)
    is bit-identical to audio_fingerprint (batch, window-exploded +
    collect_list) across the law's edge shapes: multi-window, one-window,
    exact-multiple length, beyond-cap length, empty payload."""
    from streamjoin_spark.operators.multimodal import (
        audio_afp,
        audio_fingerprint,
    )

    rows = [
        (1, "abcdefgh" * 40),        # many full windows
        (2, "xy"),                   # single partial window
        (3, "abcd" * 4),             # exact window multiples
        (4, "q" * 4 * 40),           # longer than the (n_bits+1)-window cap
        (5, ""),                     # empty payload
        (6, "abcdefgh" * 40),        # byte-identical to 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    kw = dict(bytes_per_window=4, n_bits=16)
    batch = {r["doc_id"]: r["afp"]
             for r in audio_fingerprint(df, **kw).collect()}
    local = {r["doc_id"]: r["afp"] for r in audio_afp(df, **kw).collect()}
    assert local == batch
    assert local[1] == local[6]
    assert all(len(v) == 16 for v in local.values())


def test_ppjoin_pair_bound_dominated(spark):
    """Dominance theorem, empirically (VERDICT r4 #4, resolved as a proof):
    under the consistent global (df, shingle) token order, the PPJoin+
    aggregated pair-level positional bound is implied by the in-join
    per-occurrence positional filter — shared prefix tokens w1<…<wc have
    ranks a1 ≤ ac-(c-1), so the first surviving occurrence's bound
    1+min(|A|-a1,|B|-b1) ≥ c+min(|A|-ac,|B|-bc). Hence on a SIZE-VARIED
    corpus (the case the r4 verdict hypothesized the bound would bite on)
    every candidate surviving the join already passes the aggregate bound
    — it is structurally inert, and prefix_jaccard_pairs rightly omits it.
    Losslessness on the same mixed-length corpus re-pinned against brute
    force."""
    from streamjoin_spark.operators.dedup import (
        _ppjoin_candidates,
        _ppjoin_pair_bound,
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(24):
        # lengths vary 4..26 tokens: short docs, long docs, shared vocab
        ln = 4 + (i * 7) % 23
        toks = [words[(i + j) % len(words)] for j in range(ln)] + [f"u{i}"]
        rows.append((i, " ".join(toks)))
    rows.append((100, rows[2][1]))                    # exact dup, short doc
    rows.append((101, rows[3][1] + " tail tail2"))    # near dup, longer
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t = 0.5
    cands, _ = _ppjoin_candidates(
        docs, n=2, threshold=t, with_bound_cols=True
    )
    cands = cands.persist()
    n_all = cands.count()
    assert n_all > 0                                   # the fence is non-vacuous
    # the theorem: zero candidates are cut by the aggregate bound
    assert cands.where(~_ppjoin_pair_bound(t)).count() == 0

    brute = sorted(map(tuple, ngram_jaccard_pairs(
        docs, n=2, threshold=t, max_shingle_df=None).collect()))
    pp = sorted(map(tuple, prefix_jaccard_pairs(
        docs, n=2, threshold=t).collect()))
    assert pp == brute
    cands.unpersist()


def test_refined_centroids_k_bounded_and_dense(spark):
    """refined_centroids: Lloyd refinement keeps the coarse quantizer
    K-bounded with dense 0..K-1 ids (empty clusters drop), and the refined
    means equal a pure-Python rendition of the canonical-mean law."""
    import hashlib
    import random

    from streamjoin_spark.operators.similarity import refined_centroids

    rnd = random.Random(3)
    dim, K = 4, 3
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["cent_id"]: list(r["__cvec"])
           for r in refined_centroids(df, K, refine_iters=1).collect()}
    assert set(got) <= set(range(K)) and len(got) >= 1

    # python twin: md5-ordered seeds -> L2 assign (round 6, id tiebreak)
    # -> canonical FLOOR mean over per-component rounded decimal sums
    import struct
    from decimal import Decimal

    vec = {i: [struct.unpack("f", struct.pack("f", x))[0] for x in v]
           for i, v in rows}
    seeds = sorted(
        sorted(vec, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:K]
    )
    cents = {ci: vec[sid] for ci, sid in enumerate(seeds)}
    members = {}
    for i, v in vec.items():
        scored = sorted(
            (round(sum((a - b) * (a - b) for a, b in zip(v, c)), 6), ci)
            for ci, c in cents.items()
        )
        members.setdefault(scored[0][1], []).append(i)
    want = {}
    for ci, ids in members.items():
        mean = []
        for p in range(dim):
            tot = sum(Decimal(str(round(vec[i][p], 6))) for i in ids)
            import math

            mean.append(math.floor(float(tot) / len(ids) * 1e6) / 1e6)
        want[ci] = mean
    assert set(got) == set(want)
    for ci in want:
        assert got[ci] == pytest.approx(want[ci], abs=1e-9)


def test_winnow_fingerprints_matches_python_and_guarantee(spark):
    """Winnowing: (a) selections equal a pure-Python rendition of the law
    (k-gram hash64 rolling hashes, w-window rightmost-min), (b) the
    winnowing guarantee holds — two docs sharing a token run of length
    >= w + k - 1 share at least one selected fingerprint, (c) disjoint
    docs share none."""
    import hashlib

    from streamjoin_spark.operators.text import winnow_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta"      # 6 tokens = w+k-1
    rows = [
        (1, "aa bb cc " + shared + " dd ee"),
        (2, shared + " xx yy zz qq"),
        (3, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"),
        (4, "tiny doc"),                                  # < k tokens: empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def winnow_py(text):
        tk = [t for t in text.lower().strip().split() if t]
        hs = [h64(" ".join(tk[i:i + k])) for i in range(len(tk) - k + 1)] \
            if len(tk) >= k else []
        sel = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            rpos = w - 1 - win[::-1].index(m)            # rightmost min
            sel.add((j + rpos + 1, m))                   # 1-based pos
        return sel

    for i, text in rows:
        assert got.get(i, set()) == winnow_py(text), i
    fp1 = {fp for _, fp in got[1]}
    fp2 = {fp for _, fp in got[2]}
    fp3 = {fp for _, fp in got[3]}
    assert fp1 & fp2                                      # the guarantee
    assert not (fp1 & fp3) and not (fp2 & fp3)
    assert 4 not in got


def test_winnow_overlap_pairs_cap_and_threshold(spark):
    """Overlap pairs honor min_shared and the hot-fingerprint DF cap; the
    pair join is an equi-join on fp with a broadcast anti-join cap (plan
    shape shared with the ngram hot-shingle guard)."""
    from streamjoin_spark.operators.text import winnow_overlap_pairs

    boiler = "one two three four five six seven eight"   # in EVERY doc
    # docs 1+2 only; LONG shared run: the winnowing guarantee yields one
    # shared fingerprint per w+k-1 = 6 shared tokens, so ~14 tokens give
    # comfortably >= min_shared interior selections
    para = ("shared paragraph tokens appear here again and keep going "
            "with more shared words still")
    rows = [
        (1, boiler + " " + para + " tail1 a b c"),
        (2, para + " " + boiler + " other x y z"),
        (3, boiler + " completely different body d e f g h"),
        (4, boiler + " yet another unrelated body m n o p q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(k=3, w=4, min_shared=2)
    capped = {(r["doc_a"], r["doc_b"]) for r in
              winnow_overlap_pairs(df, max_fp_df=0.9, **kw).collect()}
    # boilerplate fps (df = 4 docs > 0.9*4) are dropped: only the real
    # shared-paragraph pair survives
    assert capped == {(1, 2)}
    uncapped = {(r["doc_a"], r["doc_b"]) for r in
                winnow_overlap_pairs(df, max_fp_df=None, **kw).collect()}
    assert (1, 2) in uncapped and len(uncapped) > 1      # boiler pairs back
    import re

    from .test_plans import plan_of

    p = plan_of(winnow_overlap_pairs(df, max_fp_df=0.9, **kw))
    assert "LeftAnti" in p
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[fp", p)
    # the only nested-loop allowed is the 1-row corpus-count broadcast
    assert "CartesianProduct" not in p


if _HAVE_HYP:

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from("a b c d e f g h".split()),
                min_size=1, max_size=14,
            ),
            min_size=2, max_size=6,
        ),
        kw=st.sampled_from([(2, 3), (3, 4), (4, 2)]),
    )
    def test_winnow_matches_python_truth(spark, docs, kw):
        """Property pin for the winnowing law: on random tiny corpora the
        Spark selections equal the pure-Python rendition (k-gram hash64
        rolling hashes, w-window rightmost-min) — any off-by-one in the
        window arithmetic, the ANSI guards, or the rightmost tiebreak
        shows up here."""
        import hashlib

        from streamjoin_spark.operators.text import winnow_fingerprints

        k, w = kw
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in winnow_fingerprints(df, k=k, w=w).collect():
            got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))

        def h64(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        for i, text in rows:
            tk = [t for t in text.lower().strip().split() if t]
            hs = ([h64(" ".join(tk[j:j + k]))
                   for j in range(len(tk) - k + 1)]
                  if len(tk) >= k else [])
            sel = set()
            for j in range(len(hs) - w + 1):
                win = hs[j:j + w]
                m = min(win)
                rpos = w - 1 - win[::-1].index(m)
                sel.add((j + rpos + 1, m))
            assert got.get(i, set()) == sel, (i, text)


def test_signature_pairs_hot_refinement_lossless(spark):
    """refine_over (multi-index-hashing second level): hot segment buckets
    re-block on complement-bit sub-segments — output must stay IDENTICAL
    to blocked=False all-pairs at every refinement threshold, including
    refine_over=0/1 (everything refined) and a corpus engineered to share
    one segment corpus-wide (the hot-bucket case the knob exists for)."""
    base = ("spark incremental engine maintains joined views over change "
            "feeds with bounded rewrites").split()
    rows = []
    for i in range(30):
        words = list(base)
        words[i % len(words)] = f"tok{i}"
        if i % 3 == 0:
            words.append(f"extra{i // 3}")
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for radius in (2, 4):
        allpairs = {(r["doc_a"], r["doc_b"], r["hamming"])
                    for r in dedup.simhash_pairs(
                        docs, max_hamming=radius, blocked=False).collect()}
        assert allpairs
        for cap in (0, 1, 5, 10_000):
            refined = {(r["doc_a"], r["doc_b"], r["hamming"])
                       for r in dedup.simhash_pairs(
                           docs, max_hamming=radius, refine_over=cap
                       ).collect()}
            assert refined == allpairs, (radius, cap)

    # synthetic fixed-width signatures with a CORPUS-WIDE shared segment
    # (worst hot bucket) + controlled far pairs
    import random

    rng = random.Random(13)
    sig_rows = []
    shared = "1010101010101"                       # 13 bits, segment 0 at h=4
    for i in range(40):
        rest = "".join(rng.choice("01") for _ in range(51))
        sig_rows.append((i, shared + rest))
    sigs = spark.createDataFrame(sig_rows, "doc_id long, s string")
    want = {(r["doc_a"], r["doc_b"], r["hamming"])
            for r in dedup.signature_pairs(
                sigs, id_col="doc_id", sig_col="s", n_bits=64,
                max_hamming=4, blocked=False).collect()}
    got = {(r["doc_a"], r["doc_b"], r["hamming"])
           for r in dedup.signature_pairs(
               sigs, id_col="doc_id", sig_col="s", n_bits=64,
               max_hamming=4, refine_over=8).collect()}
    assert got == want


def test_signature_pairs_auto_refinement(spark, monkeypatch):
    """refine_over="auto" (r7): the driver-side probe picks the rung.
    Cold corpora (no bucket past occupancy×diversity×mass) must produce
    the unrefined result; with the thresholds forced low the SAME corpus
    must engage the split plan and stay byte-identical; and a
    duplicate-cluster corpus (identical signatures — the measured 1.17×
    anti-win) must NOT engage even when occupancy and mass qualify,
    because the dup-ratio guard sees average multiplicity m/d ≫ the
    REFINE_AUTO_MAX_DUP_RATIO bound."""
    import random

    rng = random.Random(7)
    sig_rows = []
    shared = "1010101010101"  # segment 0 at h=4 over 64 bits
    base_tail = [rng.choice("01") for _ in range(51)]
    for i in range(12):  # near-dup cluster: flip bit i → pairwise hamming 2
        tail = list(base_tail)
        tail[i] = "1" if tail[i] == "0" else "0"
        sig_rows.append((i, shared + "".join(tail)))
    for i in range(12, 40):  # far docs: random tails
        sig_rows.append(
            (i, shared + "".join(rng.choice("01") for _ in range(51)))
        )
    sigs = spark.createDataFrame(sig_rows, "doc_id long, s string")
    want = {(r["doc_a"], r["doc_b"], r["hamming"])
            for r in dedup.signature_pairs(
                sigs, id_col="doc_id", sig_col="s", n_bits=64,
                max_hamming=4, refine_over=None).collect()}
    assert want
    # default thresholds: 40 docs qualify on nothing — cold path
    auto_cold = {(r["doc_a"], r["doc_b"], r["hamming"])
                 for r in dedup.signature_pairs(
                     sigs, id_col="doc_id", sig_col="s", n_bits=64,
                     max_hamming=4, refine_over="auto").collect()}
    assert auto_cold == want
    # force engagement: every threshold floored — the hot bucket (the
    # corpus-wide shared segment, occupancy 40, 40 distinct sigs) refines
    monkeypatch.setattr(dedup, "REFINE_AUTO_OCCUPANCY", 1)
    monkeypatch.setattr(dedup, "REFINE_AUTO_CANDIDATES", 1)
    hot_df = dedup.signature_pairs(
        sigs, id_col="doc_id", sig_col="s", n_bits=64,
        max_hamming=4, refine_over="auto")
    # the engaged plan is the cold∪hot split — a Union node pins it
    assert "Union" in hot_df._jdf.queryExecution().optimizedPlan().toString()
    auto_hot = {(r["doc_a"], r["doc_b"], r["hamming"])
                for r in hot_df.collect()}
    assert auto_hot == want
    # duplicate cluster: occupancy/mass huge, diversity 1 — must stay
    # cold (refinement cannot split identical signatures; the measured
    # anti-win case)
    dup = spark.createDataFrame(
        [(i, "1" * 64) for i in range(50)], "doc_id long, s string"
    )
    dup_pairs = dedup.signature_pairs(
        dup, id_col="doc_id", sig_col="s", n_bits=64,
        max_hamming=4, refine_over="auto",
    )
    assert "Union" not in (
        dup_pairs._jdf.queryExecution().optimizedPlan().toString()
    )
    # all 50×49/2 identical-signature pairs at hamming 0
    assert dup_pairs.where(F.col("hamming") == 0).count() == 50 * 49 // 2


def test_signature_cache_lifecycle(spark, monkeypatch):
    """r8 review finding: signature_pairs("auto") persists the block frame
    for the session; repeated calls in a long-lived service must not
    accumulate cached frames without bound. The registry holds at most
    _SIG_CACHE_LIMIT frames (older ones unpersist FIFO — safe: their
    plans just recompute), release_signature_caches() drops them all,
    and results are identical before and after release."""
    dedup.release_signature_caches()  # other tests may have left caches
    sigs = spark.createDataFrame(
        [(i, format(i * 2654435761 % (1 << 64), "064b")) for i in range(30)],
        "doc_id long, s string",
    )
    monkeypatch.setattr(dedup, "_SIG_CACHE_LIMIT", 3)
    dfs = [
        dedup.signature_pairs(
            sigs, id_col="doc_id", sig_col="s", n_bits=64,
            max_hamming=4, refine_over="auto",
        )
        for _ in range(5)
    ]
    # bounded: 5 calls, at most 3 cached frames alive
    assert len(dedup._SIG_CACHES) == 3
    assert all(b.is_cached for b in dedup._SIG_CACHES)
    want = {(r["doc_a"], r["doc_b"]) for r in dfs[0].collect()}

    released = dedup.release_signature_caches()
    assert released == 3
    assert dedup._SIG_CACHES == []
    # evicted/released plans still evaluate correctly (recompute)
    for df in dfs[1:]:
        assert {(r["doc_a"], r["doc_b"]) for r in df.collect()} == want


# ---------------------------------------------------------------- spread_scan


def test_spread_scan_parallelizes_undersplit_input(spark):
    """r12 input-skew guard: a single-partition input is repartitioned to
    defaultParallelism (hash layout on the key when given); an input
    already at >= par/2 partitions is returned UNCHANGED (same plan
    object — zero added exchanges at real scale)."""
    from pyspark.sql import functions as F
    from streamjoin_spark.operators.spread import spread_scan

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(0, 1000, 1, 1).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), "id").alias("text")
    )
    assert narrow.rdd.getNumPartitions() == 1
    out = spread_scan(narrow, "doc_id")
    assert out.rdd.getNumPartitions() == par
    # pure layout change: identical rows
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(1000))
    assert "hashpartitioning(doc_id" in out._jdf.queryExecution().executedPlan().toString()

    wide = spark.range(0, 1000, 1, par)
    assert spread_scan(wide, "id") is wide  # no-op, not even a new frame


def test_spread_scan_many_file_scan_skips_planning(spark, tmp_path):
    """r13 ADVICE fix: a scan already backed by >= 16*par files (the
    sound bound under split packing) early-exits via the analysis-only
    inputFiles() listing — same object back, no physical-plan compile."""
    from streamjoin_spark.operators.spread import spread_scan

    par = spark.sparkContext.defaultParallelism
    n_files = 16 * par
    path = str(tmp_path / "many_files")
    spark.range(0, n_files, 1, n_files).write.parquet(path)
    scan = spark.read.parquet(path)
    assert len(scan.inputFiles()) >= n_files
    assert spread_scan(scan, "id") is scan


def test_minhash_lsh_star_edges_connectivity_matches_pairs(spark):
    """r12 CC-feed rewrite: star edges (bucket-min -> member) must induce
    exactly the same connected components as the all-pairs bucket output —
    the equivalence dedup_clusters/_star rely on."""
    from pyspark.sql import functions as F
    from streamjoin_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
        minhash_lsh_star_edges,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta{i % 7} eta theta") for i in range(40)]
        + [(100 + i, f"totally different text number {i} with words unique{i}") for i in range(10)],
        "doc_id long, text string",
    )
    a = connected_components(minhash_lsh_pairs(docs))
    b = connected_components(minhash_lsh_star_edges(docs))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # star edges never exceed the pair count and carry the bucket min left
    e = minhash_lsh_star_edges(docs)
    assert e.where(F.col("doc_a") >= F.col("doc_b")).count() == 0

"""Incremental maintenance of the corpus dedup operators through the IVM
runtime (VERDICT r3 #3), via the packaged pipeline builders
(streamjoin_spark/pipelines.py): a documents table under CDC (insert /
text-update / delete) keeps its exact-dedup groups and its MinHash-LSH
candidate-pair table continuously converged to the batch twin, without
full recomputation.

The MinHash leg uses the package's PER-ROW band transform
(pipelines.minhash_band_rows — same hash law as
operators/dedup.minhash_signatures, just row-local): change images
transform independently (a cross-row groupBy transform would merge pre-
and post-images of one doc into a garbage signature and break the probe
leg's old-partner discovery).
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.operators import dedup
from streamjoin_spark.pipelines import (
    incremental_exact_dedup,
    incremental_minhash_pairs,
    minhash_band_rows,
)

from .test_incremental import assert_same

DOC = "doc_id long, text string"

NUM_HASHES = 6
BAND_SIZE = 2
SHINGLE_N = 2


@pytest.fixture()
def docs_ct(spark, tmp_path):
    return ChangeTable.create(
        spark, str(tmp_path / "docs"),
        spark.createDataFrame([], DOC).schema, ["doc_id"],
    )


def d_rows(spark, rows):
    return spark.createDataFrame(rows, DOC)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def test_incremental_exact_dedup_maintained(spark, tmp_path, docs_ct):
    w = incremental_exact_dedup(docs_ct, str(tmp_path / "exact"))

    docs_ct.merge(d_rows(spark, [
        (1, "the cat sat"), (2, "The  cat SAT"),        # same content group
        (3, "a different doc"), (4, "unique text here"),
    ]))
    w.run()
    assert_same(w.toDF(), dedup.exact_dedup(docs_ct.snapshot()))
    # min(doc_id) is non-additive: keep_id must be the group min
    got = {r["content_md5"]: (r["keep_id"], r["n_copies"])
           for r in w.toDF().collect()}
    assert (1, 2) in got.values()

    # text update MOVES doc 2 between content groups; delete shrinks one
    docs_ct.merge(d_rows(spark, [(2, "a different doc")]))
    docs_ct.delete_where("doc_id = 4")
    w.run()
    assert_same(w.toDF(), dedup.exact_dedup(docs_ct.snapshot()))

    # deleting the group min re-elects keep_id (dirty-group recompute)
    docs_ct.delete_where("doc_id = 2")
    docs_ct.merge(d_rows(spark, [(9, "the cat sat"), (0, "the cat sat")]))
    w.run()
    assert_same(w.toDF(), dedup.exact_dedup(docs_ct.snapshot()))


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs
# ---------------------------------------------------------------------------
def test_band_rows_match_aggregated_signatures(spark):
    """The row-local band transform must bucket identically to the
    aggregated minhash_signatures path — duplicates in the raw shingle
    array cannot change a min."""
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y z x y")], DOC
    )
    rowwise = {
        (r["doc_id"], r["band"], r["bh"])
        for r in minhash_band_rows(
            docs, num_hashes=NUM_HASHES, band_size=BAND_SIZE,
            shingle_n=SHINGLE_N,
        ).collect()
    }
    # aggregated path: signatures -> same banding arithmetic
    sigs = dedup.minhash_signatures(
        docs, num_hashes=NUM_HASHES, shingle_n=SHINGLE_N
    )
    n_bands = NUM_HASHES // BAND_SIZE
    structs = [
        F.struct(
            F.lit(bnd).alias("band"),
            F.md5(F.concat_ws(
                ",", *[f"h{bnd * BAND_SIZE + j}" for j in range(BAND_SIZE)]
            )).alias("bh"),
        )
        for bnd in range(n_bands)
    ]
    agg = {
        (r["doc_id"], r["x"]["band"], r["x"]["bh"])
        for r in sigs.select(
            "doc_id", F.explode(F.array(*structs)).alias("x")
        ).collect()
    }
    assert rowwise == agg


def make_pairs_writer(docs_ct, path):
    return incremental_minhash_pairs(
        docs_ct, str(path),
        num_hashes=NUM_HASHES, band_size=BAND_SIZE, shingle_n=SHINGLE_N,
    )


def batch_pairs(docs_ct):
    return dedup.minhash_lsh_pairs(
        docs_ct.snapshot(), num_hashes=NUM_HASHES,
        band_size=BAND_SIZE, shingle_n=SHINGLE_N,
    )


def check_pairs(w, docs_ct):
    got = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    want = {(r["doc_a"], r["doc_b"]) for r in batch_pairs(docs_ct).collect()}
    assert got == want, f"only-inc={got - want} only-batch={want - got}"


def test_incremental_minhash_pairs_maintained(spark, tmp_path, docs_ct):
    w = make_pairs_writer(docs_ct, tmp_path / "pairs")

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs_ct.merge(d_rows(spark, [
        (1, base),
        (2, base + " tail"),                       # near-dup of 1
        (3, "completely unrelated words in this document body"),
        (4, base),                                 # exact dup of 1
    ]))
    w.run()
    check_pairs(w, docs_ct)
    got = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (1, 4) in got                           # exact dups always pair

    # update: doc 2 rewritten to unrelated text → its pairs must retract
    docs_ct.merge(d_rows(spark, [(2, "totally new text with nothing shared at all")]))
    w.run()
    check_pairs(w, docs_ct)

    # insert a new near-dup; delete an old member of a pair
    docs_ct.merge(d_rows(spark, [(5, base + " extra")]))
    docs_ct.delete_where("doc_id = 4")
    w.run()
    check_pairs(w, docs_ct)


# ---------------------------------------------------------------------------
# per-source corpus stats (quality classifier + additive sums)
# ---------------------------------------------------------------------------
DOCS = "doc_id long, text string, source string"


def test_incremental_corpus_stats_maintained(spark, tmp_path):
    """incremental_corpus_stats converges to the batch twin
    (hashed_classifier_score + groupBy(source) sums) under insert /
    text-update / source-move / delete, and insert-only batches ride the
    additive fast path."""
    from streamjoin_spark.operators.text import hashed_classifier_score
    from streamjoin_spark.pipelines import incremental_corpus_stats

    ct = ChangeTable.create(
        spark, str(tmp_path / "docs3"),
        spark.createDataFrame([], DOCS).schema, ["doc_id"],
    )
    w = incremental_corpus_stats(ct, str(tmp_path / "qstats"), n_buckets=16)

    def twin():
        return (
            hashed_classifier_score(
                ct.snapshot(), n_buckets=16, extra_cols=["source"]
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
            )
        )

    rows = lambda data: spark.createDataFrame(data, DOCS)
    ct.merge(rows([
        (1, "the cat sat on the mat", "web"),
        (2, "quarterly spark earnings report", "news"),
        (3, "", "web"),                      # empty doc scores exactly bias
        (4, "unique snowflake text", "web"),
    ]))
    w.run()
    assert w.pipeline.stages[-1].additive is True   # pure sum/count aggs
    assert_same(w.toDF(), twin())

    # text update changes token count + keep; source move shifts groups;
    # delete shrinks; a brand-new source group appears
    ct.merge(rows([
        (1, "rewritten much longer cat text with many more tokens", "web"),
        (4, "unique snowflake text", "forum"),
        (5, "fresh insert", "news"),
    ]))
    ct.delete_where("doc_id = 2")
    w.run()
    assert_same(w.toDF(), twin())

    # group-vanish: delete the only forum doc
    ct.delete_where("doc_id = 4")
    w.run()
    assert_same(w.toDF(), twin())


# ---------------------------------------------------------------------------
# inverted-index term stats (BM25 backbone)
# ---------------------------------------------------------------------------
def test_incremental_term_stats_maintained(spark, tmp_path):
    """incremental_term_stats converges to the batch twin (explode +
    groupBy(token)) under insert / rewrite / delete; a rewritten doc's
    pre-image terms retract and its post-image terms appear."""
    from streamjoin_spark.functions import tokens
    from streamjoin_spark.pipelines import incremental_term_stats

    ct = ChangeTable.create(
        spark, str(tmp_path / "docs4"),
        spark.createDataFrame([], DOC).schema, ["doc_id"],
    )
    w = incremental_term_stats(ct, str(tmp_path / "terms"))

    def twin():
        return (
            ct.snapshot()
            .select("doc_id", F.explode(
                F.filter(tokens(F.col("text")), lambda t: t != "")
            ).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df_docs"), F.sum("tf").alias("cf"))
        )

    ct.merge(d_rows(spark, [
        (1, "spark joins spark streams"),
        (2, "streams of change data"),
        (3, "spark"),
    ]))
    w.run()
    assert w.pipeline.stages[-1].additive is True
    assert_same(w.toDF(), twin())
    got = {r["token"]: (r["df_docs"], r["cf"]) for r in w.toDF().collect()}
    assert got["spark"] == (2, 3)      # docs 1 (tf=2) and 3 (tf=1)

    # rewrite doc 1 (drops 'joins', adds 'engine'), delete doc 2
    ct.merge(d_rows(spark, [(1, "spark engine")]))
    ct.delete_where("doc_id = 2")
    w.run()
    assert_same(w.toDF(), twin())
    got = {r["token"]: (r["df_docs"], r["cf"]) for r in w.toDF().collect()}
    assert "joins" not in got and "of" not in got
    assert got["spark"] == (2, 2)


# ---------------------------------------------------------------------------
# IVF inverted lists (streaming ANN index maintenance)
# ---------------------------------------------------------------------------
def test_incremental_ivf_lists_maintained(spark, tmp_path):
    """incremental_ivf_lists keeps every vector's nearest-centroid
    assignment converged under CDC: inserts index themselves, a re-embedded
    vector MOVES between lists, deletes vanish."""
    import random

    from streamjoin_spark.pipelines import (
        incremental_ivf_lists,
        sampled_centroids,
    )

    rnd = random.Random(5)
    VEC = "vec_id long, embedding array<float>"
    dim = 8

    def vrows(data):
        return spark.createDataFrame(data, VEC)

    ct = ChangeTable.create(
        spark, str(tmp_path / "vecs"),
        spark.createDataFrame([], VEC).schema, ["vec_id"],
    )
    base = [(i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(30)]
    ct.merge(vrows(base))
    cents = sampled_centroids(ct.snapshot(), n_centroids=3)
    # the fixed-K law: the 3 lowest-md5(id) rows, returned sorted by id
    import hashlib

    expect_ids = sorted(
        sorted(range(30), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
    )
    assert [c for c, _ in cents] == expect_ids

    w = incremental_ivf_lists(ct, str(tmp_path / "ivf"), cents)
    w.run()

    def batch_assign():
        # independent python reference for the nearest-centroid assignment
        import math

        out = []
        snap = {r["vec_id"]: list(r["embedding"])
                for r in ct.snapshot().collect()}
        for vid, v in snap.items():
            v = [float(x) for x in v]
            vn = math.sqrt(sum(x * x for x in v))
            best, best_s = None, None
            for cid, cw in cents:
                nrm = math.sqrt(sum(x * x for x in cw))
                s = sum(x * y for x, y in zip(v, cw)) / (vn * nrm)
                if best_s is None or s > best_s:
                    best, best_s = cid, s
            out.append((vid, best))
        return dict(out)

    got = {r["vec_id"]: r["cent_id"] for r in w.toDF().collect()}
    assert got == batch_assign()

    # move vector 7 onto the last centroid's exact embedding; delete 3;
    # insert 99
    last_cid = cents[-1][0]
    target = dict(cents)[last_cid]
    ct.merge(vrows([(7, target), (99, [0.5] * dim)]))
    ct.delete_where("vec_id = 3")
    w.run()
    got = {r["vec_id"]: r["cent_id"] for r in w.toDF().collect()}
    assert got == batch_assign()
    assert got[7] == last_cid and 3 not in got and 99 in got


# ---------------------------------------------------------------------------
# passage-granular dedup state
# ---------------------------------------------------------------------------
def test_incremental_passage_dedup_maintained(spark, tmp_path, docs_ct):
    """incremental_passage_dedup keeps first-global-occurrence passage
    survivorship converged under CDC: a rewrite retracts old passages,
    deleting the keeper re-elects the next copy."""
    from streamjoin_spark.pipelines import (
        incremental_passage_dedup,
        passage_rows,
    )

    P = 3
    w = incremental_passage_dedup(
        docs_ct, str(tmp_path / "pass"), passage_tokens=P
    )

    def twin():
        return (
            passage_rows(docs_ct.snapshot(), passage_tokens=P)
            .groupBy("passage_md5")
            .agg(
                F.min(F.struct(F.col("doc_id"), F.col("pos")))["doc_id"]
                .alias("keep_doc"),
                F.min(F.struct(F.col("doc_id"), F.col("pos")))["pos"]
                .alias("keep_pos"),
                F.count(F.lit(1)).alias("n_copies"),
            )
        )

    boiler = "subscribe to our list"          # shared 3-token-ish tail
    docs_ct.merge(d_rows(spark, [
        (1, f"alpha beta gamma {boiler}"),
        (2, f"delta epsilon zeta {boiler}"),   # repeats doc 1's tail window
        (3, "unique words only here"),
    ]))
    w.run()
    assert_same(w.toDF(), twin())
    # the shared passage survives at its first occurrence (doc 1)
    shared = [r for r in w.toDF().collect() if r["n_copies"] > 1]
    assert shared and all(r["keep_doc"] == 1 for r in shared)

    # delete the keeper: survivorship re-elects doc 2's copy
    docs_ct.delete_where("doc_id = 1")
    w.run()
    assert_same(w.toDF(), twin())
    shared_after = {r["passage_md5"]: r for r in w.toDF().collect()}
    for r in shared:
        nxt = shared_after.get(r["passage_md5"])
        assert nxt is not None and nxt["keep_doc"] == 2

    # rewrite doc 2 away from the shared tail: passage count shrinks
    docs_ct.merge(d_rows(spark, [(2, "completely different body now")]))
    w.run()
    assert_same(w.toDF(), twin())


# ---------------------------------------------------------------------------
# image near-dup pairs (perceptual hashes)
# ---------------------------------------------------------------------------
def test_incremental_image_pairs_maintained(spark, tmp_path):
    """incremental_image_pairs converges to the batch twin
    (multimodal.image_neardup_pairs) under image ingest / re-encode /
    delete; re-encoding an image away from its twin retracts the pair."""
    from streamjoin_spark.operators.multimodal import image_neardup_pairs
    from streamjoin_spark.pipelines import incremental_image_pairs

    IMG = "doc_id long, payload binary"
    ct = ChangeTable.create(
        spark, str(tmp_path / "imgs"),
        spark.createDataFrame([], IMG).schema, ["doc_id"],
    )

    def irows(data):
        return spark.createDataFrame(
            [(i, t.encode()) for i, t in data], IMG
        )

    def twin():
        return image_neardup_pairs(ct.snapshot(), max_hamming=6)

    def check(w):
        got = {(r["doc_a"], r["doc_b"], r["hamming"])
               for r in w.toDF().collect()}
        want = {(r["doc_a"], r["doc_b"], r["hamming"])
                for r in twin().collect()}
        assert got == want, f"only-inc={got - want} only-batch={want - got}"

    w = incremental_image_pairs(
        ct, str(tmp_path / "ipairs"), max_hamming=6
    )
    base = "the quick brown fox jumps over the lazy dog " * 4
    ct.merge(irows([
        (1, base),
        (2, base.replace("lazy", "hazy", 1)),    # near-dup of 1
        (3, "entirely different content with other words " * 4),
    ]))
    w.run()
    check(w)
    assert {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()} == {(1, 2)}

    # re-encode 2 away from 1 -> pair retracts; new near-dup of 3 appears
    ct.merge(irows([
        (2, "now totally unrelated to everything else " * 4),
        (4, ("entirely different content with other words " * 4)
            .replace("other", "OTHER", 1).lower()),
    ]))
    w.run()
    check(w)

    # delete one member of the surviving pair
    ct.delete_where("doc_id = 4")
    w.run()
    check(w)


# ---------------------------------------------------------------------------
# SimHash near-dup pairs
# ---------------------------------------------------------------------------
def test_simhash_segment_rows_match_batch_signature(spark):
    """The row-local simhash must equal the batch explode+groupBy
    signature bit-for-bit (same ±1 multiset sums)."""
    from streamjoin_spark.pipelines import simhash_segment_rows

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x  y z"), (3, "   ")], DOC
    )
    rowwise = {r["doc_id"]: r["sh"] for r in simhash_segment_rows(docs)
               .select("doc_id", "sh").distinct().collect()}
    batch = {r["doc_id"]: r["simhash"]
             for r in dedup.simhash(docs).collect()}
    assert rowwise == batch        # doc 3 (no tokens) absent from both


def test_incremental_simhash_pairs_maintained(spark, tmp_path, docs_ct):
    """incremental_simhash_pairs converges to dedup.simhash_pairs under
    insert / rewrite / delete."""
    from streamjoin_spark.pipelines import incremental_simhash_pairs

    w = incremental_simhash_pairs(
        docs_ct, str(tmp_path / "shpairs"), max_hamming=6
    )

    def check():
        got = {(r["doc_a"], r["doc_b"], r["hamming"])
               for r in w.toDF().collect()}
        want = {(r["doc_a"], r["doc_b"], r["hamming"])
                for r in dedup.simhash_pairs(
                    docs_ct.snapshot(), max_hamming=6).collect()}
        assert got == want, f"only-inc={got - want} only-batch={want - got}"

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs_ct.merge(d_rows(spark, [
        (1, base),
        (2, base + " tail"),
        (3, "completely unrelated words in this document body"),
        (4, base),
    ]))
    w.run()
    check()
    assert any(r["hamming"] == 0 for r in w.toDF().collect())  # exact dup

    docs_ct.merge(d_rows(spark, [(2, "rewritten into something far away entirely")]))
    docs_ct.delete_where("doc_id = 4")
    w.run()
    check()


# ---------------------------------------------------------------------------
# audio near-dup pairs (energy-diff fingerprints)
# ---------------------------------------------------------------------------
def test_incremental_audio_pairs_maintained(spark, tmp_path):
    """incremental_audio_pairs converges to the batch twin
    (multimodal.audio_neardup_pairs) under ingest / re-master / delete:
    the row-local audio_afp transform keeps pre-/post-images separate, so
    a re-mastered recording retracts its old pairs exactly."""
    from streamjoin_spark.operators.multimodal import audio_neardup_pairs
    from streamjoin_spark.pipelines import incremental_audio_pairs

    AUD = "doc_id long, payload binary"
    ct = ChangeTable.create(
        spark, str(tmp_path / "auds"),
        spark.createDataFrame([], AUD).schema, ["doc_id"],
    )

    def arows(data):
        return spark.createDataFrame(
            [(i, t.encode()) for i, t in data], AUD
        )

    KW = dict(bytes_per_window=4, n_bits=16, max_hamming=3)

    def twin():
        return audio_neardup_pairs(ct.snapshot(), **KW)

    def check(w):
        got = {(r["doc_a"], r["doc_b"], r["hamming"])
               for r in w.toDF().collect()}
        want = {(r["doc_a"], r["doc_b"], r["hamming"])
                for r in twin().collect()}
        assert got == want, f"only-inc={got - want} only-batch={want - got}"

    w = incremental_audio_pairs(ct, str(tmp_path / "apairs"), **KW)
    base = "abcdefgh" * 10                      # 20 windows of 4 bytes
    tweaked = base[:8] + "QQQQ" + base[12:]     # one window re-recorded
    ct.merge(arows([
        (1, base),
        (2, tweaked),                           # near-dup of 1 (≤2 bits)
        (3, "zyxwvuts" * 10),                   # unrelated
    ]))
    w.run()
    check(w)
    assert (1, 2) in {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}

    # re-master 2 away from 1 -> pair retracts; exact copy of 3 appears
    ct.merge(arows([
        (2, "totally different sound " * 4),
        (4, "zyxwvuts" * 10),
    ]))
    w.run()
    check(w)
    pairs = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (1, 2) not in pairs and (3, 4) in pairs

    # delete one member of the surviving pair
    ct.delete_where("doc_id = 4")
    w.run()
    check(w)


# ---------------------------------------------------------------------------
# video near-dup pairs (shared frame fingerprints)
# ---------------------------------------------------------------------------
def test_incremental_video_pairs_maintained(spark, tmp_path):
    """incremental_video_pairs converges to the batch twin
    (multimodal.video_neardup_pairs with the corpus-global hot-frame cap
    off) under ingest / re-edit / delete; a pair dropping below
    min_shared retracts via the post-agg filter + scope-diff."""
    from streamjoin_spark.operators.multimodal import video_neardup_pairs
    from streamjoin_spark.pipelines import incremental_video_pairs

    VID = "doc_id long, payload binary"
    ct = ChangeTable.create(
        spark, str(tmp_path / "vids"),
        spark.createDataFrame([], VID).schema, ["doc_id"],
    )

    def vrows(data):
        return spark.createDataFrame(
            [(i, t.encode()) for i, t in data], VID
        )

    seg = lambda tag: (tag * 80)[:64]           # one distinct 64-byte frame
    KW = dict(frame_bytes=64, n_frames=8, min_shared=2)

    def twin():
        return video_neardup_pairs(ct.snapshot(), max_fp_df=None, **KW)

    def check(w):
        got = {(r["doc_a"], r["doc_b"], r["n_shared"])
               for r in w.toDF().collect()}
        want = {(r["doc_a"], r["doc_b"], r["n_shared"])
                for r in twin().collect()}
        assert got == want, f"only-inc={got - want} only-batch={want - got}"

    w = incremental_video_pairs(ct, str(tmp_path / "vpairs"), **KW)
    ct.merge(vrows([
        (1, seg("a") + seg("b") + seg("c")),
        (2, seg("a") + seg("b")),               # trimmed copy of 1
        (3, seg("x") + seg("y")),               # unrelated
    ]))
    w.run()
    check(w)
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in w.toDF().collect()}
    assert got == {(1, 2): 2}

    # re-edit 2: one shared frame left -> drops below min_shared, retracts;
    # a new two-frame overlap with 3 appears
    ct.merge(vrows([
        (2, seg("a") + seg("q")),
        (4, seg("x") + seg("y") + seg("w")),
    ]))
    w.run()
    check(w)
    pairs = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (1, 2) not in pairs and (3, 4) in pairs

    ct.delete_where("doc_id = 3")
    w.run()
    check(w)


# ---------------------------------------------------------------------------
# depth-3 chained maintained views: view -> pairs -> cluster assignment
# ---------------------------------------------------------------------------
def test_incremental_dedup_chain_depth3(spark, tmp_path, docs_ct):
    """incremental_dedup_chain keeps a 3-stage curation chain converged
    under CDC, every stage consuming the PREVIOUS maintained table's
    change feed: fingerprint view -> exact-dup pairs -> one-hop cluster
    assignment. Each stage is compared to its own batch twin computed
    from the docs snapshot after every round of changes."""
    from streamjoin_spark.functions import normalize_text, token_count
    from streamjoin_spark.pipelines import incremental_dedup_chain

    chain = incremental_dedup_chain(docs_ct, str(tmp_path / "chain"))

    def view_twin():
        return docs_ct.snapshot().select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.md5(normalize_text(F.col("text"))).alias("fp"),
        )

    def pairs_twin():
        v = view_twin()
        a = v.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"))
        b = v.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"))
        return a.join(
            b, (a["fp_a"] == b["fp_b"]) & (a["doc_a"] < b["doc_b"])
        ).select("doc_a", "doc_b", "fp_a")

    def assign_twin():
        p = pairs_twin()
        return (
            p.select(
                F.explode(F.array("doc_a", "doc_b")).alias("member"),
                F.col("doc_a").alias("label"),
            )
            .groupBy("member")
            .agg(F.min("label").alias("cluster"))
        )

    def check():
        assert_same(chain.view.toDF(), view_twin())
        assert_same(chain.pairs.toDF(), pairs_twin())
        assert_same(chain.assign.toDF(), assign_twin())

    docs_ct.merge(d_rows(spark, [
        (1, "the cat sat"), (2, "The  CAT sat"),     # dup group {1,2}
        (3, "other words"), (4, "other words"),       # dup group {3,4}
        (5, "a singleton document"),
    ]))
    chain.run()
    check()
    got = {r["member"]: r["cluster"] for r in chain.assign.toDF().collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}            # singletons carry no row

    # rewrite 2 into group {3,4}: pairs retract + register through the
    # chain; cluster of 2 moves
    docs_ct.merge(d_rows(spark, [(2, "other words")]))
    chain.run()
    check()
    got = {r["member"]: r["cluster"] for r in chain.assign.toDF().collect()}
    assert got == {2: 2, 3: 2, 4: 2}                   # 1 now a singleton

    # delete the group min: assignment re-elects through the agg recompute
    docs_ct.delete_where("doc_id = 2")
    docs_ct.merge(d_rows(spark, [(6, "the cat sat")]))
    chain.run()
    check()
    got = {r["member"]: r["cluster"] for r in chain.assign.toDF().collect()}
    assert got == {3: 3, 4: 3, 1: 1, 6: 1}


# ---------------------------------------------------------------------------
# MOSS winnowing overlap pairs
# ---------------------------------------------------------------------------
def test_incremental_winnow_pairs_maintained(spark, tmp_path, docs_ct):
    """incremental_winnow_pairs converges to the batch twin
    (text.winnow_overlap_pairs with the corpus-global cap off) under
    insert / paragraph-edit / delete: a rewritten document's selections
    retract, overlap pairs follow the shared paragraphs."""
    from streamjoin_spark.operators.text import winnow_overlap_pairs
    from streamjoin_spark.pipelines import incremental_winnow_pairs

    KW = dict(k=3, w=4, min_shared=2)

    def twin():
        return winnow_overlap_pairs(
            docs_ct.snapshot(), max_fp_df=None, **KW
        )

    def check(w):
        got = {(r["doc_a"], r["doc_b"], r["n_shared"])
               for r in w.toDF().collect()}
        want = {(r["doc_a"], r["doc_b"], r["n_shared"])
                for r in twin().collect()}
        assert got == want, f"only-inc={got - want} only-batch={want - got}"

    w = incremental_winnow_pairs(docs_ct, str(tmp_path / "wpairs"), **KW)
    para = ("shared paragraph tokens appear here again and keep going "
            "with more shared words still")
    docs_ct.merge(d_rows(spark, [
        (1, "intro words first " + para + " tail one two"),
        (2, para + " different ending here entirely"),
        (3, "unrelated body of text with its own private words only"),
    ]))
    w.run()
    check(w)
    assert (1, 2) in {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}

    # edit 2's shared paragraph away -> pair retracts; new doc shares
    # with 3
    docs_ct.merge(d_rows(spark, [
        (2, "completely rewritten content with nothing in common anymore"),
        (4, "unrelated body of text with its own private words only plus"),
    ]))
    w.run()
    check(w)
    pairs = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (1, 2) not in pairs and (3, 4) in pairs

    docs_ct.delete_where("doc_id = 3")
    w.run()
    check(w)


def test_incremental_sessions_maintained(spark, tmp_path):
    """incremental_sessions converges to the batch sessionize twin under
    the moves that break streaming session windows: a LATE event bridging
    (merging) two sessions, a timestamp edit splitting one, and a delete
    shifting every later boundary — all handled by dirty-group recompute
    on the touched users only."""
    from pyspark.sql.window import Window

    from streamjoin_spark.pipelines import incremental_sessions

    EV = "event_id long, user_id long, ts double, value double"
    ct = ChangeTable.create(
        spark, str(tmp_path / "ev"),
        spark.createDataFrame([], EV).schema, ["event_id"],
    )
    w = incremental_sessions(
        ct, str(tmp_path / "sess"), ts_col="ts", gap_seconds=1800.0
    )

    def twin():
        ev = ct.snapshot()
        win = Window.partitionBy("user_id").orderBy(
            F.asc("ts"), F.asc("event_id")
        )
        gap = F.col("ts") - F.lag("ts").over(win)
        sess = ev.withColumn(
            "ns", F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
        ).withColumn(
            "sid",
            F.sum("ns").over(
                win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return sess.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("sid").cast("int").alias("n_sessions"),
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double").alias("total_value"),
        )

    rows = lambda data: spark.createDataFrame(data, EV)
    # user 1: two sessions (gap 2500 s); user 2: one session
    ct.merge(rows([
        (10, 1, 1000.0, 1.0), (11, 1, 1500.0, 2.0),
        (12, 1, 4000.0, 3.0), (13, 1, 4300.0, 4.0),
        (20, 2, 500.0, 5.0),
    ]))
    w.run()
    assert_same(
        w.toDF().select("user_id", "n_events", "n_sessions", "total_value"),
        twin(),
    )

    # late event at 2900 s BRIDGES user 1's sessions (within 1800 s of
    # both 1500 and 4000): 2 sessions merge into 1 — the case watermarked
    # streaming session windows get wrong
    ct.merge(rows([(14, 1, 2900.0, 0.5)]))
    w.run()
    got = {r["user_id"]: r for r in w.toDF().collect()}
    assert got[1]["n_sessions"] == 1 and got[1]["n_events"] == 5
    assert_same(
        w.toDF().select("user_id", "n_events", "n_sessions", "total_value"),
        twin(),
    )

    # ts edit SPLITS again (bridge event moves far out), delete shifts
    # boundaries, new user appears
    ct.merge(rows([(14, 1, 99000.0, 0.5)]))
    ct.delete_where("event_id = 11")
    ct.merge(rows([(30, 3, 42.0, 9.0)]))
    w.run()
    got = {r["user_id"]: r for r in w.toDF().collect()}
    assert got[1]["n_sessions"] == 3          # (1000), (4000,4300), (99000)
    assert_same(
        w.toDF().select("user_id", "n_events", "n_sessions", "total_value"),
        twin(),
    )

    # user vanishes entirely
    ct.delete_where("user_id = 2")
    w.run()
    assert_same(
        w.toDF().select("user_id", "n_events", "n_sessions", "total_value"),
        twin(),
    )


def test_rebuild_every_applies_corpus_global_cap(spark, tmp_path, docs_ct):
    """rebuild_every=N (RebuildingWriter): between rebuilds the maintained
    pair table is exact/uncapped; when a fingerprint crosses the
    corpus-global hot cap (max_fp_df), the scheduled rebuild reconciles
    the table to the CAPPED batch twin through one compensating commit —
    the convergence the capped semantics cannot get from bounded
    incremental slices (VERDICT r5 #7)."""
    from streamjoin_spark.operators.text import winnow_overlap_pairs
    from streamjoin_spark.pipelines import (
        RebuildingWriter,
        incremental_winnow_pairs,
    )

    KW = dict(k=3, w=4, min_shared=1)
    CAP = 3  # absolute DF cap: fp in >3 docs is "boilerplate"
    w = incremental_winnow_pairs(
        docs_ct, str(tmp_path / "wpairs"), rebuild_every=3, max_fp_df=CAP,
        **KW,
    )
    assert isinstance(w, RebuildingWriter)

    boiler = "common boilerplate paragraph repeated across documents often"
    docs_ct.merge(d_rows(spark, [          # v1: fp df == 2, under the cap
        (1, boiler + " alpha unique tail one"),
        (2, boiler + " beta unique tail two"),
    ]))
    w.run()                                # no rebuild yet (head 1 < 3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (1, 2) in pairs                 # uncapped between rebuilds

    # v2..v3: the fingerprint crosses the cap (df=4 > 3)
    docs_ct.merge(d_rows(spark, [(3, boiler + " gamma unique tail three")]))
    docs_ct.merge(d_rows(spark, [(4, boiler + " delta unique tail four")]))
    w.run()                                # head 3 -> scheduled rebuild fires

    def capped_twin():
        return winnow_overlap_pairs(
            docs_ct.snapshot(), max_fp_df=CAP, **KW
        )

    got = {(r["doc_a"], r["doc_b"], r["n_shared"]) for r in w.toDF().collect()}
    want = {(r["doc_a"], r["doc_b"], r["n_shared"])
            for r in capped_twin().collect()}
    assert got == want, f"only-inc={got - want} only-batch={want - got}"
    # the cap actually BIT: the capped law drops pairs the uncapped
    # maintained state carried (the corpus-wide retraction a bounded
    # incremental slice cannot express)
    uncapped = {(r["doc_a"], r["doc_b"], r["n_shared"])
                for r in winnow_overlap_pairs(
                    docs_ct.snapshot(), max_fp_df=None, **KW).collect()}
    assert got < uncapped, (got, uncapped)

    # post-rebuild CDC keeps converging (to the UNCAPPED law) and the next
    # rebuild re-applies the cap without drift
    docs_ct.merge(d_rows(spark, [
        (5, "fresh pairwise content shared here exactly"),
        (6, "fresh pairwise content shared here exactly plus tail"),
    ]))
    w.run()
    pairs = {(r["doc_a"], r["doc_b"]) for r in w.toDF().collect()}
    assert (5, 6) in pairs
    w.rebuild()                            # operator-initiated rebuild
    got = {(r["doc_a"], r["doc_b"], r["n_shared"]) for r in w.toDF().collect()}
    want = {(r["doc_a"], r["doc_b"], r["n_shared"])
            for r in capped_twin().collect()}
    assert got == want

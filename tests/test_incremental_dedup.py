"""Incremental maintenance of the corpus dedup operators through the IVM
runtime (VERDICT r3 #3): the product story this engine is uniquely placed
for — a documents table under CDC (insert / text-update / delete) keeps its
exact-dedup groups and its MinHash-LSH candidate-pair table continuously
converged to the batch twin, without full recomputation.

The MinHash leg uses a PER-ROW band transform (array_min over the row's own
shingles — same hash law as operators/dedup.minhash_signatures, just
row-local): change images transform independently (a cross-row groupBy
transform would merge pre- and post-images of one doc into a garbage
signature and break the probe leg's old-partner discovery).
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.operators import dedup

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
def _fingerprint(df):
    return df.select(
        "doc_id",
        F.md5(dedup.normalize_text(F.col("text"))).alias("content_md5"),
    )


def make_exact_writer(docs_ct, path):
    return (
        Stream.fromChangeTable(docs_ct, "docs")
        .primaryKeys("doc_id")
        .to(_fingerprint)
        .groupBy("content_md5")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .writeToPath(str(path))
    )


def test_incremental_exact_dedup_maintained(spark, tmp_path, docs_ct):
    w = make_exact_writer(docs_ct, tmp_path / "exact")

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
def _band_transform(suffix):
    """Row-local MinHash banding, same hash law as minhash_signatures /
    minhash_lsh_pairs (h_i = min over distinct shingles of md5('i|'+s);
    duplicates can't change a min, so array_min over the raw shingle array
    is identical)."""

    def f(df):
        w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        out = df.withColumn("__w", w).where(F.size("__w") >= SHINGLE_N)
        shingles = F.expr(
            f"transform(sequence(1, size(__w) - {SHINGLE_N - 1}), "
            f"i -> array_join(slice(__w, i, {SHINGLE_N}), ' '))"
        )
        out = out.withColumn("__sh", shingles)
        def h_min(i):
            # single-param lambda only: a second parameter would be the
            # ELEMENT INDEX to F.transform, silently overriding a default
            return F.array_min(
                F.transform(
                    F.col("__sh"),
                    lambda s: F.md5(F.concat(F.lit(f"{i}|"), s)),
                )
            )

        hs = [h_min(i) for i in range(NUM_HASHES)]
        n_bands = NUM_HASHES // BAND_SIZE
        bands = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(
                    ",", *[hs[b * BAND_SIZE + j] for j in range(BAND_SIZE)]
                )).alias("bh"),
            )
            for b in range(n_bands)
        ])
        return out.select(
            F.col("doc_id").alias(f"doc_{suffix}"),
            F.explode(bands).alias("__x"),
        ).select(
            f"doc_{suffix}",
            F.col("__x.band").alias(f"band_{suffix}"),
            F.col("__x.bh").alias(f"bh_{suffix}"),
        )

    return f


def make_pairs_writer(docs_ct, path):
    a = (
        Stream.fromChangeTable(docs_ct, "bands_a")
        .primaryKeys("doc_a", "band_a")
        .to(_band_transform("a"))
    )
    b = (
        Stream.fromChangeTable(docs_ct, "bands_b")
        .primaryKeys("doc_b", "band_b")
        .to(_band_transform("b"))
    )
    return (
        a.join(b, "inner")
        .on(
            (a["band_a"] == b["band_b"])
            & (a["bh_a"] == b["bh_b"])
            & (a["doc_a"] < b["doc_b"])
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .writeToPath(str(path))
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

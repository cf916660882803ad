"""Salted join / two-phase agg / deterministic split (operators/skew.py):
salt choice must never change results, so each operator is asserted
multiset-equal to its plain unsalted counterpart."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from streamjoin_spark.operators.skew import (
    deterministic_split,
    salted_agg,
    salted_join,
)


def same(a, b):
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key k=1 carries most rows; k=3 has no build-side match
    probe = spark.createDataFrame(
        [Row(k=1, v=float(i)) for i in range(50)]
        + [Row(k=2, v=1.5), Row(k=3, v=2.5)]
    )
    build = spark.createDataFrame([Row(k=1, name="hot"), Row(k=2, name="cold")])
    return probe, build


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(skewed, how):
    probe, build = skewed
    salted = salted_join(probe, build, on=["k"], how=how, n_salts=4)
    plain = probe.join(build, ["k"], how)
    same(salted, plain)


def test_salted_join_rejects_non_probe_preserving(skewed):
    probe, build = skewed
    with pytest.raises(ValueError, match="probe"):
        salted_join(probe, build, on=["k"], how="right")


def test_salted_agg_equals_plain(skewed, spark):
    probe, _ = skewed
    # include a NULL value so count/avg NULL-skipping semantics are covered
    probe = probe.union(spark.createDataFrame([(1, None)], "k bigint, v double"))
    salted = salted_agg(
        probe,
        ["k"],
        {
            "s": ("sum", F.col("v")),
            "n": ("count", F.col("v")),
            "lo": ("min", F.col("v")),
            "hi": ("max", F.col("v")),
            "m": ("avg", F.col("v")),
        },
        n_salts=4,
    )
    plain = probe.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("m"),
    )
    same(salted, plain)


def test_deterministic_split_stable_and_weighted(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s1 = deterministic_split(df, "doc_id", {"train": 80, "val": 10, "test": 10})
    s2 = deterministic_split(df, "doc_id", {"train": 80, "val": 10, "test": 10})
    same(s1, s2)  # reproducible across invocations
    counts = {r.split: r.n for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 700 < counts["train"] < 900  # ~80% within hash tolerance
    # a different seed reshuffles assignments
    s3 = deterministic_split(df, "doc_id", {"train": 80, "val": 10, "test": 10}, seed="s")
    joined = s1.alias("a").join(s3.alias("b"), "doc_id")
    moved = joined.where(F.col("a.split") != F.col("b.split")).count()
    assert moved > 0

    with pytest.raises(ValueError, match="sum to 100"):
        deterministic_split(df, "doc_id", {"train": 50})


def test_sample_per_group_exact_and_deterministic(spark):
    from streamjoin_spark.operators.skew import sample_per_group

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(90)] + [(1000, "tiny"), (1001, "tiny")],
        "id long, g string",
    )
    s1 = sample_per_group(df, ["g"], 5, ["id"])
    counts = {r["g"]: r["n"] for r in s1.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5, "tiny": 2}  # min(n, |stratum|)

    # deterministic under physical reordering
    s2 = sample_per_group(df.repartition(13).sortWithinPartitions("g"), ["g"], 5, ["id"])
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_weighted_sample_semantics(spark):
    """A-ES weighted reservoir: exact per-group counts, overwhelming-weight
    rows always selected, zero/null weights excluded, deterministic."""
    from streamjoin_spark.operators.skew import weighted_sample

    rows = ([("g1", 0, 1e9)] + [("g1", i, 1.0) for i in range(1, 60)]
            + [("g2", 100, 2.0), ("g2", 101, 0.0), ("g2", 102, None)])
    df = spark.createDataFrame(rows, "g string, id long, w double")

    out = weighted_sample(df, ["g"], 5, "w", ["id"])
    got = {(r["g"], r["id"]): r["rnk"] for r in out.collect()}
    g1 = [k for k in got if k[0] == "g1"]
    assert len(g1) == 5                      # exact n when stratum is larger
    # the 10^9-weight row has rank key ~0 (max) — always sampled, rank 1
    assert got[("g1", 0)] == 1
    # zero/null weights are not sampleable; g2 keeps only its valid row
    assert [k for k in got if k[0] == "g2"] == [("g2", 100)]
    # deterministic: identical second run
    again = {(r["g"], r["id"]): r["rnk"]
             for r in weighted_sample(df, ["g"], 5, "w", ["id"]).collect()}
    assert again == got


def test_mixture_quotas_largest_remainder():
    from streamjoin_spark.operators.skew import mixture_quotas

    # 7 rows at 1/3 each: floor gives 2+2+2, largest remainder (tie) breaks
    # by name -> 'a' gets the extra
    assert mixture_quotas({"a": 1.0, "b": 1.0, "c": 1.0}, 7) == {
        "a": 3, "b": 2, "c": 2,
    }
    q = mixture_quotas({"x": 0.5, "y": 0.3, "z": 0.2}, 10)
    assert q == {"x": 5, "y": 3, "z": 2}
    # unnormalized weights normalize
    assert mixture_quotas({"x": 5, "y": 3, "z": 2}, 10) == q


def test_mixture_sample_exact_quotas_and_shortfall(spark):
    from streamjoin_spark.operators.skew import mixture_sample

    rows = [(i, "big") for i in range(50)] + [(100 + i, "tiny") for i in range(2)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(
        df, "src", {"big": 0.5, "tiny": 0.5, "absent": 0.0}, 10, ["id"]
    )
    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # tiny's quota is 5 but only 2 rows exist -> visible shortfall, no
    # silent redistribution; groups not in weights are dropped
    assert counts == {"big": 5, "tiny": 2}
    # determinism
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in mixture_sample(
        df, "src", {"big": 0.5, "tiny": 0.5, "absent": 0.0}, 10, ["id"]).collect())
    assert a == b


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        weights=st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=3),
            st.floats(min_value=0.001, max_value=100.0,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=8,
        ),
        total=st.integers(min_value=0, max_value=10_000),
    )
    def test_mixture_quotas_properties(weights, total):
        """Largest-remainder invariants: quotas sum EXACTLY to the budget,
        every quota is within 1 of its real-valued share, none negative,
        and the apportionment is deterministic."""
        from streamjoin_spark.operators.skew import mixture_quotas

        q = mixture_quotas(weights, total)
        assert set(q) == set(weights)
        assert sum(q.values()) == total
        wsum = sum(weights.values())
        for g, w in weights.items():
            ideal = total * w / wsum
            assert q[g] >= 0
            assert abs(q[g] - ideal) < 1.0 + 1e-9, (g, q[g], ideal)
        assert mixture_quotas(weights, total) == q
except ImportError:  # pragma: no cover
    pass

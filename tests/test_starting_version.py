"""``startingVersion`` on Stream sources (reference ``Stream.fromPath(path,
startingVersion)`` / ``fromTable(..., startingVersion)``,
elzyme/streams.py:126-144): a consumer's FIRST start begins at the pinned
commit — earlier history is skipped, with no backfill of untouched keys
(Delta CDF semantics) — while an existing checkpoint always wins on restart.
"""

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable

SCHEMA = "id long, name string, seg string"


def rows(spark, data):
    return spark.createDataFrame(data, SCHEMA)


@pytest.fixture()
def src_ct(spark, tmp_path):
    ct = ChangeTable.create(
        spark, str(tmp_path / "src"),
        spark.createDataFrame([], SCHEMA).schema, ["id"],
    )
    ct.merge(rows(spark, [(1, "ann", "A"), (2, "bob", "B")]))   # v1
    ct.merge(rows(spark, [(3, "cyd", "A")]))                    # v2
    ct.merge(rows(spark, [(2, "bob2", "B")]))                   # v3
    return ct


def make_writer(spark, src_ct, out, starting_version):
    s = Stream.fromPath(
        spark, src_ct.path, startingVersion=starting_version
    ).primaryKeys("id")
    return (
        s.groupBy("id")
        .agg(F.max("name").alias("name"))
        .writeToPath(str(out))
    )


def test_frompath_autodetects_changetable(spark, src_ct):
    """A ChangeTable path resolves to the full incremental stream — the
    engine's Delta-path analog — not a static parquet read."""
    s = Stream.fromPath(spark, src_ct.path)
    assert s.change_table is not None
    assert s.latest_version() == 3


def test_starting_version_rejected_on_static_path(spark, tmp_path):
    p = str(tmp_path / "plain")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="startingVersion"):
        Stream.fromPath(spark, p, startingVersion=2)


def test_starting_version_consumes_only_suffix(spark, tmp_path, src_ct):
    """First start at v3: only keys touched at/after v3 materialize —
    ids 1 and 3 (last touched v1/v2) never reach the target, id 2 lands
    with its v3 value."""
    w = make_writer(spark, src_ct, tmp_path / "out", 3)
    w.run()
    got = {r["id"]: r["name"] for r in w.toDF().collect()}
    assert got == {2: "bob2"}

    # the suffix keeps flowing: a later commit touching an old key brings it in
    src_ct.merge(rows(spark, [(1, "ann2", "A")]))               # v4
    w.run()
    got = {r["id"]: r["name"] for r in w.toDF().collect()}
    assert got == {1: "ann2", 2: "bob2"}


def test_checkpoint_wins_over_seed_on_restart(spark, tmp_path, src_ct):
    """A rebuilt pipeline with a DIFFERENT startingVersion must resume from
    the persisted watermark, not re-seed — seeding after a restart would
    silently skip the backlog."""
    out = tmp_path / "out"
    w = make_writer(spark, src_ct, out, 3)
    w.run()
    src_ct.merge(rows(spark, [(3, "cyd2", "A")]))               # v4
    # "restart" with a bogus seed far past the head
    w2 = make_writer(spark, src_ct, out, 99)
    w2.run()
    got = {r["id"]: r["name"] for r in w2.toDF().collect()}
    assert got == {2: "bob2", 3: "cyd2"}


def test_starting_version_native_stream_filtered(spark, src_ct, tmp_path):
    """The native readStream leg also honors the pin: draining the change
    feed with startingVersion=3 yields only v3+ images."""
    s = Stream.fromChangeTable(src_ct, "s", startingVersion=3)
    q = (
        s.stream()
        .writeStream.format("memory")
        .queryName("sv_feed")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vers = {
        r["_commit_version"]
        for r in spark.sql("select _commit_version from sv_feed").collect()
    }
    assert vers == {3}


def test_starting_version_beyond_head_waits(spark, tmp_path, src_ct):
    """A pin PAST the head means 'only commits ≥ pin' (Delta CDF lets a
    stream wait for future versions): the seeded watermark must not
    regress to the head, commits below the pin stay skipped even when
    they arrive later, and the pipeline neither crashes nor spins."""
    w = make_writer(spark, src_ct, tmp_path / "out", 6)   # head is 3
    assert w.run() == 0
    assert w.toDF().count() == 0

    src_ct.merge(rows(spark, [(7, "eve", "C")]))          # v4 < pin: skipped
    assert w.run() == 0
    assert w.toDF().count() == 0

    src_ct.merge(rows(spark, [(8, "fay", "C")]))          # v5 < pin: skipped
    src_ct.merge(rows(spark, [(9, "gus", "C")]))          # v6 == pin: flows
    w.run()
    assert {r["id"] for r in w.toDF().collect()} == {9}

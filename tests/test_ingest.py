"""File ingestion (the Auto Loader analog): discovery, batching, CDC merge,
end-to-end into an incremental pipeline."""

import json
import os

import pyspark.sql.functions as F

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.sources import FileIngest

SCHEMA = "id long, name string, seq long"


def write_json(dirpath, fname, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_ingest_discovers_batches_and_merges(spark, tmp_path):
    src = tmp_path / "landing"
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze"),
        spark.createDataFrame([], SCHEMA).schema, ["id"], sequence_by=["seq"],
    )
    ing = FileIngest(spark, f"{src}/*.json", ct, fmt="json",
                     mode="merge", max_files_per_batch=1)

    write_json(src, "a.json", [{"id": 1, "name": "x", "seq": 1},
                               {"id": 2, "name": "y", "seq": 1}])
    write_json(src, "b.json", [{"id": 1, "name": "x2", "seq": 2}])
    assert ing.run() == 2            # two files, two single-file batches
    assert ct.version() == 2         # one commit per batch
    snap = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert snap == {1: "x2", 2: "y"}

    # idempotent: nothing new
    assert ing.run() == 0

    # late out-of-order file: seq 0 must not clobber seq 2
    write_json(src, "c.json", [{"id": 1, "name": "stale", "seq": 0}])
    assert ing.run() == 1
    assert {r["id"]: r["name"] for r in ct.snapshot().collect()}[1] == "x2"


def test_ingest_feeds_incremental_pipeline(spark, tmp_path):
    src = tmp_path / "landing"
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze"),
        spark.createDataFrame([], SCHEMA).schema, ["id"],
    )
    ing = FileIngest(spark, f"{src}/*.json", ct, fmt="json", mode="merge")
    s = Stream.fromChangeTable(ct, "s").primaryKeys("id")
    w = (
        s.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "by_name"))
    )

    write_json(src, "a.json", [{"id": 1, "name": "x", "seq": 1},
                               {"id": 2, "name": "x", "seq": 1},
                               {"id": 3, "name": "y", "seq": 1}])
    ing.run()
    w.run()
    assert {r["name"]: r["n"] for r in w.toDF().collect()} == {"x": 2, "y": 1}

    write_json(src, "b.json", [{"id": 2, "name": "y", "seq": 2}])  # x -> y move
    ing.run()
    w.run()
    assert {r["name"]: r["n"] for r in w.toDF().collect()} == {"x": 1, "y": 2}


def test_ingest_csv_with_header(spark, tmp_path):
    """CSV landing files (header via reader options; column types come from
    the target table's schema) flow through the same discovery/merge path
    as JSON."""
    src = tmp_path / "landing_csv"
    os.makedirs(src, exist_ok=True)
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze_csv"),
        spark.createDataFrame([], SCHEMA).schema, ["id"], sequence_by=["seq"],
    )
    (src / "a.csv").write_text("id,name,seq\n1,x,1\n2,y,1\n")
    (src / "b.csv").write_text("id,name,seq\n1,x2,2\n")
    ing = FileIngest(
        spark, f"{src}/*.csv", ct, fmt="csv", mode="merge",
        max_files_per_batch=1,
        reader_options={"header": "true"},
    )
    assert ing.run() == 2
    snap = {r["id"]: (r["name"], r["seq"]) for r in ct.snapshot().collect()}
    assert snap == {1: ("x2", 2), 2: ("y", 1)}
    assert ing.run() == 0


def test_auto_compact_bounds_fragmentation(spark, tmp_path):
    """Append-mode ingestion adds one dir per batch per touched part; the
    auto-OPTIMIZE policy consolidates once any part exceeds the threshold,
    emits no change rows, and leaves content + change feed intact."""
    import json as _json

    from streamjoin_spark.changelog import ChangeTable
    from streamjoin_spark.sources import FileIngest
    from streamjoin_spark.streams import CHANGE_TYPE

    land = tmp_path / "land"
    land.mkdir()
    schema = "id long, v string"
    # single-part table (one bucket) so every append touches the same part
    ct = ChangeTable.create(
        spark, str(tmp_path / "tbl"),
        spark.createDataFrame([], schema).schema, ["id"], n_buckets=1,
    )
    for i in range(8):
        with open(land / f"f{i:02d}.json", "w") as f:
            f.write(_json.dumps({"id": i, "v": f"x{i}"}) + "\n")

    ing = FileIngest(spark, str(land / "*.json"), ct, fmt="json",
                     mode="append", max_files_per_batch=1,
                     auto_compact_threshold=3)
    assert ing.run() == 8
    # fragmentation stayed bounded: compaction ran at least once
    assert ct.max_dirs_per_part() <= 3 + 1
    # content complete, change feed has exactly the 8 inserts, no extras
    assert ct.snapshot().count() == 8
    feed = ct.read_change_feed()
    assert feed.count() == 8
    assert feed.where(F.col(CHANGE_TYPE) != "insert").count() == 0


def test_medallion_quarantine_gate_e2e(spark, tmp_path):
    """Bronze-edge expectations gate (the Auto Loader + DLT pattern): rows
    failing rules divert to a quarantine table with their violation list;
    clean rows merge into bronze and flow through the incremental silver
    aggregate; a later batch's bad rows never reach silver either."""
    src = tmp_path / "landing"
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze"),
        spark.createDataFrame([], SCHEMA).schema, ["id"], sequence_by=["seq"],
    )
    qschema = spark.createDataFrame(
        [], SCHEMA + ", _violations string"
    ).schema
    qt = ChangeTable.create(spark, str(tmp_path / "quarantine"), qschema, ["id"])
    ing = FileIngest(
        spark, f"{src}/*.json", ct, fmt="json", mode="merge",
        rules={"id_present": "id IS NOT NULL", "named": "name <> 'bad'"},
        quarantine_target=qt,
    )
    agg = (
        Stream.fromChangeTable(ct, "m").primaryKeys("id")
        .groupBy("name").agg(F.count(F.lit(1)).alias("n"))
        .writeToPath(str(tmp_path / "silver"))
    )

    write_json(src, "a.json", [
        {"id": 1, "name": "x", "seq": 1},
        {"id": 2, "name": "bad", "seq": 1},          # rule violation
        {"id": None, "name": "y", "seq": 1},         # null id
        {"id": 3, "name": "x", "seq": 1},
    ])
    ing.run()
    agg.run()
    assert {r["name"]: r["n"] for r in agg.toDF().collect()} == {"x": 2}
    q = {r["name"]: r["_violations"] for r in qt.snapshot().collect()}
    assert q == {"bad": "named", "y": "id_present"}

    # second batch: a clean update + another violation
    write_json(src, "b.json", [
        {"id": 1, "name": "z", "seq": 2},
        {"id": 9, "name": "bad", "seq": 2},
    ])
    ing.run()
    agg.run()
    assert {r["name"]: r["n"] for r in agg.toDF().collect()} == {"x": 1, "z": 1}
    assert sorted(
        r["id"] for r in qt.snapshot().where("id IS NOT NULL").collect()
    ) == [2, 9]


def test_quarantine_replay_idempotent_with_qid(spark, tmp_path):
    """Crash between the quarantine commit and the ingest-state update
    replays the batch; a `_qid`-keyed quarantine table absorbs the replay
    via content-addressed merge() without duplicating rows — while two
    DISTINCT bad rows sharing a NULL business key are both kept (the
    failure a bronze-PK-keyed quarantine would collapse)."""
    src = tmp_path / "landing"
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze"),
        spark.createDataFrame([], SCHEMA).schema, ["id"], sequence_by=["seq"],
    )
    qschema = spark.createDataFrame(
        [], SCHEMA + ", _violations string, _qid string"
    ).schema
    qt = ChangeTable.create(
        spark, str(tmp_path / "quarantine"), qschema, ["_qid"]
    )
    ing = FileIngest(
        spark, f"{src}/*.json", ct, fmt="json", mode="merge",
        rules={"id_present": "id IS NOT NULL", "named": "name <> 'bad'"},
        quarantine_target=qt,
    )
    write_json(src, "a.json", [
        {"id": 1, "name": "x", "seq": 1},
        {"id": 2, "name": "bad", "seq": 1},
        {"id": None, "name": "y", "seq": 1},     # two distinct NULL-id rows
        {"id": None, "name": "z", "seq": 1},     # must BOTH survive
    ])
    ing.run()
    assert qt.snapshot().count() == 3
    assert {r["name"] for r in qt.snapshot().collect()} == {"bad", "y", "z"}
    # simulate the crash window: state update lost, batch replays
    os.remove(os.path.join(ct.path, "_ingest_state.json"))
    ing.run()
    assert qt.snapshot().count() == 3          # merge absorbed the replay
    assert ct.snapshot().count() == 1          # bronze merge likewise


def test_ingest_parquet_files(spark, tmp_path):
    """fmt='parquet': binary-columnar landing files merge like JSON — the
    format knob is a pure reader swap, discovery/state/merge unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "landing_pq"
    os.makedirs(src, exist_ok=True)
    pq.write_table(
        pa.table({"id": [1, 2], "name": ["a", "b"], "seq": [1, 1]}),
        str(src / "f1.parquet"),
    )
    pq.write_table(
        pa.table({"id": [2, 3], "name": ["b2", "c"], "seq": [2, 2]}),
        str(src / "f2.parquet"),
    )
    ct = ChangeTable.create(
        spark, str(tmp_path / "bronze_pq"),
        spark.createDataFrame([], SCHEMA).schema, ["id"], sequence_by=["seq"],
    )
    ing = FileIngest(spark, f"{src}/*.parquet", ct, fmt="parquet", mode="merge")
    assert ing.run() > 0
    got = {r["id"]: r["name"] for r in ct.snapshot().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}     # seq-ordered upsert wins
    assert ing.run_once() == 0                  # nothing new -> no commit

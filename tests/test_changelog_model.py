"""Model-based differential test of the ChangeTable substrate.

A fixed-seed random sequence of writer operations (merge / append /
delete_where / compact / restore / vacuum) runs against both the real
table and a driver-side dict model of its semantics; after every commit
the snapshot must equal the model, and at the end the change feed
replayed in version order must reconstruct the final state (the
invariant every downstream IVM consumer relies on). This catches
cross-operation interactions the per-feature tests can't — e.g. a
restore over a vacuumed range, or a compact between a single-write
insert commit and a rewriting merge.
"""

import random

import pyspark.sql.functions as F
import pytest

from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.streams import (
    CHANGE_TYPE,
    COMMIT_VERSION,
    DELETE,
    INSERT,
    UPDATE_POST,
    UPDATE_PRE,
)

SCHEMA = "id long, name string, amount double, seq int"


def _rows(model):
    return sorted((k, v[0], v[1], v[2]) for k, v in model.items())


def _snap(ct):
    return sorted(
        (r["id"], r["name"], r["amount"], r["seq"])
        for r in ct.snapshot().collect()
    )


def _apply_merge(model, batch):
    # staged dedup: latest seq wins; then sequence-ordered upsert
    staged = {}
    for (i, n, a, s) in batch:
        if i not in staged or staged[i][2] < s:
            staged[i] = (n, a, s)
    for i, (n, a, s) in staged.items():
        if i not in model or model[i][2] <= s:
            model[i] = (n, a, s)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_op_sequence_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    df0 = spark.createDataFrame([], SCHEMA)
    ct = ChangeTable.create(
        spark, str(tmp_path / f"m{seed}"), df0.schema, ["id"],
        sequence_by=["seq"],
    )
    model: dict = {}
    states = {0: dict(model)}  # model snapshot per committed version
    next_id = 100
    vacuumed = False

    def fresh_batch(n, update_bias=0.5):
        nonlocal next_id
        out = []
        for _ in range(n):
            if model and rng.random() < update_bias:
                i = rng.choice(sorted(model))
                out.append((i, f"u{rng.randrange(1000)}",
                            round(rng.random() * 10, 2),
                            model[i][2] + rng.choice([-1, 0, 1, 2])))
            else:
                out.append((next_id, f"n{next_id}",
                            round(rng.random() * 10, 2), rng.randrange(5)))
                next_id += 1
        return out

    ops = ["merge", "merge", "append", "delete", "compact", "restore",
           "merge", "vacuum", "merge", "delete", "rebucket"]
    rng.shuffle(ops)
    for op in ops:
        v_before = ct.version()
        if op == "merge":
            batch = fresh_batch(rng.randrange(1, 4))
            ct.merge(spark.createDataFrame(batch, SCHEMA))
            _apply_merge(model, batch)
        elif op == "append":
            # append is the insert-only path: new keys only
            batch = []
            for _ in range(rng.randrange(1, 3)):
                batch.append((next_id, f"a{next_id}", 1.0, 0))
                next_id += 1
            ct.append(spark.createDataFrame(batch, SCHEMA))
            for (i, n, a, s) in batch:
                model[i] = (n, a, s)
        elif op == "delete":
            if not model:
                continue
            doomed = rng.sample(sorted(model), k=min(2, len(model)))
            ct.delete_where(F.col("id").isin([int(d) for d in doomed]))
            for d in doomed:
                model.pop(d)
        elif op == "compact":
            ct.compact()
        elif op == "rebucket":
            # online re-bucketing interleaved with every other writer op:
            # pure layout change, the model is untouched by construction
            ct.compact(n_buckets=rng.choice([2, 4, 8, 16]))
        elif op == "restore":
            # restore only to a retained version (vacuum drops manifests)
            lo = max(0, ct.version() - 1) if vacuumed else 0
            target = rng.randrange(lo, ct.version() + 1)
            ct.restore(target)
            model = dict(states[target])
        elif op == "vacuum":
            ct.vacuum(retain_versions=3)
            vacuumed = True
            # retention may drop restore targets below the window
            keep_from = max(0, ct.version() - 2)
            states = {v: s for v, s in states.items() if v >= keep_from}

        for v in range(v_before + 1, ct.version() + 1):
            states[v] = dict(model)
        assert _snap(ct) == _rows(model), f"divergence after {op}"
        # the O(range) pinned read agrees with the version-filtered full
        # feed for every commit this op produced — across single-write
        # (insert-only) and rewrite layouts alike
        for v in range(v_before + 1, ct.version() + 1):
            ranged = sorted(map(tuple, ct.read_change_range(v, v).collect()))
            full = sorted(map(tuple, ct.read_change_feed().where(
                F.col(COMMIT_VERSION) == v).collect()))
            assert ranged == full, f"range/feed mismatch at v{v} after {op}"

    # feed replay reconstructs the final state from the retention floor's
    # base snapshot (floor-1 is not replayable by definition)
    floor = ct.change_floor()
    if floor <= 1:
        base: dict = {}
    else:
        base = dict(states.get(floor - 1, {}))
        if (floor - 1) not in states:
            pytest.skip("floor predates retained model states")
    feed = ct.read_change_feed().collect()
    state = dict(base)
    for r in sorted(feed, key=lambda r: r[COMMIT_VERSION]):
        if r[CHANGE_TYPE] in (INSERT, UPDATE_POST):
            state[r["id"]] = (r["name"], r["amount"], r["seq"])
        elif r[CHANGE_TYPE] == DELETE:
            state.pop(r["id"], None)
    assert _rows(state) == _rows(model)


# ---------------------------------------------------------------------------
# Optimistic concurrency: claim-serialized writers (r6)
# ---------------------------------------------------------------------------

from streamjoin_spark.changelog import ConcurrentWriteError  # noqa: E402


def _b(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, path):
    df0 = spark.createDataFrame([], SCHEMA)
    return ChangeTable.create(spark, path, df0.schema, ["id"], sequence_by=["seq"])


def test_two_writer_interleaved_ops_converge(spark, tmp_path):
    """Fixed-seed schedule of merges/appends/deletes alternating between
    two writer INSTANCES of the same table: version-slot claims serialize
    them, every op's body reads the fresh head, so the final state equals
    the model applied in schedule order — the single-writer contract
    relaxed to any number of serialized writers."""
    rng = random.Random(7)
    path = str(tmp_path / "occ")
    _mk(spark, path)
    writers = [ChangeTable(spark, path), ChangeTable(spark, path)]
    model: dict = {}
    next_id = 0
    for step in range(8):
        w = writers[step % 2]
        op = rng.choice(["merge", "merge", "append", "delete"])
        if op == "merge":
            batch = [(next_id % 5, f"s{step}", float(step), step)]
            w.merge(_b(spark, batch))
            _apply_merge(model, batch)
            next_id += 1
        elif op == "append":
            batch = [(100 + next_id, f"a{step}", 1.0, 0)]
            w.append(_b(spark, batch))
            for (i, n, a, s) in batch:
                model[i] = (n, a, s)
            next_id += 1
        elif op == "delete":
            if not model:
                continue
            doomed = sorted(model)[0]
            w.delete_where(F.col("id") == int(doomed))
            model.pop(doomed)
    assert _snap(writers[0]) == _rows(model)
    assert _snap(writers[1]) == _rows(model)


def test_claim_blocks_second_writer_then_serializes(spark, tmp_path):
    """An in-flight writer's claimed slot blocks a second writer for the
    bounded wait (ConcurrentWriteError, table untouched); once the holder
    publishes, the second writer claims the next slot and both commits
    land — no clobbered files, no lost commit."""
    path = str(tmp_path / "claim")
    _mk(spark, path)
    a, b = ChangeTable(spark, path), ChangeTable(spark, path)
    b._claim_wait_s = 0.3
    v = a._next_version()                      # a is "in flight" at slot v
    with pytest.raises(ConcurrentWriteError, match="claimed"):
        b.merge(_b(spark, [(1, "b", 1.0, 1)]))
    assert b.version() == v - 1                # head untouched by the loser
    av = a.merge(_b(spark, [(0, "a", 0.0, 1)]))  # same token reclaims slot v
    assert av == v
    b._claim_wait_s = 10.0
    bv = b.merge(_b(spark, [(1, "b", 1.0, 1)]))
    assert bv == v + 1
    assert _snap(a) == [(0, "a", 0.0, 1), (1, "b", 1.0, 1)]


def test_stale_claim_of_dead_writer_is_stolen(spark, tmp_path):
    """A claim whose writer died (never published) stops blocking after
    the staleness window: the next writer steals the slot and proceeds —
    no permanent wedge from a crashed process."""
    path = str(tmp_path / "stale")
    _mk(spark, path)
    dead, live = ChangeTable(spark, path), ChangeTable(spark, path)
    v = dead._next_version()                   # claim, then "die"
    live._claim_stale_s = 0.0                  # immediately stealable
    lv = live.merge(_b(spark, [(5, "x", 5.0, 1)]))
    assert lv == v
    assert _snap(live) == [(5, "x", 5.0, 1)]


def test_threaded_writers_serialize(spark, tmp_path):
    """Two OS threads writing disjoint keys concurrently: claims serialize
    the six commits, none is lost, and the feed replay reconstructs the
    final state (the invariant IVM consumers rely on)."""
    import threading

    path = str(tmp_path / "thr")
    _mk(spark, path)
    errs: list = []

    def work(base):
        try:
            w = ChangeTable(spark, path)
            for i in range(3):
                w.merge(_b(spark, [(base + i, f"w{base + i}", 1.0, 1)]))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=work, args=(b,)) for b in (0, 100)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ct = ChangeTable(spark, path)
    assert ct.version() == 6
    assert len(_snap(ct)) == 6
    state: dict = {}
    for r in sorted(ct.read_change_feed().collect(),
                    key=lambda r: r[COMMIT_VERSION]):
        if r[CHANGE_TYPE] in (INSERT, UPDATE_POST):
            state[r["id"]] = (r["name"], r["amount"], r["seq"])
        elif r[CHANGE_TYPE] == DELETE:
            state.pop(r["id"], None)
    assert _rows(state) == _snap(ct)


def test_replace_keys_expected_version_disjoint_allows_overlap_raises(
    spark, tmp_path
):
    """The IVM rebase law: replace_keys with expected_version proceeds when
    the interleaved commits' key scopes are DISJOINT from its own (the
    precomputed rows are still correct for the scope) and raises
    ConcurrentWriteError on overlap (they are stale); the refused commit
    releases its slot so the table keeps committing."""
    path = str(tmp_path / "rk")
    _mk(spark, path)
    ct = ChangeTable(spark, path)
    ct.merge(_b(spark, [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]))
    h = ct.version()
    scope = spark.createDataFrame([(2,)], "id long")

    # disjoint interleave: another writer touches key 1 only
    ct.merge(_b(spark, [(1, "a2", 1.5, 2)]))
    v = ct.replace_keys(
        scope, ["id"], _b(spark, [(2, "b2", 9.9, 5)]), expected_version=h
    )
    assert v == ct.version()
    assert _snap(ct) == [(1, "a2", 1.5, 2), (2, "b2", 9.9, 5)]

    # overlapping interleave: the winner touched key 2 — stale precompute
    h2 = ct.version()
    ct.merge(_b(spark, [(2, "race", 3.0, 6)]))
    with pytest.raises(ConcurrentWriteError, match="stale"):
        ct.replace_keys(
            scope, ["id"], _b(spark, [(2, "old", 0.0, 7)]),
            expected_version=h2,
        )
    # slot released: the next commit claims head+1 immediately
    nxt = ct.merge(_b(spark, [(3, "c", 3.0, 1)]))
    assert nxt == ct.version()


# ---------------------------------------------------------------------------
# Crash-injection kill-point sweep over every commit kind (r6)
# ---------------------------------------------------------------------------


def _kill_publish(self, *a, **kw):
    raise RuntimeError("killed: pre-manifest")


def _kill_meta(self, *a, **kw):
    raise RuntimeError("killed: pre-meta-bump")


KILL_POINTS = {
    # data/c{v} + changes/c{v} written, manifest + t-file + meta NOT
    "pre_manifest": ("_publish", _kill_publish),
    # manifest + t-file written, meta bump NOT (the narrowest window)
    "pre_meta": ("_write_meta", _kill_meta),
}


@pytest.mark.parametrize("kill", sorted(KILL_POINTS))
def test_crash_kill_points_all_commit_kinds(spark, tmp_path, kill):
    """Kill the commit protocol between every artifact, for every commit
    kind (append / bulk-load single-write merge / rewriting merge /
    replace_keys / delete_where / compact / restore): the un-published
    commit must be invisible (version, snapshot, feed unchanged), and the
    RETRY of the same operation must land exactly once — the idempotent
    pure-overwrite law of the protocol, proven at every kill point rather
    than just the one the single-write test covered."""
    attr, fn = KILL_POINTS[kill]
    b0 = [(1, "a", 1.0, 1), (2, "b", 2.0, 1)]

    ops = {
        "append": lambda ct: ct.append(_b(spark, [(50, "ap", 5.0, 0)])),
        "merge_rewrite": lambda ct: ct.merge(_b(spark, [(1, "a2", 1.5, 2)])),
        "replace": lambda ct: ct.replace_keys(
            spark.createDataFrame([(2,)], "id long"), ["id"],
            _b(spark, [(2, "r", 9.0, 3)]),
        ),
        "delete": lambda ct: ct.delete_where("id = 2"),
        "compact": lambda ct: ct.compact(),
        "restore": lambda ct: ct.restore(1),
    }
    finals = {
        "append": sorted([(1, "a", 1.0, 1), (2, "b", 2.0, 1), (50, "ap", 5.0, 0)]),
        "merge_rewrite": [(1, "a2", 1.5, 2), (2, "b", 2.0, 1)],
        "replace": [(1, "a", 1.0, 1), (2, "r", 9.0, 3)],
        "delete": [(1, "a", 1.0, 1)],
        "compact": sorted(b0),
        "restore": sorted(b0),
    }
    for name, op in ops.items():
        path = str(tmp_path / f"{kill}_{name}")
        _mk(spark, path)
        ct = ChangeTable(spark, path)
        ct.merge(_b(spark, b0))                      # v1 baseline
        if name == "restore":
            ct.merge(_b(spark, [(2, "tmp", 0.0, 2)]))  # v2 to roll back
        v_before = ct.version()
        snap_before = _snap(ct)
        feed_before = ct.read_change_feed().count()

        real = getattr(ChangeTable, attr)
        setattr(ChangeTable, attr, fn)
        try:
            with pytest.raises(RuntimeError, match="killed"):
                op(ct)
        finally:
            setattr(ChangeTable, attr, real)

        # the crashed commit is invisible on every read surface
        assert ct.version() == v_before, f"{name}/{kill}: version moved"
        assert _snap(ct) == snap_before, f"{name}/{kill}: snapshot moved"
        assert ct.read_change_feed().count() == feed_before, (
            f"{name}/{kill}: feed leaked orphans"
        )

        op(ct)                                        # retry lands once
        assert _snap(ct) == finals[name], f"{name}/{kill}: retry diverged"
        v = ct.version()
        ranged = sorted(map(tuple, ct.read_change_range(v, v).collect()))
        full = sorted(map(tuple, ct.read_change_feed().where(
            F.col(COMMIT_VERSION) == v).collect()))
        assert ranged == full, f"{name}/{kill}: range/feed mismatch"


def test_crash_between_vacuum_deletes_and_floor_bump(spark, tmp_path):
    """vacuum's deletions are idempotent and its floor bump publishes
    last: a crash between them leaves a readable table and the re-run
    converges to the same floor."""
    path = str(tmp_path / "vac")
    _mk(spark, path)
    ct = ChangeTable(spark, path)
    for i in range(5):
        ct.merge(_b(spark, [(i, f"x{i}", float(i), 1)]))
    snap = _snap(ct)
    real = ChangeTable._write_meta
    ChangeTable._write_meta = _kill_meta
    try:
        with pytest.raises(RuntimeError, match="killed"):
            ct.vacuum(retain_versions=2)
    finally:
        ChangeTable._write_meta = real
    assert ct.change_floor() == 0                 # bump never published
    assert _snap(ct) == snap                      # current state readable
    ct.vacuum(retain_versions=2)                  # idempotent re-run
    assert ct.change_floor() == ct.version() - 1
    assert _snap(ct) == snap


def test_stolen_claim_aborts_before_any_write(spark, tmp_path):
    """A live-but-slow writer whose claim went stale and was stolen must
    abort at the write edge (ownership re-verify in _write_commit) BEFORE
    its overwrite-mode writes can destroy the thief's published files —
    and the thief's commit survives intact."""
    path = str(tmp_path / "steal")
    _mk(spark, path)
    slow, thief = ChangeTable(spark, path), ChangeTable(spark, path)
    v = slow._next_version()               # slow writer claims, then stalls
    thief._claim_stale_s = 0.0             # its claim is immediately stale
    tv = thief.merge(_b(spark, [(7, "thief", 7.0, 1)]))
    assert tv == v
    snap = _snap(thief)
    # slow writer wakes up and tries to commit into its stolen slot: the
    # pre-write ownership check aborts it; the thief's data is untouched
    with pytest.raises(ConcurrentWriteError, match="stolen"):
        slow._write_commit(
            v, slow._tag(_b(spark, [(8, "slow", 8.0, 1)]), "insert", v),
            op="MERGE", content_in_changes=True,
        )
    assert _snap(slow) == snap
    # and the heartbeat: a writer that still OWNS its claim refreshes the
    # timestamp at the write edge, so staleness measures from the last
    # protocol step (asserted indirectly: a fresh merge works)
    nxt = slow.merge(_b(spark, [(8, "slow", 8.0, 1)]))
    assert nxt == v + 1


def test_same_instance_threads_serialize(spark, tmp_path):
    """Two OS threads sharing ONE ChangeTable instance: the claim token is
    per (instance, thread), so the second thread cannot 'reclaim' the
    first thread's in-flight slot — commits serialize exactly like
    separate instances (previously a per-instance token let both threads
    own the same slot and clobber each other's version-addressed dirs)."""
    import threading

    path = str(tmp_path / "shared")
    _mk(spark, path)
    ct = ChangeTable(spark, path)
    errs: list = []

    def work(base):
        try:
            for i in range(3):
                ct.merge(_b(spark, [(base + i, f"t{base + i}", 1.0, 1)]))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=work, args=(b,)) for b in (0, 100)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert ct.version() == 6
    assert len(_snap(ct)) == 6


def test_threaded_writers_overlapping_keys_seq_law(spark, tmp_path):
    """Two threads merging the SAME key concurrently: claims serialize the
    commits and merge's sequence ordering makes the outcome deterministic
    regardless of interleaving — the highest seq wins, exactly as if the
    merges ran sequentially in any order."""
    import threading

    path = str(tmp_path / "ovl")
    _mk(spark, path)
    errs: list = []

    def work(tag, seqs):
        try:
            w = ChangeTable(spark, path)
            for s in seqs:
                w.merge(_b(spark, [(1, f"{tag}{s}", float(s), s)]))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [
        threading.Thread(target=work, args=("a", [0, 2, 4])),
        threading.Thread(target=work, args=("b", [1, 3, 5])),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ct = ChangeTable(spark, path)
    assert ct.version() == 6                      # all six commits landed
    assert _snap(ct) == [(1, "b5", 5.0, 5)]       # highest seq wins


def test_unparseable_claim_ages_out_on_mtime(spark, tmp_path):
    """r8: the hardlink-free put_if_absent fallback can die between the
    O_EXCL create and the payload write, leaving an EMPTY claim file with
    no heartbeat to age — json-unparseable, so the body-based steal never
    fires and the slot would wedge every future writer. _try_claim ages
    unparseable claims on the FILE's mtime instead."""
    import json
    import os

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    path = str(tmp_path / "t")
    ct = ChangeTable.create(spark, path, df.schema, ["id"])
    ct.merge(df)
    v = ct.version() + 1
    claim = os.path.join(path, "manifests", f"claim_v{v}.json")
    with open(claim, "w"):  # the crashed writer's empty claim
        pass
    fresh = ChangeTable(spark, path)
    fresh._claim_stale_s = 0.0
    fresh._claim_wait_s = 1.0
    assert fresh._try_claim(v)  # stolen on mtime, not wedged
    body = json.loads(open(claim).read())
    assert body["token"] == fresh._writer_token


def test_claim_wait_option_sizes_five_writers(spark, tmp_path):
    """r10 VERDICT watch-item 2: the claim wait is a constructor option
    (measured rule: N writers × longest single commit — at 4 writers the
    observed max wait grazed the old hardwired 30 s). A short wait raises
    against a held claim; a sized wait serializes FIVE concurrent
    writers with zero lost commits."""
    import threading

    path = str(tmp_path / "five")
    _mk(spark, path)
    holder = ChangeTable(spark, path)
    v = holder._next_version()
    short = ChangeTable(spark, path, claim_wait_s=0.05)
    assert short._claim_wait_s == 0.05
    with pytest.raises(Exception, match="claimed|in-flight"):
        short.merge(_b(spark, [(1, "x", 1.0, 1)]))
    holder._release_claim(v)

    errs: list = []

    def work(i):
        try:
            w = ChangeTable(spark, path, claim_wait_s=120.0)
            w.merge(_b(spark, [(10 + i, f"w{i}", float(i), 1)]))
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(5)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    final = ChangeTable(spark, path)
    ids = {r[0] for r in _snap(final)}
    assert {10, 11, 12, 13, 14} <= ids
    # five distinct commits landed (serialized, none lost)
    assert final.version() >= 5

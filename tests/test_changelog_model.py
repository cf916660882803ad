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
           "merge", "vacuum", "merge", "delete"]
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

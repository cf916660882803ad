"""Reference-fixture parity e2e: the 4-table CDC chain, end to end.

The reference's whole test suite runs over four all-STRING silver tables
(customers → transactions → orders → products, FK-sampled with gaps and
fan-out) fed by Auto Loader JSON with small triggers, through renamed
streams with string sequence columns, into join chains checked against a
batch recompute (SURVEY.md §5; FIXTURES.md; reference
tests/SetupInputStream.py:41-202, RunTests.py:29-54). This test replays
that exact shape on this engine:

- JSON landing files → ``FileIngest`` (merge mode, 1 file per batch ⇒ many
  small commits, the maxBytesPerTrigger analog);
- string-formatted ``MM-dd-yyyy HH:mm:ss`` sequence columns with LATE and
  STALE duplicate-PK records across files (sequence-ordered upsert);
- reference renames via ``Stream.to`` (id → customer_id/transaction_id/…)
  plus the derived ``date = year*10000 + month*100`` column
  (SetupInputStream.py:182);
- depth-3 chain with the JoinTestComplex1 theta leg
  ``(p.product_name == o.item_name) & (p.product_name == 'Small Towels')``
  (reference tests/JoinTestComplex1.py:11-12);
- governed incremental drain (maxVersionsPerTrigger=2) vs the reference's
  batch-recompute oracle (bidirectional exceptAll).
"""

import json
import random

import pyspark.sql.functions as F
import pytest

from streamjoin_spark import Stream
from streamjoin_spark.changelog import ChangeTable
from streamjoin_spark.sources import FileIngest

from .test_incremental import assert_same

CUST = ("id string, firstname string, lastname string, email string, "
        "address string, operation string, operation_date string")
TXN = ("id string, customer_id string, transaction_date string, "
       "amount double, item_count double, operation string, "
       "operation_date string")
ORD = ("id string, transaction_id string, delivery_date string, "
       "item_name string, operation string, operation_date string")
PROD = ("id string, order_id string, item_name string, "
        "item_operation string, item_operation_date string, price double")

ITEMS = ["Small Towels", "Big Cup", "Fast Car", "Thin Book"]
OPS = ["APPEND"] * 50 + ["UPDATE"] * 30 + ["DELETE"] * 10 + [None]


def _odate(rnd, month=None):
    m = month if month is not None else rnd.randint(1, 12)
    return (f"{m:02d}-{rnd.randint(1, 28):02d}-2024 "
            f"{rnd.randint(0, 23):02d}:{rnd.randint(0, 59):02d}:00")


def _gen(rnd):
    """Deterministic reference-shaped rows. FK sampling at ~0.8 leaves
    unmatched rows on both sides (what differentiates join types);
    item_name is low-cardinality (theta-join selectivity relies on
    repeats); addresses carry newlines; operation is null ~1%."""
    cust = [
        {"id": f"c{i:03d}", "firstname": f"fn{i}", "lastname": f"ln{i}",
         "email": f"u{i}@example.com", "address": f"{i} Main St\nApt {i}",
         "operation": rnd.choice(OPS), "operation_date": _odate(rnd)}
        for i in range(30)
    ]
    cust_ids = [c["id"] for c in cust[: int(30 * 0.8)]]
    txns = [
        {"id": f"t{i:03d}", "customer_id": rnd.choice(cust_ids),
         "transaction_date": _odate(rnd), "amount": float(rnd.randint(0, 1000)),
         "item_count": float(rnd.randint(0, 10)),
         "operation": rnd.choice(OPS), "operation_date": _odate(rnd)}
        for i in range(90)
    ]
    txn_ids = [t["id"] for t in txns[: int(90 * 0.8)]]
    orders = [
        {"id": f"o{i:03d}", "transaction_id": rnd.choice(txn_ids),
         "delivery_date": _odate(rnd), "item_name": rnd.choice(ITEMS),
         "operation": rnd.choice(OPS), "operation_date": _odate(rnd)}
        for i in range(60)
    ]
    ord_ids = [o["id"] for o in orders[: int(60 * 0.8)]]
    prods = [
        {"id": f"p{i:03d}", "order_id": rnd.choice(ord_ids),
         "item_name": rnd.choice(ITEMS), "item_operation": rnd.choice(OPS),
         "item_operation_date": _odate(rnd), "price": float(rnd.randint(0, 10))}
        for i in range(40)
    ]
    return cust, txns, orders, prods


def _write_json(dirpath, name, rows, n_files=3):
    dirpath.mkdir(parents=True, exist_ok=True)
    per = max(1, len(rows) // n_files)
    for f_idx in range(0, len(rows), per):
        chunk = rows[f_idx : f_idx + per]
        with open(dirpath / f"{name}_{f_idx:04d}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")


# reference renames (SetupInputStream.py:170-202)
def _rename_c(df):
    return (df.withColumnRenamed("id", "customer_id")
              .withColumnRenamed("operation", "customer_operation")
              .withColumnRenamed("operation_date", "customer_operation_date"))


def _rename_t(df):
    out = df.withColumnRenamed("id", "transaction_id")
    return out.withColumn(
        "date",
        (F.year(F.to_date("operation_date", "MM-dd-yyyy HH:mm:ss")) * 10000
         + F.month(F.to_date("operation_date", "MM-dd-yyyy HH:mm:ss")) * 100
         ).cast("long"),
    )


def _rename_o(df):
    return (df.withColumnRenamed("id", "order_id")
              .withColumnRenamed("operation", "order_operation")
              .withColumnRenamed("operation_date", "order_operation_date"))


def _rename_p(df):
    return (df.withColumnRenamed("id", "product_id")
              .withColumnRenamed("order_id", "product_order_id")
              .withColumnRenamed("item_name", "product_name"))


def _batch_oracle(cts):
    """The reference's batch recompute over the final silver states
    (JoinTestComplex1-shaped, tests/JoinTestComplex1.py + JoinTestInner.py:
    22-25), with identical renames."""
    c = _rename_c(cts["c"].snapshot()).alias("c")
    t = _rename_t(cts["t"].snapshot()).alias("t")
    o = _rename_o(cts["o"].snapshot()).alias("o")
    p = _rename_p(cts["p"].snapshot()).alias("p")
    return (
        t.join(c, "customer_id", "left")
        .join(o, "transaction_id", "inner")
        .join(
            p,
            (F.col("product_name") == F.col("item_name"))
            & (F.col("product_name") == "Small Towels"),
            "left",
        )
    )


def test_reference_fixture_chain_e2e(spark, tmp_path):
    rnd = random.Random(42)
    cust, txns, orders, prods = _gen(rnd)

    # late/stale duplicate-PK records across files: the late one (bigger
    # lexical operation_date within 2024) must win the merge, the stale
    # one must lose (reference sequence condition u.seq <= staged.seq,
    # elzyme/joins.py:704-706)
    late = dict(txns[0]); late["amount"] = 9999.0
    late["operation_date"] = "12-28-2024 23:59:00"
    stale = dict(txns[1]); stale["amount"] = -1.0
    stale["operation_date"] = "01-01-2024 00:00:00"
    txns[1]["operation_date"] = "06-15-2024 12:00:00"

    land = tmp_path / "land"
    _write_json(land / "c", "c", cust)
    _write_json(land / "t", "t", txns + [late, stale])
    _write_json(land / "o", "o", orders)
    _write_json(land / "p", "p", prods)

    def mk(name, schema, pk, seq):
        return ChangeTable.create(
            spark, str(tmp_path / f"silver_{name}"),
            spark.createDataFrame([], schema).schema, [pk], sequence_by=[seq],
        )

    cts = {
        "c": mk("c", CUST, "id", "operation_date"),
        "t": mk("t", TXN, "id", "operation_date"),
        "o": mk("o", ORD, "id", "operation_date"),
        "p": mk("p", PROD, "id", "item_operation_date"),
    }
    ings = {
        k: FileIngest(spark, str(land / k / "*.json"), cts[k],
                      fmt="json", mode="merge", max_files_per_batch=1)
        for k in cts
    }
    for k, ing in ings.items():
        assert ing.run() >= 3          # one commit per file ⇒ many batches
        assert cts[k].version() >= 3

    # sequence-ordered upsert: late record won, stale record lost
    t0 = {r["id"]: r["amount"] for r in cts["t"].snapshot().collect()}
    assert t0["t000"] == 9999.0
    assert t0["t001"] != -1.0

    c = Stream.fromChangeTable(cts["c"], "c").to(_rename_c).primaryKeys(
        "customer_id").sequenceBy("customer_operation_date")
    t = Stream.fromChangeTable(cts["t"], "t").to(_rename_t).primaryKeys(
        "transaction_id").sequenceBy("operation_date")
    o = Stream.fromChangeTable(cts["o"], "o").to(_rename_o).primaryKeys(
        "order_id").sequenceBy("order_operation_date")
    p = Stream.fromChangeTable(cts["p"], "p").to(_rename_p).primaryKeys(
        "product_id").sequenceBy("item_operation_date")

    w = (
        t.join(c, "left").onKeys("customer_id")
        .join(o, "inner").onKeys("transaction_id")
        .join(p, "left").on(
            (p["product_name"] == o["item_name"])
            & (p["product_name"] == "Small Towels")
        )
        .writeToPath(str(tmp_path / "gold"))
        .option("maxVersionsPerTrigger", 2)
    )
    slices = w.run()
    assert slices > 3                  # governed, multi-slice drain
    assert_same(w.toDF(), _batch_oracle(cts))

    # second wave: new rows + a newer update riding in by ingest
    rnd2 = random.Random(7)
    wave2_t = [
        {"id": "t500", "customer_id": "c001", "transaction_date": _odate(rnd2),
         "amount": 123.0, "item_count": 1.0, "operation": "APPEND",
         "operation_date": "12-30-2024 01:00:00"},
        dict(txns[2], amount=777.0, operation_date="12-30-2024 02:00:00"),
    ]
    wave2_p = [
        {"id": "p500", "order_id": "o001", "item_name": "Small Towels",
         "item_operation": "APPEND",
         "item_operation_date": "12-30-2024 03:00:00", "price": 5.0},
    ]
    _write_json(land / "t", "t_wave2", wave2_t, n_files=1)
    _write_json(land / "p", "p_wave2", wave2_p, n_files=1)
    assert ings["t"].run() == 1 and ings["p"].run() == 1

    w.run()
    assert_same(w.toDF(), _batch_oracle(cts))
    amounts = {r["transaction_id"]: r["amount"]
               for r in w.toDF().select("transaction_id", "amount").collect()}
    assert amounts.get("t002", 777.0) == 777.0    # update propagated (if joined)

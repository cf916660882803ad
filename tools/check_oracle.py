"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: stable short repr
        return f"{v:.9g}"
    return str(v)


def frame_signature(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    body = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, body


def main():
    import __spark_entry__ as entrymod
    from streamjoin_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        sc, sb = frame_signature(srows, scols)
        oc, ob = frame_signature(orows, ocols)
        dt = time.time() - t0
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: schema mismatch spark={sc} duck={oc}")
        elif len(sb) != len(ob):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sb)} duck={len(ob)}")
        elif sb != ob:
            failures.append(name)
            diffs = [i for i, (a, b) in enumerate(zip(sb, ob)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs at {diffs}")
            for i in diffs[:2]:
                print(f"      spark={sb[i]}")
                print(f"      duck ={ob[i]}")
        else:
            print(f"ok    {name}: rows={len(sb)} ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

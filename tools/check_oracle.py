"""Local emulation of the driver's correctness gate — driver-strict.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column names,
*column type classes*, and order-insensitive values (columns sorted by name,
rows sorted).

Strictness contract (VERDICT r1 item 2): this gate must be at least as strict
as the driver's hash. Concretely:
  - floats are canonicalized at FULL precision (repr), not %.9g — last-ulp
    summation-order drift is a failure here, as it is for the driver;
  - numeric type classes are part of the signature: BIGINT != HUGEINT !=
    DECIMAL != DOUBLE. DuckDB SUM(BIGINT) returns HUGEINT (int128) which the
    driver hashes differently from Spark's LongType even when values print
    identically (tpch_q12, r1) — oracle SQL must CAST(... AS BIGINT).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import re
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

_INT_TYPES = {
    "tinyint", "smallint", "int", "integer", "bigint", "long",
    "utinyint", "usmallint", "uinteger", "ubigint",
}
_FLOAT_TYPES = {"float", "double", "real"}
_STR_TYPES = {"string", "varchar", "text"}
_TS_TYPES = {
    "timestamp", "timestamp_ntz", "timestamp_ltz", "datetime",
    "timestamp_s", "timestamp_ms", "timestamp_ns",
    "timestamp with time zone", "timestamptz",
}


def type_class(t: str) -> str:
    """Collapse a Spark simpleString / DuckDB type string into the class the
    driver's hash distinguishes. int vs hugeint vs decimal vs float matter."""
    t = t.strip().lower()
    if t in _INT_TYPES:
        return "int"
    if t in ("hugeint", "int128"):
        return "hugeint"
    m = re.match(r"decimal\s*\((\d+)\s*,\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(2)})"  # scale only; precision widens on SUM
    if t == "decimal":
        return "decimal(?)"
    if t in _FLOAT_TYPES:
        return "float"
    if t in _STR_TYPES:
        return "str"
    if t in _TS_TYPES:
        return "ts"
    if t == "date":
        return "date"
    if t in ("boolean", "bool"):
        return "bool"
    m = re.match(r"array<(.*)>$", t)
    if m:
        return f"list<{type_class(m.group(1))}>"
    m = re.match(r"(.*)\[\]$", t)
    if m:
        return f"list<{type_class(m.group(1))}>"
    return t


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # collapse -0.0 vs 0.0 (engine-dependent for empty sums)
            return "0.0"
        return repr(v)  # FULL precision — ulp drift must fail
    if isinstance(v, _decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    return str(v)


def frame_signature(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    schema = [(cols[i], type_class(types[i])) for i in order]
    body = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return schema, body


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
            stypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = [str(t) for t in rel.types]
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        sc, sb = frame_signature(srows, scols, stypes)
        oc, ob = frame_signature(orows, ocols, otypes)
        dt = time.time() - t0
        if sc != oc:
            failures.append(name)
            print(f"FAIL  {name}: schema mismatch\n      spark={sc}\n      duck ={oc}")
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

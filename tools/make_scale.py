"""Synthesize a K× replica of a testdata dir for scaling-law measurement.

The 100 TB posture of every operator in this repo is argued from plan shape
(what shuffles, what broadcasts, what prunes); this tool buys the missing
EMPIRICAL evidence locally: replicate sf0.1 K× (default 10×, ~170 MB) and
measure t(K×)/t(1×) per heavy query — a documented-linear operator whose
ratio bends super-linear has a hidden quadratic.

Replication must preserve each table's STATISTICAL structure, not just its
row count — naive row cloning corrupts exactly the physics under test:

- ``documents``: cloning text K× turns every document into a K-clone group,
  so every pair-finder's output grows ~K²/2 per group and the measured law
  would read "quadratic" for a perfectly linear operator. Instead each
  replica k>0 deterministically SALTS ~60% of distinct tokens
  (``w → w~k``, chosen by crc32(w) mixed with k): duplicate structure
  WITHIN a replica is preserved exactly (the same salting applies to both
  members of a dup pair), while cross-replica Jaccard collapses to ~0.09
  (shared-token fraction ≈ 0.4² over the union), far below every
  pair-finder threshold — the corpus behaves like K disjoint sub-corpora
  of identical shape, which is exactly how a 10× crawl behaves.
- ``embeddings``: ids offset; each replica adds small deterministic
  Gaussian noise (σ=0.02, seeded by k) so ANN distance structure is
  preserved without degenerate exact ties across replicas.
- ``events``: event/user ids offset per replica → disjoint user universes;
  sessionization, funnels and the event-derived graphs scale linearly by
  construction (10 disjoint copies of the same workload).
- TPC-H facts/dims: every key column offsets by k·10⁷ consistently across
  tables (custkey in customer+orders, orderkey in orders+lineitem, …) so
  referential integrity holds per replica; ``nation``/``region`` stay
  single copies (bounded dims shared by all replicas, as in real TPC-H
  scaling).

Usage: python tools/make_scale.py [K] [src_dir] [out_dir] [--tables a,b,c]
       (defaults: 10 /root/testdata/sf0.1 /tmp/scale/sf1, all tables)
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id offset per replica — far above any sf0.1 key space; override via
# SCALE_OFFSET when replicating an ALREADY-replicated dir (its ids occupy
# k·10M slots, so a second-level replication needs a bigger stride)
OFF = int(os.environ.get("SCALE_OFFSET", 10_000_000))

# key columns to offset, per table
KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
COPY_ONLY = ["nation", "region"]  # bounded shared dims: single copy


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _scramble(w: str, k: int) -> str:
    """Deterministic pseudo-word for (w, replica k): every byte differs
    from the original (md5-derived letters, length preserved +1). A mere
    suffix salt (``w~k``) is NOT enough for the media queries: their
    payload fingerprints (sliding-window simhash over encode(text)) keep
    all in-word windows identical across replicas, so replicas stayed
    within the near-dup hamming radius and pair counts grew ~K²
    (measured: image pairs 38.7× at K=10). Full-word scrambles share no
    windows, pushing cross-replica fingerprints to ~half the bits apart."""
    h = hashlib.md5(f"{w}|{k}".encode()).hexdigest()
    n = len(w) + 1
    out = []
    for i in range(n):
        out.append(_ALPHA[int(h[(2 * i) % 32 : (2 * i) % 32 + 2], 16) % 26])
    return "".join(out)


def _salt_text(texts: list[str | None], k: int) -> tuple[list, list]:
    """Deterministically scramble ~60% of distinct tokens for replica k>0.
    Per-TOKEN (not per-position) so every occurrence of a word moves
    together and intra-replica shingle/dup structure is preserved."""
    cache: dict[str, str] = {}
    out_text, out_chars = [], []
    for t in texts:
        if t is None:
            out_text.append(None)
            out_chars.append(None)
            continue
        words = t.split(" ")
        salted = []
        for w in words:
            s = cache.get(w)
            if s is None:
                h = (zlib.crc32(w.encode("utf-8")) + 0x9E3779B1 * k) & 0xFFFFFFFF
                s = _scramble(w, k) if h % 10 < 6 else w
                cache[w] = s
            salted.append(s)
        nt = " ".join(salted)
        out_text.append(nt)
        out_chars.append(len(nt))
    return out_text, out_chars


def _replicate(name: str, table: pa.Table, k: int) -> pa.Table:
    """One replica (k=0 is the identity)."""
    if k == 0:
        return table
    cols = {c: table.column(c) for c in table.column_names}
    for c in KEY_COLS.get(name, []):
        cols[c] = pc.add(cols[c], pa.scalar(k * OFF, type=cols[c].type))
    if name == "documents":
        texts = cols["text"].to_pylist()
        nt, nc = _salt_text(texts, k)
        cols["text"] = pa.array(nt, type=pa.string())
        cols["n_chars"] = pa.array(nc, type=table.schema.field("n_chars").type)
    if name == "embeddings":
        # per-replica RANDOM ORTHOGONAL rotation: cosine similarity is
        # invariant under Q_k, so intra-replica near-dup/ANN structure is
        # preserved EXACTLY, while cross-replica cosines randomize to ~0 —
        # additive noise (the first attempt) left replicas inside the
        # near-dup radius and pair counts grew ~K² (measured 346× at K=10)
        emb = cols["embedding"].combine_chunks()
        flat = np.asarray(emb.values, dtype=np.float32)
        dim = flat.shape[0] // len(emb)
        mat = flat.reshape(-1, dim)
        rng = np.random.default_rng(42 + k)
        q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
        rotated = (mat @ q.astype(np.float32)).astype(np.float32).ravel()
        cols["embedding"] = type(emb).from_arrays(emb.offsets, pa.array(rotated))
    return pa.table(cols, schema=pa.schema(
        [table.schema.field(c) for c in table.column_names]
    ))


def main() -> None:
    argv, args, only = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        if argv[i] == "--tables":
            only = set(argv[i + 1].split(","))
            i += 2
        else:
            args.append(argv[i])
            i += 1
    k_total = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = args[2] if len(args) > 2 else "/tmp/scale/sf1"
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        if only is not None and name not in only:
            continue
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows}")
    for name in KEY_COLS:
        if only is not None and name not in only:
            continue
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        reps = [_replicate(name, t, k) for k in range(k_total)]
        big = pa.concat_tables(reps)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()

"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata structs; decode/feature-extraction runs as Arrow-batched
pandas stages over ``mapInPandas`` — the only place Python belongs in the
hot path, because the work is per-blob CPU, not relational.

Decode modes (the Spark-side plumbing — schema, batch iteration,
partitioning, output shape — is identical in all of them):

- ``decode="fake"`` (default): deterministic pseudo-features from the
  blob's md5 — no codec libs needed, exact SQL oracle twin possible.
- ``decode="real"`` images: Pillow behind an import guard — decodes
  width/height/mean-luma when PIL is importable, raises
  ``NotImplementedError`` with install guidance otherwise (this
  environment has no PIL; a real cluster pip-installs it and the same
  code lights up).
- ``decode="real"`` audio: raw little-endian 16-bit PCM windows via
  numpy — RMS and zero-crossing rate computed for real, no codec lib
  required (the contract is PCM windows, e.g. a WAV file's data
  section; container/codec demux belongs upstream or behind
  soundfile/ffmpeg on a real cluster).

Scale notes: mapInPandas streams Arrow batches, so per-executor memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean blob
size — set it low (e.g. 64) for video. Repartition by a size-bucket column
first when blob sizes are heavy-tailed, so one task doesn't get all the
4K videos.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("format", T.StringType()),       # png/wav/mp4/...
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Wrap a binary column with a typed metadata struct (the multimodal
    data-model convention: blob stays opaque, metadata is columnar and
    prunable)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _real_image_decode(blob: bytes) -> tuple[int, int, float]:
    """PIL decode behind an import guard: width, height, mean luminance.
    Raises NotImplementedError (not ImportError) when Pillow is absent so
    the caller's error reads as an environment gap, not a bug."""
    try:
        from PIL import Image  # noqa: PLC0415 — guarded optional dep
    except ImportError as e:
        raise NotImplementedError(
            "decode='real' for images needs Pillow (pip install pillow); "
            "not available in this environment — use decode='fake' for "
            "plumbing tests"
        ) from e
    import io

    import numpy as np

    with Image.open(io.BytesIO(blob)) as img:
        width, height = img.size
        luma = float(np.asarray(img.convert("L"), dtype=np.float64).mean())
    return width, height, luma


def _real_audio_decode(chunk: bytes) -> tuple[float, float]:
    """Real per-window features for raw s16le PCM: RMS (in sample units)
    and zero-crossing rate — numpy only, no codec lib. A trailing odd byte
    (partial sample at a window boundary) is dropped."""
    import numpy as np

    pcm = np.frombuffer(chunk[: len(chunk) - (len(chunk) % 2)], dtype="<i2")
    if pcm.size == 0:
        return 0.0, 0.0
    x = pcm.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x)))
    if pcm.size == 1:
        return rms, 0.0
    signs = np.signbit(x)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / (pcm.size - 1)
    return rms, zcr


def _fake_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic pseudo-decode from md5 — stands in for PIL/ffmpeg.
    width = 1 + h[:15] % 4096, height = 1 + h[15:30] % 4096,
    mean_luma = (h[-15:] % 256000) / 1000."""
    h = hashlib.md5(blob).hexdigest()
    width = 1 + int(h[:15], 16) % 4096
    height = 1 + int(h[15:30], 16) % 4096
    luma = (int(h[-15:], 16) % 256000) / 1000.0
    return width, height, luma


def image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: str = "fake",
) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched ``mapInPandas``.

    Output: (doc_id, n_bytes, width, height, mean_luma). The batch loop,
    schema contract and partition behavior are production-shaped;
    ``decode="real"`` uses Pillow behind an import guard (install it and
    this path lights up unchanged), ``decode="fake"`` is the
    deterministic md5 stub with an exact SQL oracle twin.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    # decode dominates I/O by orders of magnitude — one round-robin shuffle
    # of (id, payload) ahead of the Python stage keeps every core decoding
    # even when the input arrives as a handful of large files
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.repartition(par).select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _real_image_decode if decode == "real" else _fake_decode
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "mean_luma": pd.Series([f[2] for f in feats], dtype="float64"),
                }
            )

    return src.mapInPandas(run, schema=IMAGE_FEATURES)


# per-worker-process memo for SMALL analysis windows (fingerprint-style
# bytes_per_window ≤ 8): tiny windows of real corpora repeat massively
# (4-byte text windows draw from a ~1e3-1e5 universe), so each distinct
# window pays its md5 once per reused worker (guide §4.5). Large windows
# are essentially unique — memoizing them would only grow the dict — so
# they bypass the cache; a size cap bounds worst-case adversarial input.
_AUDIO_MEMO: dict = {}
_AUDIO_MEMO_CAP = 1 << 20


def _fake_audio_decode(chunk: bytes) -> tuple[float, float]:
    """Deterministic pseudo audio features from the chunk's hex-md5 —
    stands in for an ffmpeg/torchaudio decode + RMS/zero-crossing pass.
    Hashing the UPPERCASE HEX of the bytes (not the raw bytes) keeps an
    exact ANSI-SQL twin possible: SQL md5() takes strings, and arbitrary
    byte windows of utf-8 text are not valid strings."""
    if len(chunk) <= 8:
        hit = _AUDIO_MEMO.get(chunk)
        if hit is not None:
            return hit
    h = hashlib.md5(chunk.hex().upper().encode()).hexdigest()
    rms = (int(h[:15], 16) % 100000) / 1000.0
    zcr = (int(h[15:30], 16) % 1000) / 1000.0
    if len(chunk) <= 8 and len(_AUDIO_MEMO) < _AUDIO_MEMO_CAP:
        _AUDIO_MEMO[bytes(chunk)] = (rms, zcr)
    return rms, zcr


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bytes_per_window: int = 4000,
    decode: str = "fake",
) -> DataFrame:
    """Windowed audio feature extraction: split each audio blob into
    fixed-size analysis windows and compute per-window features (RMS,
    zero-crossing rate) via Arrow-batched ``mapInPandas``.

    The window plan is declarative — ``sequence`` + ``explode`` — and the
    byte slice happens JVM-side (``substr`` on the binary column) BEFORE
    the Python stage, so parallelism is across windows, not blobs, and no
    Python call ever sees more than ``bytes_per_window`` bytes: an
    hour-long recording becomes thousands of independent bounded tasks
    instead of one unbounded decode (same physics as
    ``frame_sample_plan`` for video).

    Output: (doc_id, window_idx, n_bytes, rms, zcr); the trailing window
    is partial, empty payloads yield one empty window. ``decode="real"``
    computes true RMS/ZCR treating windows as raw s16le PCM (numpy only —
    works in this environment; container demux belongs upstream);
    ``decode="fake"`` is the md5 stub with an exact SQL oracle twin.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if bytes_per_window <= 0:
        raise ValueError("bytes_per_window must be positive")

    n_win = F.greatest(
        F.ceil(F.length(F.col(payload_col)) / F.lit(bytes_per_window)).cast("int"),
        F.lit(1),
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    exploded = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("payload"),
            F.explode(F.sequence(F.lit(0), n_win - F.lit(1))).alias("window_idx"),
        )
        .select(
            "doc_id",
            "window_idx",
            F.col("payload")
            .substr(
                F.col("window_idx") * F.lit(bytes_per_window) + F.lit(1),
                F.lit(bytes_per_window),
            )
            .alias("chunk"),
        )
        .repartition(par)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _real_audio_decode if decode == "real" else _fake_audio_decode
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf["chunk"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "window_idx": pdf["window_idx"].astype("int32"),
                    "n_bytes": pdf["chunk"].map(len).astype("int64"),
                    "rms": pd.Series([f[0] for f in feats], dtype="float64"),
                    "zcr": pd.Series([f[1] for f in feats], dtype="float64"),
                }
            )

    return exploded.mapInPandas(run, schema=AUDIO_FEATURES)


def frame_sample_plan(
    df: DataFrame,
    every_n_seconds: float = 1.0,
    duration_col: str = "duration_s",
    id_col: str = "doc_id",
) -> DataFrame:
    """Expand each video row into one row per sampled frame timestamp —
    declarative (sequence + explode), no Python: the expensive decode then
    runs on the *exploded* frame rows, so Spark parallelizes across frames,
    not videos (critical when one video is hours long)."""
    n = F.greatest(
        F.floor(F.col(duration_col) / every_n_seconds).cast("int"), F.lit(0)
    )
    return df.select(
        F.col(id_col), F.explode(F.sequence(F.lit(0), n)).alias("frame_idx")
    ).withColumn("frame_ts_s", F.col("frame_idx") * F.lit(every_n_seconds))


PHASH = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


def _fake_phash(blob: bytes) -> str:
    """Deterministic stand-in perceptual hash that is genuinely
    LOCALITY-SENSITIVE (an md5-of-the-whole-payload stub would avalanche —
    near-identical payloads must land near each other or the pairing tier
    is never exercised): a 64-bit simhash over the payload's sliding
    4-byte windows. Each window's md5 votes ±1 per bit position; a small
    edit perturbs only the windows it touches, flipping a few bits, while
    unrelated payloads land ~32 apart — the aHash distance profile.
    Payloads shorter than 4 bytes hash to all-zeros. Exact SQL twin
    (ASCII payloads; the real tier decodes actual pixels)."""
    n = len(blob) - 3
    if n <= 0:
        return "0" * 64
    import numpy as np

    # one md5 per window (C-speed), then vectorized bit votes: unpackbits
    # is MSB-first per byte, so column j holds bit (63-j) of the big-endian
    # 8-byte digest prefix — identical semantics to (h >> k) & 1 on
    # int(hexdigest[:16], 16), which the SQL twin mirrors
    packed = np.frombuffer(
        b"".join(hashlib.md5(blob[i : i + 4]).digest()[:8] for i in range(n)),
        dtype=np.uint8,
    ).reshape(n, 8)
    ones = np.unpackbits(packed, axis=1).sum(axis=0)
    return "".join(
        "1" if 2 * int(ones[63 - k]) > n else "0" for k in range(64)
    )


# per-worker-process memo for _fake_phash_batch: 4-byte window (as uint32,
# little-endian byte order) -> row index into _PHASH_BITS, whose row is the
# window's md5-digest-prefix bit vector (unpackbits order — column j = bit
# 63-j of the big-endian 8-byte prefix, exactly _fake_phash's law). Windows
# repeat massively across documents (text corpora carry ~1e3 distinct
# 4-grams), so each distinct window pays its md5 ONCE per reused worker
# instead of once per occurrence (guide §4.5 heavyweight-state pattern).
# The cap bounds worker memory on adversarial high-entropy corpora (the
# full uint32 universe would be ~0.5 GB of dict + bit rows); past it,
# overflow windows compute their digest per batch without entering the
# memo — output unchanged either way.
_PHASH_CACHE: dict[int, int] = {}
_PHASH_CACHE_CAP = 1 << 20
_PHASH_BITS = None  # lazily-grown (n, 64) uint8 ndarray, ≤ cap rows
# per-group window budget: every transient ndarray a group allocates (the
# window-value vector, unique/inverse, the (windows, 64) bit gather) stays
# a few MB — safely under glibc's DYNAMIC mmap threshold, so scratch
# recycles inside the malloc arena across groups instead of munmap/mmap
# cycles. That matters: on ballooned/lazily-backed VMs, first touch of
# freshly mapped pages can run orders of magnitude slower than a warm
# write (measured this round: an unbounded batch re-mapped ~40-250 MB of
# scratch per Arrow batch and stalled 10-60 s — 6× SLOWER end-to-end than
# the per-row md5 loop it replaced, on the video frame shape).
_PHASH_GROUP_WINDOWS = 1 << 17

# glibc by default serves large mallocs with mmap and returns them on free;
# every new batch then re-faults fresh pages, which on lazily-backed VMs
# (balloon + free-page reporting) can run ~4 MB/s — measured here: a fresh
# 64 MB scratch write took 10-19 s while the identical warm-buffer write
# took <1 ms. Pinning the allocator to the brk heap with trimming off makes
# a worker fault each scratch page ONCE for its lifetime (classic long-
# lived-worker allocator tuning; RSS holds at the bounded per-worker peak —
# a few × the group budget). Best-effort: silently skipped off glibc.
_MALLOC_PINNED = False


def _pin_malloc() -> None:
    global _MALLOC_PINNED
    if _MALLOC_PINNED:
        return
    _MALLOC_PINNED = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
        libc.mallopt(M_MMAP_MAX, 0)
    except Exception:
        pass


def _phash_bits_for(uniq, np):
    """(len(uniq), 64) bit rows for the given sorted unique window values:
    memo hits gathered from _PHASH_BITS, misses md5'd once and appended to
    the memo (amortized-doubling table growth) up to the cap; cap overflow
    stays group-local. Output is independent of cache state."""
    global _PHASH_BITS
    rows = np.empty(len(uniq), dtype=np.int64)
    grow = []
    extra = []  # cap-overflow bit rows, group-local (negative row ids)
    for j, v in enumerate(uniq.tolist()):
        r = _PHASH_CACHE.get(v)
        if r is None:
            d = hashlib.md5(v.to_bytes(4, "little")).digest()[:8]
            bitrow = np.unpackbits(np.frombuffer(d, dtype=np.uint8))
            if len(_PHASH_CACHE) < _PHASH_CACHE_CAP:
                r = len(_PHASH_CACHE)
                _PHASH_CACHE[v] = r
                grow.append(bitrow)
            else:
                r = -(len(extra) + 1)
                extra.append(bitrow)
        rows[j] = r
    if grow:
        n_total = len(_PHASH_CACHE)
        if _PHASH_BITS.shape[0] < n_total:
            new_cap = max(1024, _PHASH_BITS.shape[0] * 2, n_total)
            nb = np.zeros((new_cap, 64), dtype=np.uint8)
            nb[: n_total - len(grow)] = _PHASH_BITS[: n_total - len(grow)]
            _PHASH_BITS = nb
        _PHASH_BITS[n_total - len(grow) : n_total] = np.asarray(
            grow, dtype=np.uint8
        )
    cached = rows >= 0
    bits = np.empty((len(uniq), 64), dtype=np.uint8)
    bits[cached] = _PHASH_BITS[rows[cached]]
    if extra:
        bits[~cached] = np.asarray(extra, dtype=np.uint8)[-rows[~cached] - 1]
    return bits


def _phash_group_votes(parts, lens, np):
    """Vote matrix (len(parts), 64) for a doc group whose total window
    count is ≤ _PHASH_GROUP_WINDOWS (callers guarantee it): one window
    extraction, one np.unique + memo probe, one segmented reduceat."""
    lens_a = np.asarray(lens, dtype=np.int64)
    buf = np.frombuffer(b"".join(parts), dtype=np.uint8).astype(np.uint32)
    # window start offsets: doc d (byte length lens[d]+3) contributes
    # windows at its first lens[d] byte positions
    doc_off = np.concatenate(([0], np.cumsum(lens_a + 3)))[:-1]
    win_off = np.concatenate(([0], np.cumsum(lens_a)))[:-1]
    starts = np.repeat(doc_off - win_off, lens_a) + np.arange(
        int(lens_a.sum())
    )
    u = (
        buf[starts]
        | (buf[starts + 1] << 8)
        | (buf[starts + 2] << 16)
        | (buf[starts + 3] << 24)
    )
    uniq, inverse = np.unique(u, return_inverse=True)
    bits = _phash_bits_for(uniq, np)
    seg = bits[inverse]  # (wsum, 64) uint8, bounded by the group budget
    offs = win_off.astype(np.int64)
    return np.add.reduceat(seg, offs, axis=0, dtype=np.int64)


def _phash_single_votes(blob, n, np):
    """(64,) vote vector for ONE doc with n windows, window-sliced so a
    huge payload still never materializes more than the group budget."""
    bv = np.frombuffer(blob, dtype=np.uint8)
    ones = np.zeros(64, dtype=np.int64)
    step = _PHASH_GROUP_WINDOWS
    for off in range(0, n, step):
        m = min(step, n - off)
        w = bv[off : off + m + 3].astype(np.uint32)
        u = w[:m] | (w[1 : m + 1] << 8) | (w[2 : m + 2] << 16) | (
            w[3 : m + 3] << 24
        )
        uniq, inverse = np.unique(u, return_inverse=True)
        bits = _phash_bits_for(uniq, np)
        ones += bits[inverse].sum(axis=0, dtype=np.int64)
    return ones


def _fake_phash_batch(blobs: "list[bytes]") -> "list[str]":
    """Whole-batch vectorized twin of ``_fake_phash`` — IDENTICAL output
    for every input (pinned by tests/test_corpus_ops.py): the same
    per-window md5 votes, accumulated with one memo probe + one segmented
    reduceat per bounded doc group instead of one md5 call per window
    occurrence. The bit law is unchanged: column j of the unpacked digest
    prefix is bit 63-j, and the output character k reads vote column 63-k
    with the strict 2·ones > n majority."""
    global _PHASH_BITS
    import numpy as np

    _pin_malloc()
    if _PHASH_BITS is None:
        _PHASH_BITS = np.zeros((0, 64), dtype=np.uint8)
    out: list = [None] * len(blobs)
    keep_i, parts, lens = [], [], []
    for i, b in enumerate(blobs):
        n = len(b) - 3
        if n <= 0:
            out[i] = "0" * 64
        else:
            keep_i.append(i)
            parts.append(b)
            lens.append(n)
    if not parts:
        return out
    n_docs = len(parts)
    ones = np.empty((n_docs, 64), dtype=np.int64)
    d0 = 0
    while d0 < n_docs:
        if lens[d0] > _PHASH_GROUP_WINDOWS:
            ones[d0] = _phash_single_votes(parts[d0], lens[d0], np)
            d0 += 1
            continue
        d1 = d0 + 1
        wsum = lens[d0]
        while (
            d1 < n_docs
            and lens[d1] <= _PHASH_GROUP_WINDOWS
            and wsum + lens[d1] <= _PHASH_GROUP_WINDOWS
        ):
            wsum += lens[d1]
            d1 += 1
        ones[d0:d1] = _phash_group_votes(parts[d0:d1], lens[d0:d1], np)
        d0 = d1
    lens_a = np.asarray(lens, dtype=np.int64)
    cond = (2 * ones[:, ::-1]) > lens_a[:, None]
    chars = (cond.astype(np.uint8) + 48).tobytes().decode("ascii")
    for j, i in enumerate(keep_i):
        out[i] = chars[j * 64 : (j + 1) * 64]
    return out


def _real_phash(blob: bytes) -> str:
    """True average-hash: 8×8 grayscale resize, bit = pixel > mean —
    the classic aHash (near-identical images differ in a few bits)."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError as e:  # pragma: no cover - Pillow not in this env
        raise NotImplementedError(
            "real image decode needs Pillow: pip install pillow"
        ) from e
    px = list(
        Image.open(BytesIO(blob)).convert("L").resize((8, 8)).getdata()
    )
    mean = sum(px) / 64.0
    return "".join("1" if p > mean else "0" for p in px)


def image_phash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode: str = "fake",
    extra_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Perceptual hash per image via Arrow-batched ``mapInPandas`` —
    the signature half of image near-dup dedup. ``decode="real"`` is the
    true 8×8 aHash behind the Pillow import guard; ``decode="fake"`` the
    deterministic md5 stub with an exact SQL twin. Output:
    (doc_id, phash, *extra_cols) with a 64-char bit string.

    ``extra_cols`` ride THROUGH the pandas stage row-by-row (not joined
    back on the id afterwards): a change frame can carry pre- and
    post-images of the same key, and an id-keyed join-back would
    cross-product them — pass-through is the only row-local way to keep
    ancillary columns."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    extra_cols = list(extra_cols)
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.repartition(par).select(
        F.col(id_col).alias("doc_id"),
        F.col(payload_col).alias("payload"),
        *extra_cols,
    )
    schema = T.StructType(
        list(PHASH.fields)
        + [src.schema[c] for c in extra_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                hashes = [_real_phash(bytes(b)) for b in pdf["payload"]]
            else:
                # batch-vectorized md5-vote twin: identical output to the
                # per-row _fake_phash at ~10× less Python time (one md5
                # per DISTINCT window per worker, one scatter+matmul per
                # batch — guide §4.2/§4.5)
                hashes = _fake_phash_batch(
                    [bytes(b) for b in pdf["payload"]]
                )
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "phash": hashes,
            }
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)


def image_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 4,
    decode: str = "fake",
    blocked: bool = True,
    refine_over: int | str | None = "auto",
) -> DataFrame:
    """Image near-duplicate pairs: perceptual hashes within ``max_hamming``
    bits — re-encoded/resized/lightly-edited copies of the same picture
    land a few aHash bits apart, exact byte dups at 0. Pairing rides the
    generic pigeonhole bit-segment machinery (``dedup.signature_pairs``,
    lossless blocking), so at 100 TB the candidate join is per-segment
    uniform-key equi-joins over the (tiny) signature frame — the payloads
    themselves are touched exactly once, in the Arrow decode pass.
    Output: ``doc_a < doc_b, hamming``.
    """
    from .dedup import signature_pairs

    return signature_pairs(
        image_phash(df, payload_col, id_col, decode),
        id_col="doc_id",
        sig_col="phash",
        n_bits=64,
        max_hamming=max_hamming,
        blocked=blocked,
        refine_over=refine_over,
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bytes_per_window: int = 4000,
    n_bits: int = 64,
    decode: str = "fake",
) -> DataFrame:
    """Chromaprint-style audio fingerprint: the sign of the energy CHANGE
    between consecutive analysis windows, packed into an ``n_bits`` bit
    string (bit k = window k+1 louder than window k; recordings shorter
    than ``n_bits+1`` windows zero-pad). Windowed RMS comes from
    ``audio_features`` (Arrow decode — real PCM path behind the same
    guard), so a per-window wobble flips only its neighboring bits while
    unrelated audio lands ~half the bits apart — the energy-diff
    fingerprint real audio dedup (Chromaprint/AcoustID) is built on.

    Signature assembly is pure codegen off the feature frame: one
    ``collect_list`` per recording (bounded to n_bits+1 windows by the
    pre-filter), ``array_sort``, and a lazily-guarded element walk (CASE
    short-circuits, so out-of-range ``element_at`` never evaluates — ANSI
    safe). Output: ``(doc_id, afp)``.
    """
    # truncate the payload JVM-side BEFORE the decode stage: a filter on
    # window_idx cannot push through mapInPandas (opaque to Catalyst), so
    # without this every window of an hour-long recording would decode in
    # Python only to be discarded — the substr caps Python work at
    # (n_bits+1) windows per recording. Window n_bits of a longer payload
    # is a full window either way, so the kept windows are bit-identical.
    cap = (n_bits + 1) * bytes_per_window
    trunc = df.withColumn(
        payload_col, F.col(payload_col).substr(F.lit(1), F.lit(cap))
    )
    feats = audio_features(
        trunc, payload_col, id_col, bytes_per_window, decode
    ).where(F.col("window_idx") <= n_bits)
    agg = feats.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("window_idx", "rms"))
        ).alias("__w")
    )
    # Bits past the recording's last window are a deterministic function
    # of its WINDOW COUNT (hex digits of md5(n_windows), parity per
    # position), not zeros: a shared all-zero tail would put every short
    # recording in one giant pigeonhole bucket and turn the candidate
    # join quadratic (measured: ~20 s at sf0.1, dominated by one
    # degenerate segment). Length-salted padding makes the fingerprint
    # duration-sensitive — the Chromaprint stance: clips of clearly
    # different length are not near-dups — and bucket sizes collapse to
    # per-duration populations.
    # Nested whens, not `cond & element_at(...)`: & does NOT
    # short-circuit, so an out-of-range element_at would throw under ANSI
    # even when the size guard is false — CASE branches are the only lazy
    # construct.
    padh = F.md5(F.size(F.col("__w")).cast("string"))
    bits = F.transform(
        F.sequence(F.lit(1), F.lit(n_bits)),
        lambda i: F.when(
            F.size(F.col("__w")) >= i + 1,
            F.when(
                F.element_at(F.col("__w"), (i + 1).cast("int"))["rms"]
                > F.element_at(F.col("__w"), i.cast("int"))["rms"],
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ).otherwise(
            F.pmod(
                F.conv(
                    F.substring(padh, F.pmod(i - 1, F.lit(16)) + 1, F.lit(1)),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            ).cast("string")
        ),
    )
    return agg.select("doc_id", F.array_join(bits, "").alias("afp"))


def _afp_from_bytes(
    data: bytes, bytes_per_window: int, n_bits: int, decoder
) -> str:
    """Pure-Python rendition of the ``audio_fingerprint`` law for ONE
    payload: capped windowing, per-window RMS via ``decoder``, energy-diff
    sign bits, length-salted md5 padding. Kept in exact lockstep with the
    Column-expression law (pinned by
    tests/test_corpus_ops.py::test_audio_afp_row_local_matches_batch)."""
    data = data[: (n_bits + 1) * bytes_per_window]
    n_win = max(-(-len(data) // bytes_per_window), 1)
    n_win = min(n_win, n_bits + 1)
    rms = [
        decoder(data[k * bytes_per_window : (k + 1) * bytes_per_window])[0]
        for k in range(n_win)
    ]
    padh = hashlib.md5(str(n_win).encode()).hexdigest()
    bits = []
    for i in range(1, n_bits + 1):
        if n_win >= i + 1:
            bits.append("1" if rms[i] > rms[i - 1] else "0")
        else:
            bits.append(str(int(padh[(i - 1) % 16], 16) % 2))
    return "".join(bits)


def audio_afp(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bytes_per_window: int = 4000,
    n_bits: int = 64,
    decode: str = "fake",
    extra_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """ROW-LOCAL audio fingerprint: one input row → one ``(doc_id, afp)``
    row, bit-identical to ``audio_fingerprint`` (same window/RMS/padding
    law), but each recording's windows fold INSIDE its own Arrow row
    instead of a cross-row ``collect_list`` groupBy. That makes it legal
    as an incremental source transform: a change frame carries pre- AND
    post-images of one key, and the batch operator's groupBy would merge
    them into a garbage signature (the row-locality contract,
    pipelines.simhash_segment_rows precedent) — here each image
    fingerprints independently.

    Scale posture: the payload is truncated JVM-side to
    ``(n_bits+1)·bytes_per_window`` BEFORE the Arrow stage (filters do not
    push through mapInPandas), so Python work per recording is bounded
    regardless of duration; ``extra_cols`` (change-feed metadata) ride
    through the pandas stage row-by-row, never joined back on the id.
    Parallelism is across recordings — right for the incremental path's
    bounded slices; the batch operator's window-exploded form remains the
    better shape for one huge backfill of hour-long blobs.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    extra_cols = list(extra_cols)
    cap = (n_bits + 1) * bytes_per_window
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.repartition(par).select(
        F.col(id_col).alias("doc_id"),
        F.col(payload_col).substr(F.lit(1), F.lit(cap)).alias("payload"),
        *extra_cols,
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("afp", T.StringType()),
        ]
        + [src.schema[c] for c in extra_cols]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _real_audio_decode if decode == "real" else _fake_audio_decode
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"].astype("int64"),
                "afp": [
                    _afp_from_bytes(bytes(b), bytes_per_window, n_bits, decoder)
                    for b in pdf["payload"]
                ],
            }
            for c in extra_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=schema)


def audio_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    bytes_per_window: int = 4000,
    n_bits: int = 64,
    max_hamming: int = 3,
    decode: str = "fake",
    blocked: bool = True,
    refine_over: int | str | None = "auto",
) -> DataFrame:
    """Audio near-duplicate pairs: energy-diff fingerprints within
    ``max_hamming`` bits, paired by the generic pigeonhole machinery
    (``dedup.signature_pairs`` — lossless blocking, payloads decoded
    exactly once; ``refine_over`` engages the lossless hot-bucket
    refinement for entropy-limited fingerprint spaces, SCALING.md notes
    5-6). Output: ``doc_a < doc_b, hamming``.

    r12: fingerprints come from the ROW-LOCAL ``audio_afp`` — bit-identical
    to the window-exploded ``audio_fingerprint`` law (pinned by
    tests/test_corpus_ops.py::test_audio_afp_row_local_matches_batch) but
    each capped recording folds inside its own Arrow row, dropping the
    window explode → shuffle → collect_list/array_sort groupBy the batch
    form paid per corpus pass (guide §2.4: the JVM-side payload cap already
    bounds per-row work, so across-recording parallelism is sufficient)."""
    from .dedup import signature_pairs

    return signature_pairs(
        audio_afp(
            df, payload_col, id_col, bytes_per_window, n_bits, decode
        ),
        id_col="doc_id",
        sig_col="afp",
        n_bits=n_bits,
        max_hamming=max_hamming,
        blocked=blocked,
        refine_over=refine_over,
    )


def video_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    n_frames: int = 8,
    decode: str = "fake",
) -> DataFrame:
    """Per-frame perceptual hashes for video near-dup: sample ``n_frames``
    fixed-offset key frames JVM-side (binary ``substr`` — Python only ever
    sees one frame, the ``frame_sample_plan`` physics) and perceptual-hash
    each through the image path (Arrow-batched; real tier = 8×8 aHash of
    the decoded frame). Frames shorter than 4 bytes (past end-of-payload)
    are dropped. Output: ``(doc_id, frame_idx, fphash)``."""
    frames = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("payload"),
            F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias(
                "frame_idx"
            ),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.col("payload")
            .substr(
                F.col("frame_idx") * F.lit(frame_bytes) + F.lit(1),
                F.lit(frame_bytes),
            )
            .alias("frame"),
        )
        .where(F.length("frame") >= 4)
    )
    return image_phash(
        frames, "frame", "doc_id", decode, extra_cols=["frame_idx"]
    ).select("doc_id", "frame_idx", F.col("phash").alias("fphash"))


def video_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    n_frames: int = 8,
    min_shared: int = 2,
    max_fp_df: float | int | None = 0.5,
    decode: str = "fake",
) -> DataFrame:
    """Video near-duplicate pairs: videos sharing at least ``min_shared``
    distinct frame fingerprints — the content-based video retrieval
    inverted-index move (match on frames, rank by how many agree; robust
    to trims and re-muxes that keep frames intact). The join key is the
    frame phash itself: a uniform equi-join, never all-pairs.

    ``max_fp_df`` is the hot-frame guard (same physics as the hot-shingle
    cap): a frame fingerprint shared by k videos contributes k² candidate
    pairs, and universal boilerplate (intro cards, color bars) would go
    quadratic — fingerprints whose video-frequency exceeds the cap (a
    fraction of the corpus when ≤ 1, absolute otherwise) are dropped
    before the join; such frames carry no near-dup signal. ``None``
    disables. Output: ``doc_a < doc_b, n_shared``.
    """
    fps = video_fingerprints(
        df, payload_col, id_col, frame_bytes, n_frames, decode
    )
    # one hash(fphash) layout serves every consumer (r13, guide §2.4):
    # hash(fphash) satisfies the (doc_id, fphash) dedup clustering, the
    # hot-frame DF aggregate groups on fphash, and both legs of the
    # candidate self-join key on fphash — so the single repartition
    # exchange below is reused where the unpartitioned distinct paid a
    # fresh exchange per consumer. AQE sizes the partition count.
    dp = (
        fps.select("doc_id", "fphash")
        .repartition(F.col("fphash"))
        .dropDuplicates(["doc_id", "fphash"])
    )
    if max_fp_df is not None:
        dfreq = dp.groupBy("fphash").agg(F.count(F.lit(1)).alias("__df"))
        if max_fp_df <= 1:
            total = df.select(
                F.countDistinct(F.col(id_col)).alias("__n")
            )
            hot = dfreq.crossJoin(F.broadcast(total)).where(
                F.col("__df") > F.col("__n") * F.lit(float(max_fp_df))
            )
        else:
            hot = dfreq.where(F.col("__df") > F.lit(int(max_fp_df)))
        dp = dp.join(
            F.broadcast(hot.select("fphash")), "fphash", "left_anti"
        )
    a = dp.select(F.col("doc_id").alias("doc_a"), "fphash")
    b = dp.select(F.col("doc_id").alias("doc_b"), "fphash")
    return (
        a.join(b, "fphash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )

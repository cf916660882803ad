"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata structs; decode/feature-extraction runs as Arrow-batched
pandas stages over ``mapInPandas`` — the only place Python belongs in the
hot path, because the work is per-blob CPU, not relational.

The decode step itself needs codec libraries (PIL/ffmpeg/torchaudio) that
are NOT in this environment, so decoding is stubbed: ``decode=\"fake\"``
(default) derives deterministic pseudo-features from the blob's md5 —
making the Spark-side plumbing (schema, batch iteration, partitioning,
output shape) fully real and testable — while ``decode=\"real\"`` raises
``NotImplementedError`` where the codec call belongs.

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
    schema contract and partition behavior are production-shaped; only the
    innermost decode call is stubbed.
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
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode needs PIL/libvips — not available in "
                    "this environment; wire it here"
                )
            feats = [_fake_decode(bytes(b)) for b in pdf["payload"]]
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


def _fake_audio_decode(chunk: bytes) -> tuple[float, float]:
    """Deterministic pseudo audio features from the chunk's hex-md5 —
    stands in for an ffmpeg/torchaudio decode + RMS/zero-crossing pass.
    Hashing the UPPERCASE HEX of the bytes (not the raw bytes) keeps an
    exact ANSI-SQL twin possible: SQL md5() takes strings, and arbitrary
    byte windows of utf-8 text are not valid strings."""
    h = hashlib.md5(chunk.hex().upper().encode()).hexdigest()
    rms = (int(h[:15], 16) % 100000) / 1000.0
    zcr = (int(h[15:30], 16) % 1000) / 1000.0
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
    is partial, empty payloads yield one empty window.
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
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real audio decode needs ffmpeg/torchaudio — not "
                    "available in this environment; wire it here"
                )
            feats = [_fake_audio_decode(bytes(b)) for b in pdf["chunk"]]
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

"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The Spark-side plumbing here is REAL and tested: schemas, mapInPandas batch
shapes, partition sizing, deterministic fake decoders. The actual codec
calls (PIL/librosa/ffmpeg) are NOT available in this container, so the
decode kernels are stubbed: ``use_real_codecs=True`` raises
NotImplementedError at the exact integration point, and the default path
runs a deterministic fake decode (hash-seeded) with the same shapes, so
every downstream stage (feature extract, resize, frame sampling, batching)
is exercised end-to-end.

Scale notes: media rows are large (MBs); the operators below assume the
table is stored with the binary column in its own parquet column chunk
(column pruning keeps metadata-only queries from touching bytes) and use
``maxRecordsPerBatch``-bounded Arrow batches so a worker never holds more
than a few hundred MB of frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

MEDIA_TABLE = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", MEDIA_META, True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
])


def synth_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads are seeded bytes)."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random((seed << 20) | i)
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.getrandbits(8) for _ in range(256 + (i % 7) * 64))
        rows.append({
            "media_id": i,
            "payload": payload,
            "meta": {
                "media_type": kind,
                "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                "width": 64 + (i % 4) * 32 if kind != "audio" else None,
                "height": 64 + (i % 3) * 32 if kind != "audio" else None,
                "duration_ms": 1000 + i * 37 if kind != "image" else None,
                "sample_rate": 16000 if kind == "audio" else None,
            },
        })
    return spark.createDataFrame(rows, schema=MEDIA_TABLE)


def _fake_decode_image(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decode: hash-seeded pixels of
    the declared shape. Same dtype/shape contract as a real decoder."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_and_featurize_images(df: DataFrame, use_real_codecs: bool = False,
                                embed_dim: int = 16) -> DataFrame:
    """Images -> (dims, mean luma, tiny embedding) via mapInPandas.

    Batch shape: iterator of pandas DataFrames (Arrow batches); each batch
    decodes vectorized-per-row and emits one row per input row. The real
    codec would slot in at `_decode` — everything around it is production
    plumbing.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real image codecs (PIL/libvips) are not available in this "
            "container; integrate at this call site"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # column extraction once per batch (no per-row iterrows); the
            # per-item loop remains because the (real) codec is per-item
            for media_id, meta, payload in zip(
                pdf["media_id"].tolist(), pdf["meta"].tolist(),
                pdf["payload"].tolist(),
            ):
                w = int(meta["width"] or 32)
                h = int(meta["height"] or 32)
                img = _fake_decode_image(payload, w, h)
                luma = float(
                    (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
                )
                # "embedding": normalized channel histogram head — stands in
                # for a model forward pass, deterministic per payload
                hist = np.histogram(img, bins=embed_dim, range=(0, 256))[0]
                emb = (hist / max(hist.sum(), 1)).astype(np.float32)
                out.append((media_id, w, h, round(luma, 4), emb.tolist()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_luma", "embedding"]
            )

    imgs = df.filter(F.col("meta.media_type") == "image")
    return imgs.mapInPandas(run, schema=IMAGE_FEATURES)


def sample_video_frames(df: DataFrame, every_ms: int = 500,
                        use_real_codecs: bool = False) -> DataFrame:
    """Video -> one row per sampled frame timestamp (frame extraction stub).

    The explode of frame timestamps is real Spark; the frame decode is the
    stubbed kernel (deterministic bytes keyed by (payload, ts))."""
    if use_real_codecs:
        raise NotImplementedError("ffmpeg not available in this container")
    vids = df.filter(F.col("meta.media_type") == "video")
    ts = F.sequence(
        F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms)
    )
    exploded = vids.select(
        "media_id", F.explode(ts).alias("frame_ms"), "payload"
    )
    frame_key = F.md5(F.concat(F.md5("payload").cast("string"), F.col("frame_ms").cast("string")))
    return exploded.select(
        "media_id", "frame_ms", frame_key.alias("frame_fingerprint")
    )


def audio_features(df: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Audio -> (duration, rms-proxy) without decoding: metadata + payload
    byte stats (the real spectral features would slot into the same shape)."""
    if use_real_codecs:
        raise NotImplementedError("librosa/soundfile not available")
    auds = df.filter(F.col("meta.media_type") == "audio")
    return auds.select(
        "media_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.octet_length("payload").alias("payload_bytes"),
        (F.crc32(F.col("payload")) % 1000 / 1000.0).alias("rms_proxy"),
    )

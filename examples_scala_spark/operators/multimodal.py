"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque BINARY columns + typed metadata structs —
the parquet-native layout that scales: binaries stay columnar,
metadata predicates prune row groups without touching bytes.

The decode/feature-extract step runs as Arrow-batched `mapInPandas`
(one Python worker per partition, whole record batches across the
JVM<->Python boundary). The image/audio codec libraries are NOT
available in this container, so `decode_media` is STUBBED with a
deterministic fake (documented below); the Spark-side plumbing —
schema, batch iteration, partitioning — is real and tested, and a real
deployment only swaps `_fake_decode` for PIL/ffmpeg calls.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media", BinaryType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("n_frames", LongType()),
])


def media_table(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Build a media-shaped table from the documents fixture: the text
    bytes stand in for an encoded payload. In production this is
    `spark.read.parquet` on a table with a real binary column."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("media"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
         .when(F.col(id_col) % 3 == 1, "audio/wav")
         .otherwise("video/mp4").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(media: bytes, mime: str) -> tuple[int, int, int]:
    """STUB decoder (deterministic fake): derives (width, height,
    n_frames) from payload length. Replace with PIL / soundfile /
    pyav in a real deployment:

        raise NotImplementedError("install pillow/av and swap me in")

    Keeping it deterministic lets the driver oracle-check the plumbing.
    """
    n = len(media)
    if mime.startswith("image/"):
        return (n % 1920) + 1, (n % 1080) + 1, 1
    if mime.startswith("audio/"):
        return 0, 0, n * 100  # "samples"
    return (n % 1920) + 1, (n % 1080) + 1, (n % 240) + 1


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over mapInPandas. Partition-parallel; each
    batch decodes vectorized-ish in the Python worker. The output
    schema drops the payload (decoded features only) so downstream
    stages never re-shuffle the heavy binary column."""
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(m, t) for m, t in zip(pdf["media"], pdf["mime"])
            ]
            out = pd.DataFrame(decoded, columns=["width", "height", "n_frames"])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "mime", pdf["mime"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    frame index — posexplode of a frame-index sequence, JVM-side."""
    return (
        decoded.filter(F.col("mime").startswith("video/"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)))
            .alias("frame_idx"),
        )
    )


def resize_plan(decoded: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Resize planning for image/video rows: per asset, the
    aspect-preserving scale factor, the scaled dimensions, and the
    center-crop box that yields exactly (target_w, target_h) — the
    arithmetic every preprocessing pipeline runs before the pixel
    resample. Pure JVM-side column math (the pixel work itself needs a
    codec and belongs in the decode UDF); emitting the plan separately
    lets a scheduler bucket assets by output geometry and batch the
    GPU/CPU resample per bucket."""
    d = decoded.filter(F.col("width") > 0)
    scale = F.greatest(F.lit(target_w) / F.col("width"),
                       F.lit(target_h) / F.col("height"))
    sw = F.ceil(F.col("width") * scale).cast("long")
    sh = F.ceil(F.col("height") * scale).cast("long")
    return d.select(
        "doc_id", "mime", "width", "height",
        F.round(scale, 6).alias("scale"),
        sw.alias("scaled_w"), sh.alias("scaled_h"),
        ((sw - target_w) / 2).cast("long").alias("crop_x"),
        ((sh - target_h) / 2).cast("long").alias("crop_y"),
        F.lit(target_w).alias("out_w"), F.lit(target_h).alias("out_h"),
    )


def extract_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """Codec-free feature extraction over the raw payload: a
    normalized byte histogram (`bins` buckets over 0..255) as an
    array<double> feature vector per asset — a real, deterministic
    content signature (byte-distribution features drive format
    detection, corruption screens, and cheap near-dup blocking before
    any decode). Arrow-batched mapInPandas with numpy bincount per
    batch; the payload never leaves the scan stage — only the
    `bins`-float vector flows downstream, where the ANN/similarity
    operators consume it like any embedding column. A real deployment
    appends decoded-domain features (CLIP, mel spectra) in the same
    UDF shape."""
    import numpy as np

    width = 256 // bins

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["media"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if len(arr) == 0:
                    feats.append([0.0] * bins)
                    continue
                hist = np.bincount(arr // width, minlength=bins)[:bins]
                feats.append((hist / len(arr)).round(6).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "mime": pdf["mime"],
                                "byte_hist": feats})

    return media.mapInPandas(
        featurize, "doc_id bigint, mime string, byte_hist array<double>")


def chunk_media(media: DataFrame, chunk_bytes: int = 4096) -> DataFrame:
    """Content-addressable chunking: split each binary payload into
    fixed-size chunks and emit (doc_id, chunk_idx, chunk_md5, n_bytes)
    — the staging op for dedup'd media storage/transfer (identical
    chunks across assets share a hash). Entirely JVM-side: sequence +
    explode over byte offsets, substring on the BINARY column, md5 of
    the slice. Narrow (zero shuffle); the payload bytes never leave
    the scan stage — only 16-byte hashes flow downstream."""
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)),
        F.lit(chunk_bytes))
    st = media.select("doc_id", "media", F.explode(starts).alias("s"))
    piece = F.expr(f"substring(media, s + 1, {chunk_bytes})")
    return st.select(
        "doc_id",
        (F.col("s") / chunk_bytes).cast("long").alias("chunk_idx"),
        F.md5(piece).alias("chunk_md5"),
        F.expr(f"octet_length(substring(media, s + 1, {chunk_bytes}))")
         .cast("long").alias("n_bytes"),
    )

"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batching,
mapInPandas signatures, partitioning — while the codec itself is stubbed:
the container has no image/audio libraries, so `RealCodec` raises
NotImplementedError with the drop-in point documented, and tests run the
deterministic `SyntheticCodec` over a self-describing binary format.

Binary format (synthetic): b"XMED" | kind(1B: 0=image,1=audio,2=video) |
width(2B BE) | height(2B BE) | n_frames(2B BE) | payload bytes.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MAGIC = b"XMED"
KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)
META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media_bytes(media_id: str) -> bytes:
    """Deterministic self-describing payload for tests/datagen."""
    h = int(hashlib.md5(media_id.encode()).hexdigest()[:12], 16)
    kind = h % 3
    w, hgt = 64 + h % 512, 64 + (h >> 9) % 512
    frames = 1 if kind == 0 else 8 + h % 24
    payload = hashlib.md5(media_id.encode()).digest() * 4
    return MAGIC + struct.pack(">BHHH", kind, w, hgt, frames) + payload


class SyntheticCodec:
    """Deterministic decode of the synthetic format (per-executor init,
    same lifecycle slot a real codec would occupy)."""

    def decode_meta(self, content: bytes):
        if content[:4] != MAGIC:
            return None
        kind, w, h, frames = struct.unpack(">BHHH", content[4:11])
        return KINDS.get(kind, "unknown"), w, h, frames

    def extract_features(self, content: bytes, dim: int = 8):
        meta = self.decode_meta(content)
        if meta is None:
            return None
        payload = content[11:]
        return [round(b / 255.0, 6) for b in payload[:dim]]


class RealCodec:
    """Drop-in point for actual decoders (cv2/PIL/ffmpeg/soundfile).

    Not available in this environment; at deploy time implement
    decode_meta/extract_features with the real libraries and pass
    codec=RealCodec() to the stage builders."""

    def decode_meta(self, content: bytes):
        raise NotImplementedError(
            "real media decoding requires cv2/PIL/ffmpeg — not in this "
            "container; use SyntheticCodec for the pipeline plumbing"
        )

    extract_features = decode_meta


def media_metadata(media: DataFrame, codec_factory=SyntheticCodec) -> DataFrame:
    """(media_id, content) -> typed metadata. Batched; codec built once
    per python worker (iterator-of-batches pattern)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = codec_factory()
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                meta = codec.decode_meta(bytes(content))
                if meta is None:
                    continue  # undecodable -> dead-letter by omission
                kind, w, h, frames = meta
                rows.append((mid, kind, w, h, frames, len(content)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_frames", "n_bytes"]
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def media_features(media: DataFrame, dim: int = 8, codec_factory=SyntheticCodec) -> DataFrame:
    """(media_id, content) -> feature vectors (the embed step of a
    multimodal training-data pipeline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = codec_factory()
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                meta = codec.decode_meta(bytes(content))
                if meta is None:
                    continue
                feats = codec.extract_features(bytes(content), dim)
                rows.append((mid, meta[0], feats))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "features"])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(meta: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    pure column ops (sequence/explode), no Python."""
    return (
        meta.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
    )

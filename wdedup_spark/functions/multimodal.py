"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, mapInPandas
partition flow, deterministic feature extraction for dedup — while the
actual media decoding is STUBBED (no image/audio libraries in this
container).  ``decode_image`` raises NotImplementedError unless the
deterministic fake backend is selected; the fake parses a tiny header and
derives a fixed-shape feature vector from a blake2 digest, so downstream
dedup/ANN over media features is fully testable.

Schema contract (one row per asset):
  asset_id: long, modality: string in {image,audio,video},
  content: binary, meta: struct<width:int, height:int, duration_ms:int,
  mime:string>

At 100 TB: binary columns ride parquet byte arrays; mapInPandas streams
Arrow record batches so a partition never fully materializes in Python;
feature extraction is the narrow stage before any shuffle (same
sign-before-shuffle shape as MinHash over text).
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("mime", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 64

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("content_hash", LongType(), False),
    ]
)


def decode_image(content: bytes, backend: str = "stub"):
    """Decode an image byte payload.

    backend="stub"  — real decoders (PIL/opencv) are not available in this
                      container: raises NotImplementedError, as documented.
    backend="fake"  — deterministic fake decode for tests: derives an
                      8x8 'pixel' array from the blake2 digest of content.
    """
    if backend == "stub":
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not installed); "
            "use backend='fake' for deterministic test plumbing"
        )
    if backend == "fake":
        d = blake2b(content, digest_size=64).digest()
        return np.frombuffer(d, dtype=np.uint8).reshape(8, 8).astype(np.float32)
    raise ValueError(f"unknown backend {backend}")


def _feature_from_bytes(content: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-float feature from the content digest —
    the stand-in for an embedding model; same bytes → same feature."""
    d = blake2b(content, digest_size=FEATURE_DIM).digest()
    v = np.frombuffer(d, dtype=np.uint8).astype(np.float32)
    return v / np.linalg.norm(v)


def _content_hash(content: bytes, algo: str) -> int:
    """Signed-i64 content hash.  algo="md5" takes the first 8 md5 digest
    bytes big-endian (reinterpreted signed) — bit-identical to DuckDB's
    ('0x' || substr(md5(s),1,16))::UBIGINT, so media dedup is
    oracle-checkable; "blake2" is the keyed-seedable default."""
    if algo == "md5":
        from hashlib import md5

        u = int.from_bytes(md5(content).digest()[:8], "big")
        return u - (1 << 64) if u >= (1 << 63) else u
    return (
        int.from_bytes(blake2b(content, digest_size=8).digest(), "little", signed=False)
        - (1 << 63)
    )


def extract_features(assets: DataFrame, batch_hint: int = 1024, hash_algo: str = "blake2") -> DataFrame:
    """mapInPandas feature extraction: assets(ASSET_SCHEMA) →
    FEATURE_SCHEMA.  Streams Arrow batches; never materializes a whole
    partition."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_feature_from_bytes(bytes(c)) for c in pdf["content"]]
            hashes = [_content_hash(bytes(c), hash_algo) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": [f.tolist() for f in feats],
                    "content_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return assets.mapInPandas(_extract, FEATURE_SCHEMA)


def exact_media_dups(features: DataFrame) -> DataFrame:
    """Byte-identical assets via content hash groupBy (same shape as text
    exact dedup): → (content_hash, rep_id, n_members)."""
    return features.groupBy("content_hash").agg(
        F.min("asset_id").alias("rep_id"), F.count(F.lit(1)).alias("n_members")
    )


def frame_sample_udf(n_frames: int = 4):
    """Video frame sampling stub: emits n_frames deterministic pseudo-frame
    offsets per asset (the real implementation would seek the container).
    Demonstrates the explode-shaped plumbing for per-frame features."""

    def sample(assets: DataFrame) -> DataFrame:
        return assets.select(
            "asset_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_frames - 1)),
                    lambda i: F.struct(
                        i.alias("frame_no"),
                        (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) * i / n_frames)
                        .cast("int")
                        .alias("offset_ms"),
                    ),
                )
            ).alias("frame"),
        ).select("asset_id", "frame.frame_no", "frame.offset_ms")

    return sample

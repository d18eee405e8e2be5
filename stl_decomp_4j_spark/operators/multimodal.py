"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (content-hash ->
synthetic dimensions/features) exercises the full Spark plumbing — schema,
batch shape, partitioning — which is the part that matters for the engine.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministically derive a fake binary media column from doc content
    (the payload is opaque to the engine; only the plumbing is real)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.abs(F.xxhash64(F.col(id_col))) % 3 + 1).cast("int"))
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.substring(F.col(text_col), 1, 64), "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.length(F.encode(F.substring(F.col(text_col), 1, 64), "utf-8")).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes, kind: str, n_features: int):
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    width = 16 + digest[8] % 240
    height = 16 + digest[9] % 240
    n_frames = 1 if kind == "image" else 1 + digest[10] % 32
    return width, height, n_frames, rng.standard_normal(n_features)


def extract_features(media: DataFrame, n_features: int = 8, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches; the batch
    iterator shape is what a real decoder would use)."""
    if not fake:
        raise NotImplementedError(
            "real image/audio decode requires pillow/librosa etc., not available in this container"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                w, h, nf, feats = _fake_decode(bytes(row["payload"]), row["kind"], n_features)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id, frame_no)
    rows for frames 0, n, 2n... of the (fake-)decoded frame count."""
    feats = extract_features(media.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_no"),
    )

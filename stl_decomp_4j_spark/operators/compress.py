"""Gorilla-compress tier rows into per-(url, tier) binary chunks, and the
inverse for reads/verification.

One chunk per url per column stream keeps chunks small (grid-length bounded)
and lets a reader prune to the url+time-range it needs.

Scale shape: a grouped-map applyInPandas paid ~10 ms of per-group overhead
(per-group pandas construction + sort) against ~0.25 ms of actual encoding
per 1,441-pt series — at 24k urls that overhead WAS the compression phase.
compress_tier instead repartitions by url (explicit count — AQE-exempt),
sorts within partitions by (url, ts), and streams Arrow batches through
mapInPandas: one Python call per ~10k rows, url boundaries found with
searchsorted/flatnonzero, no per-group DataFrame machinery.  A url never
spans partitions; a url spanning consecutive Arrow batches is carried over
inside the iterator.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..codec.gorilla import decode_series, encode_series

CHUNK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("t0", TimestampType()),
        StructField("t1", TimestampType()),
        StructField("n", IntegerType()),
        StructField("column", StringType()),
        StructField("chunk", BinaryType()),
    ]
)


def _encode_block(pdf: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """Encode every complete url run in an already (url, ts)-sorted block."""
    urls = pdf["url"].to_numpy()
    ts_col = pdf["ts"]
    ts_ms = ts_col.astype("datetime64[ms]").astype("int64").to_numpy()
    vals = {c: pdf[c].to_numpy(dtype=float) for c in columns}
    bounds = np.flatnonzero(np.r_[True, urls[1:] != urls[:-1], True])
    out: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA.fields}
    for i in range(len(bounds) - 1):
        a, b = int(bounds[i]), int(bounds[i + 1])
        for col in columns:
            out["url"].append(urls[a])
            out["t0"].append(ts_col.iloc[a])
            out["t1"].append(ts_col.iloc[b - 1])
            out["n"].append(b - a)
            out["column"].append(col)
            out["chunk"].append(encode_series(ts_ms[a:b], vals[col][a:b]))
    return pd.DataFrame(out)


def compress_tier(tier: DataFrame, columns: list[str] | None = None, partitions: int | None = None) -> DataFrame:
    columns = columns or [c for c in tier.columns if c not in ("url", "ts")]
    spark = tier.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 4

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
            if not len(pdf):
                continue
            urls = pdf["url"].to_numpy()
            # rows are (url, ts)-sorted within the partition and batches
            # arrive in order, so only the LAST url run may continue into
            # the next batch — hold it back (equal urls are contiguous, so
            # the run length is just the count of the last url)
            cut = len(urls) - int((urls == urls[-1]).sum())
            pending = pdf.iloc[cut:]
            ready = pdf.iloc[:cut]
            if len(ready):
                yield _encode_block(ready, columns)
        if pending is not None and len(pending):
            yield _encode_block(pending, columns)

    return (
        tier.repartition(partitions, "url")
        .sortWithinPartitions("url", "ts")
        .mapInPandas(fn, CHUNK_SCHEMA)
    )


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of compress_tier: back to long (url, ts, column, value) rows."""
    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("column", StringType()),
            StructField("ts_ms", LongType()),
            StructField("value", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            ts, vals = decode_series(bytes(row["chunk"]))
            out.append(
                pd.DataFrame(
                    {"url": row["url"], "column": row["column"], "ts_ms": ts, "value": vals}
                )
            )
        return pd.concat(out) if out else pd.DataFrame(columns=["url", "column", "ts_ms", "value"])

    return chunks.groupBy("url", "column").applyInPandas(fn, schema)

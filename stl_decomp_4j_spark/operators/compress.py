"""Gorilla-compress tier rows into per-(url, tier) binary chunks, and the
inverse for reads/verification.

One chunk per url per column stream keeps chunks small (grid-length bounded)
and lets a reader prune to the url+time-range it needs.  Runs as a
grouped-map pandas UDF over Arrow batches (no per-row Python).
"""
from __future__ import annotations

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


def compress_tier(tier: DataFrame, columns: list[str] | None = None) -> DataFrame:
    columns = columns or [c for c in tier.columns if c not in ("url", "ts")]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ts = pdf["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
        rows = []
        for col in columns:
            vals = pdf[col].to_numpy(dtype=float)
            rows.append(
                {
                    "url": pdf["url"].iloc[0],
                    "t0": pdf["ts"].iloc[0],
                    "t1": pdf["ts"].iloc[-1],
                    "n": len(ts),
                    "column": col,
                    "chunk": encode_series(ts, vals),
                }
            )
        return pd.DataFrame(rows)

    return tier.groupBy("url").applyInPandas(fn, CHUNK_SCHEMA)


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

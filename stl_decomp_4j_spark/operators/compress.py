"""Gorilla-compress tier rows into per-(url, tier) binary chunks, and the
inverse for reads/verification.

Chunks are per url per column stream, split into time slabs of at most
``chunk_points`` points, so a reader prunes to the url+time-range it needs
on (url, t0, t1, column) metadata alone (prune_chunks / read_range) and
never decodes outside the range.

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

# calendar slabs a chunk can be aligned to (retention drops whole slabs)
_SLAB_PERIOD = {"day": "D", "week": "W", "month": "M"}


def _slab_ids(ts_col: pd.Series, slab: str) -> np.ndarray:
    """Integer calendar-slab id per row (equal ids <=> same slab)."""
    try:
        period = _SLAB_PERIOD[slab]
    except KeyError:
        raise ValueError(f"slab must be one of {sorted(_SLAB_PERIOD)}, got {slab!r}") from None
    return pd.PeriodIndex(ts_col, freq=period).asi8


def _encode_block(
    pdf: pd.DataFrame, columns: list[str], chunk_points: int | None, slab: str | None = None
) -> pd.DataFrame:
    """Encode every complete url run in an already (url, ts)-sorted block,
    splitting runs longer than ``chunk_points`` into time-slab chunks.

    With ``slab`` set, runs are additionally cut at calendar-slab boundaries
    so every chunk lies wholly inside one slab — the retention path
    (operators/retention.py) then drops whole slab partitions on metadata
    alone, never splitting or rewriting a chunk."""
    urls = pdf["url"].to_numpy()
    ts_col = pdf["ts"]
    ts_ms = ts_col.astype("datetime64[ms]").astype("int64").to_numpy()
    vals = {c: pdf[c].to_numpy(dtype=float) for c in columns}
    new_run = urls[1:] != urls[:-1]
    if slab is not None:
        sids = _slab_ids(ts_col, slab)
        new_run = new_run | (sids[1:] != sids[:-1])
    bounds = np.flatnonzero(np.r_[True, new_run, True])
    out: dict[str, list] = {f.name: [] for f in CHUNK_SCHEMA.fields}
    for i in range(len(bounds) - 1):
        a, b = int(bounds[i]), int(bounds[i + 1])
        step = chunk_points or (b - a)
        for s in range(a, b, step):
            e = min(s + step, b)
            for col in columns:
                out["url"].append(urls[a])
                out["t0"].append(ts_col.iloc[s])
                out["t1"].append(ts_col.iloc[e - 1])
                out["n"].append(e - s)
                out["column"].append(col)
                out["chunk"].append(encode_series(ts_ms[s:e], vals[col][s:e]))
    return pd.DataFrame(out)


def compress_tier(
    tier: DataFrame,
    columns: list[str] | None = None,
    partitions: int | None = None,
    chunk_points: int | None = 4096,
    presorted: bool = False,
    slab: str | None = None,
) -> DataFrame:
    """``chunk_points`` bounds points per chunk (default 4096): bounded decode
    memory, and time-slab chunk boundaries so a range read can prune WITHIN a
    url's history — at 100x the 1h table spans years and a dashboard reads
    days.  None = one chunk per url (unbounded).

    ``presorted=True`` skips the repartition+sort: valid when the input
    already has each url's rows contiguous and time-ordered within every
    scan partition — true for the materialized 1h tier, whose parquet files
    are written straight from the url-hash-partitioned STL stage (whole
    groups, grid order; hourly_tier is a pure projection).  This removes the
    sink's only shuffle (the full tier's bytes) — the phase that scales
    worst across executors.  A file split mid-url just yields one extra
    chunk at the boundary; correctness never depends on the ordering (any
    ordering round-trips), only the chunk count/compression ratio does.

    ``slab`` ('day'/'week'/'month') additionally aligns chunks to calendar
    slabs so retention can drop whole expired slabs without touching any
    chunk's bytes (see _encode_block)."""
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
                yield _encode_block(ready, columns, chunk_points, slab)
        if pending is not None and len(pending):
            yield _encode_block(pending, columns, chunk_points, slab)

    if presorted:
        return tier.mapInPandas(fn, CHUNK_SCHEMA)
    return (
        tier.repartition(partitions, "url")
        .sortWithinPartitions("url", "ts")
        .mapInPandas(fn, CHUNK_SCHEMA)
    )


def decompress_chunks(chunks: DataFrame, decode_counter=None) -> DataFrame:
    """Inverse of compress_tier: back to long (url, ts, column, value) rows.

    ``decode_counter``: optional Spark accumulator incremented once per chunk
    actually decoded — observability for the pruned read path (a test or a
    production monitor can assert decode work == chunks in range)."""
    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("column", StringType()),
            StructField("ts_ms", LongType()),
            StructField("value", DoubleType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, column, chunk in zip(pdf["url"], pdf["column"], pdf["chunk"]):
                ts, vals = decode_series(bytes(chunk))
                if decode_counter is not None:
                    decode_counter.add(1)
                out.append(pd.DataFrame({"url": url, "column": column, "ts_ms": ts, "value": vals}))
            if out:
                yield pd.concat(out)

    # mapInPandas (not grouped-map): decode needs no grouping — each chunk is
    # self-contained — so no shuffle is introduced by the read path
    return chunks.select("url", "column", "chunk").mapInPandas(fn, schema)


def prune_chunks(
    chunks: DataFrame,
    urls: list[str] | None = None,
    ts_min=None,
    ts_max=None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Select only the chunks that can contain rows for the given url/time/
    column predicate, using chunk METADATA only (no decode).  Reading from
    parquet, every predicate lands in PushedFilters — at 100x the 1h Gorilla
    table is the engine's largest, and a range read must not touch (let alone
    decode) chunks outside the range.

    A chunk [t0, t1] overlaps [ts_min, ts_max] iff t1 >= ts_min and
    t0 <= ts_max."""
    import pyspark.sql.functions as F

    out = chunks
    if urls is not None:
        out = out.filter(F.col("url").isin(list(urls)))
    if columns is not None:
        out = out.filter(F.col("column").isin(list(columns)))
    if ts_min is not None:
        out = out.filter(F.col("t1") >= F.lit(ts_min))
    if ts_max is not None:
        out = out.filter(F.col("t0") <= F.lit(ts_max))
    return out


def read_range(
    chunks: DataFrame,
    urls: list[str] | None = None,
    ts_min=None,
    ts_max=None,
    columns: list[str] | None = None,
    decode_counter=None,
) -> DataFrame:
    """Pruned range read: metadata-prune chunks, decode only the survivors,
    then trim rows of boundary chunks to the exact [ts_min, ts_max] range."""
    import pyspark.sql.functions as F

    rows = decompress_chunks(
        prune_chunks(chunks, urls, ts_min, ts_max, columns), decode_counter=decode_counter
    )
    if ts_min is not None:
        rows = rows.filter(F.timestamp_millis(F.col("ts_ms")) >= F.lit(ts_min))
    if ts_max is not None:
        rows = rows.filter(F.timestamp_millis(F.col("ts_ms")) <= F.lit(ts_max))
    return rows

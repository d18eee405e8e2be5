"""Gorilla-store compaction: merge fragmented chunks back to maximally-filled
ones, touching only fragmented (url, column[, slab]) groups — healthy chunks
pass through byte-identical, a second pass is a no-op (fixpoint), merged
chunks never cross a calendar-slab boundary (retention stays metadata-only).
"""
import datetime as dt
import json
import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.compress import (
    compact_chunks,
    compact_store,
    compress_tier,
    decompress_chunks,
)
from stl_decomp_4j_spark.pipeline import PipelineConfig, run_pipeline
from stl_decomp_4j_spark.sources.catalog import write_table
from stl_decomp_4j_spark.sources.pages import generate_pages


def _hourly_series(spark, start, hours, urls):
    rows = []
    rng = np.random.default_rng(11)
    for u in urls:
        vals = rng.normal(5.0, 1.0, hours)
        for i in range(hours):
            rows.append((u, start + dt.timedelta(hours=i), float(vals[i])))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "ts", "value"]))


def _chunk_set(chunks_df):
    """Comparable identity of every chunk incl. payload bytes."""
    return {
        (r["url"], r["column"], r["t0"], r["t1"], r["n"], bytes(r["chunk"]))
        for r in chunks_df.collect()
    }


def _decoded(chunks_df):
    return (
        decompress_chunks(chunks_df)
        .toPandas()
        .sort_values(["url", "column", "ts_ms"])
        .reset_index(drop=True)
    )


def test_compact_chunks_merges_passthrough_fixpoint(spark):
    # Jan 25 -> Feb 8: each url has 168 pts in January, 168 in February
    start = dt.datetime(2025, 1, 25)
    frag = compress_tier(
        _hourly_series(spark, start, hours=24 * 14, urls=["a", "b"]),
        columns=["value"], chunk_points=24, slab="month",
    )
    healthy = compress_tier(
        _hourly_series(spark, start, hours=24 * 14, urls=["c"]),
        columns=["value"], chunk_points=96, slab="month",
    )
    inp = frag.unionByName(healthy)
    before_rows = _decoded(inp)
    healthy_set = _chunk_set(healthy)

    out = compact_chunks(inp, chunk_points=96, slab="month")
    out_set = _chunk_set(out)

    # healthy url 'c' chunks pass through byte-identical (no re-encode)
    assert healthy_set <= out_set

    # fragmented groups packed to the minimum chunk count per (url, month):
    # ceil(168/96) = 2 chunks per url per month
    counts = (
        out.groupBy("url", "column", F.date_trunc("month", "t0").alias("m"))
        .count().collect()
    )
    assert counts and all(r["count"] == math.ceil(168 / 96) for r in counts)

    # no merged chunk crosses a month boundary
    for r in out.select("t0", "t1").collect():
        assert (r["t0"].year, r["t0"].month) == (r["t1"].year, r["t1"].month)

    # decoded points identical
    pd.testing.assert_frame_equal(_decoded(out), before_rows)

    # fixpoint: a second pass returns the same chunk set byte-for-byte
    assert _chunk_set(compact_chunks(out, chunk_points=96, slab="month")) == out_set

    # without a slab constraint, months merge too: ceil(336/96) = 4 per url
    flat = compact_chunks(frag, chunk_points=96)
    flat_counts = flat.groupBy("url", "column").count().collect()
    assert flat_counts and all(r["count"] == math.ceil(336 / 96) for r in flat_counts)
    pd.testing.assert_frame_equal(_decoded(flat), _decoded(frag))


def test_compact_chunks_rejects_overlapping_runs(spark):
    series = _hourly_series(spark, dt.datetime(2025, 3, 1), hours=48, urls=["a"])
    chunks = compress_tier(series, columns=["value"], chunk_points=8)
    dup = chunks.unionByName(chunks)  # same time range twice -> not mergeable
    with pytest.raises(Exception, match="not strictly increasing"):
        compact_chunks(dup, chunk_points=4096).collect()


@pytest.mark.parametrize("or_chain_limit", [1000, 0])
def test_compact_store_end_to_end(spark, tmp_path, or_chain_limit):
    """Pipeline store -> artificially fragmented gorilla_1d -> compact_store
    rewrites only fragmented partitions, preserves decoded bytes, records
    lineage, keeps slab alignment, and a second pass finds nothing.

    Parametrized over both fragmented-subset strategies: the static OR-chain
    (small lists) and the broadcast semi-join engaged past or_chain_limit
    (or_chain_limit=0 forces it) — the scale path for stores with 10^3+
    fragmented partitions, where a driver-built OR predicate would blow up
    Catalyst."""
    out = str(tmp_path / "rollup")
    pages = generate_pages(spark, n_urls=4, days=40, events_per_url=200)
    run_pipeline(spark, pages, out, PipelineConfig(n_buckets=2, compress=True))

    root = f"{out}/gorilla_1d"
    baseline_rows = _decoded(spark.read.parquet(root))

    # fragment the 1d store the way a pathological incremental rewrite would:
    # re-encode every bucket at chunk_points=4 (same slab-aligned layout)
    t1d = spark.read.parquet(f"{out}/tier_1d")
    comp_cols = ["sum_value", "sum_trend", "sum_seasonal", "sum_residual"]
    for b in sorted(r[0] for r in t1d.select("bucket").distinct().collect()):
        mat = t1d.filter(F.col("bucket") == b).select("url", "ts", *comp_cols)
        ch = (
            compress_tier(mat, chunk_points=4, slab="month")
            .withColumn("run_id", F.lit("fragtest"))
            .withColumn("bucket", F.lit(int(b)))
        )
        ch = ch.withColumn(
            "slab", F.date_format(F.date_trunc("month", "t0"), "yyyy-MM-dd")
        )
        write_table(ch, root, partition_by=["bucket", "slab"],
                    mode="overwrite_partitions")
    frag_count = spark.read.parquet(root).count()
    assert frag_count > len(baseline_rows.groupby(["url", "column"]))
    pd.testing.assert_frame_equal(_decoded(spark.read.parquet(root)), baseline_rows)

    summary = compact_store(
        spark, out, tiers=("1d",), chunk_points=4096, or_chain_limit=or_chain_limit
    )
    s = summary["gorilla_1d"]
    assert s["partitions"] > 0
    assert s["chunks_after"] < s["chunks_before"] == frag_count

    after = spark.read.parquet(root)
    assert after.count() == s["chunks_after"]
    # decoded points byte-identical to the pre-fragmentation store
    pd.testing.assert_frame_equal(_decoded(after), baseline_rows)
    # slab alignment preserved: chunk t0's month == its slab partition value
    bad = after.filter(
        F.date_format(F.date_trunc("month", "t0"), "yyyy-MM-dd")
        != F.col("slab").cast("string")
    ).count()
    assert bad == 0

    # lineage rows with before/after chunk counts
    rows = [
        json.loads(l)
        for l in (tmp_path / "rollup" / "manifest.jsonl").read_text().splitlines()
    ]
    comp = [r for r in rows if r["status"] == "compaction" and r["table"] == "gorilla_1d"]
    assert comp and sum(r["chunks_before"] for r in comp) == s["chunks_before"]
    assert sum(r["chunks_after"] for r in comp) == s["chunks_after"]
    assert all(r["chunks_after"] <= r["chunks_before"] for r in comp)

    # fixpoint: nothing left to compact anywhere in the store
    again = compact_store(spark, out, tiers=("1h", "1d", "1w"), chunk_points=4096)
    assert again["gorilla_1d"] == {"partitions": 0}

    # retention still works on the compacted store (slab metadata intact):
    # manifest-recorded granularity is month, January is droppable
    from stl_decomp_4j_spark.operators.retention import apply_retention

    dropped = apply_retention(spark, out, {"1d": 8}, now=dt.datetime(2025, 2, 10))
    assert "gorilla_1d" in dropped
    min_ms = (
        decompress_chunks(spark.read.parquet(root)).agg(F.min("ts_ms")).first()[0]
    )
    assert min_ms >= int(dt.datetime(2025, 2, 1).timestamp() * 1000)

"""End-to-end Spark pipeline tests: synthetic pages table -> bucketize ->
gap-fill -> STL -> tiers -> Gorilla sink, compared exactly against a local
pandas/NumPy reference run of the same core (SURVEY.md §5 engine test plan),
plus checkpoint/resume and the text byte-identity invariant."""
import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.bucketize import bucketize
from stl_decomp_4j_spark.operators.compress import compress_tier, decompress_chunks
from stl_decomp_4j_spark.operators.gapfill import gapfill
from stl_decomp_4j_spark.operators.rollup import build_tiers
from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df
from stl_decomp_4j_spark.pipeline import PipelineConfig, run_pipeline
from stl_decomp_4j_spark.sources.pages import generate_pages, text_digests

N_URLS = 12
DAYS = 21


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, n_urls=N_URLS, days=DAYS, events_per_url=400, hot_url_count=2, hot_multiplier=16)
    df.cache().count()
    return df


def test_pages_schema_and_determinism(spark, pages):
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types == {
        "url": "string", "warc_ts": "timestamp", "html": "binary", "text": "string", "lang": "string",
    }
    # deterministic under different parallelism
    again = generate_pages(
        spark, n_urls=N_URLS, days=DAYS, events_per_url=400, hot_url_count=2, hot_multiplier=16, partitions=3
    )
    a = pages.groupBy().agg(F.expr("bit_xor(xxhash64(url, warc_ts, text, lang))").alias("h")).collect()[0]["h"]
    b = again.groupBy().agg(F.expr("bit_xor(xxhash64(url, warc_ts, text, lang))").alias("h")).collect()[0]["h"]
    assert a == b
    # text is a pure function of url
    assert text_digests(pages).filter(F.col("n_digests") != 1).count() == 0


def test_bucketize_and_gapfill_dense(spark, pages):
    buckets = bucketize(pages)
    series = gapfill(buckets)
    pdf = series.toPandas().sort_values(["url", "ts"])
    for url, g in pdf.groupby("url"):
        diffs = g["ts"].diff().dropna().dt.total_seconds()
        assert (diffs == 3600).all(), f"grid not dense for {url}"
    # gap-filled totals preserve observed counts
    assert pdf["value"].sum() == pages.count()


def test_stl_matches_local_reference_exactly(spark, pages):
    series = gapfill(bucketize(pages))
    out = stl_decompose_df(series, period=24, seasonal_width=35, robust=False)
    got = out.toPandas().sort_values(["url", "ts"]).reset_index(drop=True)

    from stl_decomp_4j_spark.stl import decompose

    local = series.toPandas().sort_values(["url", "ts"])
    for url, g in local.groupby("url"):
        y = g["value"].to_numpy(dtype=float)
        d = decompose(y, 24, seasonal_width=35, robust=False)
        sub = got[got["url"] == url]
        assert np.array_equal(sub["trend"].to_numpy(), d.trend), url
        assert np.array_equal(sub["seasonal"].to_numpy(), d.seasonal), url
        assert np.array_equal(sub["residual"].to_numpy(), d.residual), url


def test_fused_gapfill_stl_equals_distributed(spark, pages):
    """The fused kernel (gap-fill inside the grouped map) must be row-for-row
    bit-identical to the distributed gapfill() -> stl_decompose_df() path."""
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_sparse_df

    buckets = bucketize(pages)
    dist = (
        stl_decompose_df(gapfill(buckets), period=24, seasonal_width=35, robust=True)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    fused = (
        stl_decompose_sparse_df(buckets, period=24, seasonal_width=35, robust=True)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    assert len(dist) == len(fused)
    assert (dist["url"] == fused["url"]).all()
    assert (dist["ts"] == fused["ts"]).all()
    for col in ("value", "trend", "seasonal", "residual", "weight"):
        assert np.array_equal(dist[col].to_numpy(), fused[col].to_numpy()), col


def test_tiers_exact_vs_pandas(spark, pages):
    decomposed = stl_decompose_df(gapfill(bucketize(pages)), period=24, seasonal_width=35)
    tiers = build_tiers(decomposed)
    t1d = tiers["1d"].toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    pdf = decomposed.toPandas()
    pdf["day"] = pdf["ts"].dt.floor("D")
    ref = pdf.groupby(["url", "day"]).agg(
        sum_trend=("trend", "sum"), min_trend=("trend", "min"), max_trend=("trend", "max"), cnt=("trend", "size")
    ).reset_index()
    merged = t1d.merge(ref, left_on=["url", "ts"], right_on=["url", "day"], suffixes=("", "_ref"))
    assert len(merged) == len(t1d) == len(ref)
    assert np.allclose(merged["sum_trend"], merged["sum_trend_ref"], rtol=0, atol=1e-9)
    assert np.array_equal(merged["min_trend"].to_numpy(), merged["min_trend_ref"].to_numpy())
    assert (merged["cnt"] == merged["cnt_ref"]).all()
    # week tier from day tier: totals conserved exactly in sum&cnt space
    t1w = tiers["1w"].toPandas()
    assert t1w["cnt"].sum() == len(pdf)
    assert abs(t1w["sum_value"].sum() - pdf["value"].sum()) < 1e-6


def test_gorilla_chunks_roundtrip_via_spark(spark, pages):
    decomposed = stl_decompose_df(gapfill(bucketize(pages)), period=24, seasonal_width=35)
    tier = build_tiers(decomposed)["1h"].select("url", "ts", "value", "trend")
    chunks = compress_tier(tier)
    back = decompress_chunks(chunks).toPandas()
    orig = tier.toPandas()
    for col in ("value", "trend"):
        got = back[back["column"] == col].sort_values(["url", "ts_ms"])["value"].to_numpy()
        want = orig.sort_values(["url", "ts"])[col].to_numpy()
        assert np.array_equal(got, want)


def test_compress_presorted_matches_shuffled_path(spark, pages, tmp_path):
    """presorted=True (no repartition+sort — valid on the materialized 1h
    tier, which preserves the STL stage's url grouping and grid order) must
    decode to exactly the same rows as the shuffling path."""
    decomposed = stl_decompose_df(gapfill(bucketize(pages)), period=24, seasonal_width=35)
    path = str(tmp_path / "t1h")
    build_tiers(decomposed)["1h"].write.parquet(path)
    mat = spark.read.parquet(path).select("url", "ts", "value", "trend")

    def decode(chunks):
        return (
            decompress_chunks(chunks)
            .toPandas()
            .sort_values(["url", "column", "ts_ms"])
            .reset_index(drop=True)
        )

    a = decode(compress_tier(mat))
    b = decode(compress_tier(mat, presorted=True))
    pd.testing.assert_frame_equal(a, b)


def test_pruned_range_read_decodes_only_needed_chunks(spark, pages):
    """read_range must decode exactly the chunks overlapping the url+time
    predicate (counted via accumulator), and return the same rows as
    filtering the uncompressed tier."""
    from stl_decomp_4j_spark.operators.compress import prune_chunks, read_range

    series = gapfill(bucketize(pages)).select("url", "ts", "value")
    # small slabs so each url has many time chunks to prune between
    chunks = compress_tier(series, columns=["value"], chunk_points=48)
    chunks.cache().count()
    bounds = series.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1")).collect()[0]
    url0 = series.select("url").orderBy("url").first()["url"]
    import datetime as dt

    ts_min = bounds["t0"] + dt.timedelta(days=4)
    ts_max = bounds["t0"] + dt.timedelta(days=8)

    pruned_n = prune_chunks(chunks, urls=[url0], ts_min=ts_min, ts_max=ts_max).count()
    total_n = chunks.count()
    assert 0 < pruned_n < total_n / 2  # both url and time pruning engaged

    acc = spark.sparkContext.accumulator(0)
    got = (
        read_range(chunks, urls=[url0], ts_min=ts_min, ts_max=ts_max, decode_counter=acc)
        .toPandas().sort_values("ts_ms").reset_index(drop=True)
    )
    assert acc.value == pruned_n  # decoded exactly the chunks in range

    want = (
        series.filter((F.col("url") == url0) & (F.col("ts") >= ts_min) & (F.col("ts") <= ts_max))
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert np.array_equal(got["value"].to_numpy(), want["value"].to_numpy())
    assert np.array_equal(
        got["ts_ms"].to_numpy(), want["ts"].astype("datetime64[ms]").astype("int64").to_numpy()
    )
    chunks.unpersist()


def test_full_pipeline_with_resume(spark, pages, tmp_path):
    out = str(tmp_path / "rollup")
    cfg = PipelineConfig(n_buckets=4, compress=True)
    res1 = run_pipeline(spark, pages, out, cfg)
    assert len(res1.buckets_run) == 4
    assert res1.rows_per_tier["1h"] > res1.rows_per_tier["1d"] > res1.rows_per_tier["1w"] > 0

    # lineage rows carry per-bucket throughput (points_per_sec) so a scale
    # operator can spot a collapsed stage from the manifest alone
    import json

    done_rows = [
        json.loads(l)
        for l in (tmp_path / "rollup" / "manifest.jsonl").read_text().splitlines()
        if json.loads(l)["status"] == "done"
    ]
    assert len(done_rows) == 4
    for r in done_rows:
        assert r["points_per_sec"] > 0
        assert abs(r["points_per_sec"] - r["points"] / r["wall_s"]) < 1e-6

    # resume: everything done -> nothing re-runs, outputs unchanged
    before = spark.read.parquet(f"{out}/tier_1d").toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    res2 = run_pipeline(spark, pages, out, cfg, resume=True)
    assert res2.buckets_run == [] and len(res2.buckets_skipped) == 4
    after = spark.read.parquet(f"{out}/tier_1d").toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        before.drop(columns=["run_id"]), after.drop(columns=["run_id"])
    )

    # partial resume: wipe 2 buckets from the manifest -> only those re-run
    manifest = tmp_path / "rollup" / "manifest.jsonl"
    lines = [l for l in manifest.read_text().splitlines() if '"bucket": 0' not in l and '"bucket": 1' not in l]
    manifest.write_text("\n".join(lines) + "\n")
    res3 = run_pipeline(spark, pages, out, cfg, resume=True)
    assert sorted(res3.buckets_run) == [0, 1]
    assert sorted(res3.buckets_skipped) == [2, 3]
    final = spark.read.parquet(f"{out}/tier_1d").toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        before.drop(columns=["run_id"]), final.drop(columns=["run_id"])
    )

    # read-side CLI over the store this pipeline just wrote: pruning engages
    # on url+column, and the decoded rows equal the materialized tier's
    from jobs.query_job import run_query

    url0 = pages.select("url").orderBy("url").first()["url"]
    q = run_query(spark, out, tier="1h", urls=[url0], columns=["trend"])
    assert 0 < q["chunks_decoded"] < q["chunks_total"]
    want_rows = (
        spark.read.parquet(f"{out}/tier_1h").filter(F.col("url") == url0).count()
    )
    assert q["rows"] == want_rows > 0


@pytest.mark.parametrize("granularity,period", [("day", 7), ("week", 4)])
def test_fused_gapfill_other_granularities(spark, pages, granularity, period):
    """Fused kernel grid construction must match the distributed gapfill at
    day and week granularity too (rollup_job exposes --granularity)."""
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_sparse_df

    buckets = bucketize(pages, granularity=granularity)
    dist = (
        stl_decompose_df(gapfill(buckets, granularity=granularity), period=period, seasonal_width=7)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    fused = (
        stl_decompose_sparse_df(buckets, period=period, granularity=granularity, seasonal_width=7)
        .toPandas().sort_values(["url", "ts"]).reset_index(drop=True)
    )
    assert len(dist) == len(fused) and len(dist) > 0
    assert (dist["ts"] == fused["ts"]).all()
    for col in ("value", "trend", "seasonal", "residual"):
        assert np.array_equal(dist[col].to_numpy(), fused[col].to_numpy()), col


def test_incremental_recompute_only_touched_buckets(spark, pages, tmp_path):
    """Streaming-append -> periodic-batch mode: after a full run, an
    incremental run re-runs only buckets whose data high-water mark
    (max(warc_ts), recorded per done row) advanced; untouched buckets keep
    their outputs byte-for-byte."""
    out = str(tmp_path / "rollup_inc")
    cfg = PipelineConfig(n_buckets=4, compress=False)
    res1 = run_pipeline(spark, pages, out, cfg)
    assert sorted(res1.buckets_run) == [0, 1, 2, 3]

    # same input again -> every bucket's high-water mark is unchanged
    res2 = run_pipeline(spark, pages, out, cfg, incremental=True)
    assert res2.buckets_run == [] and len(res2.buckets_skipped) == 4

    # append fresh crawls of one url, 30 days past the end of its history;
    # text stays a pure function of url so the byte-identity invariant holds
    url0 = pages.select("url").orderBy("url").first()["url"]
    target_bucket = (
        pages.filter(F.col("url") == url0)
        .select(F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int").alias("b"))
        .first()["b"]
    )
    appended = pages.filter(F.col("url") == url0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS")
    )
    pages2 = pages.unionByName(appended)

    before = {
        b: spark.read.parquet(f"{out}/tier_1d")
        .filter(F.col("bucket") == b)
        .drop("run_id")
        .toPandas()
        .sort_values(["url", "ts"])
        .reset_index(drop=True)
        for b in range(cfg.n_buckets)
    }
    res3 = run_pipeline(spark, pages2, out, cfg, incremental=True)
    assert res3.buckets_run == [target_bucket]
    assert sorted(res3.buckets_skipped) == sorted(set(range(4)) - {target_bucket})

    # untouched buckets byte-identical; the touched bucket's series extends
    for b in range(cfg.n_buckets):
        after = (
            spark.read.parquet(f"{out}/tier_1d")
            .filter(F.col("bucket") == b)
            .drop("run_id")
            .toPandas()
            .sort_values(["url", "ts"])
            .reset_index(drop=True)
        )
        if b == target_bucket:
            assert after["ts"].max() > before[b]["ts"].max()
            assert len(after) > len(before[b])
        else:
            pd.testing.assert_frame_equal(before[b], after)

    # manifest rows carry the high-water mark for the next incremental run
    import json

    rows = [
        json.loads(l)
        for l in (tmp_path / "rollup_inc" / "manifest.jsonl").read_text().splitlines()
        if json.loads(l)["status"] == "done"
    ]
    assert all(r.get("data_max_ts") for r in rows)
    marks = {}
    for r in rows:  # manifest is append-only: last row per bucket wins
        marks[r["bucket"]] = r["data_max_ts"]
    # the re-run bucket's recorded mark is the appended url's new max ts
    assert marks[target_bucket] == int(
        pages2.filter(F.col("url") == url0).agg(F.max(F.unix_timestamp("warc_ts"))).first()[0]
    )

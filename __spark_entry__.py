"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship north-rule pipeline slice on sf0.001.
queries(): one entry per implemented operator (SURVEY.md §2); each callable
takes (spark, sf_dir) and returns a DataFrame.
oracle_sql(): DuckDB ANSI-SQL twin per SQL-expressible query; non-SQL ops
(STL decomposition, LSH variants, multimodal) are rows-only by design.
"""
from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _t(sf_dir: str, name: str):
    return f"{sf_dir}/{name}.parquet"


def _events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stl_decomp_4j_spark.operators.bucketize import bucketize

    events = spark.read.parquet(_t(sf_dir, "events"))
    return bucketize(events, key_col="event_type", ts_col="ts", granularity="hour")


def _events_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stl_decomp_4j_spark.operators.gapfill import gapfill

    return gapfill(_events_hourly(spark, sf_dir), granularity="hour")


def _fmt_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    return df.withColumn(col, F.date_format(F.col(col), TS_FMT))


# --------------------------------------------------------------------------
# individual queries
# --------------------------------------------------------------------------

def q_bucketize_hourly(spark, sf_dir):
    return _fmt_ts(_events_hourly(spark, sf_dir)).select("url", "ts", "cnt")


def q_gapfill_hourly(spark, sf_dir):
    return _fmt_ts(_events_gapfilled(spark, sf_dir)).select("url", "ts", "value")


def q_gapfill_linear(spark, sf_dir):
    """Linear-interpolation gap-fill (TimescaleDB interpolate()): missing
    hours get the line between the neighboring observed buckets; one window
    exchange, no self-join.  The oracle rebuilds the grid and both
    ignore-nulls carries in DuckDB."""
    from stl_decomp_4j_spark.operators.gapfill import gapfill_linear

    out = gapfill_linear(_events_hourly(spark, sf_dir), granularity="hour")
    return _fmt_ts(out).select(
        "url", "ts", F.round("value", 6).alias("value"), "observed"
    )


def q_asof_serving(spark, sf_dir):
    """As-of join (kdb aj / DuckDB ASOF): per url, the latest hourly bucket
    at or before each daily 00:30 probe, NULLed when staler than 2h.  Shape:
    union + one per-url ordered window — zero joins (a range join would go
    nested-loop).  The oracle is DuckDB's native ASOF LEFT JOIN."""
    from stl_decomp_4j_spark.operators.readside import asof_join

    data = _events_hourly(spark, sf_dir)
    ev = spark.read.parquet(_t(sf_dir, "events"))
    bounds = ev.groupBy(F.col("event_type").alias("url")).agg(
        (F.date_trunc("day", F.min("ts")) + F.expr("INTERVAL 1 DAY")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    # a url whose events all land in one calendar day yields d0 > d1, where
    # Spark's sequence(positive step) throws but generate_series returns
    # empty — filter the empty ranges out BEFORE the explode (the oracle
    # mirrors the filter, where it is a no-op).
    probes = (
        bounds.filter(F.col("d0") <= F.col("d1"))
        .select(
            "url",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("ts"),
        )
        .select("url", (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ts"))
    )
    out = asof_join(probes, data, tolerance_s=7200)
    return out.select(
        "url",
        F.date_format("ts", TS_FMT).alias("ts"),
        "cnt",
        F.date_format("matched_ts", TS_FMT).alias("matched_ts"),
        "staleness_s",
    )


def q_pctl_daily(spark, sf_dir):
    """Per-(url, day) exact interpolated percentiles (p50/p95/p99) of the
    hourly crawl-count series — the latency-style rollup sums can't derive.
    Exact (PERCENTILE_CONT definition) because tier-from-tier groups are
    bounded (<=24 hourly rows per day); the oracle is DuckDB quantile_cont,
    the same interpolation rule."""
    from stl_decomp_4j_spark.operators.rollup import percentile_rollup

    hourly = _events_hourly(spark, sf_dir).select("url", "ts", F.col("cnt").cast("double").alias("value"))
    out = percentile_rollup(hourly, granularity="day")
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("p50", 6).alias("p50"),
        F.round("p95", 6).alias("p95"),
        F.round("p99", 6).alias("p99"),
        "cnt",
    )


def q_twa_daily(spark, sf_dir):
    """Per-(url, day) time-weighted average of the irregular event series:
    each observation LOCF-weighted by how long it was latest — the correct
    downsample for uneven sampling (count-weighted avg over-weights bursts).
    The oracle recomputes dedup + lead-segment weighting in SQL."""
    from stl_decomp_4j_spark.operators.readside import time_weighted_avg

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        F.col("event_type").alias("url"), "ts", "value"
    )
    out = time_weighted_avg(ev, granularity="day")
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("twa", 6).alias("twa"),
        "n_points",
        F.round("span_s", 6).alias("span_s"),
    )


def q_counter_rate_daily(spark, sf_dir):
    """Counter increase / per-second rate per (url, day) with reset
    detection (PromQL increase()/rate(); TimescaleDB counter_agg) over a
    synthetic monotonic counter derived from the hourly crawl counts
    (running cumsum % 100 — each wraparound is a process-restart reset the
    operator must adjust for).  The oracle recomputes the lag/reset-offset
    windows and arg_min/arg_max bucketing in DuckDB."""
    from stl_decomp_4j_spark.operators.readside import counter_rate

    hourly = _events_hourly(spark, sf_dir)
    w = (
        Window.partitionBy("url")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    counter = hourly.select(
        "url",
        "ts",
        (F.sum("cnt").over(w) % F.lit(100)).cast("double").alias("value"),
    )
    out = counter_rate(counter, granularity="day")
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("delta", 6).alias("delta"),
        F.round("rate_per_s", 6).alias("rate_per_s"),
        "n_resets",
        "n_points",
        F.round("span_s", 6).alias("span_s"),
    )


def q_ohlc_daily(spark, sf_dir):
    """Open-high-low-close per (url, day) over the hourly crawl counts
    (TimescaleDB ohlc()/candlestick_agg): open/close via min_by/max_by on
    the timestamp, one partial+final hash aggregate.  The oracle is DuckDB
    arg_min/arg_max/min/max on the same buckets."""
    from stl_decomp_4j_spark.operators.rollup import ohlc_rollup

    hourly = _events_hourly(spark, sf_dir).select(
        "url", "ts", F.col("cnt").cast("double").alias("value")
    )
    out = ohlc_rollup(hourly, granularity="day")
    return _fmt_ts(out).select("url", "ts", "open", "high", "low", "close", "cnt")


def q_ohlc_weekly(spark, sf_dir):
    """Weekly OHLC derived tier-from-tier (daily candles -> weekly candles,
    never re-reading raw data).  The oracle computes weekly OHLC DIRECTLY
    from the hourly series in SQL — hash equality proves the composition is
    exact (open/close are boundary samples of disjoint ordered slices)."""
    from stl_decomp_4j_spark.operators.rollup import ohlc_from_tier, ohlc_rollup

    hourly = _events_hourly(spark, sf_dir).select(
        "url", "ts", F.col("cnt").cast("double").alias("value")
    )
    daily = ohlc_rollup(hourly, granularity="day")
    out = ohlc_from_tier(daily, granularity="week")
    return _fmt_ts(out).select("url", "ts", "open", "high", "low", "close", "cnt")


def q_stats_daily(spark, sf_dir):
    """Per-(url, day) descriptive + linear-trend stats (TimescaleDB
    stats_agg 2D): mean/sample-stddev of the hourly counts plus OLS
    slope/intercept/r² of count vs seconds-within-day.  Moment sums with
    bucket-relative x are integer-exact in float64, so DuckDB reproduces the
    divisions bit-for-bit."""
    from stl_decomp_4j_spark.operators.rollup import stats_rollup

    hourly = _events_hourly(spark, sf_dir).select(
        "url", "ts", F.col("cnt").cast("double").alias("value")
    )
    out = stats_rollup(hourly, granularity="day")
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("avg_value", 6).alias("avg_value"),
        F.round("stddev_value", 6).alias("stddev_value"),
        F.round(F.col("slope_per_s") * 3600, 6).alias("slope_per_h"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        "n",
    )


def q_crawl_sessions(spark, sf_dir):
    """Gap-based sessionization of the raw crawl stream (gap > 2h starts a
    new session): per (url, session) start/end/n_events/duration.  Duplicate
    instants are collapsed before the lag/running-sum windows so boundaries
    are engine-deterministic; the oracle replays the same windows in
    DuckDB."""
    from stl_decomp_4j_spark.operators.sessions import session_summary

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        F.col("event_type").alias("url"), "ts"
    )
    out = session_summary(ev, gap_s=7200)
    return out.select(
        "url",
        "session_id",
        F.date_format("start_ts", TS_FMT).alias("start_ts"),
        F.date_format("end_ts", TS_FMT).alias("end_ts"),
        "n_events",
        F.round("duration_s", 6).alias("duration_s"),
    )


def q_hist_daily(spark, sf_dir):
    """Fixed-edge histogram of the hourly crawl counts per (url, day) — the
    heatmap rollup.  Explicit edges [0, 64) x 8 bins, out-of-range clamped
    into edge bins, sparse rows only.  The oracle recomputes the
    clamp(floor((v-lo)/w)) binning in SQL."""
    from stl_decomp_4j_spark.operators.rollup import histogram_rollup

    hourly = _events_hourly(spark, sf_dir).select(
        "url", "ts", F.col("cnt").cast("double").alias("value")
    )
    out = histogram_rollup(hourly, lo=0.0, hi=64.0, bins=8, granularity="day")
    return _fmt_ts(out).select(
        "url",
        "ts",
        "bin",
        F.round("bin_lo", 6).alias("bin_lo"),
        F.round("bin_hi", 6).alias("bin_hi"),
        "cnt",
    )


def q_top_urls_daily(spark, sf_dir):
    """Exact per-day heavy hitters: top-3 urls by event count with a
    deterministic total order (count desc, url asc).  The rank window sees
    only the count-reduced (day, url) rows, never raw events.  Oracle:
    row_number over the same ordering in DuckDB."""
    from stl_decomp_4j_spark.operators.rollup import top_k_keys

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        F.col("event_type").alias("url"), "ts"
    )
    out = top_k_keys(ev, k=3, granularity="day")
    return out.select(
        F.date_format("ts", TS_FMT).alias("ts"), "rank", "url", "cnt"
    )


def q_rollup_daily(spark, sf_dir):
    events = spark.read.parquet(_t(sf_dir, "events"))
    return _fmt_ts(
        events.groupBy(
            F.col("event_type").alias("url"), F.date_trunc("day", "ts").alias("ts")
        ).agg(
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def q_rollup_weekly(spark, sf_dir):
    events = spark.read.parquet(_t(sf_dir, "events"))
    return _fmt_ts(
        events.groupBy(
            F.col("event_type").alias("url"), F.date_trunc("week", "ts").alias("ts")
        ).agg(
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


def q_sma_24h(spark, sf_dir):
    series = _events_gapfilled(spark, sf_dir)
    w = Window.partitionBy("url").orderBy("ts").rowsBetween(-23, 0)
    out = series.select(
        "url",
        "ts",
        F.round(F.avg("value").over(w), 6).alias("sma24"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )
    return _fmt_ts(out)


def q_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers(spark, sf_dir):
    orders = spark.read.parquet(_t(sf_dir, "orders"))
    cust = spark.read.parquet(_t(sf_dir, "customer"))
    rev = (
        orders.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"),
                                        F.count(F.lit(1)).alias("n_orders"))
    )
    out = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey).select(
        "c_custkey", "c_name", "revenue", "n_orders"
    )
    # TakeOrderedAndProject (distributed partial top-k) instead of a global
    # unpartitioned Window; the rank window then sees only the 20 rows kept
    top = out.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("revenue").desc(), F.col("c_custkey"))
    return top.withColumn("rank", F.row_number().over(w))


def q_text_token_stats(spark, sf_dir):
    from stl_decomp_4j_spark.functions.text import punct_count, token_count, word_count

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        word_count(F.col("text")).alias("n_words"),
        punct_count(F.col("text")).alias("n_punct"),
        F.length("text").alias("n_chars_measured"),
    )


def q_text_quality(spark, sf_dir):
    from stl_decomp_4j_spark.functions.text import quality_score

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


def q_lang_guess(spark, sf_dir):
    from stl_decomp_4j_spark.functions.text import lang_guess

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return docs.select("doc_id", lang_guess(F.col("text")).alias("lang_guess"))


def q_doc_fingerprint(spark, sf_dir):
    from stl_decomp_4j_spark.functions.text import fingerprint

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def q_dedup_exact(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import dedup_exact

    return dedup_exact(spark.read.parquet(_t(sf_dir, "documents")))


def q_dedup_word_set(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import dedup_word_set

    return dedup_word_set(spark.read.parquet(_t(sf_dir, "documents")))


def q_dedup_minhash_lsh(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import dedup_minhash_lsh

    return dedup_minhash_lsh(spark.read.parquet(_t(sf_dir, "documents")), threshold=0.5)


def q_dedup_span_strip(spark, sf_dir):
    """Span REMOVAL: documents rewritten with cross-document duplicate spans
    stripped (operators/dedup.py strip_duplicate_spans) — the step that
    consumes the span index in a training-data pipeline.  The oracle
    recomputes covered positions and the surviving-word reassembly in SQL
    (string_agg ordered by position)."""
    from stl_decomp_4j_spark.operators.dedup import strip_duplicate_spans

    return strip_duplicate_spans(spark.read.parquet(_t(sf_dir, "documents")), k=5)


def q_dedup_spans(spark, sf_dir):
    """Cross-document repeated-span extents (hashed 5-gram span index +
    per-doc island merge; operators/dedup.py duplicate_spans).  The oracle
    recomputes gram positions, cross-doc grams and the interval merge on the
    gram STRINGS in SQL — they match iff the hashed span index loses nothing
    (modulo ~2^-64 xxhash64 gram collisions)."""
    from stl_decomp_4j_spark.operators.dedup import duplicate_spans

    return duplicate_spans(spark.read.parquet(_t(sf_dir, "documents")), k=5)


def q_dedup_components(spark, sf_dir):
    """Transitive near-dup groups: minhash-LSH pairs -> alternating
    large-star/small-star connected components -> one row per document with
    its component label (component minimum doc_id) and whether it is the
    keep-one canonical.  The oracle recomputes the exact-Jaccard pair set
    and its transitive closure with a recursive CTE."""
    from stl_decomp_4j_spark.operators.components import connected_components
    from stl_decomp_4j_spark.operators.dedup import dedup_minhash_lsh

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    pairs = dedup_minhash_lsh(docs, threshold=0.5)
    comp = connected_components(pairs, "id_a", "id_b")
    out = docs.select("doc_id").join(comp, F.col("doc_id") == F.col("node"), "left")
    label = F.coalesce(F.col("component"), F.col("doc_id"))
    return out.select(
        "doc_id",
        label.alias("component"),
        (label == F.col("doc_id")).alias("is_canonical"),
    )


def q_embedding_near_dup_bf(spark, sf_dir):
    """Exact all-pairs baseline for the LSH near-dup path — intentionally
    O(n^2), guarded by all_pairs_cosine's max_rows cap so the quadratic plan
    can never be pointed at a large table by accident."""
    from stl_decomp_4j_spark.operators.similarity import all_pairs_cosine

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    return all_pairs_cosine(emb, threshold=0.5)


def q_ann_topk(spark, sf_dir):
    from stl_decomp_4j_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return brute_force_topk(emb, q, k=10).select("vec_id", "rank")


def q_ann_lsh(spark, sf_dir):
    from stl_decomp_4j_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return ann_lsh_topk(emb, q, k=10, multiprobe_bits=2).select("vec_id", "rank")


def q_ann_ivf(spark, sf_dir):
    from stl_decomp_4j_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return ann_ivf_topk(emb, q, k=10, n_clusters=16, nprobe=4).select("vec_id", "rank")


def q_embedding_near_dup_lsh(spark, sf_dir):
    from stl_decomp_4j_spark.operators.similarity import embedding_near_dup_pairs

    # 0.35 (not the production-ish 0.95) so the random test embeddings yield
    # a non-trivial pair set for the oracle to cross-check
    return embedding_near_dup_pairs(spark.read.parquet(_t(sf_dir, "embeddings")), threshold=0.35)


def q_simhash_pairs(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(spark.read.parquet(_t(sf_dir, "documents")), max_hamming=4)


def q_snapshot_dedup(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import snapshot_dedup

    # `source` is the snapshot key, doc_id order is crawl order: flag
    # consecutive re-crawls whose simhash moved <= 4 bits.
    return snapshot_dedup(spark.read.parquet(_t(sf_dir, "documents")), max_hamming=4)


def q_snapshot_churn(spark, sf_dir):
    from stl_decomp_4j_spark.operators.dedup import snapshot_churn

    return snapshot_churn(spark.read.parquet(_t(sf_dir, "documents")), max_hamming=4)


def q_corpus_clean(spark, sf_dir):
    from stl_decomp_4j_spark.operators.corpus import dedup_corpus

    # the composed training-data cleaning pass: exact -> temporal snapshot ->
    # near-dup keep-one (LSH pairs + connected components) -> span removal.
    # minhash_threshold=0.5 matches the validated dedup_minhash_lsh oracle
    # equality (LSH recall ~1 there); each stage's semantics are individually
    # oracled by the dedup_* / snapshot_* / dedup_span_strip queries.
    return dedup_corpus(
        spark.read.parquet(_t(sf_dir, "documents")),
        snapshot_key="source",
        snapshot_max_hamming=4,
        minhash_threshold=0.5,
        minhash_k=3,
        strip_spans_k=5,
    )


def q_stl_decompose_events(spark, sf_dir):
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    series = _events_gapfilled(spark, sf_dir)
    out = stl_decompose_df(series, period=24, seasonal_width=35, robust=False, partitions=32)
    return _fmt_ts(out).select(
        "url",
        "ts",
        "value",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("residual", 6).alias("residual"),
    )


def q_stl_tier_1d(spark, sf_dir):
    from stl_decomp_4j_spark.operators.rollup import build_tiers
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(_events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, partitions=32)
    t1d = build_tiers(decomposed)["1d"]
    cols = ["url", "ts"] + [c for c in t1d.columns if c.startswith(("sum_", "min_", "max_"))] + ["cnt"]
    out = t1d.select(*[F.round(c, 6).alias(c) if c.startswith(("sum_", "min_", "max_")) else c for c in cols])
    return _fmt_ts(out)


def q_stl_tier_1d_fused(spark, sf_dir):
    """Same 1d tier as q_stl_tier_1d but through the pipeline's fused
    gap-fill+STL kernel (stl_decompose_sparse_df): only observed buckets
    cross the Arrow boundary, the dense grid is built in-kernel.  Result is
    row-for-row identical to the distributed path."""
    from stl_decomp_4j_spark.operators.bucketize import bucketize
    from stl_decomp_4j_spark.operators.rollup import build_tiers
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_sparse_df

    events = spark.read.parquet(_t(sf_dir, "events"))
    buckets = bucketize(events, key_col="event_type", ts_col="ts", granularity="hour")
    decomposed = stl_decompose_sparse_df(buckets, period=24, seasonal_width=35, partitions=32)
    t1d = build_tiers(decomposed)["1d"]
    cols = ["url", "ts"] + [c for c in t1d.columns if c.startswith(("sum_", "min_", "max_"))] + ["cnt"]
    out = t1d.select(*[F.round(c, 6).alias(c) if c.startswith(("sum_", "min_", "max_")) else c for c in cols])
    return _fmt_ts(out)


def q_gorilla_roundtrip(spark, sf_dir):
    """Gap-filled series passed through Gorilla encode+decode; the oracle is
    the plain series SQL — they match iff the codec is lossless."""
    from stl_decomp_4j_spark.operators.compress import compress_tier, decompress_chunks

    series = _events_gapfilled(spark, sf_dir)
    chunks = compress_tier(series.select("url", "ts", "value"), columns=["value"])
    back = decompress_chunks(chunks)
    return back.select(
        "url",
        F.date_format(F.timestamp_millis(F.col("ts_ms")), TS_FMT).alias("ts"),
        "value",
    )


def q_gorilla_range_read(spark, sf_dir):
    """Pruned range read over the Gorilla store: compress with small time
    slabs, then read back only one url's 5-day window — chunks outside the
    (url, time) predicate are pruned on metadata and never decoded.  The
    oracle is the plain-SQL filter of the gap-filled series; they match iff
    pruning loses nothing and decode is lossless."""
    import datetime as dt

    from stl_decomp_4j_spark.operators.compress import compress_tier, read_range

    series = _events_gapfilled(spark, sf_dir)
    chunks = compress_tier(series.select("url", "ts", "value"), columns=["value"], chunk_points=168)
    url0 = series.select("url").orderBy("url").first()["url"]
    t0 = series.agg(F.min("ts").alias("t0")).collect()[0]["t0"]
    ts_min = t0 + dt.timedelta(days=10)
    ts_max = t0 + dt.timedelta(days=15)
    out = read_range(chunks, urls=[url0], ts_min=ts_min, ts_max=ts_max)
    return out.select(
        "url",
        F.date_format(F.timestamp_millis(F.col("ts_ms")), TS_FMT).alias("ts"),
        "value",
    )


def gorilla_range_read_setup(spark, sf_dir, store_dir):
    """Bench helper (not a driver query): materialize the chunk store that
    q_gorilla_range_read builds inline, so bench.py can time store-build
    (setup, once) separately from the pruned read (the number that matters
    — a store is written once and range-read many times).  Returns the probe
    (url, ts_min, ts_max)."""
    import datetime as dt

    from stl_decomp_4j_spark.operators.compress import compress_tier

    series = _events_gapfilled(spark, sf_dir)
    chunks = compress_tier(series.select("url", "ts", "value"), columns=["value"], chunk_points=168)
    chunks.write.mode("overwrite").parquet(store_dir)
    url0 = series.select("url").orderBy("url").first()["url"]
    t0 = series.agg(F.min("ts").alias("t0")).collect()[0]["t0"]
    return url0, t0 + dt.timedelta(days=10), t0 + dt.timedelta(days=15)


def gorilla_range_read_from_store(spark, store_dir, url0, ts_min, ts_max):
    """Bench helper: the pruned range read against a materialized parquet
    chunk store — url/t0/t1 predicates reach the parquet scan as
    PushedFilters, chunks outside the window are never decoded."""
    from stl_decomp_4j_spark.operators.compress import read_range

    chunks = spark.read.parquet(store_dir)
    out = read_range(chunks, urls=[url0], ts_min=ts_min, ts_max=ts_max)
    return out.select(
        "url",
        F.date_format(F.timestamp_millis(F.col("ts_ms")), TS_FMT).alias("ts"),
        "value",
    )


def q_gorilla_compact(spark, sf_dir):
    """Fragmented Gorilla store (encoded at chunk_points=24) compacted back
    to maximally-filled chunks at chunk_points=96 (operators/compress.py
    compact_chunks): per-url chunk count must equal the minimum possible
    ceil(points/96), and the decoded points must survive fragment+merge
    losslessly.  The oracle recomputes points, minimal chunk count and the
    value checksum from the plain gap-filled series in SQL — they match iff
    compaction packs every group to its floor and re-encodes bit-losslessly."""
    from stl_decomp_4j_spark.operators.compress import (
        compact_chunks,
        compress_tier,
        decompress_chunks,
    )

    series = _events_gapfilled(spark, sf_dir)
    frag = compress_tier(series.select("url", "ts", "value"), columns=["value"], chunk_points=24)
    merged = compact_chunks(frag, chunk_points=96)
    stats = decompress_chunks(merged).groupBy("url").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    counts = merged.groupBy("url").agg(F.count(F.lit(1)).alias("n_chunks"))
    return stats.join(counts, "url").select("url", "n_points", "n_chunks", "sum_value")


def q_stl_fit_stats(spark, sf_dir):
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from stl_decomp_4j_spark.stl import decompose, stl_fit_stats

    series = _events_gapfilled(spark, sf_dir)
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("data_mean", DoubleType()),
            StructField("data_variance", DoubleType()),
            StructField("trend_range", DoubleType()),
            StructField("seasonal_variance", DoubleType()),
            StructField("residual_variance", DoubleType()),
            StructField("trendiness_z", DoubleType()),
            StructField("seasonal_z", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from stl_decomp_4j_spark.plans.malloc import tune_malloc

        tune_malloc()
        pdf = pdf.sort_values("ts")
        y = pdf["value"].to_numpy(dtype=float)
        d = decompose(y, 24, seasonal_width=35, robust=False)
        s = stl_fit_stats(d)
        return pd.DataFrame(
            [
                {
                    "url": pdf["url"].iloc[0],
                    "data_mean": round(s.data_mean, 6),
                    "data_variance": round(s.data_variance, 6),
                    "trend_range": round(s.trend_range, 6),
                    "seasonal_variance": round(s.seasonal_variance, 6),
                    "residual_variance": round(s.residual_variance, 6),
                    "trendiness_z": round(s.trendiness_z_score, 6),
                    "seasonal_z": round(s.seasonal_z_score, 6),
                }
            ]
        )

    from stl_decomp_4j_spark.operators.stl_udf import pinned_grouped_apply

    return pinned_grouped_apply(series, fn, schema)


def q_stl_periodic(spark, sf_dir):
    """A23: diagnostic strictly-periodic decomposition (periodic seasonal,
    ni=1, no=0 — ref SeasonalTrendLoess.performPeriodicDecomposition,
    main/stl/SeasonalTrendLoess.java:494-516)."""
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    series = _events_gapfilled(spark, sf_dir)
    out = stl_decompose_df(
        series, period=24, periodic=True, inner_iterations=1, outer_iterations=0, partitions=32
    )
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
    )


def q_stl_robust_periodic(spark, sf_dir):
    """A23: robust periodic diagnostic (ni=1, no=1 — ref
    performRobustPeriodicDecomposition, main/stl/SeasonalTrendLoess.java:523-545)."""
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    series = _events_gapfilled(spark, sf_dir)
    out = stl_decompose_df(
        series, period=24, periodic=True, inner_iterations=1, outer_iterations=1, partitions=32
    )
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("trend", 6).alias("trend"),
        F.round("seasonal", 6).alias("seasonal"),
        F.round("weight", 6).alias("weight"),
    )


def q_stl_seasonal_smooth(spark, sf_dir):
    """A19: post-hoc quadratic loess smoothing of the seasonal component with
    endpoint restoration + residual recompute (ref Decomposition.smoothSeasonal,
    main/stl/SeasonalTrendLoess.java:686-735)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType, TimestampType

    from stl_decomp_4j_spark.stl import decompose

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("ts", TimestampType()),
            StructField("seasonal_smoothed", DoubleType()),
            StructField("residual", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from stl_decomp_4j_spark.plans.malloc import tune_malloc

        tune_malloc()
        pdf = pdf.sort_values("ts")
        y = pdf["value"].to_numpy(dtype=float)
        d = decompose(y, 24, seasonal_width=35, robust=False)
        d.smooth_seasonal(15)
        return pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "seasonal_smoothed": d.seasonal.round(6),
                "residual": d.residual.round(6),
            }
        )

    from stl_decomp_4j_spark.operators.stl_udf import pinned_grouped_apply

    return _fmt_ts(pinned_grouped_apply(_events_gapfilled(spark, sf_dir), fn, schema))


def q_stl_exogenous(spark, sf_dir):
    """A2/A16: STL with exogenous regressors — flipped inner loop, exogenous
    WLS trend (ref main/stl/SeasonalTrendLoess.java:752-765,
    LoessInterpolator.java:292-354).  Regressors are deterministic functions
    of the grid timestamp (weekend indicator + daily sine), so the query is
    reproducible without extra inputs."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType, TimestampType

    from stl_decomp_4j_spark.stl import decompose

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("ts", TimestampType()),
            StructField("trend", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("residual", DoubleType()),
        ]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from stl_decomp_4j_spark.plans.malloc import tune_malloc

        tune_malloc()
        pdf = pdf.sort_values("ts")
        y = pdf["value"].to_numpy(dtype=float)
        ts = pd.to_datetime(pdf["ts"])
        weekend = (ts.dt.dayofweek >= 5).to_numpy(dtype=float)
        daily = np.sin(2.0 * np.pi * ts.dt.hour.to_numpy(dtype=float) / 24.0)
        exog = np.vstack([weekend, daily])
        d = decompose(y, 24, exog=exog, seasonal_width=35, inner_iterations=2, outer_iterations=0)
        return pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "trend": d.trend.round(6),
                "seasonal": d.seasonal.round(6),
                "residual": d.residual.round(6),
            }
        )

    from stl_decomp_4j_spark.operators.stl_udf import pinned_grouped_apply

    return _fmt_ts(pinned_grouped_apply(_events_gapfilled(spark, sf_dir), fn, schema))


def q_multimodal_features(spark, sf_dir):
    from stl_decomp_4j_spark.operators.multimodal import attach_media, extract_features

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    feats = extract_features(attach_media(docs), n_features=8)
    return feats.select(
        "media_id", "kind", "width", "height", "n_frames",
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


def q_multimodal_resize(spark, sf_dir):
    """Aspect-preserving image resize plumbing (stubbed pixel resampling):
    geometry + payload digest verified against an independent pure-Python
    fixture (tools/make_multimodal_fixture.py)."""
    from stl_decomp_4j_spark.operators.multimodal import attach_media, resize_images

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    rs = resize_images(attach_media(docs), max_side=64)
    return rs.select(
        "media_id", "width", "height", "out_width", "out_height",
        F.md5("resized").alias("resized_md5"),
    )


def _stl_tiers(spark, sf_dir):
    from stl_decomp_4j_spark.operators.rollup import build_tiers
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(
        _events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, partitions=32
    )
    return build_tiers(decomposed)


def _round_tier(out):
    cols = ["url", "ts"] + [c for c in out.columns if c.startswith(("sum_", "min_", "max_"))] + ["cnt"]
    return _fmt_ts(
        out.select(*[F.round(c, 6).alias(c) if c.startswith(("sum_", "min_", "max_")) else c for c in cols])
    )


def q_tier_route_month(spark, sf_dir):
    """Tier-routed continuous-aggregate read: a month request with a url
    subset routes to the 1d tier (NOT 1w — ISO weeks straddle month
    boundaries) and re-aggregates exactly.  The oracle aggregates the
    reference fixture's raw hourly grid straight to months, so the
    hash-match proves serve-from-tier == aggregate-from-raw."""
    from stl_decomp_4j_spark.operators.serve import serve_rollup

    out = serve_rollup(_stl_tiers(spark, sf_dir), "month", urls=["click", "error", "purchase"])
    return _round_tier(out)


def q_tier_route_week(spark, sf_dir):
    """Tier-routed read with time-range pruning: a 3-week window routes to
    the 1w tier; the ts bounds prune week buckets before re-aggregation
    (PushedFilters when the tier is parquet-backed)."""
    import datetime as dt

    from stl_decomp_4j_spark.operators.serve import serve_rollup

    wk0 = (
        spark.read.parquet(_t(sf_dir, "events"))
        .agg(F.date_trunc("week", F.min("ts")))
        .first()[0]
    )
    out = serve_rollup(
        _stl_tiers(spark, sf_dir),
        "week",
        ts_min=wk0 + dt.timedelta(days=7),
        ts_max=wk0 + dt.timedelta(days=21),
    )
    return _round_tier(out)


def q_stl_anomalies(spark, sf_dir):
    """Residual anomaly detection: rows whose STL residual exceeds 2.5x the
    url's residual stddev.  The oracle recomputes scale + z + filter in SQL
    over the Java-reference fixture's residuals."""
    from stl_decomp_4j_spark.operators.anomaly import residual_anomalies
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(
        _events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, robust=False, partitions=32
    )
    out = residual_anomalies(decomposed, k=2.5, sigma="std")
    return _fmt_ts(out).select(
        "url",
        "ts",
        "value",
        F.round("residual", 6).alias("residual"),
        F.round("z", 6).alias("z"),
    )


def q_stl_forecast(spark, sf_dir):
    """STL forecast: seasonal repeats its last observed cycle, trend extends
    linearly from a two-point endpoint slope (48 hourly steps ahead, slope
    window = one period).  The oracle recomputes the identical deterministic
    rule in SQL over the Java-reference fixture's trend/seasonal columns."""
    from stl_decomp_4j_spark.operators.forecast import stl_forecast
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(
        _events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, robust=False, partitions=32
    )
    out = stl_forecast(decomposed, period=24, horizon=48, trend_window=24)
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.col("k").cast("long").alias("k"),
        F.round("trend_fc", 6).alias("trend_fc"),
        F.round("seasonal_fc", 6).alias("seasonal_fc"),
        F.round("forecast", 6).alias("forecast"),
    )


def q_lttb_downsample(spark, sf_dir):
    """LTTB visual downsampling (Steinarsson 2013): each url's dense hourly
    series reduced to 100 shape-preserving points (first/last kept, one
    largest-triangle pick per bucket).  The oracle is a committed fixture
    computed by an INDEPENDENT naive scalar transcription of the thesis
    pseudocode (tools/make_lttb_fixture.py) on the DuckDB-gap-filled
    series."""
    from stl_decomp_4j_spark.operators.downsample import lttb

    out = lttb(_events_gapfilled(spark, sf_dir), n_out=100)
    return _fmt_ts(out).select("url", "ts", F.round("value", 6).alias("value"))


def q_stl_backtest(spark, sf_dir):
    """Forecast backtest: hold out each url's last 48 hours, decompose the
    truncated series, forecast the holdout, and score per-url MAE / RMSE /
    MASE (scaled by the in-sample seasonal-naive MAE).  The oracle rebuilds
    the forecast rule from a Java-reference decomposition of the SAME
    truncated series (stl_backtest fixture) and recomputes the metrics in
    SQL against the independently gap-filled actuals."""
    from stl_decomp_4j_spark.operators.forecast import forecast_backtest, stl_forecast
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    series = _events_gapfilled(spark, sf_dir)
    last = series.groupBy("url").agg(F.max("ts").alias("t_last"))
    tagged = series.join(F.broadcast(last), "url")
    cutoff = F.col("t_last") - F.expr("INTERVAL 48 HOURS")
    trunc = tagged.filter(F.col("ts") <= cutoff).select("url", "ts", "value")
    actuals = tagged.filter(F.col("ts") > cutoff).select("url", "ts", "value")
    dec = stl_decompose_df(trunc, period=24, seasonal_width=35, robust=False, partitions=32)
    fc = stl_forecast(dec, period=24, horizon=48, trend_window=24)
    out = forecast_backtest(fc, actuals, trunc, period=24)
    return out.select(
        "url",
        "n",
        F.round("mae", 6).alias("mae"),
        F.round("rmse", 6).alias("rmse"),
        F.round("mase", 6).alias("mase"),
    )


def q_tier_audit(spark, sf_dir):
    """Cross-tier consistency audit with an injected corruption: the stored
    1d tier's sum_trend is shifted +10 for url='error', then audited against
    re-aggregation of the 1h tier.  The audit must report exactly those
    buckets (and nothing else — the float tolerance absorbs double-sum
    merge-order noise).  Oracle recomputes the daily rollup + corruption +
    diff in SQL over the Java-reference fixture."""
    from stl_decomp_4j_spark.operators.audit import tier_consistency

    tiers = _stl_tiers(spark, sf_dir)
    stored = tiers["1d"].withColumn(
        "sum_trend",
        F.when(F.col("url") == "error", F.col("sum_trend") + F.lit(10.0)).otherwise(
            F.col("sum_trend")
        ),
    )
    out = tier_consistency(stored, tiers["1h"], "day", tol=1e-6)
    return _fmt_ts(out).select(
        "url",
        "ts",
        "metric",
        F.round("stored", 6).alias("stored"),
        F.round("recomputed", 6).alias("recomputed"),
    )


def q_stl_strength(spark, sf_dir):
    """Hyndman Fs/Ft decomposition-strength diagnostics per url.  The oracle
    recomputes the variance-ratio formulas in SQL over the Java-reference
    fixture's trend/seasonal/residual columns."""
    from stl_decomp_4j_spark.operators.diagnostics import seasonal_strength
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(
        _events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, robust=False, partitions=32
    )
    out = seasonal_strength(decomposed)
    return out.select(
        "url",
        F.round("f_seasonal", 6).alias("f_seasonal"),
        F.round("f_trend", 6).alias("f_trend"),
        F.round("var_resid", 6).alias("var_resid"),
        F.col("n").cast("long").alias("n"),
    )


def q_stl_changepoints(spark, sf_dir):
    """Residual-CUSUM change-point candidate per url (Page's CUSUM, one row
    per url: earliest max-|CUSUM| point + k*sqrt(n) decision band).  The
    oracle recomputes moments + ordered cumsum + argmax in SQL over the
    Java-reference fixture's residuals."""
    from stl_decomp_4j_spark.operators.diagnostics import cusum_changepoints
    from stl_decomp_4j_spark.operators.stl_udf import stl_decompose_df

    decomposed = stl_decompose_df(
        _events_gapfilled(spark, sf_dir), period=24, seasonal_width=35, robust=False, partitions=32
    )
    out = cusum_changepoints(decomposed, k=3.0)
    return _fmt_ts(out).select(
        "url",
        "ts",
        F.round("cusum", 6).alias("cusum"),
        F.round("threshold", 6).alias("threshold"),
        "exceeds",
    )


def q_crawl_outages(spark, sf_dir):
    """Crawl-outage summary per url from the SPARSE bucketized series (no
    dense grid materialized): gap count / total / max missing buckets and
    the earliest longest gap's start.  Integer-exact; one row per url even
    when gapless."""
    from stl_decomp_4j_spark.operators.diagnostics import outage_summary

    out = outage_summary(_events_hourly(spark, sf_dir), granularity="hour")
    return _fmt_ts(out, col="worst_gap_start").select(
        "url",
        F.col("n_gaps").cast("long").alias("n_gaps"),
        F.col("missing_total").cast("long").alias("missing_total"),
        F.col("max_missing").cast("long").alias("max_missing"),
        "worst_gap_start",
    )


# --------------------------------------------------------------------------
# round-5 merged + new queries.
#
# The driver's CORRECTNESS harness checks the first 50 queries() entries, so
# the registry is kept at EXACTLY 50 by merging near-duplicate queries
# (union with a discriminator column, or a join for per-doc profiles) — the
# merged query still executes every underlying operator and its oracle is
# the UNION ALL / join of the original oracle SQL, so no checked surface is
# lost and every entry now gets a hard-signal row every round.
# --------------------------------------------------------------------------

def q_gapfill(spark, sf_dir):
    """Zero-fill + linear-interpolation gap-fill in one checked result
    (method column); the linear variant's `observed` flag is covered by the
    value itself (observed hours reproduce cnt exactly)."""
    zero = q_gapfill_hourly(spark, sf_dir).select(
        F.lit("zero").alias("method"), "url", "ts", "value"
    )
    lin = q_gapfill_linear(spark, sf_dir).select(
        F.lit("linear").alias("method"), "url", "ts", "value"
    )
    return zero.unionByName(lin)


def q_ohlc(spark, sf_dir):
    """Daily candles + the tier-from-tier weekly candles (ohlc_from_tier),
    tagged by tier."""
    d = q_ohlc_daily(spark, sf_dir).select(F.lit("1d").alias("tier"), "*")
    w = q_ohlc_weekly(spark, sf_dir).select(F.lit("1w").alias("tier"), "*")
    return d.unionByName(w)


def q_rollup_tiers(spark, sf_dir):
    d = q_rollup_daily(spark, sf_dir).select(F.lit("1d").alias("tier"), "*")
    w = q_rollup_weekly(spark, sf_dir).select(F.lit("1w").alias("tier"), "*")
    return d.unionByName(w)


def q_text_profile(spark, sf_dir):
    """All four per-doc text functions (token stats, quality, lang-id,
    fingerprint) in ONE scan — cheaper than the four standalone queries it
    replaces and each column keeps its own oracle expression."""
    from stl_decomp_4j_spark.functions.text import (
        fingerprint,
        lang_guess,
        punct_count,
        quality_score,
        token_count,
        word_count,
    )

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        word_count(F.col("text")).alias("n_words"),
        punct_count(F.col("text")).alias("n_punct"),
        F.length("text").alias("n_chars_measured"),
        quality_score(F.col("text")).alias("quality"),
        lang_guess(F.col("text")).alias("lang_guess"),
        fingerprint(F.col("text")).alias("fp"),
    )


def q_dedup_exact_sets(spark, sf_dir):
    """Exact-digest + word-set dedup groups, tagged by method (key = the
    group digest)."""
    ex = q_dedup_exact(spark, sf_dir).select(
        F.lit("exact").alias("method"), F.col("fp").alias("key"), "keep_id", "n_docs"
    )
    ws = q_dedup_word_set(spark, sf_dir).select(
        F.lit("word_set").alias("method"), F.col("sig").alias("key"), "keep_id", "n_docs"
    )
    return ex.unionByName(ws)


def q_ann(spark, sf_dir):
    """Brute-force, LSH and IVF top-k against the same query vector, tagged
    by method — the three ANN strategies checked in one row set."""
    b = q_ann_topk(spark, sf_dir).select(F.lit("brute").alias("method"), "vec_id", "rank")
    l = q_ann_lsh(spark, sf_dir).select(F.lit("lsh").alias("method"), "vec_id", "rank")
    i = q_ann_ivf(spark, sf_dir).select(F.lit("ivf").alias("method"), "vec_id", "rank")
    return b.unionByName(l).unionByName(i)


def ann_index_setup(spark, sf_dir, idx_dir):
    """Bench helper (not a driver query): materialize the LSH + IVF serving
    indexes once so bench.py can time index-build (setup) separately from
    the partition-pruned lookups — an index is written once and queried many
    times.  Returns the query vector."""
    from stl_decomp_4j_spark.operators.similarity import build_ivf_index, build_lsh_index

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    build_lsh_index(emb, idx_dir + "/lsh", n_planes=8)
    build_ivf_index(emb, idx_dir + "/ivf", n_clusters=16)
    return q


def ann_indexed_from_store(spark, idx_dir, q):
    """The pruned lookups against a materialized ANN index: only the probed
    bucket / cluster partitions are read (PartitionFilters)."""
    from stl_decomp_4j_spark.operators.similarity import ivf_index_topk, lsh_index_topk

    lsh = lsh_index_topk(spark, idx_dir + "/lsh", q, k=10, multiprobe_bits=2).select(
        F.lit("lsh").alias("method"), "vec_id", "rank"
    )
    ivf = ivf_index_topk(spark, idx_dir + "/ivf", q, k=10, nprobe=4).select(
        F.lit("ivf").alias("method"), "vec_id", "rank"
    )
    return lsh.unionByName(ivf)


def q_ann_indexed(spark, sf_dir):
    """Persisted-ANN-index serving path: vectors written once partitioned by
    LSH bucket / IVF cluster, then looked up via partition-pruned reads —
    results identical to the batch q_ann paths (same planes / centroids), so
    the same DuckDB recomputation oracles apply."""
    import tempfile

    idx_dir = tempfile.mkdtemp(prefix="ann_index_")
    q = ann_index_setup(spark, sf_dir, idx_dir)
    return ann_indexed_from_store(spark, idx_dir, q)


def q_multimodal(spark, sf_dir):
    """Feature extraction over all media joined with the image-only resize
    geometry/digest (nulls for non-images) — one checked row per media."""
    feats = q_multimodal_features(spark, sf_dir)
    rs = q_multimodal_resize(spark, sf_dir).select(
        "media_id", "out_width", "out_height", "resized_md5"
    )
    return feats.join(rs, "media_id", "left")


def q_stl_periodic_both(spark, sf_dir):
    """A23 diagnostics: strictly-periodic and robust-periodic decompositions
    tagged by variant (weight is NULL for the non-robust variant)."""
    p = q_stl_periodic(spark, sf_dir).select(
        F.lit("periodic").alias("variant"),
        "url",
        "ts",
        "trend",
        "seasonal",
        F.lit(None).cast("double").alias("weight"),
    )
    r = q_stl_robust_periodic(spark, sf_dir).select(
        F.lit("robust").alias("variant"), "url", "ts", "trend", "seasonal", "weight"
    )
    return p.unionByName(r)


def q_tier_route(spark, sf_dir):
    """Both tier-routed reads (month -> 1d tier with a url subset; pruned
    3-week window -> 1w tier) from ONE tier build, tagged by grain."""
    import datetime as dt

    from stl_decomp_4j_spark.operators.serve import serve_rollup

    tiers = _stl_tiers(spark, sf_dir)
    month = _round_tier(
        serve_rollup(tiers, "month", urls=["click", "error", "purchase"])
    ).select(F.lit("month").alias("grain"), "*")
    wk0 = (
        spark.read.parquet(_t(sf_dir, "events"))
        .agg(F.date_trunc("week", F.min("ts")))
        .first()[0]
    )
    week = _round_tier(
        serve_rollup(
            tiers,
            "week",
            ts_min=wk0 + dt.timedelta(days=7),
            ts_max=wk0 + dt.timedelta(days=21),
        )
    ).select(F.lit("week").alias("grain"), "*")
    return month.unionByName(week)


def q_corpus_clean_incremental(spark, sf_dir):
    """Incremental corpus dedup: documents split by doc_id midpoint into
    HISTORY (fingerprint store built once, text then never touched again)
    and a NEW batch deduped against the store — exact digest anti-join,
    store-seeded lag-1 snapshot window, history band join + exact-Jaccard
    verify, then new-vs-new keep-one.  The oracle chains old+new tables in
    DuckDB (history ids sort before new ids, so the shared inverted gram
    index splits pairs into cross and in-batch by id alone)."""
    import tempfile

    from stl_decomp_4j_spark.operators.corpus import (
        build_fingerprint_store,
        dedup_corpus_incremental,
    )

    docs = spark.read.parquet(_t(sf_dir, "documents"))
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    split = (int(lo) + int(hi)) // 2
    store = tempfile.mkdtemp(prefix="fpstore_")
    build_fingerprint_store(docs.filter(F.col("doc_id") <= split), store, snapshot_key="source")
    return dedup_corpus_incremental(
        docs.filter(F.col("doc_id") > split),
        store,
        snapshot_key="source",
        snapshot_max_hamming=4,
        minhash_threshold=0.5,
        minhash_k=3,
    )


def q_snapshot_stream(spark, sf_dir):
    """Batch-equivalence check of the STATEFUL STREAMING snapshot-dedup twin
    (streaming/snapshots.py): fingerprint rows materialized to parquet, a
    real Structured Streaming query (applyInPandasWithState, availableNow
    trigger, checkpointed exactly-once parquet sink) consumes them, and the
    sink is read back.  The oracle is the BATCH snapshot_dedup SQL — stream
    output must equal the batch lag-1 window."""
    import tempfile

    from stl_decomp_4j_spark.operators.dedup import simhash
    from stl_decomp_4j_spark.streaming.snapshots import (
        SNAPSHOT_IN_SCHEMA,
        stream_snapshot_dedup,
    )

    work = tempfile.mkdtemp(prefix="snapstream_")
    docs = spark.read.parquet(_t(sf_dir, "documents"))
    rows = simhash(docs, carry_cols=("source",)).select("source", "doc_id", "simhash")
    rows.write.mode("overwrite").parquet(work + "/in")
    src = spark.readStream.schema(SNAPSHOT_IN_SCHEMA).parquet(work + "/in")
    q = (
        stream_snapshot_dedup(src, max_hamming=4)
        .writeStream.format("parquet")
        .option("path", work + "/out")
        .option("checkpointLocation", work + "/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(work + "/out")


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events -> bucketize -> fused gap-fill+STL -> 1d tier
    (the pipeline's production kernel; row-identical to the distributed
    gapfill -> stl path, see q_stl_tier_1d)."""
    return q_stl_tier_1d_fused(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the driver's CORRECTNESS harness checks the
    first 50, so at 50 every query gets a hard-signal row every round (the
    r3/r4 rotation defect).  Near-duplicate queries are merged (union with a
    discriminator / one-scan profile join) rather than dropped, so every
    underlying operator still executes and hash-checks; ordering puts the
    entries without an r4 driver row first (never-checked, then r4-rotated,
    then new this round) as belt-and-braces against any future cap change.
    q_stl_tier_1d (the unfused twin) left the registry: it is row-identical
    to stl_tier_1d_fused by construction and pinned by a pytest equivalence
    test instead of a second full STL run per gate."""
    return {
        # -- never driver-checked before round 5 --------------------------
        "lttb_downsample": q_lttb_downsample,
        "tier_audit": q_tier_audit,
        "stl_strength": q_stl_strength,
        "stl_changepoints": q_stl_changepoints,
        "crawl_outages": q_crawl_outages,
        # -- rotated out of the r4 snapshot -------------------------------
        "tier_route": q_tier_route,
        "stl_anomalies": q_stl_anomalies,
        "stl_forecast": q_stl_forecast,
        "stl_backtest": q_stl_backtest,
        # -- new in round 5 ------------------------------------------------
        "ann_indexed": q_ann_indexed,
        "corpus_clean_incremental": q_corpus_clean_incremental,
        "snapshot_stream": q_snapshot_stream,
        # -- series core ----------------------------------------------------
        "bucketize_hourly": q_bucketize_hourly,
        "gapfill": q_gapfill,
        "asof_serving": q_asof_serving,
        "twa_daily": q_twa_daily,
        "counter_rate_daily": q_counter_rate_daily,
        "ohlc": q_ohlc,
        "stats_daily": q_stats_daily,
        "crawl_sessions": q_crawl_sessions,
        "hist_daily": q_hist_daily,
        "top_urls_daily": q_top_urls_daily,
        "pctl_daily": q_pctl_daily,
        "rollup_tiers": q_rollup_tiers,
        "sma_24h": q_sma_24h,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        # -- text / dedup / similarity ---------------------------------------
        "text_profile": q_text_profile,
        "dedup_exact": q_dedup_exact_sets,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_spans": q_dedup_spans,
        "dedup_span_strip": q_dedup_span_strip,
        "dedup_components": q_dedup_components,
        "embedding_near_dup_bf": q_embedding_near_dup_bf,
        "ann_topk": q_ann,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "simhash_pairs": q_simhash_pairs,
        "snapshot_dedup": q_snapshot_dedup,
        "snapshot_churn": q_snapshot_churn,
        "corpus_clean": q_corpus_clean,
        # -- STL family -------------------------------------------------------
        "stl_decompose_events": q_stl_decompose_events,
        "stl_tier_1d_fused": q_stl_tier_1d_fused,
        "stl_fit_stats": q_stl_fit_stats,
        "stl_periodic": q_stl_periodic_both,
        "stl_seasonal_smooth": q_stl_seasonal_smooth,
        "stl_exogenous": q_stl_exogenous,
        # -- gorilla store / multimodal ----------------------------------------
        "gorilla_roundtrip": q_gorilla_roundtrip,
        "gorilla_range_read": q_gorilla_range_read,
        "gorilla_compact": q_gorilla_compact,
        "multimodal": q_multimodal,
    }


def oracle_sql() -> dict[str, str]:
    """Oracles for the 50-entry registry.  Merged queries reuse the original
    per-operator SQL verbatim (UNION ALL with the same discriminator literal
    the Spark side adds, or a join for the one-scan profiles), so every
    operator keeps its independently-derived oracle."""
    base = _oracle_base()
    fix = str(Path(__file__).resolve().parent / "tests" / "fixtures" / "oracle")

    def tag(dcol: str, val: str, sql: str, cols: str = "*") -> str:
        return f"SELECT '{val}' AS {dcol}, {cols} FROM ({sql})"

    merged = {
        "gapfill": tag("method", "zero", base["gapfill_hourly"])
        + " UNION ALL "
        + tag("method", "linear", base["gapfill_linear"], "url, ts, value"),
        "ohlc": tag("tier", "1d", base["ohlc_daily"])
        + " UNION ALL "
        + tag("tier", "1w", base["ohlc_weekly"]),
        "rollup_tiers": tag("tier", "1d", base["rollup_daily"])
        + " UNION ALL "
        + tag("tier", "1w", base["rollup_weekly"]),
        "tier_route": tag("grain", "month", base["tier_route_month"])
        + " UNION ALL "
        + tag("grain", "week", base["tier_route_week"]),
        "dedup_exact": tag("method", "exact", base["dedup_exact"], "fp AS key, keep_id, n_docs")
        + " UNION ALL "
        + tag("method", "word_set", base["dedup_word_set"], "sig AS key, keep_id, n_docs"),
        "ann_topk": tag("method", "brute", base["ann_topk"])
        + " UNION ALL "
        + tag("method", "lsh", base["ann_lsh"])
        + " UNION ALL "
        + tag("method", "ivf", base["ann_ivf"]),
        # indexed serving path returns identical rows to the batch LSH/IVF
        # paths (same planes fixture / same centroid training), so the same
        # independent DuckDB recomputations are its oracle
        "ann_indexed": tag("method", "lsh", base["ann_lsh"])
        + " UNION ALL "
        + tag("method", "ivf", base["ann_ivf"]),
        "text_profile": f"""
            SELECT t.doc_id, t.n_tokens, t.n_words, t.n_punct, t.n_chars_measured,
                   q.quality, l.lang_guess, f.fp
            FROM ({base["text_token_stats"]}) t
            JOIN ({base["text_quality"]}) q USING (doc_id)
            JOIN ({base["lang_guess"]}) l USING (doc_id)
            JOIN ({base["doc_fingerprint"]}) f USING (doc_id)
        """,
        "multimodal": f"""
            SELECT f.media_id, f.kind, f.width, f.height, f.n_frames, f.f0,
                   r.out_width, r.out_height, r.resized_md5
            FROM ({base["multimodal_features"]}) f
            LEFT JOIN ({base["multimodal_resize"]}) r ON f.media_id = r.media_id
        """,
        "stl_periodic": tag(
            "variant",
            "periodic",
            base["stl_periodic"],
            "url, ts, trend, seasonal, CAST(NULL AS DOUBLE) AS weight",
        )
        + " UNION ALL "
        + tag("variant", "robust", base["stl_robust_periodic"]),
        "snapshot_stream": base["snapshot_dedup"],
        "corpus_clean_incremental": f"""
            WITH RECURSIVE
            split AS (SELECT (min(doc_id) + max(doc_id)) // 2 AS s FROM documents),
            fx AS (
                SELECT doc_id, simhash FROM read_parquet('{fix}/simhash.parquet')
                WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
            ),
            old AS (SELECT d.* FROM documents d, split WHERE d.doc_id <= split.s),
            new AS (SELECT d.* FROM documents d, split WHERE d.doc_id > split.s),
            -- stage 1: in-batch exact keep-lowest + digest anti-join vs history
            nb AS (
                SELECT * FROM new
                QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
            ),
            ex AS (
                SELECT * FROM nb
                WHERE md5(text) NOT IN (SELECT md5(text) FROM old)
            ),
            -- stage 2: lag-1 simhash per source seeded by history's LAST snapshot
            lastold AS (
                SELECT o.source, max(o.doc_id) AS doc_id,
                       arg_max(fx.simhash, o.doc_id) AS simhash
                FROM old o JOIN fx USING (doc_id) GROUP BY o.source
            ),
            un AS (
                SELECT e.source, e.doc_id, fx.simhash, FALSE AS hist
                FROM ex e JOIN fx USING (doc_id)
                UNION ALL
                SELECT source, doc_id, simhash, TRUE FROM lastold
            ),
            lg AS (
                SELECT *, lag(simhash) OVER (PARTITION BY source ORDER BY doc_id) AS prev
                FROM un
            ),
            sn AS (
                SELECT e.* FROM ex e JOIN lg ON e.doc_id = lg.doc_id
                WHERE lg.prev IS NULL OR bit_count(xor(lg.simhash, lg.prev)) > 4
            ),
            -- stage 3: exact-Jaccard near-dup — shared inverted gram index over
            -- ALL documents; history ids sort before new ids, so id alone
            -- splits pairs into cross (id_a old) and in-batch (id_a new)
            shs AS (
                SELECT doc_id, list_distinct([
                    lower(words[i]) || ' ' || lower(words[i+1]) || ' ' || lower(words[i+2])
                    FOR i IN range(1, len(words) - 1)
                ]) AS sh
                FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS words
                      FROM documents)
                WHERE len(words) >= 3
            ),
            shx AS (SELECT doc_id, unnest(sh) AS gr FROM shs),
            shn AS (SELECT doc_id, len(sh) AS n FROM shs),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                FROM shx a JOIN shx b ON a.gr = b.gr AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            jac AS (
                SELECT id_a, id_b,
                       CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS j
                FROM inter
                JOIN shn sa ON sa.doc_id = inter.id_a
                JOIN shn sb ON sb.doc_id = inter.id_b
            ),
            -- 3a: drop stage-2 survivors matching HISTORY at >= 0.5
            dh AS (
                SELECT DISTINCT j.id_b AS doc_id
                FROM jac j, split
                WHERE j.j >= 0.5 AND j.id_a <= split.s
                  AND j.id_b IN (SELECT doc_id FROM sn)
            ),
            s3 AS (SELECT * FROM sn WHERE doc_id NOT IN (SELECT doc_id FROM dh)),
            -- 3b: new-vs-new pairs among the remainder -> CC keep-minimum
            prs AS (
                SELECT j.id_a, j.id_b FROM jac j, split
                WHERE j.j >= 0.5 AND j.id_a > split.s
                  AND j.id_a IN (SELECT doc_id FROM s3)
                  AND j.id_b IN (SELECT doc_id FROM s3)
            ),
            e2 AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
            reach(node, label) AS (
                SELECT u, u FROM e2
                UNION
                SELECT e2.v, r.label FROM reach r JOIN e2 ON e2.u = r.node
            ),
            noncanon AS (
                SELECT node FROM reach GROUP BY node HAVING min(label) <> node
            )
            SELECT * FROM s3 WHERE doc_id NOT IN (SELECT node FROM noncanon)
        """,
    }
    out = dict(base)
    for dropped in (
        "gapfill_hourly",
        "gapfill_linear",
        "ohlc_daily",
        "ohlc_weekly",
        "rollup_daily",
        "rollup_weekly",
        "tier_route_month",
        "tier_route_week",
        "dedup_word_set",
        "ann_lsh",
        "ann_ivf",
        "text_token_stats",
        "text_quality",
        "lang_guess",
        "doc_fingerprint",
        "multimodal_features",
        "multimodal_resize",
        "stl_robust_periodic",
        "stl_tier_1d",
    ):
        out.pop(dropped)
    out.update(merged)
    return out


def _oracle_base() -> dict[str, str]:
    hourly = (
        "SELECT event_type AS url, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS ts, "
        "count(*) AS cnt FROM events GROUP BY 1, 2"
    )
    hourly_raw = "SELECT event_type AS url, date_trunc('hour', ts) AS ts, count(*) AS cnt FROM events GROUP BY 1, 2"
    gapfill = f"""
        WITH hourly AS ({hourly_raw}),
        bounds AS (SELECT url, min(ts) AS t0, max(ts) AS t1 FROM hourly GROUP BY url),
        grid AS (SELECT url, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM bounds)
        SELECT g.url, strftime(g.ts, '%Y-%m-%d %H:%M:%S') AS ts,
               coalesce(CAST(h.cnt AS DOUBLE), 0.0) AS value
        FROM grid g LEFT JOIN hourly h ON g.url = h.url AND g.ts = h.ts
    """
    gapfill_raw = f"""
        WITH hourly AS ({hourly_raw}),
        bounds AS (SELECT url, min(ts) AS t0, max(ts) AS t1 FROM hourly GROUP BY url),
        grid AS (SELECT url, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM bounds)
        SELECT g.url, g.ts AS ts, coalesce(CAST(h.cnt AS DOUBLE), 0.0) AS value
        FROM grid g LEFT JOIN hourly h ON g.url = h.url AND g.ts = h.ts
    """
    shingles = """
        SELECT doc_id, list_distinct([
            lower(words[i]) || ' ' || lower(words[i+1]) || ' ' || lower(words[i+2])
            FOR i IN range(1, len(words) - 1)
        ]) AS sh
        FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS words FROM documents)
        WHERE len(words) >= 3
    """
    # exact pairwise Jaccard via an inverted gram index — identical values to
    # an n^2 list_intersect join, but linear in shared-gram pairs (the n^2
    # form was quadratic-infeasible on the 5000-doc sf0.1 table)
    gram_jaccard = f"""
        sh AS ({shingles}),
        shx AS (SELECT doc_id, unnest(sh) AS gr FROM sh),
        shn AS (SELECT doc_id, len(sh) AS n FROM sh),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM shx a JOIN shx b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        jac AS (
            SELECT id_a, id_b,
                   CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS j
            FROM inter
            JOIN shn sa ON sa.doc_id = inter.id_a
            JOIN shn sb ON sb.doc_id = inter.id_b
        )
    """
    gapfill_linear = f"""
        WITH hourly AS ({hourly_raw}),
        bounds AS (SELECT url, min(ts) AS t0, max(ts) AS t1 FROM hourly GROUP BY url),
        grid AS (SELECT url, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM bounds),
        s AS (SELECT g.url, g.ts, CAST(h.cnt AS DOUBLE) AS obs
              FROM grid g LEFT JOIN hourly h ON g.url = h.url AND g.ts = h.ts),
        c AS (SELECT url, ts, obs,
              last_value(obs IGNORE NULLS) OVER
                (PARTITION BY url ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
              last_value(CASE WHEN obs IS NOT NULL THEN ts END IGNORE NULLS) OVER
                (PARTITION BY url ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
              first_value(obs IGNORE NULLS) OVER
                (PARTITION BY url ORDER BY ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              first_value(CASE WHEN obs IS NOT NULL THEN ts END IGNORE NULLS) OVER
                (PARTITION BY url ORDER BY ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
              FROM s)
        SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               round(coalesce(obs,
                     pv + (nv - pv) * ((epoch(ts) - epoch(pt)) / (epoch(nt) - epoch(pt)))
               ), 6) AS value,
               obs IS NOT NULL AS observed
        FROM c
    """
    asof_serving = f"""
        WITH hourly AS ({hourly_raw}),
        r AS (SELECT event_type AS url,
                     date_trunc('day', min(ts)) + INTERVAL 1 DAY AS d0,
                     date_trunc('day', max(ts)) AS d1
              FROM events GROUP BY 1),
        p AS (SELECT url, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) + INTERVAL 30 MINUTE AS ts
              FROM r WHERE d0 <= d1),
        j AS (SELECT p.url, p.ts, h.ts AS mt, h.cnt
              FROM p ASOF LEFT JOIN hourly h ON p.url = h.url AND p.ts >= h.ts)
        SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               CASE WHEN epoch(ts) - epoch(mt) <= 7200 THEN cnt END AS cnt,
               CASE WHEN epoch(ts) - epoch(mt) <= 7200
                    THEN strftime(mt, '%Y-%m-%d %H:%M:%S') END AS matched_ts,
               CASE WHEN epoch(ts) - epoch(mt) <= 7200
                    THEN CAST(epoch(ts) - epoch(mt) AS BIGINT) END AS staleness_s
        FROM j
    """
    pctl_daily = f"""
        WITH hourly AS ({hourly_raw}),
        v AS (SELECT url, date_trunc('day', ts) AS b, CAST(cnt AS DOUBLE) AS value FROM hourly)
        SELECT url, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               round(quantile_cont(value, 0.99), 6) AS p99,
               count(*) AS cnt
        FROM v GROUP BY url, b
    """
    twa_daily = """
        WITH d AS (SELECT event_type AS url, ts AS t, avg(value) AS v, count(*) AS n
                   FROM events GROUP BY 1, 2),
        s AS (SELECT url, date_trunc('day', t) AS b, t, v, n,
                     epoch(lead(t) OVER (PARTITION BY url, date_trunc('day', t) ORDER BY t))
                       - epoch(t) AS dt
              FROM d)
        SELECT url, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts,
               round(CASE WHEN epoch(max(t)) - epoch(min(t)) > 0
                          THEN sum(v * dt) / (epoch(max(t)) - epoch(min(t)))
                          ELSE min_by(v, t) END, 6) AS twa,
               CAST(sum(n) AS BIGINT) AS n_points,
               round(epoch(max(t)) - epoch(min(t)), 6) AS span_s
        FROM s GROUP BY url, b
    """
    counter_rate_daily = f"""
        WITH hourly AS ({hourly_raw}),
        c AS (SELECT url, ts,
                     CAST(sum(cnt) OVER (PARTITION BY url ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) % 100
                       AS DOUBLE) AS v
              FROM hourly),
        l AS (SELECT url, ts, v,
                     lag(v) OVER (PARTITION BY url ORDER BY ts) AS pv
              FROM c),
        a AS (SELECT url, ts,
                     CASE WHEN v < pv THEN 1 ELSE 0 END AS r,
                     v + sum(CASE WHEN v < pv THEN pv ELSE 0 END) OVER
                       (PARTITION BY url ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS adj
              FROM l),
        g AS (SELECT url, date_trunc('day', ts) AS b, ts, adj, r FROM a)
        SELECT url, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts,
               round(arg_max(adj, ts) - arg_min(adj, ts), 6) AS delta,
               CASE WHEN epoch(max(ts)) - epoch(min(ts)) > 0
                    THEN round((arg_max(adj, ts) - arg_min(adj, ts))
                               / (epoch(max(ts)) - epoch(min(ts))), 6)
               END AS rate_per_s,
               CAST(sum(r) AS BIGINT) AS n_resets,
               count(*) AS n_points,
               round(epoch(max(ts)) - epoch(min(ts)), 6) AS span_s
        FROM g GROUP BY url, b
    """
    ohlc_daily = f"""
        WITH hourly AS ({hourly_raw})
        SELECT url, strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ts,
               arg_min(CAST(cnt AS DOUBLE), ts) AS open,
               max(CAST(cnt AS DOUBLE)) AS high,
               min(CAST(cnt AS DOUBLE)) AS low,
               arg_max(CAST(cnt AS DOUBLE), ts) AS close,
               count(*) AS cnt
        FROM hourly GROUP BY url, date_trunc('day', ts)
    """
    stats_daily = f"""
        WITH hourly AS ({hourly_raw}),
        v AS (SELECT url, date_trunc('day', ts) AS b,
                     epoch(ts) - epoch(date_trunc('day', ts)) AS x,
                     CAST(cnt AS DOUBLE) AS y
              FROM hourly),
        m AS (SELECT url, b, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
              FROM v GROUP BY url, b)
        SELECT url, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts,
               round(sy / n, 6) AS avg_value,
               CASE WHEN n > 1
                    THEN round(sqrt(greatest((syy - sy*sy/n) / (n-1), 0)), 6)
               END AS stddev_value,
               CASE WHEN n*sxx - sx*sx <> 0
                    THEN round((n*sxy - sx*sy) / (n*sxx - sx*sx) * 3600, 6)
               END AS slope_per_h,
               CASE WHEN n*sxx - sx*sx <> 0
                    THEN round((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx) * sx) / n, 6)
               END AS intercept,
               CASE WHEN n*sxx - sx*sx <> 0 AND n*syy - sy*sy <> 0
                    THEN round((n*sxy - sx*sy)*(n*sxy - sx*sy)
                               / ((n*sxx - sx*sx)*(n*syy - sy*sy)), 6)
               END AS r2,
               n
        FROM m
    """
    crawl_sessions = """
        WITH e AS (SELECT event_type AS url, ts FROM events),
        d AS (SELECT url, ts AS t, count(*) AS n FROM e GROUP BY 1, 2),
        l AS (SELECT url, t, n,
                     epoch(t) - epoch(lag(t) OVER (PARTITION BY url ORDER BY t)) AS gap
              FROM d),
        f AS (SELECT url, t, n,
                     CASE WHEN gap IS NULL OR gap > 7200 THEN 1 ELSE 0 END AS nf
              FROM l),
        s AS (SELECT url, t, n,
                     sum(nf) OVER (PARTITION BY url ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM f)
        SELECT url, CAST(sid AS BIGINT) AS session_id,
               strftime(min(t), '%Y-%m-%d %H:%M:%S') AS start_ts,
               strftime(max(t), '%Y-%m-%d %H:%M:%S') AS end_ts,
               CAST(sum(n) AS BIGINT) AS n_events,
               round(epoch(max(t)) - epoch(min(t)), 6) AS duration_s
        FROM s GROUP BY url, sid
    """
    hist_daily = f"""
        WITH hourly AS ({hourly_raw}),
        v AS (SELECT url, date_trunc('day', ts) AS b,
                     least(greatest(CAST(floor((CAST(cnt AS DOUBLE) - 0.0) / 8.0)
                                         AS BIGINT), 0), 7) AS bin
              FROM hourly)
        SELECT url, strftime(b, '%Y-%m-%d %H:%M:%S') AS ts, bin,
               round(CAST(bin * 8.0 AS DOUBLE), 6) AS bin_lo,
               round(CAST((bin + 1) * 8.0 AS DOUBLE), 6) AS bin_hi,
               count(*) AS cnt
        FROM v GROUP BY url, b, bin
    """
    top_urls_daily = """
        WITH e AS (SELECT event_type AS url, date_trunc('day', ts) AS b FROM events),
        c AS (SELECT url, b, count(*) AS cnt FROM e GROUP BY 1, 2),
        r AS (SELECT b, url, cnt,
                     row_number() OVER (PARTITION BY b ORDER BY cnt DESC, url) AS rank
              FROM c)
        SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS ts, rank, url, cnt
        FROM r WHERE rank <= 3
    """
    return {
        "bucketize_hourly": hourly,
        "gapfill_hourly": gapfill,
        "gapfill_linear": gapfill_linear,
        "asof_serving": asof_serving,
        "twa_daily": twa_daily,
        "counter_rate_daily": counter_rate_daily,
        "ohlc_daily": ohlc_daily,
        "ohlc_weekly": f"""
        WITH hourly AS ({hourly_raw})
        SELECT url, strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S') AS ts,
               arg_min(CAST(cnt AS DOUBLE), ts) AS open,
               max(CAST(cnt AS DOUBLE)) AS high,
               min(CAST(cnt AS DOUBLE)) AS low,
               arg_max(CAST(cnt AS DOUBLE), ts) AS close,
               count(*) AS cnt
        FROM hourly GROUP BY url, date_trunc('week', ts)
    """,
        "stats_daily": stats_daily,
        "crawl_sessions": crawl_sessions,
        "hist_daily": hist_daily,
        "top_urls_daily": top_urls_daily,
        "pctl_daily": pctl_daily,
        "rollup_daily": (
            "SELECT event_type AS url, strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ts, "
            "round(sum(value), 6) AS sum_value, min(value) AS min_value, max(value) AS max_value, "
            "count(*) AS cnt FROM events GROUP BY 1, 2"
        ),
        "rollup_weekly": (
            "SELECT event_type AS url, strftime(date_trunc('week', ts), '%Y-%m-%d %H:%M:%S') AS ts, "
            "round(sum(value), 6) AS sum_value, min(value) AS min_value, max(value) AS max_value, "
            "count(*) AS cnt FROM events GROUP BY 1, 2"
        ),
        "sma_24h": f"""
            WITH series AS ({gapfill_raw})
            SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   round(avg(value) OVER w, 6) AS sma24,
                   count(*) OVER w AS n_window
            FROM series
            WINDOW w AS (PARTITION BY url ORDER BY ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        """,
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty, "
            "round(sum(l_extendedprice), 4) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
            "count(*) AS count_order FROM lineitem WHERE l_shipdate <= '1998-09-02' GROUP BY 1, 2"
        ),
        "top_customers": """
            WITH rev AS (
                SELECT o_custkey, round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
                FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey, c_name, revenue, n_orders,
                   row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank
            FROM rev JOIN customer ON o_custkey = c_custkey
            QUALIFY rank <= 20
        """,
        "text_token_stats": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_words, "
            "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct, "
            "length(text) AS n_chars_measured FROM documents"
        ),
        "text_quality": """
            SELECT doc_id, round((
                least(CAST(n_tok AS DOUBLE) / 20.0, 1.0)
                + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0), 1.0))
                + least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0) * 5.0, 1.0)
            ) / 3.0, 6) AS quality
            FROM (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\\S+')) AS n_tok,
                       len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
                       len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in)\\b')) AS n_stop
                FROM documents
            )
        """,
        "lang_guess": """
            SELECT doc_id, CASE
                WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                WHEN es >= fr AND es > 0 THEN 'es'
                WHEN fr > 0 THEN 'fr'
                ELSE 'unknown' END AS lang_guess
            FROM (
                SELECT doc_id,
                    len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in)\\b')) AS en,
                    len(regexp_extract_all(lower(text), '\\b(der|und|die|das|ist)\\b')) AS de,
                    len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b')) AS fr,
                    len(regexp_extract_all(lower(text), '\\b(el|la|los|que|de)\\b')) AS es
                FROM documents
            )
        """,
        "doc_fingerprint": (
            "SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp FROM documents"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_docs "
            "FROM documents GROUP BY 1 HAVING count(*) > 1"
        ),
        "dedup_word_set": (
            "SELECT md5(array_to_string(list_sort(list_distinct("
            "regexp_extract_all(lower(trim(text)), '\\S+'))), ' ')) AS sig, "
            "min(doc_id) AS keep_id, count(*) AS n_docs FROM documents GROUP BY 1 HAVING count(*) > 1"
        ),
        "dedup_components": f"""
            WITH RECURSIVE {gram_jaccard},
            p AS (SELECT id_a, id_b FROM jac WHERE j >= 0.5),
            e AS (SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b, id_a FROM p),
            reach(node, label) AS (
                SELECT u, u FROM e
                UNION
                SELECT e.v, r.label FROM reach r JOIN e ON e.u = r.node
            ),
            comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
            SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
                   coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
        """,
        "dedup_spans": r"""
            WITH w AS (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\S+') AS words
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest([array_to_string(words[i:i+4], ' ')
                                 FOR i IN range(1, len(words) - 3)]) AS gram,
                         unnest(range(1, len(words) - 3)) AS pos
                  FROM w WHERE len(words) >= 5),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
            d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
            b AS (SELECT doc_id, pos,
                         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5
                              THEN 0 ELSE 1 END AS brk
                  FROM d),
            isl AS (SELECT doc_id, pos,
                           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                    FROM b)
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + 4 AS BIGINT) AS span_end,
                   CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_words,
                   count(*) AS n_grams
            FROM isl GROUP BY doc_id, island
        """,
        "dedup_span_strip": r"""
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(trim(text)), '\S+') AS lwords,
                              regexp_extract_all(trim(text), '\S+') AS words
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest([array_to_string(lwords[i:i+4], ' ')
                                 FOR i IN range(1, len(lwords) - 3)]) AS gram,
                         unnest(range(1, len(lwords) - 3)) AS pos
                  FROM w WHERE len(lwords) >= 5),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
            d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
            cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS cp FROM d),
            pw AS (SELECT doc_id, unnest(words) AS wd, generate_subscripts(words, 1) AS pos
                   FROM w),
            kept AS (SELECT p.doc_id, p.wd, p.pos FROM pw p
                     WHERE NOT EXISTS (SELECT 1 FROM cov c
                                       WHERE c.doc_id = p.doc_id AND c.cp = p.pos))
            SELECT k.doc_id, string_agg(k.wd, ' ' ORDER BY k.pos) AS clean_text,
                   count(*) AS n_kept,
                   CAST(any_value(t.n) - count(*) AS BIGINT) AS n_removed
            FROM kept k JOIN (SELECT doc_id, len(words) AS n FROM w) t USING (doc_id)
            GROUP BY k.doc_id
        """,
        "dedup_minhash_lsh": f"""
            WITH {gram_jaccard}
            SELECT id_a, id_b, round(j, 6) AS jaccard FROM jac WHERE j >= 0.5
        """,
        "embedding_near_dup_bf": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(a.v, b.v)
                         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.5
        """,
        "ann_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       round(list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
                FROM e, q
            )
            SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
            FROM scored QUALIFY rank <= 10
        """,
        "gorilla_roundtrip": gapfill,
        "gorilla_range_read": f"""
            WITH series AS ({gapfill_raw}),
            sel AS (SELECT min(url) AS u, min(ts) AS t0 FROM series)
            SELECT s.url, strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS ts, s.value
            FROM series s, sel
            WHERE s.url = sel.u
              AND s.ts >= sel.t0 + INTERVAL 10 DAY
              AND s.ts <= sel.t0 + INTERVAL 15 DAY
        """,
        "gorilla_compact": f"""
            WITH series AS ({gapfill_raw})
            SELECT url, count(*) AS n_points,
                   CAST(ceil(count(*) / 96.0) AS BIGINT) AS n_chunks,
                   round(sum(value), 6) AS sum_value
            FROM series GROUP BY url
        """,
        "crawl_outages": """
            WITH b AS (SELECT event_type AS url, date_trunc('hour', ts) AS ts
                       FROM events GROUP BY 1, 2),
            g AS (SELECT url, ts, lag(ts) OVER (PARTITION BY url ORDER BY ts) AS prev FROM b),
            gaps AS (
                SELECT url, prev + INTERVAL 1 HOUR AS gap_start,
                       date_diff('hour', prev, ts) - 1 AS missing
                FROM g WHERE prev IS NOT NULL AND date_diff('hour', prev, ts) > 1
            ),
            ranked AS (
                SELECT url, gap_start,
                       row_number() OVER (PARTITION BY url ORDER BY missing DESC, gap_start ASC) AS rk
                FROM gaps
            ),
            agg AS (SELECT url, count(*) AS n_gaps, sum(missing) AS missing_total,
                           max(missing) AS max_missing FROM gaps GROUP BY url)
            SELECT u.url, CAST(coalesce(a.n_gaps, 0) AS BIGINT) AS n_gaps,
                   CAST(coalesce(a.missing_total, 0) AS BIGINT) AS missing_total,
                   CAST(coalesce(a.max_missing, 0) AS BIGINT) AS max_missing,
                   strftime(w.gap_start, '%Y-%m-%d %H:%M:%S') AS worst_gap_start
            FROM (SELECT DISTINCT event_type AS url FROM events) u
            LEFT JOIN agg a USING (url)
            LEFT JOIN (SELECT url, gap_start FROM ranked WHERE rk = 1) w USING (url)
        """,
        **_stl_fixture_oracles(),
        **_lsh_oracles(),
    }


def _lsh_oracles() -> dict[str, str]:
    """Oracles for the LSH-family queries.

    - simhash_pairs: per-doc fingerprints come from an independent
      pure-Python implementation (own xxHash64 + vote aggregation,
      tools/make_simhash_fixture.py) committed as a fixture; the banding
      (hamming<=max AND at least one equal 16-bit block) and popcount pair
      logic is reproduced in SQL.
    - ann_lsh / embedding_near_dup_lsh: the random hyperplanes are shared
      CONFIG (a committed fixture); bucketing (sign of list_dot_product),
      Hamming-ball candidate generation, and exact cosine verification are
      all recomputed independently in DuckDB SQL.
    - multimodal_features: the deterministic fake decoder re-implemented in
      independent pure Python (tools/make_multimodal_fixture.py — own
      xxHash64/sha256/splitmix64), verifying the Spark plumbing end-to-end.
    """
    fix = str(Path(__file__).resolve().parent / "tests" / "fixtures" / "oracle")
    blocks = " OR ".join(
        f"((a.simhash >> {16 * b}) & 65535) = ((b.simhash >> {16 * b}) & 65535)" for b in range(4)
    )
    planes = f"pl AS (SELECT p, plane FROM read_parquet('{fix}/hyperplanes_d64_p8.parquet'))"
    bucketed = """
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        buck AS (
            SELECT e.vec_id,
                   sum(CASE WHEN list_dot_product(e.v, pl.plane) > 0
                            THEN (1 << pl.p) ELSE 0 END)::BIGINT AS bucket
            FROM e, pl GROUP BY e.vec_id
        )
    """
    cos = (
        "round(list_dot_product(ea.v, eb.v) / "
        "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)"
    )
    return {
        "multimodal_features": f"""
            SELECT media_id, kind, width, height, n_frames, round(f0, 6) AS f0
            FROM read_parquet('{fix}/multimodal.parquet')
            WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
        """,
        "multimodal_resize": f"""
            SELECT media_id, width, height, out_width, out_height, resized_md5
            FROM read_parquet('{fix}/multimodal.parquet')
            WHERE kind = 'image'
              AND sum_chars = (SELECT sum(n_chars) FROM documents)
        """,
        "simhash_pairs": f"""
            WITH fx AS (
                SELECT doc_id, simhash FROM read_parquet('{fix}/simhash.parquet')
                WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM fx a JOIN fx b ON a.doc_id < b.doc_id
            WHERE ({blocks})
              AND bit_count(xor(a.simhash, b.simhash)) <= 4
        """,
        "snapshot_dedup": f"""
            WITH fx AS (
                SELECT doc_id, simhash FROM read_parquet('{fix}/simhash.parquet')
                WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
            ),
            j AS (SELECT d.doc_id, d.source, fx.simhash
                  FROM documents d JOIN fx USING (doc_id)),
            w AS (SELECT doc_id, source, simhash,
                         lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev_id,
                         lag(simhash) OVER (PARTITION BY source ORDER BY doc_id) AS prev_sh
                  FROM j)
            SELECT source, doc_id, prev_id,
                   bit_count(xor(simhash, prev_sh)) AS hamming
            FROM w
            WHERE prev_id IS NOT NULL
              AND bit_count(xor(simhash, prev_sh)) <= 4
        """,
        "snapshot_churn": f"""
            WITH fx AS (
                SELECT doc_id, simhash FROM read_parquet('{fix}/simhash.parquet')
                WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
            ),
            j AS (SELECT d.doc_id, d.source, fx.simhash
                  FROM documents d JOIN fx USING (doc_id)),
            w AS (SELECT doc_id, source,
                         lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS prev_id,
                         bit_count(xor(simhash,
                             lag(simhash) OVER (PARTITION BY source ORDER BY doc_id))) AS hamming
                  FROM j)
            SELECT source,
                   count(*) AS n_pairs,
                   sum(CASE WHEN hamming <= 4 THEN 1 ELSE 0 END)::BIGINT AS n_redundant,
                   round(sum(CASE WHEN hamming <= 4 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                       AS redundant_ratio,
                   round(avg(hamming::DOUBLE), 6) AS avg_hamming
            FROM w WHERE prev_id IS NOT NULL
            GROUP BY source
        """,
        "corpus_clean": f"""
            WITH RECURSIVE
            fx AS (
                SELECT doc_id, simhash FROM read_parquet('{fix}/simhash.parquet')
                WHERE sum_chars = (SELECT sum(n_chars) FROM documents)
            ),
            -- stage 1: exact (keep lowest id per digest)
            ex AS (
                SELECT * FROM documents
                QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
            ),
            -- stage 2: temporal snapshot collapse (lag-1 simhash per source)
            snl AS (
                SELECT e.doc_id,
                       bit_count(xor(fx.simhash,
                           lag(fx.simhash) OVER (PARTITION BY e.source ORDER BY e.doc_id)))
                           AS ham
                FROM ex e JOIN fx USING (doc_id)
            ),
            sn AS (
                SELECT e.* FROM ex e JOIN snl USING (doc_id)
                WHERE snl.ham IS NULL OR snl.ham > 4
            ),
            -- stage 3: near-dup keep-one (exact Jaccard >= 0.5 + CC minimum).
            -- Intersections via an inverted gram index (identical values to
            -- the n^2 list_intersect join, but linear in shared-gram pairs);
            -- closure seeded from pair nodes only (singletons are trivially
            -- canonical).
            shs AS (
                SELECT doc_id, list_distinct([
                    lower(words[i]) || ' ' || lower(words[i+1]) || ' ' || lower(words[i+2])
                    FOR i IN range(1, len(words) - 1)
                ]) AS sh
                FROM (SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS words
                      FROM sn)
                WHERE len(words) >= 3
            ),
            shx AS (SELECT doc_id, unnest(sh) AS gr FROM shs),
            shn AS (SELECT doc_id, len(sh) AS n FROM shs),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                FROM shx a JOIN shx b ON a.gr = b.gr AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            prs AS (
                SELECT id_a, id_b
                FROM inter
                JOIN shn sa ON sa.doc_id = inter.id_a
                JOIN shn sb ON sb.doc_id = inter.id_b
                WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
            ),
            e2 AS (SELECT id_a AS u, id_b AS v FROM prs UNION SELECT id_b, id_a FROM prs),
            reach(node, label) AS (
                SELECT u, u FROM e2
                UNION
                SELECT e2.v, r.label FROM reach r JOIN e2 ON e2.u = r.node
            ),
            noncanon AS (
                SELECT node FROM reach GROUP BY node HAVING min(label) <> node
            ),
            nd AS (
                SELECT s.* FROM sn s
                WHERE s.doc_id NOT IN (SELECT node FROM noncanon)
            ),
            -- stage 4: repeated-span removal (k=5) over the survivors
            w AS (SELECT doc_id,
                         regexp_extract_all(lower(trim(text)), '\\S+') AS lwords,
                         regexp_extract_all(trim(text), '\\S+') AS words
                  FROM nd),
            g AS (SELECT doc_id,
                         unnest([array_to_string(lwords[i:i+4], ' ')
                                 FOR i IN range(1, len(lwords) - 3)]) AS gram,
                         unnest(range(1, len(lwords) - 3)) AS pos
                  FROM w WHERE len(lwords) >= 5),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
            d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
            cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 5)) AS cp FROM d),
            pw AS (SELECT doc_id, unnest(words) AS wd, generate_subscripts(words, 1) AS pos
                   FROM w),
            kept AS (SELECT p.doc_id, p.wd, p.pos FROM pw p
                     WHERE NOT EXISTS (SELECT 1 FROM cov c
                                       WHERE c.doc_id = p.doc_id AND c.cp = p.pos)),
            ct AS (SELECT doc_id, string_agg(wd, ' ' ORDER BY pos) AS text
                   FROM kept GROUP BY doc_id)
            SELECT n.doc_id, ct.text, n.lang, n.source, n.n_chars
            FROM nd n JOIN ct USING (doc_id)
        """,
        "ann_lsh": f"""
            WITH {planes}, {bucketed},
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            qb AS (
                SELECT sum(CASE WHEN list_dot_product(q.qv, pl.plane) > 0
                                THEN (1 << pl.p) ELSE 0 END)::BIGINT AS qbucket
                FROM q, pl
            ),
            scored AS (
                SELECT e.vec_id,
                       round(list_dot_product(e.v, q.qv) /
                             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                FROM e JOIN buck USING (vec_id), q, qb
                WHERE bit_count(xor(buck.bucket, qb.qbucket)) <= 2
            )
            SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
            FROM scored QUALIFY rank <= 10
        """,
        "ann_ivf": f"""
            WITH cen AS (
                SELECT cluster, centroid FROM read_parquet('{fix}/ivf_centroids.parquet')
                WHERE disc = (SELECT sum(label) FROM embeddings)
            ),
            e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
            assigned AS (
                SELECT e.vec_id, e.v,
                       arg_min(cen.cluster,
                               list_dot_product(cen.centroid, cen.centroid) / 2
                               - list_dot_product(e.v, cen.centroid)) AS cluster
                FROM e, cen GROUP BY e.vec_id, e.v
            ),
            probes AS (
                SELECT cen.cluster FROM cen, q
                ORDER BY list_dot_product(cen.centroid, cen.centroid) / 2
                         - list_dot_product(q.qv, cen.centroid)
                LIMIT 4
            ),
            scored AS (
                SELECT a.vec_id,
                       round(list_dot_product(a.v, q.qv) /
                             (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
                FROM assigned a, q WHERE a.cluster IN (SELECT cluster FROM probes)
            )
            SELECT vec_id, row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
            FROM scored QUALIFY rank <= 10
        """,
        "embedding_near_dup_lsh": f"""
            WITH {planes}, {bucketed},
            cand AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b
                FROM buck a JOIN buck b
                  ON a.vec_id < b.vec_id AND bit_count(xor(a.bucket, b.bucket)) <= 1
            )
            SELECT c.id_a, c.id_b, {cos} AS cos
            FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
            WHERE {cos} >= 0.35
        """,
    }


def _stl_fixture_oracles() -> dict[str, str]:
    """Oracles for the STL family: expected outputs produced by the REFERENCE
    Java library itself (tools/make_stl_fixtures.py compiles stl-decomp-4j
    with javac and runs it on the DuckDB-gap-filled series), committed as
    parquet fixtures.  Each fixture carries rows for every test sf tagged
    with that sf's total event count, so one fixed SQL string selects the
    right rows via the ``n_events = (SELECT count(*) FROM events)``
    discriminator."""
    fix = str(Path(__file__).resolve().parent / "tests" / "fixtures" / "oracle")
    disc = "n_events = (SELECT count(*) FROM events)"
    ts = "strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts"
    tier = f"""
        WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc})
        SELECT url, strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ts,
               round(sum(value), 6) AS sum_value, round(min(value), 6) AS min_value,
               round(max(value), 6) AS max_value,
               round(sum(trend), 6) AS sum_trend, round(min(trend), 6) AS min_trend,
               round(max(trend), 6) AS max_trend,
               round(sum(seasonal), 6) AS sum_seasonal, round(min(seasonal), 6) AS min_seasonal,
               round(max(seasonal), 6) AS max_seasonal,
               round(sum(residual), 6) AS sum_residual, round(min(residual), 6) AS min_residual,
               round(max(residual), 6) AS max_residual,
               count(*) AS cnt
        FROM h GROUP BY url, date_trunc('day', ts)
    """
    def _route(granularity: str, where: str) -> str:
        aggs = ",\n               ".join(
            f"round(sum({c}), 6) AS sum_{c}, round(min({c}), 6) AS min_{c}, "
            f"round(max({c}), 6) AS max_{c}"
            for c in ("value", "trend", "seasonal", "residual")
        )
        return f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc})
            SELECT url, strftime(date_trunc('{granularity}', ts), '%Y-%m-%d %H:%M:%S') AS ts,
               {aggs},
               count(*) AS cnt
            FROM h WHERE {where} GROUP BY url, date_trunc('{granularity}', ts)
        """

    return {
        "stl_decompose_events": f"""
            SELECT url, {ts}, value, round(trend, 6) AS trend,
                   round(seasonal, 6) AS seasonal, round(residual, 6) AS residual
            FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc}
        """,
        "tier_route_month": _route("month", "url IN ('click', 'error', 'purchase')"),
        "tier_route_week": _route(
            "week",
            "date_trunc('week', ts) >= (SELECT date_trunc('week', min(ts)) FROM events) + INTERVAL 7 DAY "
            "AND date_trunc('week', ts) <= (SELECT date_trunc('week', min(ts)) FROM events) + INTERVAL 21 DAY",
        ),
        "stl_anomalies": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc}),
            s AS (SELECT url, stddev_samp(residual) AS sigma FROM h GROUP BY url)
            SELECT h.url, strftime(h.ts, '%Y-%m-%d %H:%M:%S') AS ts, h.value,
                   round(h.residual, 6) AS residual, round(h.residual / s.sigma, 6) AS z
            FROM h JOIN s USING (url) WHERE abs(h.residual / s.sigma) > 2.5
        """,
        "stl_strength": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc})
            SELECT url,
                   round(greatest(0.0, 1.0 - var_samp(residual) / var_samp(seasonal + residual)), 6) AS f_seasonal,
                   round(greatest(0.0, 1.0 - var_samp(residual) / var_samp(trend + residual)), 6) AS f_trend,
                   round(var_samp(residual), 6) AS var_resid,
                   count(*) AS n
            FROM h GROUP BY url
        """,
        "stl_changepoints": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc}),
            m AS (SELECT url, avg(residual) AS mu, stddev_samp(residual) AS sd, count(*) AS n
                  FROM h GROUP BY url),
            c AS (
                SELECT h.url, h.ts,
                       sum((h.residual - m.mu) / m.sd) OVER (
                           PARTITION BY h.url ORDER BY h.ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
                       3.0 * sqrt(m.n) AS threshold
                FROM h JOIN m USING (url)
            ),
            r AS (SELECT *, row_number() OVER (PARTITION BY url ORDER BY abs(cusum) DESC, ts ASC) AS rk
                  FROM c)
            SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, round(cusum, 6) AS cusum,
                   round(threshold, 6) AS threshold, abs(cusum) > threshold AS exceeds
            FROM r WHERE rk = 1
        """,
        "stl_forecast": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc}),
            last AS (SELECT url, max(ts) AS t_last FROM h GROUP BY url),
            tail AS (
                SELECT h.url, l.t_last, date_diff('hour', h.ts, l.t_last) AS age,
                       h.trend, h.seasonal
                FROM h JOIN last l USING (url)
                WHERE h.ts >= l.t_last - INTERVAL 24 HOUR
            ),
            state AS (
                SELECT url, t_last,
                       max(CASE WHEN age = 0 THEN trend END) AS trend_last,
                       max(CASE WHEN age = 24 THEN trend END) AS trend_anchor
                FROM tail GROUP BY url, t_last
            ),
            slopes AS (
                SELECT url, t_last, trend_last,
                       (trend_last - coalesce(trend_anchor, trend_last)) / 24.0 AS slope
                FROM state
            ),
            grid AS (
                SELECT url, t_last, trend_last, slope,
                       unnest(generate_series(1, 48)) AS k
                FROM slopes
            ),
            season AS (SELECT url, 23 - age AS phase, seasonal AS seasonal_fc FROM tail WHERE age < 24)
            SELECT g.url,
                   strftime(g.t_last + to_hours(CAST(g.k AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts,
                   CAST(g.k AS BIGINT) AS k,
                   round(g.trend_last + g.k * g.slope, 6) AS trend_fc,
                   round(s.seasonal_fc, 6) AS seasonal_fc,
                   round((g.trend_last + g.k * g.slope) + s.seasonal_fc, 6) AS forecast
            FROM grid g JOIN season s ON g.url = s.url AND (g.k - 1) % 24 = s.phase
        """,
        "lttb_downsample": f"""
            SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
                   round(value, 6) AS value
            FROM read_parquet('{fix}/lttb_hourly.parquet') WHERE {disc}
        """,
        "stl_backtest": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_backtest.parquet') WHERE {disc}),
            last AS (SELECT url, max(ts) AS t_last FROM h GROUP BY url),
            tail AS (
                SELECT h.url, l.t_last, date_diff('hour', h.ts, l.t_last) AS age,
                       h.trend, h.seasonal
                FROM h JOIN last l USING (url)
                WHERE h.ts >= l.t_last - INTERVAL 24 HOUR
            ),
            state AS (
                SELECT url, t_last,
                       max(CASE WHEN age = 0 THEN trend END) AS trend_last,
                       max(CASE WHEN age = 24 THEN trend END) AS trend_anchor
                FROM tail GROUP BY url, t_last
            ),
            slopes AS (
                SELECT url, t_last, trend_last,
                       (trend_last - coalesce(trend_anchor, trend_last)) / 24.0 AS slope
                FROM state
            ),
            grid AS (
                SELECT url, t_last, trend_last, slope,
                       unnest(generate_series(1, 48)) AS k
                FROM slopes
            ),
            season AS (SELECT url, 23 - age AS phase, seasonal AS seasonal_fc FROM tail WHERE age < 24),
            fc AS (
                SELECT g.url, g.t_last + to_hours(CAST(g.k AS BIGINT)) AS ts,
                       (g.trend_last + g.k * g.slope) + s.seasonal_fc AS forecast
                FROM grid g JOIN season s ON g.url = s.url AND (g.k - 1) % 24 = s.phase
            ),
            hourly AS (
                SELECT event_type AS url, date_trunc('hour', ts) AS ts, count(*) AS cnt
                FROM events GROUP BY 1, 2
            ),
            bounds AS (SELECT url, min(ts) AS t0, max(ts) AS t1 FROM hourly GROUP BY url),
            act AS (
                SELECT g.url, g.ts, coalesce(CAST(hh.cnt AS DOUBLE), 0.0) AS value
                FROM (SELECT url, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts
                      FROM bounds) g
                LEFT JOIN hourly hh ON g.url = hh.url AND g.ts = hh.ts
            ),
            err AS (
                SELECT f.url, count(*) AS n,
                       avg(abs(f.forecast - a.value)) AS mae,
                       sqrt(avg((f.forecast - a.value) * (f.forecast - a.value))) AS rmse
                FROM fc f JOIN act a ON f.url = a.url AND f.ts = a.ts
                GROUP BY f.url
            ),
            sc AS (
                SELECT url, avg(abs(d)) AS scale FROM (
                    SELECT url,
                           value - lag(value, 24) OVER (PARTITION BY url ORDER BY ts) AS d
                    FROM h) WHERE d IS NOT NULL GROUP BY url
            )
            SELECT e.url, e.n, round(e.mae, 6) AS mae, round(e.rmse, 6) AS rmse,
                   round(CASE WHEN s.scale > 0 THEN e.mae / s.scale END, 6) AS mase
            FROM err e JOIN sc s USING (url)
        """,
        "tier_audit": f"""
            WITH h AS (SELECT * FROM read_parquet('{fix}/stl_decompose_events.parquet') WHERE {disc}),
            d AS (
                SELECT url, date_trunc('day', ts) AS ts, sum(trend) AS sum_trend
                FROM h GROUP BY 1, 2
            )
            SELECT url, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, 'sum_trend' AS metric,
                   round(sum_trend + 10.0, 6) AS stored, round(sum_trend, 6) AS recomputed
            FROM d WHERE url = 'error'
        """,
        "stl_tier_1d": tier,
        "stl_tier_1d_fused": tier,
        "stl_periodic": f"""
            SELECT url, {ts}, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal
            FROM read_parquet('{fix}/stl_periodic.parquet') WHERE {disc}
        """,
        "stl_robust_periodic": f"""
            SELECT url, {ts}, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
                   round(weight, 6) AS weight
            FROM read_parquet('{fix}/stl_robust_periodic.parquet') WHERE {disc}
        """,
        "stl_seasonal_smooth": f"""
            SELECT url, {ts}, round(seasonal_smoothed, 6) AS seasonal_smoothed,
                   round(residual, 6) AS residual
            FROM read_parquet('{fix}/stl_seasonal_smooth.parquet') WHERE {disc}
        """,
        "stl_exogenous": f"""
            SELECT url, {ts}, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
                   round(residual, 6) AS residual
            FROM read_parquet('{fix}/stl_exogenous.parquet') WHERE {disc}
        """,
        "stl_fit_stats": f"""
            SELECT url, round(data_mean, 6) AS data_mean, round(data_variance, 6) AS data_variance,
                   round(trend_range, 6) AS trend_range,
                   round(seasonal_variance, 6) AS seasonal_variance,
                   round(residual_variance, 6) AS residual_variance,
                   round(trendiness_z, 6) AS trendiness_z, round(seasonal_z, 6) AS seasonal_z
            FROM read_parquet('{fix}/stl_fit_stats.parquet') WHERE {disc}
        """,
    }

"""The north-rule pipeline: pages -> bucketize -> gap-fill -> STL ->
1h/1d/1w retention tiers -> Gorilla-compressed sink, with checkpoint/resume,
per-bucket lineage + metrics, and the per-url text byte-identity invariant.

Physical shape (SURVEY.md §3.4): Iceberg/parquet scan (column-pruned to
url+warc_ts) -> hash agg bucketize (partial+final) -> per-url dense-grid
join -> applyInPandas STL (the one JVM<->Python Arrow boundary) -> tier
rollup aggs (each tier from the previous, exact) -> Gorilla encode UDF ->
partitioned sink.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .operators.bucketize import bucketize
from .operators.compress import compress_tier
from .operators.gapfill import gapfill
from .operators.rollup import build_tiers
from .operators.stl_udf import stl_decompose_sparse_df
from .plans.checkpoint import Manifest, new_run_id
from .sources.catalog import write_table


# bump when the persisted tier/gorilla table schema changes (v2 = compact 1h
# tier; v3 = calendar-slab partition level for metadata-only retention); the
# manifest records it so --resume across an upgrade fails loudly instead of
# appending mixed-schema partitions under one table root
TIER_SCHEMA_VERSION = 3


@dataclass
class PipelineConfig:
    period: int = 24
    seasonal_width: int = 35
    robust: bool = False
    granularity: str = "hour"
    n_buckets: int = 8
    compress: bool = True
    # calendar slab for the second partition level (bucket, slab): Gorilla
    # chunks are slab-aligned and retention (operators/retention.py) drops
    # whole expired slabs on metadata alone.  None = single-level bucket
    # partitioning, no slab-bounded chunks, no retention support.
    slab: str | None = "month"


@dataclass
class PipelineResult:
    run_id: str
    buckets_run: list = field(default_factory=list)
    buckets_skipped: list = field(default_factory=list)
    rows_per_tier: dict = field(default_factory=dict)
    wall_s: float = 0.0


def decompose_pages(pages: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """pages -> decomposed dense hourly series (no sink).

    Uses the fused gap-fill + STL kernel: only observed buckets cross the
    shuffle and the Arrow boundary; the dense grid is built in-kernel
    (identical semantics to gapfill() — asserted by test_fused_gapfill_stl)."""
    return stl_decompose_sparse_df(
        bucketize(pages, granularity=cfg.granularity),
        cfg.period,
        granularity=cfg.granularity,
        seasonal_width=cfg.seasonal_width,
        robust=cfg.robust,
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    cfg: PipelineConfig | None = None,
    resume: bool = False,
    incremental: bool = False,
) -> PipelineResult:
    """Full pipeline with bucket-sliced checkpointing.

    Buckets are url-hash slices; each is decomposed and written independently
    so a failed run resumes from the first incomplete bucket.  Output
    partitions are (bucket, ...) so rewrites are idempotent.

    ``resume=True`` skips buckets with a 'done' manifest row (crash
    recovery).  ``incremental=True`` is the streaming-append → periodic-batch
    mode: a bucket is skipped only if its data high-water mark
    (``max(warc_ts)``, recorded in every done row as ``data_max_ts``) has not
    advanced since its last completed run — freshly-appended data re-runs
    exactly the buckets it touched and rewrites their partitions
    idempotently.  The high-water mark detects appends (the ingest path);
    backfills of strictly-older rows need a plain full run.
    """
    cfg = cfg or PipelineConfig()
    t_start = time.time()
    manifest = Manifest(out_root)
    run_id = new_run_id()

    result = PipelineResult(run_id=run_id)
    bucket_col = F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int")
    pages_b = pages.withColumn("bucket", bucket_col)

    # per-bucket data high-water mark: one column-pruned scan, partial+final
    # hash agg, n_buckets rows to the driver (bounded).  Recorded in every
    # done row so a later incremental run can skip buckets whose data did not
    # advance without touching their output.
    data_max_ts = {
        r["bucket"]: r["max_ts"]
        for r in pages_b.groupBy("bucket")
        .agg(F.max(F.unix_timestamp("warc_ts")).alias("max_ts"))
        .collect()
    }

    if incremental:
        prior = manifest.last_done(schema_version=TIER_SCHEMA_VERSION)
        done = set()
        for b, row in prior.items():
            if "data_max_ts" not in row:
                continue  # legacy row with no recorded mark: re-run to learn it
            rec, cur = row["data_max_ts"], data_max_ts.get(b)
            # skip if the mark is unchanged — including a bucket that was
            # recorded empty (mark None) and is still empty
            if cur == rec or (cur is not None and rec is not None and cur <= rec):
                done.add(b)
    else:
        done = manifest.done_buckets(schema_version=TIER_SCHEMA_VERSION) if resume else set()

    # invariant input: per-url text digest before the pipeline touches
    # anything — scoped to the buckets this run will actually process, so an
    # incremental refresh touching k of n buckets scans k/n of the table's
    # text bytes (the check is two sha256 scans; unscoped it would dominate
    # an incremental run at scale)
    run_buckets = [b for b in range(cfg.n_buckets) if b not in done]
    pages_checked = pages_b.filter(F.col("bucket").isin(run_buckets)) if run_buckets else None
    digests_before = pages_checked and (
        pages_checked.groupBy("url").agg(F.min(F.sha2("text", 256)).alias("digest_before"),
                                         F.countDistinct(F.sha2("text", 256)).alias("nd"))
    )

    for bucket in range(cfg.n_buckets):
        if bucket in done:
            result.buckets_skipped.append(bucket)
            continue
        t0 = time.time()
        # column pruning: only url + warc_ts enter the series path
        slice_pages = pages_b.filter(F.col("bucket") == bucket).select("url", "warc_ts")
        decomposed = decompose_pages(slice_pages, cfg)
        # each tier is MATERIALIZED and the next tier derives from the
        # materialized table — the STL stage runs exactly once per bucket and
        # coarser tiers read the already-reduced previous tier (the
        # continuous-aggregate pattern; recomputing the chain per tier
        # tripled the dominant UDF cost)
        from .operators.rollup import hourly_tier, rollup_tier

        n_points = 0
        tier_df = hourly_tier(decomposed)
        # second partition level for retention: slab = calendar slab of the
        # row (tier) / of the slab-aligned chunk's start (gorilla)
        part_cols = ["bucket"] + (["slab"] if cfg.slab else [])

        def _with_slab(df, ts_col):
            if not cfg.slab:
                return df
            return df.withColumn(
                "slab", F.date_format(F.date_trunc(cfg.slab, ts_col), "yyyy-MM-dd")
            )

        for tier_name, next_granularity in (("1h", "day"), ("1d", "week"), ("1w", None)):
            out = tier_df.withColumn("run_id", F.lit(run_id)).withColumn("bucket", F.lit(bucket))
            write_table(_with_slab(out, "ts"), f"{out_root}/tier_{tier_name}",
                        partition_by=part_cols, mode="overwrite_partitions")
            materialized = (
                spark.read.parquet(f"{out_root}/tier_{tier_name}")
                .filter(F.col("bucket") == bucket)
                .drop("run_id", "bucket", "slab")
            )
            if cfg.compress:
                comps = ["value", "trend", "seasonal", "residual"]
                comp_cols = comps if tier_name == "1h" else [f"sum_{c}" for c in comps]
                # the 1h tier's parquet comes straight from the url-hash-
                # partitioned STL stage (urls contiguous, grid-ordered), so
                # its compression needs no repartition+sort — the sink's only
                # shuffle, over the engine's largest table, disappears
                chunks = compress_tier(
                    materialized.select("url", "ts", *comp_cols),
                    presorted=(tier_name == "1h"),
                    slab=cfg.slab,
                )
                chunks = chunks.withColumn("run_id", F.lit(run_id)).withColumn("bucket", F.lit(bucket))
                write_table(_with_slab(chunks, "t0"), f"{out_root}/gorilla_{tier_name}",
                            partition_by=part_cols, mode="overwrite_partitions")
            n_points += materialized.count()
            if next_granularity:
                tier_df = rollup_tier(materialized, next_granularity)
        wall = time.time() - t0
        # points/sec per bucket: a 100x operator spots a collapsed stage (the
        # #1 failure mode: AQE coalescing a CPU-heavy stage to one partition)
        # straight from the lineage table — throughput craters while status
        # stays 'done'
        manifest.mark(
            run_id, bucket, "done", points=n_points, wall_s=wall,
            points_per_sec=(n_points / wall if wall > 0 else 0.0),
            schema_version=TIER_SCHEMA_VERSION,
            data_max_ts=data_max_ts.get(bucket),
            # the store is self-describing: retention reads the slab
            # granularity from here instead of trusting a caller flag (a
            # mismatched flag would silently mis-compute slab ends)
            slab_granularity=cfg.slab,
        )
        result.buckets_run.append(bucket)

    # verify the byte-identity invariant end-to-end: urls in the processed
    # buckets still map to exactly one digest equal to the input digest
    if pages_checked is not None:
        digests_after = (
            pages_checked.groupBy("url").agg(F.min(F.sha2("text", 256)).alias("digest_after"))
        )
        bad = (
            digests_before.join(digests_after, "url")
            .filter((F.col("nd") != 1) | (F.col("digest_before") != F.col("digest_after")))
            .count()
        )
        if bad:
            raise AssertionError(f"text byte-identity invariant violated for {bad} urls")

    for tier_name in ("1h", "1d", "1w"):
        result.rows_per_tier[tier_name] = spark.read.parquet(f"{out_root}/tier_{tier_name}").count()
    result.wall_s = time.time() - t_start
    return result

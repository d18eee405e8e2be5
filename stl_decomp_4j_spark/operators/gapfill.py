"""Gap-fill irregular per-key buckets to a dense fixed grid.

The STL core requires equally spaced data with no missing values
(reference README.md:8); this operator makes that assumption true before the
decomposition UDF.  The dense grid is built per key from its own [min, max]
bucket range with sequence+explode (distributed — no driver-side expansion),
then left-joined back to the observed buckets with missing values filled with
0 (no crawls observed that hour).

Scale notes: grid size per url is bounded by the time range (e.g. 90 days of
hourly grid = 2160 rows) regardless of raw crawl count, so per-group state in
the downstream pandas UDF stays small.  The join is a key+ts equi-join
between two url-partitioned children; AQE handles post-shuffle coalescing.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_INTERVALS = {"hour": "interval 1 hour", "day": "interval 1 day", "week": "interval 7 days"}


def gapfill(
    buckets: DataFrame,
    granularity: str = "hour",
    fill_value: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Dense (url, ts, value) grid; value = cnt where observed else fill.

    The bounds table (one row per url) is explicitly repartitioned by url
    BEFORE the explode: the grid fan-out multiplies rows ~grid-length-fold,
    and AQE would otherwise coalesce the tiny bounds shuffle into one
    partition by byte size — serializing the fan-out, the join, and the
    downstream CPU-heavy STL stage onto one core.  A user-specified
    repartition count is exempt from AQE coalescing and is satisfied by the
    grouped-map UDF's url clustering, so no further shuffle follows."""
    interval = _INTERVALS[granularity]
    spark = buckets.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 4
    bounds = buckets.groupBy("url").agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    grid = bounds.repartition(partitions, "url").select(
        "url", F.explode(F.sequence("t0", "t1", F.expr(interval))).alias("ts")
    )
    return grid.join(buckets, ["url", "ts"], "left").select(
        "url",
        "ts",
        F.coalesce(F.col("cnt").cast("double"), F.lit(float(fill_value))).alias("value"),
    )


def gapfill_linear(
    buckets: DataFrame,
    granularity: str = "hour",
    partitions: int | None = None,
) -> DataFrame:
    """Dense (url, ts, value) grid with LINEAR interpolation across gaps.

    zero-fill (``gapfill``) is right for crawl COUNTS ("no crawls observed
    that hour" is a real zero); for sampled gauges (a tier's trend column, a
    sensor level) a missing hour means "not sampled" and the standard fill is
    the line between the neighboring observations (TimescaleDB's
    ``interpolate()``).  Grid rows before the first / after the last
    observation of a url don't exist (the grid spans the url's own observed
    [min, max]), so every gap has both endpoints.

    Plan shape: the same bounded sequence+explode grid as ``gapfill`` (the
    repartition pin protects the fan-out from AQE byte-based coalescing),
    then ONE window exchange: the backward last-observation carry and the
    forward next-observation carry share (partitionBy url, orderBy ts), so
    Catalyst evaluates both frames in a single sort — no second shuffle, no
    self-join.  Interpolation itself is codegen arithmetic.
    """
    interval = _INTERVALS[granularity]
    spark = buckets.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 4
    bounds = buckets.groupBy("url").agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    grid = bounds.repartition(partitions, "url").select(
        "url", F.explode(F.sequence("t0", "t1", F.expr(interval))).alias("ts")
    )
    sparse = grid.join(buckets, ["url", "ts"], "left").select(
        "url", "ts", F.col("cnt").cast("double").alias("_obs")
    )
    back = (
        Window.partitionBy("url")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("url")
        .orderBy("ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("_obs").isNotNull(), F.col("ts"))
    carried = sparse.select(
        "url",
        "ts",
        "_obs",
        F.last("_obs", ignorenulls=True).over(back).alias("_pv"),
        F.last(obs_ts, ignorenulls=True).over(back).alias("_pt"),
        F.first("_obs", ignorenulls=True).over(fwd).alias("_nv"),
        F.first(obs_ts, ignorenulls=True).over(fwd).alias("_nt"),
    )
    # NTZ-safe microsecond epochs (same cast-hop convention as readside.py):
    # unix_timestamp would truncate to seconds and diverge on sub-second grids.
    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    frac = (_epoch("ts") - _epoch("_pt")) / (_epoch("_nt") - _epoch("_pt"))
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    return carried.select(
        "url",
        "ts",
        F.coalesce("_obs", interp).alias("value"),
        F.col("_obs").isNotNull().alias("observed"),
    )

"""Continuous-aggregate retention tiers (1h / 1d / 1w).

Tier N+1 is derived from tier N, never from raw data: sums and counts are
associative, so day-from-hour and week-from-day aggregation is exact AND
cheap (each tier's shuffle input is the previous tier's already-reduced
output — the 1w rollup reads ~1/24th of what the 1d rollup read).

Averages are stored as sum/cnt-derived columns so re-aggregation stays
exact; min/max compose trivially.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

COMPONENTS = ["value", "trend", "seasonal", "residual"]


def hourly_tier(decomposed: DataFrame) -> DataFrame:
    """Tier 1h: the decomposed hourly grid itself, stored COMPACT — each
    component once plus cnt == 1.  At the finest tier sum == min == max ==
    the grid point, so the sum_/min_/max_ triplet would triple the bytes of
    the engine's largest write (and at 10^12-doc scale its largest table) for
    zero information; rollup_tier reconstitutes the triplet when deriving the
    next tier."""
    return decomposed.select(
        "url", "ts", *COMPONENTS, F.lit(1).cast("long").alias("cnt")
    )


def rollup_tier(tier: DataFrame, granularity: str) -> DataFrame:
    """Aggregate a tier into the next coarser granularity ('day' or 'week').

    Accepts either the compact 1h schema (component columns, from which
    sum/min/max all derive) or the full sum_/min_/max_ schema of coarser
    tiers; output is always the full schema.  A frame carrying BOTH layouts
    is ambiguous (which columns are authoritative?) and is rejected rather
    than silently aggregating the wrong ones."""
    has_compact = COMPONENTS[0] in tier.columns
    has_full = f"sum_{COMPONENTS[0]}" in tier.columns
    if has_compact and has_full:
        raise ValueError(
            f"ambiguous tier schema: both '{COMPONENTS[0]}' and 'sum_{COMPONENTS[0]}' present"
        )
    compact = has_compact
    aggs = []
    for c in COMPONENTS:
        src_sum, src_min, src_max = (
            (c, c, c) if compact else (f"sum_{c}", f"min_{c}", f"max_{c}")
        )
        aggs += [
            F.sum(src_sum).alias(f"sum_{c}"),
            F.min(src_min).alias(f"min_{c}"),
            F.max(src_max).alias(f"max_{c}"),
        ]
    aggs.append(F.sum("cnt").alias("cnt"))
    return (
        tier.groupBy("url", F.date_trunc(granularity, "ts").alias("ts"))
        .agg(*aggs)
    )


def with_averages(tier: DataFrame) -> DataFrame:
    out = tier
    for c in COMPONENTS:
        out = out.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("cnt"))
    return out


def percentile_rollup(
    points: DataFrame,
    granularity: str = "day",
    percentiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    value_col: str = "value",
) -> DataFrame:
    """Exact interpolated percentiles per (url, bucket) — the latency-style
    rollup sums/counts can't derive.

    Uses Spark's exact ``percentile`` (linear interpolation, the SQL-standard
    PERCENTILE_CONT definition DuckDB's quantile_cont shares), NOT
    approx_percentile: percentiles are only safe as a rollup when the
    per-group row count is bounded, and tier-from-tier groups are (a day
    bucket holds <= 24 hourly rows, a week <= 7 daily rows), so the exact
    aggregate's per-group buffer is O(24) — no sketch needed, and the result
    is reproducible bit-for-bit by any engine.  One partial+final hash
    aggregate, no window, no Python.
    """
    aggs = [
        F.percentile(value_col, F.lit(p)).alias(f"p{str(p)[2:].ljust(2, '0')}")
        for p in percentiles
    ]
    return points.groupBy(
        "url", F.date_trunc(granularity, "ts").alias("ts")
    ).agg(*aggs, F.count(F.lit(1)).alias("cnt"))


def build_tiers(decomposed: DataFrame) -> dict[str, DataFrame]:
    """1h -> 1d -> 1w continuous aggregates."""
    t1h = hourly_tier(decomposed)
    t1d = rollup_tier(t1h, "day")
    t1w = rollup_tier(t1d, "week")
    return {"1h": t1h, "1d": t1d, "1w": t1w}

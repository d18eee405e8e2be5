"""Derive per-key activity series from raw event timestamps.

This is the first shuffle of the pipeline.  The groupBy is a hash aggregate
with map-side partial aggregation, so a url with 10^9 raw crawls reduces to
at most (hours-in-range) rows per map task before the shuffle — raw-row skew
is absorbed by partial aggregation, and AQE skew handling covers the rest
(SURVEY.md §4.2).
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bucketize(
    df: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    granularity: str = "hour",
) -> DataFrame:
    """Per-(key, truncated-timestamp) event counts: the crawl-activity series."""
    return (
        df.select(F.col(key_col).alias("url"), F.date_trunc(granularity, F.col(ts_col)).alias("ts"))
        .groupBy("url", "ts")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

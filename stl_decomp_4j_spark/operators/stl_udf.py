"""STL decomposition as a grouped-map pandas UDF.

The whole reference algorithm is embarrassingly parallel across series
(SURVEY.md §3: control never crosses a thread boundary), so the entire
decomposition lifecycle runs inside one ``applyInPandas`` per url group and
Spark owns all distribution.  Rows arrive as Arrow batches -> contiguous
NumPy arrays, so the Java inner loops are NumPy vector ops with no model
impedance.

Grouping/partitioning: the group key is the bare url (a url's series must
never split).  applyInPandas hash-partitions by the key, which distributes
url groups uniformly; per-group work is bounded by grid length (gap-filled),
not raw crawl count, so group-size skew is structurally bounded upstream.
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StringType, StructField, StructType, TimestampType

from ..stl.core import stl_decompose
from ..stl.settings import build_stl_config

STL_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("seasonal", DoubleType()),
        StructField("residual", DoubleType()),
        StructField("weight", DoubleType()),
    ]
)


def make_stl_fn(period: int, **config_kwargs):
    """Build the per-group pandas function.  Series shorter than 2*period
    (the reference's validity floor) degrade to trend=value, seasonal=0."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..plans.malloc import tune_malloc

        tune_malloc()  # once per worker process; no-op afterwards
        pdf = pdf.sort_values("ts")
        y = pdf["value"].to_numpy(dtype=float)
        n = len(y)
        if n >= 2 * period:
            config = build_stl_config(n, period, **config_kwargs)
            d = stl_decompose(y, config)
            trend, seasonal, residual, weight = d.trend, d.seasonal, d.residual, d.weights
        else:
            trend, seasonal, residual, weight = y, 0.0 * y, 0.0 * y, 1.0 + 0.0 * y
        return pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "value": y,
                "trend": trend,
                "seasonal": seasonal,
                "residual": residual,
                "weight": weight,
            }
        )

    return fn


def stl_decompose_df(series: DataFrame, period: int, partitions: int | None = None, **config_kwargs) -> DataFrame:
    """(url, ts, value) dense series -> + (trend, seasonal, residual, weight).

    The decomposition is CPU-bound per group, so the stage's parallelism must
    not be byte-based: AQE happily coalesces a few-MB shuffle into one
    partition, serializing hours of NumPy onto one core.  An explicit
    repartition by url pins the partition count (user-specified repartitions
    are exempt from AQE coalescing) and the groupBy reuses that hash
    partitioning, so no extra shuffle is introduced."""
    spark = series.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism * 4
    return (
        series.repartition(partitions, "url")
        .groupBy("url")
        .applyInPandas(make_stl_fn(period, **config_kwargs), STL_SCHEMA)
    )

"""Visual downsampling: Largest-Triangle-Three-Buckets (LTTB).

Serving a year of a 1h tier to a dashboard means shipping 8,760 points per
url to draw a ~1,000px chart; LTTB (Steinarsson, "Downsampling Time Series
for Visual Representation", U. Iceland 2013 — the algorithm behind
Grafana/Timescale `lttb()`) picks the ``n_out`` points that best preserve
the line's visual shape: first and last point always survive, the middle is
split into ``n_out - 2`` equal buckets, and each bucket contributes the
point forming the largest triangle with the previously selected point and
the NEXT bucket's centroid — so spikes/outliers survive where averaging
would erase them.

Spark mapping: the selection is sequential per series (each pick depends on
the previous one), so it runs per url in ONE grouped-map pandas UDF —
routed through the same pinned-repartition discipline as the STL kernel
(stl_udf.pinned_grouped_apply) — with the per-bucket area argmax fully
NumPy-vectorized; the Python-level loop is over OUTPUT points only
(n_out - 2 iterations regardless of input length).  Group state is one
url's series — the same bounded-by-time-range guarantee the STL stage
relies on, and orders of magnitude below Arrow batch limits.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LTTB_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def lttb_select(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points (float64 time/value arrays,
    assumed sorted by t).  Returns all indices when n <= n_out."""
    n = len(t)
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    if n <= n_out:
        return np.arange(n)
    mid = n_out - 2
    # bucket k covers middle indices [edges[k], edges[k+1]) (canonical split;
    # `every` is rounded ONCE then multiplied — the thesis pseudocode's op
    # order, so boundary truncation matches scalar implementations exactly)
    every = (n - 2) / mid
    edges = np.minimum(
        (np.arange(mid + 2, dtype=np.float64) * every).astype(np.int64) + 1, n
    )
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    sel[-1] = n - 1
    prev = 0
    for k in range(mid):
        lo, hi = edges[k], edges[k + 1]
        # centroid of the NEXT bucket, end clamped to n (for the last bucket
        # this degenerates to the final point — the canonical avg range)
        nlo, nhi = edges[k + 1], edges[k + 2]
        t_avg = t[nlo:nhi].mean()
        v_avg = v[nlo:nhi].mean()
        tp, vp = t[prev], v[prev]
        # 2x triangle area, vectorized across the bucket's candidates
        area = np.abs(
            (tp - t_avg) * (v[lo:hi] - vp) - (tp - t[lo:hi]) * (v_avg - vp)
        )
        prev = lo + int(np.argmax(area))
        sel[k + 1] = prev
    return sel


def lttb(
    series: DataFrame,
    n_out: int,
    value_col: str = "value",
    partitions: int | None = None,
) -> DataFrame:
    """Downsample each url's (ts, value) series to ``n_out`` points."""
    from stl_decomp_4j_spark.operators.stl_udf import pinned_grouped_apply
    from stl_decomp_4j_spark.plans.malloc import tune_malloc

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        tune_malloc()
        pdf = pdf.sort_values("ts")
        # RELATIVE micros: epoch-micros sums exceed 2^53 (centroid means
        # would round), relative offsets are exact integers in float64, so
        # every area comparison is reproducible bit-for-bit by any
        # implementation using the same coordinates
        micros = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t = (micros - micros[0]).astype(np.float64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        idx = lttb_select(t, v, n_out)
        return pd.DataFrame(
            {
                "url": pdf["url"].iat[0],
                "ts": pdf["ts"].to_numpy()[idx],
                "value": v[idx],
            }
        )

    return pinned_grouped_apply(
        series.select("url", "ts", value_col), fn, LTTB_SCHEMA, partitions=partitions
    )

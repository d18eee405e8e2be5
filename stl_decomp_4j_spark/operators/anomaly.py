"""Residual anomaly detection over decomposed series.

STL's residual is the series minus everything the model explains (trend +
seasonal), so "anomaly" reduces to "residual far outside its own per-url
distribution" — the standard use of stl-decomp-4j downstream (the reference
computes the same residual-variance machinery in StlFitStats,
stl-decomp-4j/src/main/java/.../StlFitStats.java:214).

Two scales:
  - sigma='std'  : sample standard deviation of the residual
  - sigma='mad'  : 1.4826 * median(|r - median(r)|) — the robust scale the
    reference's outer robustness loop is built on (6*MAD biweighting,
    SeasonalTrendLoess.java:663); immune to the anomalies it is meant to
    find.

Scale shape: one partial+final hash agg per url for the scale, broadcast
back onto the rows (the per-url scale table is tiny — one row per url), a
codegen'd filter; no Python, no window over the full series.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def residual_scale(decomposed: DataFrame, sigma: str = "std") -> DataFrame:
    """Per-url residual scale: (url, sigma) — one row per url."""
    if sigma == "std":
        return decomposed.groupBy("url").agg(F.stddev_samp("residual").alias("sigma"))
    if sigma == "mad":
        med = decomposed.groupBy("url").agg(F.median("residual").alias("med"))
        return (
            decomposed.join(F.broadcast(med), "url")
            .groupBy("url")
            .agg((F.lit(1.4826) * F.median(F.abs(F.col("residual") - F.col("med")))).alias("sigma"))
        )
    raise ValueError(f"sigma must be 'std' or 'mad', got {sigma!r}")


def residual_anomalies(decomposed: DataFrame, k: float = 3.0, sigma: str = "std") -> DataFrame:
    """Rows of ``decomposed`` whose |residual| exceeds k * per-url scale,
    with the z-score attached.  Input needs (url, ts, value, residual)."""
    scales = residual_scale(decomposed, sigma=sigma)
    return (
        decomposed.join(F.broadcast(scales), "url")
        .withColumn("z", F.col("residual") / F.col("sigma"))
        .filter(F.abs(F.col("z")) > F.lit(k))
        .drop("sigma")
    )

"""Tier-routed serving (continuous-aggregate reads) and residual anomaly
detection."""
import datetime as dt

import numpy as np
import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.anomaly import residual_anomalies, residual_scale
from stl_decomp_4j_spark.operators.rollup import build_tiers
from stl_decomp_4j_spark.operators.serve import route_tier, serve_rollup


def _decomposed(spark, n_urls=3, hours=24 * 35):
    """Synthetic decomposed grid: value = trend + seasonal + residual."""
    import pandas as pd

    rng = np.random.default_rng(7)
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for u in range(n_urls):
        trend = np.linspace(10 * u, 10 * u + 5, hours)
        seasonal = np.sin(2 * np.pi * np.arange(hours) / 24.0)
        resid = rng.normal(0, 0.1, hours)
        resid[5 + u] = 3.0  # planted anomaly, one per url
        for i in range(hours):
            rows.append(
                (f"url{u}", t0 + dt.timedelta(hours=i),
                 float(trend[i] + seasonal[i] + resid[i]),
                 float(trend[i]), float(seasonal[i]), float(resid[i]))
            )
    pdf = pd.DataFrame(rows, columns=["url", "ts", "value", "trend", "seasonal", "residual"])
    return spark.createDataFrame(pdf)


def test_route_table():
    assert route_tier("hour") == "1h"
    assert route_tier("day") == "1d"
    assert route_tier("week") == "1w"
    # calendar months are built from days, never from ISO weeks
    for g in ("month", "quarter", "year"):
        assert route_tier(g) == "1d"
    with pytest.raises(ValueError, match="unroutable"):
        route_tier("fortnight")


def test_serve_month_equals_direct_aggregation(spark):
    dec = _decomposed(spark)
    tiers = build_tiers(dec)
    served = serve_rollup(tiers, "month").orderBy("url", "ts").collect()
    direct = (
        dec.groupBy("url", F.date_trunc("month", "ts").alias("ts"))
        .agg(
            F.sum("value").alias("sum_value"), F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.sum("trend").alias("sum_trend"), F.min("trend").alias("min_trend"),
            F.max("trend").alias("max_trend"),
            F.sum("seasonal").alias("sum_seasonal"), F.min("seasonal").alias("min_seasonal"),
            F.max("seasonal").alias("max_seasonal"),
            F.sum("residual").alias("sum_residual"), F.min("residual").alias("min_residual"),
            F.max("residual").alias("max_residual"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("url", "ts")
        .collect()
    )
    assert len(served) == len(direct) > 0
    for a, b in zip(served, direct):
        assert a["url"] == b["url"] and a["ts"] == b["ts"] and a["cnt"] == b["cnt"]
        for c in ("value", "trend", "seasonal", "residual"):
            assert a[f"sum_{c}"] == pytest.approx(b[f"sum_{c}"], rel=1e-9)
            assert a[f"min_{c}"] == b[f"min_{c}"]  # min/max compose exactly
            assert a[f"max_{c}"] == b[f"max_{c}"]


def test_serve_prunes_urls_and_range(spark):
    dec = _decomposed(spark)
    tiers = build_tiers(dec)
    out = serve_rollup(
        tiers, "day", urls=["url0"],
        ts_min=dt.datetime(2024, 1, 5), ts_max=dt.datetime(2024, 1, 7),
    ).collect()
    assert {r["url"] for r in out} == {"url0"}
    assert sorted(r["ts"] for r in out) == [
        dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 6), dt.datetime(2024, 1, 7)
    ]
    assert all(r["cnt"] == 24 for r in out)


def test_serve_week_routes_to_week_tier_identity(spark):
    dec = _decomposed(spark)
    tiers = build_tiers(dec)
    served = {(r["url"], r["ts"]): r["sum_value"]
              for r in serve_rollup(tiers, "week").collect()}
    t1w = {(r["url"], r["ts"]): r["sum_value"] for r in tiers["1w"].collect()}
    assert served.keys() == t1w.keys()
    for k in t1w:
        assert served[k] == pytest.approx(t1w[k], rel=1e-12)


def test_anomaly_std_finds_planted_spikes(spark):
    dec = _decomposed(spark)
    out = residual_anomalies(dec, k=3.0, sigma="std").collect()
    got = {(r["url"], r["ts"]) for r in out}
    t0 = dt.datetime(2024, 1, 1)
    for u in range(3):
        assert (f"url{u}", t0 + dt.timedelta(hours=5 + u)) in got
    # z is attached and consistent with the filter
    assert all(abs(r["z"]) > 3.0 for r in out)


def test_anomaly_mad_scale_matches_numpy(spark):
    dec = _decomposed(spark, n_urls=1)
    got = {r["url"]: r["sigma"] for r in residual_scale(dec, sigma="mad").collect()}
    resid = np.array([r["residual"] for r in dec.select("residual").collect()])
    want = 1.4826 * np.median(np.abs(resid - np.median(resid)))
    assert got["url0"] == pytest.approx(want, rel=1e-9)


def test_anomaly_mad_robust_to_outlier_inflation(spark):
    """A huge planted spike inflates the std scale but not the MAD scale."""
    dec = _decomposed(spark, n_urls=1)
    dec = dec.withColumn(
        "residual",
        F.when(F.col("ts") == dt.datetime(2024, 1, 2), F.lit(1e6)).otherwise(F.col("residual")),
    )
    std = residual_scale(dec, sigma="std").first()["sigma"]
    mad = residual_scale(dec, sigma="mad").first()["sigma"]
    assert std > 1000 * mad

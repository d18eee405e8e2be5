"""stl_forecast: deterministic trend-extension + seasonal-repetition rule.

Feeds hand-built decomposed frames (url, ts, trend, seasonal) so every
expectation is exact float arithmetic — no STL run, no tolerance."""
import datetime as dt

import pytest

from stl_decomp_4j_spark.operators.forecast import stl_forecast

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, urls, n, period, trend_fn, seasonal_fn, step=3600):
    rows = []
    for u in urls:
        for i in range(n):
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(seconds=i * step),
                    float(trend_fn(u, i)),
                    float(seasonal_fn(u, i % period)),
                )
            )
    return spark.createDataFrame(rows, "url string, ts timestamp, trend double, seasonal double")


def test_linear_trend_and_cycle_repeat_exact(spark):
    period, n, horizon, w = 6, 30, 13, 6
    trend = lambda u, i: 100.0 + 2.5 * i + (10.0 if u == "b" else 0.0)
    seas = lambda u, p: [3.0, -1.0, 0.5, -2.5, 4.0, -4.0][p] * (2.0 if u == "b" else 1.0)
    df = _mk(spark, ["a", "b"], n, period, trend, seas)
    out = stl_forecast(df, period=period, horizon=horizon, trend_window=w).collect()
    assert len(out) == 2 * horizon
    by = {(r.url, r.k): r for r in out}
    for u in ("a", "b"):
        for k in range(1, horizon + 1):
            r = by[(u, k)]
            # slope of a perfectly linear trend is its true slope
            assert r.trend_fc == pytest.approx(trend(u, n - 1) + 2.5 * k, abs=0)
            # seasonal repeats the last cycle at the matching phase
            assert r.seasonal_fc == seas(u, (n + k - 1) % period)
            assert r.forecast == r.trend_fc + r.seasonal_fc
            assert r.ts == T0 + dt.timedelta(hours=n - 1 + k)


def test_short_series_flat_slope(spark):
    # series long enough for one full cycle but shorter than trend_window+1:
    # anchor row missing -> slope 0 -> flat trend at the endpoint
    period, n, w = 4, 5, 24
    df = _mk(spark, ["a"], n, period, lambda u, i: 50.0 + i, lambda u, p: float(p))
    out = stl_forecast(df, period=period, horizon=8, trend_window=w).collect()
    assert len(out) == 8
    assert all(r.trend_fc == 54.0 for r in out)
    for r in out:
        assert r.seasonal_fc == float((n + r.k - 1) % period)


def test_series_shorter_than_period_covers_observed_phases_only(spark):
    period, n = 10, 4  # phases 6..9 of the cycle never observed? ages 0..3 -> phases 9,8,7,6
    df = _mk(spark, ["a"], n, period, lambda u, i: 1.0, lambda u, p: float(p))
    out = stl_forecast(df, period=period, horizon=period).collect()
    # only the 4 observed phases (period-1-age for age in 0..3) can be forecast
    assert len(out) == 4
    assert sorted((r.k - 1) % period for r in out) == [6, 7, 8, 9]


def test_validation(spark):
    df = _mk(spark, ["a"], 8, 4, lambda u, i: 0.0, lambda u, p: 0.0)
    with pytest.raises(ValueError):
        stl_forecast(df, period=0, horizon=4)
    with pytest.raises(ValueError):
        stl_forecast(df, period=4, horizon=0)


def test_cache_handle_persists_and_is_returned(spark):
    df = _mk(spark, ["a"], 12, 4, lambda u, i: float(i), lambda u, p: 0.0)
    handle = []
    out = stl_forecast(df, period=4, horizon=4, cache_handle=handle)
    assert out.count() == 4
    assert len(handle) == 1 and handle[0].is_cached
    handle[0].unpersist()


def test_backtest_hand_metrics(spark):
    """MAE / RMSE / MASE against hand-computed values."""
    import datetime as dt

    from stl_decomp_4j_spark.operators.forecast import forecast_backtest

    t0 = dt.datetime(2024, 1, 1)

    def hours(vals, start=0):
        return [
            (u, t0 + dt.timedelta(hours=start + i), float(v))
            for u, series in vals.items()
            for i, v in enumerate(series)
        ]

    schema_v = "url string, ts timestamp, value double"
    fc = spark.createDataFrame(
        [(u, t, v) for u, t, v in hours({"a": [1, 2, 3, 4]}, start=5)],
        "url string, ts timestamp, forecast double",
    )
    actuals = spark.createDataFrame(hours({"a": [1, 4, 3, 8]}, start=5), schema_v)
    insample = spark.createDataFrame(hours({"a": [10, 20, 11, 23, 14]}), schema_v)
    [r] = forecast_backtest(fc, actuals, insample, period=2).collect()
    assert r["n"] == 4
    assert r["mae"] == pytest.approx(1.5)          # |0|+|2|+|0|+|4| / 4
    assert r["rmse"] == pytest.approx(5.0 ** 0.5)  # sqrt((0+4+0+16)/4)
    # seasonal-naive in-sample diffs at lag 2: |11-10|,|23-20|,|14-11| -> 7/3
    assert r["mase"] == pytest.approx(1.5 / (7.0 / 3.0))


def test_backtest_zero_scale_gives_null_mase(spark):
    import datetime as dt

    from stl_decomp_4j_spark.operators.forecast import forecast_backtest

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda col, vals, start=0: spark.createDataFrame(
        [("a", t0 + dt.timedelta(hours=start + i), float(v)) for i, v in enumerate(vals)],
        f"url string, ts timestamp, {col} double",
    )
    # constant in-sample series -> seasonal-naive scale 0 -> mase NULL, not inf
    [r] = forecast_backtest(
        mk("forecast", [5, 5], start=4), mk("value", [6, 6], start=4),
        mk("value", [7, 7, 7, 7]), period=2,
    ).collect()
    assert r["mae"] == pytest.approx(1.0) and r["mase"] is None

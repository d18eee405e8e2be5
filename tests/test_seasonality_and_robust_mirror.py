"""1:1 mirrors of the reference's SeasonalitySmoothingTest
(test/stl/SeasonalitySmoothingTest.java) and RobustFitIssueTest
(test/stl/RobustFitIssueTest.java), plus the SMA length-consistency case
from TimeSeriesUtilitiesTest.java:71-82."""
import json
from pathlib import Path

import numpy as np
import pytest

from stl_decomp_4j_spark.stl import decompose
from stl_decomp_4j_spark.stl.cyclic import cyclic_subseries_smooth
from stl_decomp_4j_spark.stl.loess import loess_smooth
from stl_decomp_4j_spark.stl.sma import simple_moving_average

FIX = Path(__file__).resolve().parent / "fixtures"
EPS = 1.0e-15


@pytest.fixture(scope="module")
def hourly():
    rows = np.array(json.load(open(FIX / "hourly_golden.json"))["rows"])
    return rows  # columns: data, trend, seasonal, residual, weight


@pytest.fixture(scope="module")
def weekly():
    fx = json.load(open(FIX / "simulated_weekly_metric.json"))
    return np.array(fx["values"]), np.array(fx["four_week_values"])


def _hourly_stl(values):
    return decompose(values, 168, seasonal_width=2001,
                     inner_iterations=1, outer_iterations=15)


# --- SeasonalitySmoothingTest.java:19-88 (smoothSeasonalityTest) -----------

def test_smooth_seasonality(hourly):
    data = hourly[:, 0]
    d = _hourly_stl(data)
    # against the embedded expected columns, at the reference's tolerances
    eps = 5.0e-3
    assert np.max(np.abs(d.trend - hourly[:, 1])) < eps
    assert np.max(np.abs(d.seasonal - hourly[:, 2])) < 20 * eps
    assert np.max(np.abs(d.residual - hourly[:, 3])) < 20 * eps

    period = 168
    # Java CyclicSubSeriesSmoother.Builder().setWidth(2001) derives the
    # default jump max(1, int(0.1*2001 + 0.9)) = 201 via LoessSettings
    extended = cyclic_subseries_smooth(d.seasonal, period, width=2001, degree=1, jump=201)
    n = len(d.seasonal)
    model_seasonal = np.empty(2 * period)
    model_seasonal[:period] = d.seasonal[n - period:]
    model_seasonal[period:] = extended[n + period: n + 2 * period]

    smoothed = loess_smooth(model_seasonal, width=13, degree=2, jump=1)
    base_d = np.diff(model_seasonal)
    smooth_d = np.diff(smoothed)
    assert base_d.min() < smooth_d.min()
    assert base_d.max() > smooth_d.max()
    assert np.std(base_d, ddof=1) > 0.5 * np.std(smooth_d, ddof=1)


# --- seasonalSmootherMinimalWidth{,NoEndpointFix}Test (:90-139) ------------

def test_seasonal_smoother_minimal_width_no_restore(hourly):
    d = _hourly_stl(hourly[:, 0])
    trend, seasonal, residual = d.trend.copy(), d.seasonal.copy(), d.residual.copy()
    d.smooth_seasonal(3, restore_end_points=False)
    assert np.max(np.abs(d.seasonal[1:-1] - seasonal[1:-1])) < EPS
    assert np.max(np.abs(d.trend[1:-1] - trend[1:-1])) < EPS
    assert np.max(np.abs(d.residual[1:-1] - residual[1:-1])) < 10 * EPS
    assert abs(d.seasonal[0] - seasonal[0]) > EPS
    assert abs(d.seasonal[-1] - seasonal[-1]) > EPS


def test_seasonal_smoother_minimal_width_with_restore(hourly):
    d = _hourly_stl(hourly[:, 0])
    trend, seasonal, residual = d.trend.copy(), d.seasonal.copy(), d.residual.copy()
    d.smooth_seasonal(3, restore_end_points=True)
    assert np.max(np.abs(d.seasonal - seasonal)) < EPS
    assert np.max(np.abs(d.trend - trend)) < EPS
    assert np.max(np.abs(d.residual - residual)) < 10 * EPS


# --- seasonalSmootherWidth{4,2,1,0}Test (:141-177) -------------------------

def _smoothed_with_width(values, width):
    d = _hourly_stl(values)
    d.smooth_seasonal(width, restore_end_points=True)
    return d


@pytest.mark.parametrize("requested,effective", [(4, 5), (2, 3), (1, 3), (0, 3)])
def test_seasonal_smoother_width_normalization(hourly, requested, effective):
    a = _smoothed_with_width(hourly[:, 0], effective)
    b = _smoothed_with_width(hourly[:, 0], requested)
    assert np.max(np.abs(a.seasonal - b.seasonal)) < EPS
    assert np.max(np.abs(a.trend - b.trend)) < EPS
    assert np.max(np.abs(a.residual - b.residual)) < 10 * EPS


# --- RobustFitIssueTest.java ------------------------------------------------

def _assert_periodic(arr, offset, length, delta):
    assert np.max(np.abs(arr[offset: offset + length] - arr[:length])) <= delta


def test_two_week_periodic_fit_non_robust(weekly):
    # ref :10-42 — periodic+flat on exactly two periods: model = mean of the
    # two observations per slot
    data, _ = weekly
    p = 1008
    d = decompose(data, p, periodic=True, flat_trend=True)
    _assert_periodic(d.seasonal, p, p, 1.0e-15)
    base = d.trend[0]
    expected = (data[:p] + data[p:]) / 2.0
    assert np.max(np.abs(base + d.seasonal[:p] - expected)) < 5.0e-14


def test_two_week_linear_fit_non_robust(weekly):
    # ref :45-71 — degree-1 massive-window seasonal on two periods leaves no
    # residual
    data, _ = weekly
    p = 1008
    d = decompose(data, p, seasonal_width=100 * len(data), seasonal_degree=1)
    assert np.max(np.abs(d.residual)) < 1.0e-13


def test_four_week_robust_fit_outliers(weekly):
    # ref :74-105 — no seasonal slot may have ALL FOUR cycle weights zero
    _, data = weekly
    p = 1008
    d = decompose(data, p, periodic=True, flat_trend=True, robust=True)
    w = d.weights
    all_zero = (w[:p] == 0.0) & (w[p:2 * p] == 0.0) & (w[2 * p:3 * p] == 0.0) & (w[3 * p:] == 0.0)
    assert int(all_zero.sum()) == 0


def test_two_week_robust_fit_outliers(weekly):
    # ref :112-187 — with two periods, genuine outliers at 497/927 get weight
    # 0 in BOTH cycles and the fit passes through them; one extra robustness
    # iteration flips the weights back to ~1 and the fit back to the mean
    data, _ = weekly
    p = 1008
    d = decompose(data, p, periodic=True, flat_trend=True, robust=True)
    seasonal, trend, w = d.seasonal.copy(), d.trend[0], d.weights
    for i in (497, 927):
        assert abs(w[i]) < 1.0e-15 and abs(w[i + p]) < 1.0e-15
        assert abs(data[i] - (seasonal[i] + trend)) < 1.0e-2
        assert abs(data[i + p] - (seasonal[i + p] + trend)) < 1.0e-2
    zeros = int(((w[:p] == 0.0) & (w[p:] == 0.0)).sum())
    assert zeros == 2
    seasonal[497] = seasonal[497 + p]
    seasonal[927] = seasonal[927 + p]
    _assert_periodic(seasonal, p, p, 1.0e-2)

    d2 = decompose(data, p, periodic=True, flat_trend=True,
                   inner_iterations=1, outer_iterations=16)
    s2, t2, w2 = d2.seasonal, d2.trend[0], d2.weights
    for i in (497, 927):
        assert abs(w2[i] - 1.0) < 1.0e-4 and abs(w2[i + p] - 1.0) < 1.0e-4
        assert abs((data[i] + data[i + p]) / 2 - (s2[i] + t2)) < 1.0e-2


# --- TimeSeriesUtilitiesTest.java:71-82 (lengthConsistencyTest) ------------

def test_sma_length_consistency():
    rng = np.random.default_rng(7)
    for _ in range(20):
        length = int(rng.integers(1, 1001))
        window = min(max(int(rng.integers(0, length + 1)), 2), length)
        data = rng.uniform(-50, 50, length)
        out = simple_moving_average(data, window)
        assert len(out) == length - window + 1

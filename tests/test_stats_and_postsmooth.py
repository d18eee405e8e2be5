"""Fit statistics cross-checks and post-hoc seasonal smoothing equivalences
(ref: test/stl/StlFitStatsTest.java:23-160,
 test/stl/SeasonalitySmoothingTest.java:88-196)."""
import copy
import json
import math
from pathlib import Path

import numpy as np
import pytest

from stl_decomp_4j_spark.stl import decompose, stl_fit_stats

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="module")
def hourly_decomp():
    rows = np.array(json.load(open(FIXTURES / "hourly_golden.json"))["rows"])
    data = rows[:, 0]
    return decompose(data, 168, seasonal_width=2001, inner_iterations=1, outer_iterations=15)


def test_fit_stats_vs_independent(hourly_decomp):
    d = hourly_decomp
    s = stl_fit_stats(d)
    n = len(d.data)
    tol = 1.0e-11

    def var(x):
        return float(np.var(x, ddof=1))

    assert abs(s.data_mean - np.mean(d.data)) < tol
    assert abs(s.data_variance - var(d.data)) < tol
    assert abs(s.data_std_dev - math.sqrt(var(d.data))) < tol
    assert abs(s.trend_mean - np.mean(d.trend)) < tol
    assert abs(s.trend_range - (d.trend.max() - d.trend.min())) < tol
    assert abs(s.seasonal_mean - np.mean(d.seasonal)) < tol
    assert abs(s.seasonal_variance - var(d.seasonal)) < tol
    assert abs(s.seasonal_range - (d.seasonal.max() - d.seasonal.min())) < tol
    assert abs(s.residual_mean - np.mean(d.residual)) < tol
    assert abs(s.residual_variance - var(d.residual)) < tol
    deseas = d.data - d.seasonal
    assert abs(s.de_seasonal_mean - np.mean(deseas)) < tol
    assert abs(s.de_seasonal_variance - var(deseas)) < tol
    detr = d.data - d.trend
    assert abs(s.de_trend_mean - np.mean(detr)) < tol
    assert abs(s.de_trend_variance - var(detr)) < tol

    rv = s.residual_variance
    z = (s.de_seasonal_variance - rv) / math.sqrt(2 * rv * rv / (n - 1))
    assert abs(s.trendiness_z_score - z) < tol
    z2 = (s.de_trend_variance - rv) / math.sqrt(2 * rv * rv / (n - 1))
    assert abs(s.seasonal_z_score - z2) < tol

    # log-likelihood identity at the MLE sigma
    mle_var = float(np.sum(d.residual**2)) / n
    expect_ll = -0.5 * n * (1 + math.log(2 * math.pi * mle_var))
    assert abs(s.residual_log_likelihood - expect_ll) < 1.0e-9
    assert abs(s.residual_log_likelihood_at(math.sqrt(mle_var)) - expect_ll) < 1.0e-9


def test_smooth_seasonal_width3_interior_identity(hourly_decomp):
    # width <= 3 quadratic loess reproduces interior points exactly
    d = copy.deepcopy(hourly_decomp)
    seas, trend, res = d.seasonal.copy(), d.trend.copy(), d.residual.copy()
    d.smooth_seasonal(3, restore_end_points=False)
    eps = 1.0e-15
    assert np.max(np.abs(d.seasonal[1:-1] - seas[1:-1])) < eps
    assert np.max(np.abs(d.trend - trend)) < eps
    assert np.max(np.abs(d.residual[1:-1] - res[1:-1])) < 10 * eps
    # endpoints DO move without the restore
    assert abs(d.seasonal[0] - seas[0]) > eps
    assert abs(d.seasonal[-1] - seas[-1]) > eps


def test_smooth_seasonal_width3_with_endpoint_restore(hourly_decomp):
    d = copy.deepcopy(hourly_decomp)
    seas, trend, res = d.seasonal.copy(), d.trend.copy(), d.residual.copy()
    d.smooth_seasonal(3, restore_end_points=True)
    eps = 1.0e-15
    assert np.max(np.abs(d.seasonal - seas)) < eps
    assert np.max(np.abs(d.trend - trend)) < eps
    assert np.max(np.abs(d.residual - res)) < 10 * eps


@pytest.mark.parametrize("w_equiv, w_raw", [(5, 4), (3, 2), (3, 1), (3, 0)])
def test_smooth_seasonal_width_normalization(hourly_decomp, w_equiv, w_raw):
    # width is forced odd and >= 3, so 4->5, 2/1/0->3
    a = copy.deepcopy(hourly_decomp)
    b = copy.deepcopy(hourly_decomp)
    a.smooth_seasonal(w_equiv)
    b.smooth_seasonal(w_raw)
    eps = 1.0e-15
    assert np.max(np.abs(a.seasonal - b.seasonal)) < eps
    assert np.max(np.abs(a.trend - b.trend)) < eps
    assert np.max(np.abs(a.residual - b.residual)) < 10 * eps

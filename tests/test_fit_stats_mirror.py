"""1:1 mirror of the reference's StlFitStatsTest (test/stl/StlFitStatsTest.java),
driven by the exact java.util.Random replica in tests/javarand.py and the
embedded hourly TEST_DATA fixture.  Assertions and tolerances match the
reference case-for-case, including the pinned 17-line toString report."""
import json
import math
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from stl_decomp_4j_spark.stl import decompose, stl_fit_stats
from stl_decomp_4j_spark.stl.core import (
    periodic_decomposition,
    robust_periodic_decomposition,
)
from tests.javarand import JavaRandom, create_noisy_seasonal_data

FIX = Path(__file__).resolve().parent / "fixtures"


def _hourly_values() -> np.ndarray:
    rows = np.array(json.load(open(FIX / "hourly_golden.json"))["rows"])
    return rows[:, 0]


def _mv(x):
    """SummaryStatistics twin: mean + Bessel variance."""
    return float(np.mean(x)), float(np.var(x, ddof=1))


# --- the generator replica itself ------------------------------------------

def test_java_random_replica_bitwise():
    """Pinned nextGaussian bit patterns from a javac-compiled
    java.util.Random probe on this machine (seeds used by the mirrored
    tests reproduce bitwise; other seeds may differ by 1 ulp of libm log)."""
    pinned = {
        1234567: ["bfea31048bb9334f", "3fe9aacabe0a75c3", "bfe64186fbafc06e",
                  "3ffdd40a581a04f1", "bfb0b1e824129151", "bfed60f5220e337b"],
        16951029831410: ["bff26e62cf2f59f6", "bfebd86f281c4c9c", "3fef5d630719003b",
                         "3feee4b489748574", "bfe48df6b0dce126", "3ff932d2f98ac57c"],
    }
    for seed, hexes in pinned.items():
        r = JavaRandom(seed)
        for h in hexes:
            want = struct.unpack("<d", struct.pack("<Q", int(h, 16)))[0]
            assert r.next_gaussian() == want


# --- StlFitStatsTest.java:24-88 (StlStatsSanityTest) ------------------------

@pytest.fixture(scope="module")
def hourly_stats():
    d = decompose(_hourly_values(), 168, seasonal_width=2001,
                  inner_iterations=1, outer_iterations=15)
    return d, stl_fit_stats(d)


def test_stl_stats_sanity(hourly_stats):
    d, stats = hourly_stats
    n = len(d.data)
    dmean, dvar = _mv(d.data)
    tmean, _ = _mv(d.trend)
    smean, svar = _mv(d.seasonal)
    rmean, rvar = _mv(d.residual)
    dsmean, dsvar = _mv(d.data - d.seasonal)
    eps = 1.0e-11
    assert abs(stats.data_mean - dmean) < eps
    assert abs(stats.data_variance - dvar) < eps
    assert abs(stats.data_std_dev - math.sqrt(dvar)) < eps
    assert abs(stats.trend_mean - tmean) < eps
    assert abs(stats.trend_range - (d.trend.max() - d.trend.min())) < eps
    assert abs(stats.seasonal_mean - smean) < eps
    assert abs(stats.seasonal_variance - svar) < eps
    assert abs(stats.seasonal_std_dev - math.sqrt(svar)) < eps
    assert abs(stats.residual_mean - rmean) < eps
    assert abs(stats.residual_variance - rvar) < eps
    assert abs(stats.residual_std_dev - math.sqrt(rvar)) < eps
    assert abs(stats.de_seasonal_mean - dsmean) < eps
    assert abs(stats.de_seasonal_variance - dsvar) < eps
    res_svv = rvar * rvar * 2 / (n - 1)
    trend_z = (dsvar - rvar) / math.sqrt(res_svv)
    assert abs(stats.trendiness_z_score - trend_z) < eps


def test_stl_stats_pinned_to_string(hourly_stats):
    """The reference test pins the full 17-line report for this exact
    config+data (StlFitStatsTest.java:81-87); matching it digit-for-digit
    pins both the statistics AND the decomposition at 6 decimals."""
    _, stats = hourly_stats
    assert str(stats) == (
        "Data Mean            =   7.963550\n"
        "Data Variance        =  53.996027\n"
        "Trend Mean           =   7.691074\n"
        "Trend Range          =   1.436350\n"
        "Seasonal Mean        =   0.106905\n"
        "Seasonal Variance    =  37.427790\n"
        "Seasonal Range       =  26.871361\n"
        "De-Seasonal Mean     =   7.856645\n"
        "De-Seasonal Variance =  16.398024\n"
        "De-Trend Mean        =   0.272476\n"
        "De-Trend Variance    =  53.741629\n"
        "Residual Mean        =   0.165571\n"
        "Residual Variance    =  16.161776\n"
        "Var(ResSampleVar)    =   0.357079\n"
        "Trend Test ZScore    =   0.395354\n"
        "Seasonal Test ZScore =  62.888777\n"
        "SeasonalVar/ResidVar =   2.315822"
    )


# --- pureSineTest / pureTrendTest (StlFitStatsTest.java:91-166) ------------

def test_pure_sine():
    data = create_noisy_seasonal_data(144, 12, 1.0, 0.0, 0.0, 1234567)
    d = decompose(data, 12, seasonal_width=7, robust=False)
    s = stl_fit_stats(d)
    _, dvar = _mv(d.data)
    eps = 1.0e-11
    assert abs(s.data_mean) < eps
    assert abs(s.data_variance - dvar) < eps
    assert abs(s.trend_mean) < eps
    assert abs(s.trend_range) < eps
    assert abs(s.seasonal_mean) < eps
    assert abs(s.seasonal_variance - dvar) < eps
    assert abs(s.residual_mean) < eps
    assert abs(s.residual_variance) < eps
    assert abs(s.de_seasonal_mean) < eps
    assert abs(s.de_seasonal_variance) < eps
    assert abs(s.trendiness_z_score) < eps
    assert abs(s.seasonal_variance - 1.0e-6 * s.seasonal_z_score) < eps


def test_pure_trend():
    data = create_noisy_seasonal_data(144, 12, 0.0, 1.0, 0.0, 1234567)
    d = decompose(data, 12, seasonal_width=7, robust=False)
    s = stl_fit_stats(d)
    dmean, dvar = _mv(d.data)
    eps = 1.0e-11
    assert abs(s.data_mean - dmean) < eps
    assert abs(s.data_variance - dvar) < eps
    assert abs(s.trend_mean - dmean) < eps
    assert abs(s.trend_range - 2.0 * dmean) < eps
    assert abs(s.seasonal_mean) < eps
    assert abs(s.seasonal_variance) < eps
    assert abs(s.residual_mean) < eps
    assert abs(s.residual_variance) < eps
    assert abs(s.de_seasonal_mean - dmean) < eps
    assert abs(s.de_seasonal_variance - dvar) < eps
    assert abs(dvar - 1.0e-6 * s.trendiness_z_score) < eps
    assert abs(1.0e-6 * s.seasonal_z_score) < eps


# --- noisyTrendyTest (StlFitStatsTest.java:168-205, 1000 trials) -----------

def test_noisy_trendy():
    seed = 1234567
    for i in range(1000):
        data = create_noisy_seasonal_data(168 * 4, 168, 0.0, 0.2, 1.0, seed)
        seed += 1
        d = periodic_decomposition(data, 168)
        stats = stl_fit_stats(d)
        assert stats.trendiness_z_score > 3.0, f"iteration {i}"
        d.smooth_seasonal(15)
        smoothed = stl_fit_stats(d)
        frac_var = smoothed.seasonal_variance / smoothed.de_trend_variance
        assert frac_var < 0.33, f"iteration {i}: {frac_var}"
        assert smoothed.seasonal_z_score < 3.0, f"iteration {i}"


# --- noisySeasonalTest (StlFitStatsTest.java:207-268, 100 trials) ----------

def test_noisy_seasonal():
    seed = 1234567
    z_scores, var_fracs, count = [], [], 0
    for _ in range(100):
        data = create_noisy_seasonal_data(168 * 4, 168, 1.5, 0.0, 3.0, seed)
        seed += 1
        d = robust_periodic_decomposition(data, 168)
        stats = stl_fit_stats(d)
        assert stats.trendiness_z_score < 3.0
        d.smooth_seasonal(15)
        smoothed = stl_fit_stats(d)
        var_fracs.append(smoothed.seasonal_variance / smoothed.residual_variance)
        z = smoothed.seasonal_z_score
        z_scores.append(z)
        if z > 3.0:
            count += 1
    mean_z = float(np.mean(z_scores))
    mean_vf = float(np.mean(var_fracs))
    # numAverages == 1, so min == mean == max of the sample statistics
    assert mean_z > 3.13 and mean_z < 4.13 and abs(mean_z - 3.64) < 0.06
    assert mean_vf > 0.173 and mean_vf < 0.213 and abs(mean_vf - 0.193) < 0.01


# --- noisyTrendyBadSeedTest (StlFitStatsTest.java:270-291) -----------------

def test_noisy_trendy_bad_seed():
    data = create_noisy_seasonal_data(168 * 4, 168, 0.0, 0.2, 1.0, 16951029831410)
    d = robust_periodic_decomposition(data, 168)
    stats = stl_fit_stats(d)
    assert stats.trendiness_z_score > 3.0
    d.smooth_seasonal(15)
    smoothed = stl_fit_stats(d)
    assert smoothed.seasonal_variance < 0.12 * smoothed.de_trend_variance
    assert smoothed.seasonal_z_score < 3.0


# --- StlStatsLogLikelihoodTest (StlFitStatsTest.java:293-327) --------------

def test_log_likelihood(hourly_stats):
    d, stats = hourly_stats
    ll = stats.residual_log_likelihood
    n = len(d.residual)
    var_mle = float(np.sum(d.residual * d.residual)) / n
    ll0 = -0.5 * n * (1 + math.log(2 * math.pi * var_mle))
    assert abs(ll0 - ll) < 1.0e-14
    s0 = math.sqrt(var_mle)
    assert ll - stats.residual_log_likelihood_at((1 + 1e-7) * s0) > 0.0
    assert ll - stats.residual_log_likelihood_at((1 - 1e-7) * s0) > 0.0

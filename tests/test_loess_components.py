"""Component-level LOESS tests ported from the reference's JUnit suites at the
same tolerances (ref: test/stl/LoessInterpolatorTest.java,
LoessSmootherTest.java, CyclicSubSeriesSmootherTest.java,
TimeSeriesUtilitiesTest.java, LoessSettingsTest.java)."""
import json
import math
from pathlib import Path

import numpy as np
import pytest

from stl_decomp_4j_spark.stl import (
    cyclic_subseries_smooth,
    loess_smooth,
    loess_spec,
    simple_moving_average,
    smooth_one_point,
)

FIXTURES = Path(__file__).parent / "fixtures"


def load(name):
    return json.load(open(FIXTURES / name))


CONST = np.full(100, 2016.0)
LINEAR = 3.7 - 0.25 * np.arange(100.0)
QUAD = 3.7 - 0.25 * np.arange(100.0) + 0.7 * np.arange(100.0) ** 2


# --- interpolator (smooth_one_point) — ref: LoessInterpolatorTest.java ---

@pytest.mark.parametrize("degree", [0, 1, 2])
def test_constant_data_at_nodes_and_interpolated(degree):
    for i in range(100):
        y = smooth_one_point(CONST, float(i), 0, 99, 7, degree)
        assert y is not None and abs(y - 2016.0) < 2.0e-11
    for i in range(99):
        y = smooth_one_point(CONST, i + 0.5, 0, 99, 7, degree)
        assert y is not None and abs(y - 2016.0) < 2.0e-11


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_constant_data_extrapolates(degree):
    for x in (-100.0, 1000.0):
        y = smooth_one_point(CONST, x, 0, 99, 7, degree)
        assert y is not None and abs(y - 2016.0) < 3.0e-9


def test_linear_data_on_line_small_window():
    for i in range(100):
        y = smooth_one_point(LINEAR, float(i), max(0, i - 2), min(i + 2, 99), 5, 1)
        assert y is not None and abs(y - LINEAR[i]) < 1.0e-8


@pytest.mark.parametrize("degree", [1, 2])
def test_linear_data_large_width(degree):
    for i in range(100):
        y = smooth_one_point(LINEAR, float(i), 0, 99, 5000, degree)
        assert y is not None and abs(y - LINEAR[i]) < 1.0e-12


@pytest.mark.parametrize("degree", [1, 2])
def test_linear_data_extrapolates(degree):
    data = -0.25 * np.arange(100.0)
    for x in (-100.0, 1000.0):
        y = smooth_one_point(data, x, 0, 99, 7, degree)
        assert y is not None and abs(y - (-0.25 * x)) < 1.0e-8


def test_large_width_equals_linear_regression():
    scatter = np.array(load("loess_interp_golden.json")["scatter100"])
    slope, intercept = 9.9564197212156671, -12.894457726954045
    x = -5.0
    while x < 105.0:
        y = smooth_one_point(scatter, x, 0, 99, 1000000, 1)
        assert y is not None and abs(y - (slope * x + intercept)) < 1.0e-8
        x += 0.5


def test_quadratic_data_on_parabola():
    for i in range(-100, 200):
        y = smooth_one_point(QUAD, float(i), 0, 99, 500000, 2)
        assert y is not None
        assert abs(y - (3.7 - 0.25 * i + 0.7 * i * i)) < 1.0e-10


def test_large_width_quadratic_fit():
    data = np.array(load("loess_interp_golden.json")["half_sine_noise"])
    a, b, c = -0.042576513162, 4.318963328925, -9.80856523083
    for i in range(100):
        y = smooth_one_point(data, float(i), 0, 99, 500000, 2)
        assert y is not None and abs(y - (a * i * i + b * i + c)) < 1.0e-8


# --- smoother (loess_smooth) — ref: LoessSmootherTest.java ---

def test_smoother_large_width_linear_regression_all_jumps():
    scatter = np.array(load("loess_smoother_golden.json")["scatter100"])
    slope, intercept = 9.9564197212156671, -12.894457726954045
    expect = slope * np.arange(100.0) + intercept
    for jump in range(1, 99):
        y = loess_smooth(scatter, 1000000, degree=1, jump=jump)
        assert np.max(np.abs(y - expect)) < 1.0e-8


def test_smoother_noisy_sinusoid_matches_python():
    fx = load("loess_smoother_golden.json")
    data = np.array(fx["noisy_sinusoid"])
    width = len(data) // 3
    y = loess_smooth(data, width, degree=1, jump=1)
    assert np.max(np.abs(y - np.array(fx["smoothed_noisy_sinusoid"]))) < 1.0e-8
    y2 = loess_smooth(data, width, degree=2, jump=1)
    assert np.max(np.abs(y2 - np.array(fx["smoothed_noisy_sinusoid_quadratic"]))) < 1.0e-8
    yj = loess_smooth(data, width, degree=1, jump=2)
    assert np.max(np.abs(yj - np.array(fx["smoothed_noisy_sinusoid"]))) < 5.0e-3


def test_smoother_single_point_passthrough():
    y = loess_smooth(np.array([math.pi]), 3)
    assert len(y) == 1 and y[0] == math.pi


# --- cyclic sub-series smoother — ref: CyclicSubSeriesSmootherTest.java ---

def _trending_sinusoid(n_periods=2, period=24):
    i = np.arange(n_periods * period)
    amplitude = 10 - i // period
    return amplitude * np.sin(i * 2 * math.pi / period)


def test_cyclic_extrapolates_one_period_each_way():
    period = 24
    data = _trending_sinusoid()
    ext = cyclic_subseries_smooth(data, period, width=7, n_backward=1, n_forward=1)
    i = np.arange(4 * period)
    expect = (11 - i // period) * np.sin(i * 2 * math.pi / period)
    assert np.max(np.abs(ext - expect)) < 1.0e-11


def test_cyclic_extrapolates_four_forward():
    period = 24
    data = _trending_sinusoid()
    ext = cyclic_subseries_smooth(data, period, width=7, n_backward=0, n_forward=4)
    i = np.arange(6 * period)
    expect = (10 - i // period) * np.sin(i * 2 * math.pi / period)
    assert np.max(np.abs(ext - expect)) < 1.0e-11


def test_cyclic_extrapolates_two_each_way():
    period = 24
    data = _trending_sinusoid()
    ext = cyclic_subseries_smooth(data, period, width=7, n_backward=2, n_forward=2)
    i = np.arange(6 * period)
    expect = (12 - i // period) * np.sin(i * 2 * math.pi / period)
    assert np.max(np.abs(ext - expect)) < 1.0e-11


# --- SMA — ref: TimeSeriesUtilitiesTest.java ---

def test_sma_window_one_is_identity():
    rng = np.random.default_rng(42)
    data = rng.standard_normal(100)
    # rolling delta accumulation rounds — the reference's own property test
    # tolerance is 1e-10, not bitwise
    assert np.max(np.abs(simple_moving_average(data, 1) - data)) < 1.0e-10


def test_sma_full_window_is_mean():
    rng = np.random.default_rng(42)
    data = rng.standard_normal(100)
    out = simple_moving_average(data, 100)
    assert len(out) == 1
    assert abs(out[0] - np.mean(data)) < 1.0e-10


def test_sma_random_windows_vs_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(5, 200))
        w = int(rng.integers(1, n + 1))
        data = rng.standard_normal(n)
        out = simple_moving_average(data, w)
        brute = np.array([np.mean(data[i : i + w]) for i in range(n - w + 1)])
        assert len(out) == n - w + 1
        assert np.max(np.abs(out - brute)) < 1.0e-10


# --- settings normalization — ref: LoessSettingsTest.java + pinned pairs ---

def test_settings_normalization():
    s = loess_spec(7)
    assert (s.width, s.degree, s.jump) == (7, 1, 1)
    s = loess_spec(13)
    assert (s.width, s.jump) == (13, 2)
    s = loess_spec(23)
    assert (s.width, s.jump) == (23, 3)
    # width forced odd and min 3
    assert loess_spec(2).width == 3
    assert loess_spec(-10).width == 3
    assert loess_spec(4).width == 5
    # degree clamped
    assert loess_spec(7, -1).degree == 0
    assert loess_spec(7, 5).degree == 2
    # explicit jump floored at 1
    assert loess_spec(7, 1, 0).jump == 1
    assert loess_spec(7, 1, 10).jump == 10


# --- commons-math SVD pseudoinverse parity — ref: LoessInterpolator.java:341-354 ---

def test_commons_svd_bitwise_oracle():
    """commons_svd.svd_solve must be bit-identical to commons-math 3.6.1's
    SingularValueDecomposition solver.  Fixture = 83 (A, y, params) triples
    captured from the real jar (hex-encoded IEEE-754 bits): every solver call
    the step-exogenous golden makes, plus random square / wide / tall /
    rank-deficient / zero-column shapes exercising the transposed branch."""
    import json
    import struct
    from pathlib import Path

    from stl_decomp_4j_spark.stl.commons_svd import svd_solve

    def undex(h):
        return struct.unpack("<d", struct.pack("<Q", int(h, 16)))[0]

    cases = json.loads(
        (Path(__file__).parent / "fixtures" / "commons_svd_oracle.json").read_text()
    )
    assert len(cases) >= 80
    for case in cases:
        A = [[undex(h) for h in row] for row in case["A"]]
        y = [undex(h) for h in case["y"]]
        want = [undex(h) for h in case["params"]]
        got = svd_solve(A, y)
        assert [struct.pack("<d", v) for v in got] == [
            struct.pack("<d", v) for v in want
        ]


# --- geometry memoization must not perturb results ---

def test_geom_cache_bitwise_stable():
    """smooth_windows memoizes the data-independent tricube geometry; a hit
    must replay the exact same float64 values.  Interleave configs so later
    calls are cache hits, and compare against a cold cache."""
    import numpy as np

    from stl_decomp_4j_spark.stl import decompose
    from stl_decomp_4j_spark.stl import loess as L

    rng = np.random.default_rng(3)
    y = rng.standard_normal(480) + np.sin(np.arange(480) * 2 * np.pi / 24)

    L._GEOM_CACHE.clear()
    cold = [decompose(y, 24, seasonal_width=w, robust=True) for w in (7, 35)]
    # second pass: every geometry is now a cache hit
    warm = [decompose(y, 24, seasonal_width=w, robust=True) for w in (7, 35)]
    for c, h in zip(cold, warm):
        assert np.array_equal(c.trend, h.trend)
        assert np.array_equal(c.seasonal, h.seasonal)
        assert np.array_equal(c.weights, h.weights)
    assert len(L._GEOM_CACHE) <= L._GEOM_CACHE_MAX


def test_weight_cache_bitwise_stable_and_scoped():
    """_WEIGHT_CACHE memoizes the FINAL non-robust weight matrices; a hit
    must replay bitwise-identical outputs, and robust (external-weight)
    smooths must NEVER read it — a robust decomposition's results may not
    depend on whether the non-robust cache is warm."""
    import numpy as np

    from stl_decomp_4j_spark.stl import decompose
    from stl_decomp_4j_spark.stl import loess as L

    rng = np.random.default_rng(5)
    y = rng.standard_normal(480) + np.sin(np.arange(480) * 2 * np.pi / 24)
    y2 = rng.standard_normal(480) + 3.0

    # cold non-robust, then warm non-robust: bitwise identical
    L._GEOM_CACHE.clear()
    L._WEIGHT_CACHE.clear()
    cold = decompose(y, 24, seasonal_width=35)
    assert len(L._WEIGHT_CACHE) > 0
    warm = decompose(y, 24, seasonal_width=35)
    assert np.array_equal(cold.trend, warm.trend)
    assert np.array_equal(cold.seasonal, warm.seasonal)
    # DIFFERENT data through the same (geometry, degree) cache entries:
    # still bitwise-equal to a cold-cache run of that data
    warm2 = decompose(y2, 24, seasonal_width=35)
    L._GEOM_CACHE.clear()
    L._WEIGHT_CACHE.clear()
    cold2 = decompose(y2, 24, seasonal_width=35)
    assert np.array_equal(cold2.trend, warm2.trend)
    assert np.array_equal(cold2.seasonal, warm2.seasonal)

    # robust runs are identical with a cold or a non-robust-warmed cache
    L._GEOM_CACHE.clear()
    L._WEIGHT_CACHE.clear()
    robust_cold = decompose(y, 24, seasonal_width=35, robust=True)
    L._GEOM_CACHE.clear()
    L._WEIGHT_CACHE.clear()
    decompose(y, 24, seasonal_width=35)  # warm the non-robust weight cache
    robust_warm = decompose(y, 24, seasonal_width=35, robust=True)
    assert np.array_equal(robust_cold.trend, robust_warm.trend)
    assert np.array_equal(robust_cold.seasonal, robust_warm.seasonal)
    assert np.array_equal(robust_cold.weights, robust_warm.weights)
    assert len(L._WEIGHT_CACHE) <= L._WEIGHT_CACHE_MAX

"""Complete 1:1 mirror of the reference's API-misuse, builder-reuse, and
settings-normalization test suites.

- expected-exception + reuse cases: test/stl/SeasonalTrendLoessTest.java:330-491
- LoessSettings constructor cases:  test/stl/LoessSettingsTest.java:13-116

The engine's equivalent of the Java Builder is the stateless
``build_stl_config`` derivation (stl/settings.py) + ``decompose``; "builder
reuse" maps to re-supplying the previously DERIVED values, which the
consistency checks must accept (the historical bug the reference pins)."""
import numpy as np
import pytest

from stl_decomp_4j_spark.stl import decompose
from stl_decomp_4j_spark.stl.settings import build_stl_config, loess_spec

DATA = np.sin(np.arange(240) * 0.5) + 0.1 * np.cos(np.arange(240))


# --- builder reuse (SeasonalTrendLoessTest.java:329-420) -------------------

def test_periodic_builder_can_be_reused():
    # ref :329-358 — re-supplying the derived periodic settings
    # (seasonalWidth=100*n, degree 0) alongside periodic must NOT throw
    n, p = len(DATA), 12
    first = build_stl_config(n, p, periodic=True, robust=True, flat_trend=True)
    again = build_stl_config(
        n, p, periodic=True, seasonal_width=100 * n, seasonal_degree=0,
        flat_trend=True, trend_width=100 * p * n, trend_degree=0,
        inner_iterations=1, outer_iterations=17,
    )
    assert again.seasonal == first.seasonal
    assert again.trend == first.trend
    assert again.outer_iterations == 17
    d = decompose(DATA, p, periodic=True, seasonal_width=100 * n, seasonal_degree=0)
    assert np.isfinite(d.trend).all()


def test_linear_trend_builder_can_be_reused():
    # ref :360-389
    n, p = len(DATA), 12
    first = build_stl_config(n, p, seasonal_width=101, robust=True, linear_trend=True)
    again = build_stl_config(
        n, p, seasonal_width=101, linear_trend=True,
        trend_width=100 * p * n, trend_degree=1,
        inner_iterations=1, outer_iterations=17,
    )
    assert again.trend == first.trend


def test_flat_trend_builder_can_be_reused():
    # ref :391-420
    n, p = len(DATA), 12
    first = build_stl_config(n, p, seasonal_width=101, robust=True, flat_trend=True)
    again = build_stl_config(
        n, p, seasonal_width=101, flat_trend=True,
        trend_width=100 * p * n, trend_degree=0,
        inner_iterations=1, outer_iterations=17,
    )
    assert again.trend == first.trend


# --- expected-exception cases (SeasonalTrendLoessTest.java:422-491) --------

def test_periodicity_must_be_at_least_two():
    with pytest.raises(ValueError):  # ref :422-425
        decompose(DATA, 1, seasonal_width=7)


def test_data_must_have_at_least_two_periods():
    with pytest.raises(ValueError):  # ref :427-431
        decompose(DATA[:144], 120, seasonal_width=999, robust=False)


def test_null_data_throws():
    with pytest.raises(ValueError):  # ref :433-437
        decompose(None, 120, seasonal_width=999)


def test_seasonal_width_must_be_set():
    with pytest.raises(ValueError):  # ref :439-443
        decompose(np.zeros(2000), 120)


def test_period_length_must_be_set():
    with pytest.raises(ValueError):  # ref :445-449
        decompose(np.zeros(2000), None, seasonal_width=999)


def test_set_periodic_disallows_seasonal_width():
    with pytest.raises(ValueError):  # ref :451-455
        decompose(np.zeros(2000), 10, periodic=True, seasonal_width=999)


def test_set_periodic_disallows_seasonal_degree():
    with pytest.raises(ValueError):  # ref :457-461
        decompose(np.zeros(2000), 10, periodic=True, seasonal_degree=2)


def test_set_periodic_disallows_seasonal_jump():
    with pytest.raises(ValueError):  # ref :463-467
        decompose(np.zeros(2000), 10, periodic=True, seasonal_jump=1)


def test_set_flat_trend_disallows_trend_width():
    with pytest.raises(ValueError):  # ref :469-473
        decompose(np.zeros(2000), 10, periodic=True, flat_trend=True, trend_width=999)


def test_set_flat_trend_disallows_trend_jump():
    with pytest.raises(ValueError):  # ref :475-479
        decompose(np.zeros(2000), 10, periodic=True, flat_trend=True, trend_jump=1)


def test_set_flat_trend_disallows_trend_degree():
    with pytest.raises(ValueError):  # ref :481-485
        decompose(np.zeros(2000), 10, periodic=True, flat_trend=True, trend_degree=2)


def test_set_linear_trend_disallows_trend_width():
    with pytest.raises(ValueError):  # ref :487-491 (linear variants)
        decompose(np.zeros(2000), 10, periodic=True, linear_trend=True, trend_width=999)


def test_set_linear_trend_disallows_trend_jump():
    with pytest.raises(ValueError):
        decompose(np.zeros(2000), 10, periodic=True, linear_trend=True, trend_jump=1)


def test_set_linear_trend_disallows_trend_degree():
    with pytest.raises(ValueError):
        decompose(np.zeros(2000), 10, periodic=True, linear_trend=True, trend_degree=2)


# --- LoessSettings constructors (LoessSettingsTest.java:13-116) ------------

def test_even_width_becomes_next_odd():
    s = loess_spec(20)
    assert (s.width, s.degree, s.jump) == (21, 1, 3)


def test_even_width_becomes_next_odd_2():
    s = loess_spec(20, 0)
    assert (s.width, s.degree, s.jump) == (21, 0, 3)


def test_even_width_becomes_next_odd_3():
    s = loess_spec(20, 0, 4)
    assert (s.width, s.degree, s.jump) == (21, 0, 4)


def test_default_jump_consistent_for_odd_width():
    assert loess_spec(51, 0).jump == 6
    assert loess_spec(51).jump == 6


def test_default_jump_consistent_for_even_width():
    # jump must be computed AFTER width is made odd (historical bug)
    assert loess_spec(50, 0).jump == 6
    assert loess_spec(50).jump == 6


def test_min_width_is_three():
    s = loess_spec(0)
    assert (s.width, s.degree, s.jump) == (3, 1, 1)


def test_jump_is_correct():
    s = loess_spec(100)
    assert (s.width, s.degree, s.jump) == (101, 1, 11)


def test_quadratic_works():
    s = loess_spec(13, 2, 1)
    assert (s.width, s.degree, s.jump) == (13, 2, 1)


def test_jump_is_floored_at_one():
    s = loess_spec(13, 2, -1)
    assert (s.width, s.degree, s.jump) == (13, 2, 1)


def test_degree_is_floored_at_zero():
    s = loess_spec(13, -2)
    assert (s.width, s.degree, s.jump) == (13, 0, 2)


def test_degree_is_capped_at_2():
    s = loess_spec(13, 10)
    assert (s.width, s.degree, s.jump) == (13, 2, 2)


def test_to_string():
    assert str(loess_spec(23)) == "[width = 23, degree = 1, jump = 3]"

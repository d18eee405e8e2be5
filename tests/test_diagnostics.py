"""diagnostics: seasonal strength, residual CUSUM change-points, and sparse
outage detection — exact-arithmetic expectations on tiny synthetic series."""
import datetime as dt
import math

import pytest

from stl_decomp_4j_spark.operators.diagnostics import (
    cusum_changepoints,
    detect_outages,
    outage_summary,
    seasonal_strength,
)

T0 = dt.datetime(2024, 3, 4, 0, 0, 0)


def _decomposed(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, ts timestamp, value double, trend double, seasonal double, residual double",
    )


def test_seasonal_strength_pure_components(spark):
    # url 'pure': residual == 0 -> both strengths exactly 1
    # url 'noise': seasonal == trend == 0 -> Var(S+R)=Var(R) -> strength 0
    rows = []
    for i in range(8):
        s = math.sin(i)  # any non-constant series
        rows.append(("pure", T0 + dt.timedelta(hours=i), s, 2.0 * s, s, 0.0))
        rows.append(("noise", T0 + dt.timedelta(hours=i), s, 0.0, 0.0, s))
    out = {r.url: r for r in seasonal_strength(_decomposed(spark, rows)).collect()}
    assert out["pure"].f_seasonal == pytest.approx(1.0)
    assert out["pure"].f_trend == pytest.approx(1.0)
    assert out["pure"].var_resid == 0.0
    assert out["noise"].f_seasonal == pytest.approx(0.0)
    assert out["noise"].f_trend == pytest.approx(0.0)
    assert out["noise"].n == 8


def test_seasonal_strength_clamps_at_zero(spark):
    # anti-correlated seasonal/residual can make Var(S+R) < Var(R);
    # the statistic must clamp to 0, not go negative
    rows = [
        ("anti", T0 + dt.timedelta(hours=i), 0.0, 0.0, [1.0, -1.0, 2.0, -2.0][i], [-1.0, 1.0, -2.0, 2.0][i])
        for i in range(4)
    ]
    r = seasonal_strength(_decomposed(spark, rows)).collect()[0]
    assert r.f_seasonal == 0.0


def test_cusum_finds_injected_level_shift(spark):
    # residual -1 for the first half, +1 for the second: CUSUM of the
    # standardized residual bottoms out exactly at the shift point
    n, half = 48, 24
    rows = [
        ("shift", T0 + dt.timedelta(hours=i), 0.0, 0.0, 0.0, -1.0 if i < half else 1.0)
        for i in range(n)
    ]
    r = cusum_changepoints(_decomposed(spark, rows), k=3.0).collect()[0]
    assert r.ts == T0 + dt.timedelta(hours=half - 1)
    # mu = 0, sd = sqrt(n/(n-1)); |CUSUM| at the trough = half / sd
    sd = math.sqrt(n / (n - 1.0))
    assert abs(r.cusum) == pytest.approx(half / sd, rel=1e-12)
    assert r.threshold == pytest.approx(3.0 * math.sqrt(n))
    assert bool(r.exceeds) is (half / sd > 3.0 * math.sqrt(n))


def test_cusum_one_row_per_url_and_tie_breaks_earliest(spark):
    # symmetric residual: |CUSUM| ties at multiple points; earliest ts wins
    rows = [
        ("tie", T0 + dt.timedelta(hours=i), 0.0, 0.0, 0.0, r)
        for i, r in enumerate([1.0, -1.0, 1.0, -1.0])
    ]
    out = cusum_changepoints(_decomposed(spark, rows), k=3.0).collect()
    assert len(out) == 1
    assert out[0].ts == T0  # first point already achieves |CUSUM| max


def _buckets(spark, hours):
    return spark.createDataFrame(
        [("u", T0 + dt.timedelta(hours=h), 1) for h in hours],
        "url string, ts timestamp, cnt long",
    )


def test_detect_outages_finds_gap_bounds(spark):
    # observed hours 0,1,5,6: one gap covering hours 2-4 (3 missing)
    out = detect_outages(_buckets(spark, [0, 1, 5, 6]), "hour").collect()
    assert len(out) == 1
    g = out[0]
    assert g.gap_start == T0 + dt.timedelta(hours=2)
    assert g.gap_end == T0 + dt.timedelta(hours=4)
    assert g.missing == 3


def test_detect_outages_min_missing_filters(spark):
    out = detect_outages(_buckets(spark, [0, 2, 10]), "hour", min_missing=2).collect()
    assert len(out) == 1 and out[0].missing == 7


def test_outage_summary_gapless_url_reports_zeros(spark):
    out = outage_summary(_buckets(spark, [0, 1, 2, 3]), "hour").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_gaps, r.missing_total, r.max_missing) == (0, 0, 0)
    assert r.worst_gap_start is None


def test_outage_summary_picks_earliest_longest_gap(spark):
    # two gaps of length 2 (hours 1-2 and 6-7) and one of length 1 (hour 9):
    # worst = earliest of the longest, i.e. starting at hour 1
    out = outage_summary(_buckets(spark, [0, 3, 4, 5, 8, 10]), "hour").collect()
    r = out[0]
    assert r.n_gaps == 3
    assert r.missing_total == 5
    assert r.max_missing == 2
    assert r.worst_gap_start == T0 + dt.timedelta(hours=1)


def test_outage_summary_day_granularity(spark):
    buckets = spark.createDataFrame(
        [("u", T0 + dt.timedelta(days=d), 1) for d in (0, 1, 4)],
        "url string, ts timestamp, cnt long",
    )
    r = outage_summary(buckets, "day").collect()[0]
    assert r.max_missing == 2
    assert r.worst_gap_start == T0 + dt.timedelta(days=2)

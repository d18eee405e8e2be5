"""Read-side serving operators: as-of join, time-weighted average,
linear-interpolation gap-fill — hand-computed expectations."""
import datetime as dt

import pyspark.sql.functions as F
import pytest


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_result(spark):
    from stl_decomp_4j_spark.operators.readside import asof_join

    data = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 10.0),
            ("a", _ts("2024-01-01 02:00:00"), 20.0),
            ("a", _ts("2024-01-01 05:00:00"), None),  # real NULL measurement
            ("b", _ts("2024-01-01 03:00:00"), 7.0),
        ],
        "url string, ts timestamp, v double",
    )
    probes = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 01:30:00")),  # between -> 00:00 row
            ("a", _ts("2024-01-01 02:00:00")),  # exact tie -> inclusive
            ("a", _ts("2024-01-01 06:00:00")),  # after the NULL-v row
            ("b", _ts("2024-01-01 02:00:00")),  # before any data -> unmatched
            ("b", _ts("2024-01-01 03:10:00")),
        ],
        "url string, ts timestamp",
    )
    rows = asof_join(probes, data).collect()
    return {(r["url"], r["ts"]): r for r in rows}


def test_asof_between_and_inclusive(asof_result):
    r = asof_result[("a", _ts("2024-01-01 01:30:00"))]
    assert r["v"] == 10.0 and r["matched_ts"] == _ts("2024-01-01 00:00:00")
    assert r["staleness_s"] == 5400
    tie = asof_result[("a", _ts("2024-01-01 02:00:00"))]
    assert tie["v"] == 20.0 and tie["staleness_s"] == 0


def test_asof_null_value_row_is_row_atomic(asof_result):
    # the 05:00 data row has v=NULL; the probe after it must match THAT row
    # (NULL v, staleness from 05:00) — not leak the older 02:00 value
    r = asof_result[("a", _ts("2024-01-01 06:00:00"))]
    assert r["v"] is None
    assert r["matched_ts"] == _ts("2024-01-01 05:00:00")
    assert r["staleness_s"] == 3600


def test_asof_unmatched_probe_kept_with_nulls(asof_result):
    r = asof_result[("b", _ts("2024-01-01 02:00:00"))]
    assert r["v"] is None and r["matched_ts"] is None and r["staleness_s"] is None
    assert asof_result[("b", _ts("2024-01-01 03:10:00"))]["v"] == 7.0


def test_asof_tolerance_nulls_stale_match(spark):
    from stl_decomp_4j_spark.operators.readside import asof_join

    data = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 1.0)], "url string, ts timestamp, v double"
    )
    probes = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:30:00")), ("a", _ts("2024-01-02 00:00:00"))],
        "url string, ts timestamp",
    )
    rows = {r["ts"]: r for r in asof_join(probes, data, tolerance_s=3600).collect()}
    assert rows[_ts("2024-01-01 00:30:00")]["v"] == 1.0
    stale = rows[_ts("2024-01-02 00:00:00")]
    assert stale["v"] is None and stale["matched_ts"] is None


def test_twa_locf_weighting(spark):
    from stl_decomp_4j_spark.operators.readside import time_weighted_avg

    # one day, three points: v=2 holds 60s, v=10 holds 120s, last opens none
    # twa = (2*60 + 10*120) / 180 = 7.333333...
    pts = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 2.0),
            ("a", _ts("2024-01-01 00:01:00"), 10.0),
            ("a", _ts("2024-01-01 00:03:00"), 99.0),
        ],
        "url string, ts timestamp, value double",
    )
    [r] = time_weighted_avg(pts, granularity="day").collect()
    assert r["twa"] == pytest.approx((2 * 60 + 10 * 120) / 180)
    assert r["n_points"] == 3 and r["span_s"] == 180.0
    assert r["ts"] == _ts("2024-01-01 00:00:00")


def test_twa_single_point_and_duplicate_ts(spark):
    from stl_decomp_4j_spark.operators.readside import time_weighted_avg

    pts = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 05:00:00"), 4.0),
            ("a", _ts("2024-01-01 05:00:00"), 6.0),  # duplicate ts -> mean 5
            ("b", _ts("2024-01-02 00:00:00"), 3.0),
            ("b", _ts("2024-01-02 00:00:10"), 9.0),
        ],
        "url string, ts timestamp, value double",
    )
    rows = {r["url"]: r for r in time_weighted_avg(pts, granularity="day").collect()}
    assert rows["a"]["twa"] == 5.0 and rows["a"]["span_s"] == 0.0
    assert rows["a"]["n_points"] == 2
    assert rows["b"]["twa"] == 3.0  # v=3 holds the whole 10s span


def test_twa_buckets_split_segments(spark):
    from stl_decomp_4j_spark.operators.readside import time_weighted_avg

    # points straddling midnight: the segment from 23:00 does NOT leak into
    # day 2 (lead() is per-bucket); each day stands alone
    pts = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 23:00:00"), 1.0),
            ("a", _ts("2024-01-01 23:30:00"), 3.0),
            ("a", _ts("2024-01-02 00:30:00"), 100.0),
        ],
        "url string, ts timestamp, value double",
    )
    rows = {r["ts"]: r for r in time_weighted_avg(pts, granularity="day").collect()}
    assert rows[_ts("2024-01-01 00:00:00")]["twa"] == 1.0  # v=1 held 30m of 30m span
    assert rows[_ts("2024-01-02 00:00:00")]["twa"] == 100.0


def test_gapfill_linear_interpolates(spark):
    from stl_decomp_4j_spark.operators.gapfill import gapfill_linear

    buckets = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 2),
            ("a", _ts("2024-01-01 03:00:00"), 8),
            ("a", _ts("2024-01-01 04:00:00"), 1),
        ],
        "url string, ts timestamp, cnt long",
    )
    rows = {r["ts"]: r for r in gapfill_linear(buckets, "hour").collect()}
    assert len(rows) == 5
    assert rows[_ts("2024-01-01 00:00:00")]["value"] == 2.0
    assert rows[_ts("2024-01-01 01:00:00")]["value"] == pytest.approx(4.0)
    assert rows[_ts("2024-01-01 02:00:00")]["value"] == pytest.approx(6.0)
    assert rows[_ts("2024-01-01 03:00:00")]["value"] == 8.0
    assert rows[_ts("2024-01-01 04:00:00")]["value"] == 1.0
    assert [rows[t]["observed"] for t in sorted(rows)] == [True, False, False, True, True]


def test_gapfill_linear_single_window_exchange(spark):
    """Both ignore-nulls carries share one (url, ts) sort: the physical plan
    must contain exactly one Window operator and no self-join."""
    from stl_decomp_4j_spark.operators.gapfill import gapfill_linear

    buckets = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:00"), 2)], "url string, ts timestamp, cnt long"
    )
    plan = (
        gapfill_linear(buckets, "hour")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1
    # exactly the grid<-observed join of plain gapfill; interpolation adds none
    assert plan.count("Join") <= 1


def test_percentile_rollup_exact_interpolation(spark):
    from stl_decomp_4j_spark.operators.rollup import percentile_rollup

    pts = spark.createDataFrame(
        [("a", _ts("2024-01-01 0%d:00:00" % i), float(v)) for i, v in enumerate([1, 2, 3, 4])],
        "url string, ts timestamp, value double",
    )
    [r] = percentile_rollup(pts, granularity="day").collect()
    # PERCENTILE_CONT linear interpolation on [1,2,3,4]
    assert r["p50"] == pytest.approx(2.5)
    assert r["p95"] == pytest.approx(1 + 0.95 * 3)
    assert r["p99"] == pytest.approx(1 + 0.99 * 3)
    assert r["cnt"] == 4 and r["ts"] == _ts("2024-01-01 00:00:00")


def test_asof_matches_pandas_merge_asof_property(spark):
    """Adversarial cross-check: the union+window as-of join must agree with
    pandas.merge_asof (direction='backward', inclusive) on seeded random
    data with duplicate-free per-key data timestamps, including keys that
    appear only in probes or only in data."""
    import numpy as np
    import pandas as pd

    from stl_decomp_4j_spark.operators.readside import asof_join

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    for trial in range(5):
        keys = [f"u{i}" for i in range(rng.integers(1, 6))]
        data_rows, probe_rows = [], []
        for k in keys + ["probe_only"]:
            if k != "probe_only":
                n = int(rng.integers(0, 40))
                ts = np.unique(rng.integers(0, 10_000, size=n))
                for t in ts:
                    data_rows.append((k, base + pd.Timedelta(seconds=int(t)),
                                      float(rng.normal())))
            m = int(rng.integers(1, 30))
            for t in rng.integers(-100, 10_100, size=m):
                probe_rows.append((k, base + pd.Timedelta(seconds=int(t))))
        if not data_rows:
            continue
        data_pd = pd.DataFrame(data_rows, columns=["url", "ts", "v"])
        probe_pd = pd.DataFrame(probe_rows, columns=["url", "ts"]).drop_duplicates()

        expected = pd.merge_asof(
            probe_pd.sort_values("ts"), data_pd.sort_values("ts"),
            on="ts", by="url", direction="backward",
        ).set_index(["url", "ts"])["v"]

        got = asof_join(
            spark.createDataFrame(probe_pd), spark.createDataFrame(data_pd)
        ).collect()
        assert len(got) == len(probe_pd)
        for r in got:
            exp = expected.loc[(r["url"], pd.Timestamp(r["ts"]))]
            if pd.isna(exp):
                assert r["v"] is None, (trial, r)
            else:
                assert r["v"] == exp, (trial, r)


def test_counter_rate_resets_and_buckets(spark):
    from stl_decomp_4j_spark.operators.readside import counter_rate

    df = spark.createDataFrame(
        [
            # url a, day 1: one reset mid-day (60 -> 5)
            ("a", _ts("2024-01-01 00:00:00"), 10.0),
            ("a", _ts("2024-01-01 06:00:00"), 60.0),
            ("a", _ts("2024-01-01 12:00:00"), 5.0),
            ("a", _ts("2024-01-01 18:00:00"), 25.0),
            # url a, day 2: raw 40 > prev raw 25 -> NOT a reset at the
            # bucket boundary; then 40 -> 2 is one
            ("a", _ts("2024-01-02 00:00:00"), 40.0),
            ("a", _ts("2024-01-02 12:00:00"), 2.0),
            # url b: single sample -> zero span, NULL rate
            ("b", _ts("2024-01-01 00:00:00"), 5.0),
        ],
        "url string, ts timestamp, value double",
    )
    rows = {
        (r["url"], r["ts"]): r
        for r in counter_rate(df, granularity="day").collect()
    }
    d1 = rows[("a", _ts("2024-01-01 00:00:00"))]
    # adjusted: 10, 60, 65 (offset 60), 85 -> delta 75 over 18h
    assert d1["delta"] == 75.0
    assert d1["rate_per_s"] == pytest.approx(75.0 / 64800.0)
    assert d1["n_resets"] == 1 and d1["n_points"] == 4
    assert d1["span_s"] == 64800.0

    d2 = rows[("a", _ts("2024-01-02 00:00:00"))]
    # adjusted: 100 (offset 60 carried), 102 (offset 100) -> delta 2
    assert d2["delta"] == 2.0
    assert d2["rate_per_s"] == pytest.approx(2.0 / 43200.0)
    assert d2["n_resets"] == 1 and d2["n_points"] == 2

    b = rows[("b", _ts("2024-01-01 00:00:00"))]
    assert b["delta"] == 0.0 and b["rate_per_s"] is None
    assert b["n_resets"] == 0 and b["n_points"] == 1 and b["span_s"] == 0.0


def test_counter_rate_duplicate_ts_collapse(spark):
    from stl_decomp_4j_spark.operators.readside import counter_rate

    df = spark.createDataFrame(
        [
            ("c", _ts("2024-01-01 00:00:00"), 5.0),
            ("c", _ts("2024-01-01 00:00:00"), 7.0),  # dup instant -> max = 7
            ("c", _ts("2024-01-01 01:00:00"), 3.0),  # reset vs 7 -> adj 10
        ],
        "url string, ts timestamp, value double",
    )
    (r,) = counter_rate(df, granularity="day").collect()
    assert r["delta"] == 3.0  # 10 - 7
    assert r["n_resets"] == 1 and r["n_points"] == 2
    assert r["rate_per_s"] == pytest.approx(3.0 / 3600.0)


def test_counter_rate_monotonic_counter_equals_plain_delta(spark):
    from stl_decomp_4j_spark.operators.readside import counter_rate

    rows = [
        ("m", _ts("2024-01-01 00:00:00") + dt.timedelta(hours=h), float(h * h))
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, value double")
    (r,) = counter_rate(df, granularity="day").collect()
    assert r["delta"] == 23.0 * 23.0 and r["n_resets"] == 0
    assert r["rate_per_s"] == pytest.approx(529.0 / (23 * 3600))


def test_ohlc_rollup(spark):
    from stl_decomp_4j_spark.operators.rollup import ohlc_rollup

    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), 3.0),
            ("a", _ts("2024-01-01 01:00:00"), 9.0),
            ("a", _ts("2024-01-01 02:00:00"), 1.0),
            ("a", _ts("2024-01-01 03:00:00"), 5.0),
            ("a", _ts("2024-01-02 07:00:00"), 4.0),  # single-sample bucket
        ],
        "url string, ts timestamp, value double",
    )
    rows = {(r["url"], r["ts"]): r for r in ohlc_rollup(df).collect()}
    d1 = rows[("a", _ts("2024-01-01 00:00:00"))]
    assert (d1["open"], d1["high"], d1["low"], d1["close"], d1["cnt"]) == (
        3.0, 9.0, 1.0, 5.0, 4,
    )
    d2 = rows[("a", _ts("2024-01-02 00:00:00"))]
    assert (d2["open"], d2["high"], d2["low"], d2["close"], d2["cnt"]) == (
        4.0, 4.0, 4.0, 4.0, 1,
    )


def test_stats_rollup_perfect_line_and_edge_buckets(spark):
    from stl_decomp_4j_spark.operators.rollup import stats_rollup

    df = spark.createDataFrame(
        [
            # perfect line y = 2*hours + 1
            ("a", _ts("2024-01-01 00:00:00"), 1.0),
            ("a", _ts("2024-01-01 01:00:00"), 3.0),
            ("a", _ts("2024-01-01 02:00:00"), 5.0),
            # single sample
            ("a", _ts("2024-01-02 00:00:00"), 7.0),
            # constant y
            ("b", _ts("2024-01-01 00:00:00"), 4.0),
            ("b", _ts("2024-01-01 01:00:00"), 4.0),
        ],
        "url string, ts timestamp, value double",
    )
    rows = {(r["url"], r["ts"]): r for r in stats_rollup(df).collect()}
    line = rows[("a", _ts("2024-01-01 00:00:00"))]
    assert line["avg_value"] == 3.0
    assert line["stddev_value"] == 2.0  # sample stddev of 1,3,5
    assert line["slope_per_s"] == pytest.approx(2.0 / 3600.0)
    assert line["intercept"] == pytest.approx(1.0)
    assert line["r2"] == pytest.approx(1.0)
    assert line["n"] == 3

    single = rows[("a", _ts("2024-01-02 00:00:00"))]
    assert single["avg_value"] == 7.0
    assert single["stddev_value"] is None
    assert single["slope_per_s"] is None and single["intercept"] is None
    assert single["r2"] is None

    flat = rows[("b", _ts("2024-01-01 00:00:00"))]
    assert flat["slope_per_s"] == 0.0 and flat["stddev_value"] == 0.0
    assert flat["r2"] is None  # zero y-variance: correlation undefined


def test_counter_rate_matches_pandas_reference_property(spark):
    import numpy as np
    import pandas as pd

    from stl_decomp_4j_spark.operators.readside import counter_rate

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(4):
        t = 0
        val = float(rng.integers(0, 50))
        for _ in range(int(rng.integers(2, 120))):
            rows.append((f"u{k}", base + pd.Timedelta(seconds=t), val))
            t += int(rng.integers(60, 90000))
            if rng.random() < 0.15:  # reset: restart low
                val = float(rng.integers(0, 5))
            else:
                val += float(rng.integers(0, 40))
    pdf = pd.DataFrame(rows, columns=["url", "ts", "value"])

    # independent reference: explicit python loop per url
    expected = {}
    for url, g in pdf.groupby("url"):
        g = g.sort_values("ts")
        offset, prev, adj, resets = 0.0, None, [], []
        for v in g["value"]:
            is_reset = prev is not None and v < prev
            if is_reset:
                offset += prev
            adj.append(v + offset)
            resets.append(1 if is_reset else 0)
            prev = v
        g = g.assign(adj=adj, r=resets, b=g["ts"].dt.floor("D"))
        for b, gb in g.groupby("b"):
            span = (gb["ts"].max() - gb["ts"].min()).total_seconds()
            delta = gb.loc[gb["ts"].idxmax(), "adj"] - gb.loc[gb["ts"].idxmin(), "adj"]
            expected[(url, b.to_pydatetime())] = (
                delta,
                delta / span if span > 0 else None,
                int(gb["r"].sum()),
                len(gb),
            )

    got = counter_rate(spark.createDataFrame(pdf), granularity="day").collect()
    assert len(got) == len(expected)
    for r in got:
        delta, rate, resets, n = expected[(r["url"], r["ts"])]
        assert r["delta"] == pytest.approx(delta), r
        if rate is None:
            assert r["rate_per_s"] is None, r
        else:
            assert r["rate_per_s"] == pytest.approx(rate), r
        assert r["n_resets"] == resets and r["n_points"] == n, r


def test_histogram_rollup_binning_and_clamps(spark):
    from stl_decomp_4j_spark.operators.rollup import histogram_rollup

    t = _ts("2024-01-01 00:00:00")
    vals = [0.0, 7.9, 8.0, 63.9, 64.0, 100.0, -5.0]
    df = spark.createDataFrame(
        [("a", t + dt.timedelta(minutes=i), v) for i, v in enumerate(vals)],
        "url string, ts timestamp, value double",
    )
    rows = {r["bin"]: r for r in histogram_rollup(df, lo=0.0, hi=64.0, bins=8).collect()}
    assert rows[0]["cnt"] == 3  # 0.0, 7.9 and the clamped -5.0
    assert rows[1]["cnt"] == 1  # 8.0 lands in [8, 16)
    assert rows[7]["cnt"] == 3  # 63.9 plus clamped 64.0 and 100.0
    assert set(rows) == {0, 1, 7}  # sparse: empty bins not emitted
    assert (rows[1]["bin_lo"], rows[1]["bin_hi"]) == (8.0, 16.0)


def test_histogram_rollup_rejects_bad_edges(spark):
    from stl_decomp_4j_spark.operators.rollup import histogram_rollup

    df = spark.createDataFrame([], "url string, ts timestamp, value double")
    with pytest.raises(ValueError, match="hi > lo"):
        histogram_rollup(df, lo=1.0, hi=1.0, bins=4)


def test_top_k_keys_rank_and_tiebreak(spark):
    from stl_decomp_4j_spark.operators.rollup import top_k_keys

    t = _ts("2024-01-01 00:00:00")
    rows = (
        [("a", t + dt.timedelta(minutes=i)) for i in range(5)]
        + [("b", t + dt.timedelta(minutes=i)) for i in range(5)]  # tie with a
        + [("c", t + dt.timedelta(minutes=i)) for i in range(2)]
        + [("d", t)]
        + [("d", t + dt.timedelta(days=1))]  # next day: only d
    )
    df = spark.createDataFrame(rows, "url string, ts timestamp")
    got = sorted(
        (r["ts"], r["rank"], r["url"], r["cnt"])
        for r in top_k_keys(df, k=2, granularity="day").collect()
    )
    assert got == [
        (t, 1, "a", 5),  # tie broken by key asc
        (t, 2, "b", 5),
        (t + dt.timedelta(days=1), 1, "d", 1),
    ]


def test_ohlc_from_tier_equals_from_raw(spark):
    import numpy as np
    import pandas as pd

    from stl_decomp_4j_spark.operators.rollup import ohlc_from_tier, ohlc_rollup

    rng = np.random.default_rng(19)
    base = pd.Timestamp("2024-01-01")
    rows = [
        (f"u{k}", (base + pd.Timedelta(hours=int(h))).to_pydatetime(),
         float(rng.integers(0, 100)))
        for k in range(3)
        for h in rng.choice(24 * 28, size=200, replace=False)
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, value double")
    direct = {
        (r["url"], r["ts"]): (r["open"], r["high"], r["low"], r["close"], r["cnt"])
        for r in ohlc_rollup(df, granularity="week").collect()
    }
    composed = {
        (r["url"], r["ts"]): (r["open"], r["high"], r["low"], r["close"], r["cnt"])
        for r in ohlc_from_tier(
            ohlc_rollup(df, granularity="day"), granularity="week"
        ).collect()
    }
    assert composed == direct

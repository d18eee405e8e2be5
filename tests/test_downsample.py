"""LTTB downsampling: selection invariants, spike preservation, and
bit-parity between the vectorized kernel and the naive thesis transcription
(the fixture generator's implementation)."""
import datetime as dt
import sys
from pathlib import Path

import numpy as np
import pytest

from stl_decomp_4j_spark.operators.downsample import lttb, lttb_select

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from make_lttb_fixture import lttb_naive  # noqa: E402


def test_keeps_endpooints_and_count():
    t = np.arange(500, dtype=np.float64)
    v = np.sin(t / 7.0)
    idx = lttb_select(t, v, 50)
    assert len(idx) == 50
    assert idx[0] == 0 and idx[-1] == 499
    assert (np.diff(idx) > 0).all()  # strictly increasing (sorted, unique)


def test_short_series_passthrough_and_validation():
    t = np.arange(5, dtype=np.float64)
    assert list(lttb_select(t, t, 10)) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        lttb_select(t, t, 2)


def test_spike_survives():
    # a single huge outlier must be selected — the property averaging-based
    # downsampling loses and LTTB exists to keep
    t = np.arange(1000, dtype=np.float64)
    v = np.zeros(1000)
    v[637] = 500.0
    idx = lttb_select(t, v, 20)
    assert 637 in idx


def test_matches_naive_transcription():
    rng = np.random.default_rng(11)
    for n, n_out in [(720, 100), (719, 97), (2160, 100), (50, 3), (101, 99)]:
        t = np.cumsum(rng.integers(1, 4, size=n)).astype(np.float64) * 3.6e9
        t -= t[0]
        v = np.round(rng.normal(size=n) * 3)  # integer-ish, tie-prone
        got = list(lttb_select(t, v, n_out))
        want = lttb_naive(t.tolist(), v.tolist(), n_out)
        assert got == want, (n, n_out)


def test_lttb_spark_operator_equals_local_kernel(spark):
    t0 = dt.datetime(2024, 1, 1)
    series = {
        "u%d" % u: [float((h * 7 + u * 3) % 13) for h in range(300)] for u in range(3)
    }
    rows = [
        (u, t0 + dt.timedelta(hours=h), v)
        for u, vals in series.items()
        for h, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "url string, ts timestamp, value double")
    got = {
        (r["url"], r["ts"], r["value"])
        for r in lttb(df, n_out=40).collect()
    }
    want = set()
    for u, vals in series.items():
        t = np.arange(300, dtype=np.float64) * 3.6e9  # relative micros
        idx = lttb_select(t, np.array(vals), 40)
        want |= {(u, t0 + dt.timedelta(hours=int(i)), vals[i]) for i in idx}
    assert got == want and len(got) == 3 * 40

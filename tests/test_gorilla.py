"""Round-trip and edge-case tests for the Gorilla codec (FIXTURES.md §4)."""
import numpy as np
import pytest

from stl_decomp_4j_spark.codec.gorilla import (
    decode_series,
    decode_timestamps,
    decode_values,
    encode_series,
    encode_timestamps,
    encode_values,
)

HOUR_MS = 3_600_000


@pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 2161])
def test_values_roundtrip_random(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n) * rng.choice([1e-8, 1.0, 1e12], size=n or 1)[:n]
    out = decode_values(encode_values(x))
    assert out.shape == x.shape
    assert np.array_equal(out.view(np.uint64), x.view(np.uint64))


def test_values_roundtrip_constant_and_special():
    x = np.array([3.14, 3.14, 3.14, 0.0, -0.0, np.inf, -np.inf, np.nan, 3.14])
    out = decode_values(encode_values(x))
    assert np.array_equal(out.view(np.uint64), x.view(np.uint64))


def test_values_compress_constant_well():
    x = np.full(10000, 42.0)
    blob = encode_values(x)
    assert len(blob) < 4 + 8 + 10000 // 8 + 16  # ~1 bit per repeated value


@pytest.mark.parametrize("stride", [HOUR_MS, 24 * HOUR_MS, 7 * 24 * HOUR_MS])
def test_timestamps_regular_grid(stride):
    t0 = 1_600_000_000_000
    ts = t0 + np.arange(5000, dtype=np.int64) * stride
    blob = encode_timestamps(ts)
    assert np.array_equal(decode_timestamps(blob), ts)
    # regular grid -> delta-of-delta all zero -> ~1 bit/stamp
    assert len(blob) < 4 + 16 + 5000 // 8 + 16


def test_timestamps_irregular_then_regular():
    ts = np.array([0, 7, 9, 1000, 1060, 1120, 1180], dtype=np.int64)
    assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_timestamps_edge_sizes():
    for ts in ([], [12345], [12345, 99999]):
        arr = np.array(ts, dtype=np.int64)
        assert np.array_equal(decode_timestamps(encode_timestamps(arr)), arr)


def test_timestamps_random_jitter():
    rng = np.random.default_rng(99)
    deltas = rng.integers(-10_000_000, 10_000_000, size=3000)
    ts = np.cumsum(np.concatenate(([1_700_000_000_000], deltas))).astype(np.int64)
    assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_series_roundtrip():
    rng = np.random.default_rng(5)
    ts = 1_600_000_000_000 + np.arange(2161, dtype=np.int64) * HOUR_MS
    vals = rng.standard_normal(2161)
    t2, v2 = decode_series(encode_series(ts, vals))
    assert np.array_equal(t2, ts)
    assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))


def test_values_boundary_patterns():
    # denormals, powers of two, sign flips, extremes — float-exponent
    # bit-length tricks in the vectorized encoder must survive all of them
    x = np.array(
        [5e-324, -5e-324, 2.0**-1022, 2.0**1023, -2.0**1023, 1.0, -1.0, 0.0, -0.0, np.nan, np.inf]
    )
    assert np.array_equal(decode_values(encode_values(x)).view(np.uint64), x.view(np.uint64))


def test_values_rounding_boundary_xors():
    # XOR patterns whose float64 conversion rounds up to the next power of
    # two exercise the bit_length correction branch
    pats = np.array([(1 << 53) - 1, (1 << 54) - 1, (1 << 63) - 1, (1 << 64) - 1, 1 << 63], dtype=np.uint64)
    x = np.bitwise_xor.accumulate(np.concatenate(([np.uint64(0)], pats))).view(np.float64)
    assert np.array_equal(decode_values(encode_values(x)).view(np.uint64), x.view(np.uint64))


def test_timestamps_dod_bucket_boundaries():
    dods = np.array(
        [-63, -64, 64, 65, -255, -256, 256, 257, -2047, -2048, 2048, 2049, 0, 1, -1, 2**40, -(2**40)],
        dtype=np.int64,
    )
    deltas = np.concatenate(([1000], 1000 + np.cumsum(dods)))
    ts = np.concatenate(([1_000_000], 1_000_000 + np.cumsum(deltas))).astype(np.int64)
    assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


def test_random_scale_mix_roundtrip():
    for seed in range(20):
        r = np.random.default_rng(seed)
        n = int(r.integers(0, 400))
        x = r.standard_normal(n) * r.choice([1e-300, 1e-8, 1.0, 1e12, 1e300])
        assert np.array_equal(decode_values(encode_values(x)).view(np.uint64), x.view(np.uint64))
        ts = np.cumsum(r.integers(-(2**40), 2**40, size=n)).astype(np.int64)
        assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)


# --- hypothesis property tests ---------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=200, deadline=None)
    @given(
        arrays(
            np.float64,
            st.integers(0, 300),
            elements=st.floats(
                allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64
            ),
        )
    )
    def test_values_roundtrip_hypothesis(x):
        out = decode_values(encode_values(x))
        assert np.array_equal(out.view(np.uint64), x.view(np.uint64))

    @settings(max_examples=200, deadline=None)
    @given(
        arrays(
            np.int64,
            st.integers(0, 300),
            elements=st.integers(-(2**62), 2**62),
        )
    )
    def test_timestamps_roundtrip_hypothesis(ts):
        assert np.array_equal(decode_timestamps(encode_timestamps(ts)), ts)
except ImportError:  # pragma: no cover
    pass

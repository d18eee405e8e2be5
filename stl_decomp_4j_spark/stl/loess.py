"""Vectorized LOESS smoothing on a regular integer grid.

NumPy re-expression of the reference's loess stack (semantics-faithful, not a
translation): tricube neighborhood weights with the 0.001/0.999 fuzzy cutoffs
and the width>n lambda inflation, regression-recast-as-weights for degrees
0/1/2 with the 1e-6*range^2 degeneracy guards, jump-skipping with linear
interpolation between evaluation points including the separate last-point
rule, and fallback-to-raw-value when a window's total weight is zero.
(ref: main/stl/LoessInterpolator.java:147-266,357-499;
 main/stl/LoessSmoother.java:182-288)

Everything is vectorized over evaluation points: all windows at a given call
share one length, so the evaluation is a handful of 2-D array ops — no
per-point Python in the hot path.
"""
from __future__ import annotations

import numpy as np


def _seqsum(a: np.ndarray) -> np.ndarray:
    """Left-to-right sequential row sum (bit-identical to the reference's
    scalar accumulation loops, unlike NumPy's pairwise np.sum)."""
    return np.cumsum(a, axis=1)[:, -1]


def _neighborhood_weights(
    data_len: int,
    width: int,
    xs: np.ndarray,
    lefts: np.ndarray,
    window_len: int,
    external_weights: np.ndarray | None,
):
    """Tricube weights for each evaluation point over its window.

    Returns (w, idx, lam, total) where w is (K, L) normalized weights with
    rows of all-zero total left unnormalized, idx the (K, L) window indices,
    lam the per-row neighborhood radius, total the per-row pre-normalization
    weight sum.
    """
    idx = lefts[:, None] + np.arange(window_len)[None, :]
    rights = lefts + window_len - 1
    lam = np.maximum(xs - lefts, rights - xs).astype(np.float64)
    if width > data_len:
        lam = lam + (width - data_len) // 2

    delta = np.abs(xs[:, None] - idx)
    lam_col = lam[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(lam_col > 0, delta / np.where(lam_col > 0, lam_col, 1.0), 0.0)
    tri = 1.0 - frac * frac * frac
    w = tri * tri * tri
    w = np.where(delta <= 0.001 * lam_col, 1.0, w)
    w = np.where(delta <= 0.999 * lam_col, w, 0.0)

    if external_weights is not None:
        # external weights apply only inside the neighborhood; outside the
        # weight is exactly 0 so an unconditional multiply is equivalent
        w = w * external_weights[idx]

    total = _seqsum(w)
    ok = total > 0.0
    w = np.where(ok[:, None], w / np.where(ok, total, 1.0)[:, None], w)
    return w, idx, lam, total


def _apply_degree(w: np.ndarray, idx: np.ndarray, xs: np.ndarray, degree: int, data_len: int, lam: np.ndarray) -> np.ndarray:
    """Recast the weighted polynomial fit as a linear operator on the data by
    adjusting the (already normalized) weights.  Rows with lam == 0 (single
    usable point) stay a plain weighted average."""
    if degree == 0:
        return w
    linear_ok = lam > 0
    fidx = idx.astype(np.float64)
    range_ = float(data_len - 1)
    guard = 1.0e-6 * range_ * range_

    if degree == 1:
        x_mean = _seqsum(w * fidx)
        centered = fidx - x_mean[:, None]
        x2_mean = _seqsum(w * centered * centered)
        use = linear_ok & (x2_mean > guard)
        beta = np.where(use, (xs - x_mean) / np.where(use, x2_mean, 1.0), 0.0)
        return np.where(use[:, None], w * (1.0 + beta[:, None] * centered), w)

    # degree == 2: closed-form quadratic WLS via moments
    x1w = fidx * w
    x2w = fidx * x1w
    x3w = fidx * x2w
    x4w = fidx * x3w
    x1m = _seqsum(x1w)
    x2m = _seqsum(x2w)
    x3m = _seqsum(x3w)
    x4m = _seqsum(x4w)
    m2 = x2m - x1m * x1m
    m3 = x3m - x2m * x1m
    m4 = x4m - x2m * x2m
    den = m2 * m4 - m3 * m3
    use = linear_ok & (den > guard)
    den_safe = np.where(use, den, 1.0)
    beta2 = m4 / den_safe
    beta3 = m3 / den_safe
    beta4 = m2 / den_safe
    x1 = xs - x1m
    x2 = xs * xs - x2m
    a1 = beta2 * x1 - beta3 * x2
    a2 = beta4 * x2 - beta3 * x1
    adj = 1.0 + a1[:, None] * (fidx - x1m[:, None]) + a2[:, None] * (fidx * fidx - x2m[:, None])
    return np.where(use[:, None], w * adj, w)


def smooth_at_points(
    data: np.ndarray,
    xs: np.ndarray,
    lefts: np.ndarray,
    window_len: int,
    width: int,
    degree: int,
    external_weights: np.ndarray | None = None,
):
    """LOESS-evaluate ``data`` at positions ``xs`` (may be fractional or
    outside [0, n)) using windows [lefts, lefts+window_len-1].

    Returns (ys, ok) — rows with ok False had zero total weight and the
    caller must fall back to the raw value.
    """
    xs = np.asarray(xs, dtype=np.float64)
    lefts = np.asarray(lefts, dtype=np.int64)
    w, idx, lam, total = _neighborhood_weights(len(data), width, xs, lefts, window_len, external_weights)
    ok = total > 0.0
    w = _apply_degree(w, idx, xs, degree, len(data), lam)
    ys = _seqsum(w * data[idx])
    return ys, ok


def smooth_one_point(
    data: np.ndarray,
    x: float,
    left: int,
    right: int,
    width: int,
    degree: int,
    external_weights: np.ndarray | None = None,
):
    """Single-point LOESS evaluation/extrapolation; None when the window's
    total weight is zero (ref: LoessInterpolator.smoothOnePoint)."""
    ys, ok = smooth_at_points(
        data,
        np.array([x], dtype=np.float64),
        np.array([left], dtype=np.int64),
        int(right) - int(left) + 1,
        width,
        degree,
        external_weights,
    )
    return float(ys[0]) if ok[0] else None


def loess_smooth(
    data: np.ndarray,
    width: int,
    degree: int = 1,
    jump: int = 1,
    external_weights: np.ndarray | None = None,
) -> np.ndarray:
    """Smooth a full series, evaluating LOESS every ``jump`` points with
    linear interpolation in between (ref: LoessSmoother.smooth,
    main/stl/LoessSmoother.java:182-288, incl. the last-point rule :270-284).
    """
    data = np.asarray(data, dtype=np.float64)
    n = len(data)
    if n == 1:
        return data.copy()
    jump = min(jump, n - 1)

    window_len = min(width, n)
    half = (width + 1) // 2

    xs = np.arange(0, n, jump, dtype=np.int64)
    if width >= n:
        lefts = np.zeros(len(xs), dtype=np.int64)
    else:
        lefts = np.clip(xs - half + 1, 0, n - width)

    # The reference smooths the final point (when jump doesn't land on it)
    # reusing the window of the LAST evaluated point — replicate exactly.
    last = n - 1
    last_eval = int(xs[-1])
    tail = jump != 1 and last_eval != last
    if tail:
        xs_all = np.concatenate([xs, [last]])
        lefts_all = np.concatenate([lefts, lefts[-1:]])
    else:
        xs_all, lefts_all = xs, lefts

    ys, ok = smooth_at_points(data, xs_all, lefts_all, window_len, width, degree, external_weights)
    ys = np.where(ok, ys, data[xs_all])

    if jump == 1:
        return ys

    out = np.empty(n, dtype=np.float64)
    out[xs] = ys[: len(xs)]

    starts = np.arange(0, n - jump, jump, dtype=np.int64)
    if len(starts):
        offs = np.arange(1, jump, dtype=np.float64)
        slope = (out[starts + jump] - out[starts]) / float(jump)
        fill = out[starts][:, None] + slope[:, None] * offs[None, :]
        pos = starts[:, None] + np.arange(1, jump)[None, :]
        out[pos.ravel()] = fill.ravel()

    if tail:
        out[last] = ys[-1]
        if last_eval != last - 1:
            gap = last - last_eval
            slope = (out[last] - out[last_eval]) / gap
            js = np.arange(1, gap)
            out[last_eval + js] = out[last_eval] + slope * js

    return out

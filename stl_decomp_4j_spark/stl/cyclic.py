"""Cyclic sub-series smoothing: split a series into its ``period`` phase
sub-series, LOESS-smooth each, extrapolate beyond both ends, and re-interleave
into an extended series.
(ref: main/stl/CyclicSubSeriesSmoother.java:216-385)
"""
from __future__ import annotations

import numpy as np

from .loess import loess_smooth, smooth_one_point


def cyclic_subseries_smooth(
    data: np.ndarray,
    period: int,
    width: int,
    degree: int = 1,
    jump: int = 1,
    n_backward: int = 1,
    n_forward: int = 1,
    weights: np.ndarray | None = None,
) -> np.ndarray:
    """Smooth each phase sub-series (data[p::period]) and extrapolate
    ``n_backward``/``n_forward`` points past each end via end-window LOESS
    evaluation at x=-i and x=(len-1)+i; re-interleave into an array of length
    len(data) + (n_backward+n_forward)*period.

    Extrapolation evaluates the *raw* sub-series (with its external weights)
    over the leftmost/rightmost ``width`` points; a failed evaluation falls
    back to the nearest smoothed end value.
    """
    data = np.asarray(data, dtype=np.float64)
    n = len(data)
    out = np.empty(n + (n_backward + n_forward) * period, dtype=np.float64)

    for p in range(period):
        sub = np.ascontiguousarray(data[p::period])
        sub_w = np.ascontiguousarray(weights[p::period]) if weights is not None else None
        cl = len(sub)

        smoothed = loess_smooth(sub, width, degree, jump, external_weights=sub_w)
        ext = np.empty(n_backward + cl + n_forward, dtype=np.float64)
        ext[n_backward : n_backward + cl] = smoothed

        left = 0
        right = min(width - 1, cl - 1)
        for i in range(1, n_backward + 1):
            ys = smooth_one_point(sub, float(-i), left, right, width, degree, sub_w)
            ext[n_backward - i] = ext[n_backward] if ys is None else ys

        right = cl - 1
        left = max(0, right - width + 1)
        for i in range(1, n_forward + 1):
            ys = smooth_one_point(sub, float(right + i), left, right, width, degree, sub_w)
            ext[n_backward + right + i] = ext[n_backward + right] if ys is None else ys

        out[p::period] = ext

    return out

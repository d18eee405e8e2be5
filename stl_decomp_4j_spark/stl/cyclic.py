"""Cyclic sub-series smoothing: split a series into its ``period`` phase
sub-series, LOESS-smooth each, extrapolate beyond both ends, and re-interleave
into an extended series.
(ref: main/stl/CyclicSubSeriesSmoother.java:216-385)

All sub-series of one length class (lengths are m+1 for the first n%period
phases, m for the rest) are processed in ONE batched kernel call — main
smoothing and both extrapolation directions — so the cost is a handful of
2-D NumPy ops regardless of the period.  Row-batching is bit-exact vs the
per-sub-series loop.
"""
from __future__ import annotations

import numpy as np

from .loess import loess_smooth_batch, smooth_windows


def _extrapolate(
    D: np.ndarray,
    W: np.ndarray | None,
    width: int,
    degree: int,
    count: int,
    forward: bool,
):
    """Batched end-window extrapolation for G same-length sub-series.

    Backward evaluates x=-1..-count over window [0, min(width,cl)-1];
    forward evaluates x=cl..cl+count-1 over [max(0,cl-width), cl-1].
    Returns (G, count) values with NaN where the evaluation failed (caller
    substitutes the smoothed end value, as the reference does).
    """
    G, cl = D.shape
    Lw = min(width, cl)
    left = cl - Lw if forward else 0
    if forward:
        xs1 = np.arange(cl, cl + count, dtype=np.float64)  # right+i, i=1..count
    else:
        xs1 = -np.arange(1.0, count + 1.0)                 # -i
    vals = np.broadcast_to(D[:, left : left + Lw, None], (G, Lw, count)).transpose(0, 2, 1).reshape(G * count, Lw)
    ext = None
    if W is not None:
        ext = np.broadcast_to(W[:, left : left + Lw, None], (G, Lw, count)).transpose(0, 2, 1).reshape(G * count, Lw)
    xs = np.tile(xs1, G)
    lefts = np.full(G * count, left, dtype=np.int64)
    ys, ok = smooth_windows(vals, xs, lefts, width, degree, cl, ext)
    ys = np.where(ok, ys, np.nan)
    return ys.reshape(G, count)


def _smooth_class(
    data: np.ndarray,
    weights: np.ndarray | None,
    phases: np.ndarray,
    cl: int,
    period: int,
    width: int,
    degree: int,
    jump: int,
    n_backward: int,
    n_forward: int,
):
    """Smooth+extrapolate all phase sub-series of one length class.
    Returns (G, n_backward + cl + n_forward)."""
    idx = phases[:, None] + period * np.arange(cl)[None, :]
    D = data[idx]
    W = weights[idx] if weights is not None else None

    smoothed = loess_smooth_batch(D, width, degree, jump, W)
    G = len(phases)
    ext = np.empty((G, n_backward + cl + n_forward))
    ext[:, n_backward : n_backward + cl] = smoothed

    if n_backward > 0:
        back = _extrapolate(D, W, width, degree, n_backward, forward=False)
        # back[:, i-1] is x=-i -> position n_backward - i; failed -> smoothed[0]
        for i in range(1, n_backward + 1):
            col = back[:, i - 1]
            ext[:, n_backward - i] = np.where(np.isnan(col), ext[:, n_backward], col)
    if n_forward > 0:
        fwd = _extrapolate(D, W, width, degree, n_forward, forward=True)
        for i in range(1, n_forward + 1):
            col = fwd[:, i - 1]
            ext[:, n_backward + cl - 1 + i] = np.where(np.isnan(col), ext[:, n_backward + cl - 1], col)
    return ext


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
    m, r = divmod(n, period)
    out = np.empty(n + (n_backward + n_forward) * period, dtype=np.float64)

    for phases, cl in (
        (np.arange(r, dtype=np.int64), m + 1),
        (np.arange(r, period, dtype=np.int64), m),
    ):
        if len(phases) == 0:
            continue
        ext = _smooth_class(
            data, weights, phases, cl, period, width, degree, jump, n_backward, n_forward
        )
        tgt = phases[:, None] + period * np.arange(n_backward + cl + n_forward)[None, :]
        out[tgt] = ext

    return out

"""O(n) simple moving average, bit-compatible with the reference's rolling
incremental window sum (ref: main/TimeSeriesUtilities.java:17-57).

The output has length n - window + 1.  np.cumsum accumulates sequentially, so
seeding it with the initial window sum followed by the per-step deltas
reproduces the reference's exact floating-point operation order.
"""
from __future__ import annotations

import numpy as np


def simple_moving_average(data: np.ndarray, window: int) -> np.ndarray:
    data = np.asarray(data, dtype=np.float64)
    n = len(data)
    if window > n:
        raise ValueError("simpleMovingAverage: window larger than data")
    s0 = np.cumsum(data[:window])[-1]
    if n == window:
        return np.array([s0 / window])
    deltas = data[window:] - data[: n - window]
    sums = np.cumsum(np.concatenate(([s0], deltas)))
    return sums / window

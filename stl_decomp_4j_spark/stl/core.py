"""STL decomposition driver: the inner seasonal/lowpass/trend loop with outer
bisquare robustness reweighting.
(ref: main/stl/SeasonalTrendLoess.java:635-862)

This is pure NumPy and runs per-series; Spark distributes it across url
groups via ``applyInPandas`` (see operators/stl_udf.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .cyclic import cyclic_subseries_smooth
from .loess import loess_smooth
from .settings import StlConfig, build_stl_config
from .sma import simple_moving_average


@dataclass
class Decomposition:
    data: np.ndarray
    trend: np.ndarray
    seasonal: np.ndarray
    residual: np.ndarray
    weights: np.ndarray

    def smooth_seasonal(self, width: int, restore_end_points: bool = True) -> None:
        """Post-hoc quadratic LOESS smoothing of the seasonal component with
        residual recompute (ref: main/stl/SeasonalTrendLoess.java:686-735)."""
        width = max(3, int(width))
        if width % 2 == 0:
            width += 1
        smoothed = loess_smooth(self.seasonal, width, degree=2, jump=1)
        s0 = self.seasonal[0]
        s_n = self.seasonal[-1]
        self.seasonal = smoothed
        if restore_end_points:
            self.seasonal[0] = s0
            self.seasonal[-1] = s_n
        self.residual = self.data - self.trend - self.seasonal


def _residual_weights(data: np.ndarray, seasonal: np.ndarray, trend: np.ndarray) -> np.ndarray:
    """Bisquare robustness weights from 6*MAD of the absolute residuals, with
    the two-middle-element median (ref: SeasonalTrendLoess.java:643-679)."""
    r = np.abs(data - seasonal - trend)
    srt = np.sort(r)
    n = len(data)
    mi0 = (n + 1) // 2 - 1
    mi1 = n - mi0 - 1
    six_mad = 3.0 * (srt[mi0] + srt[mi1])
    c999 = 0.999 * six_mad
    c001 = 0.001 * six_mad
    h = np.divide(r, six_mad, out=np.zeros_like(r), where=six_mad > 0)
    w = 1.0 - h * h
    w = w * w
    w = np.where(r <= c999, w, 0.0)
    w = np.where(r <= c001, 1.0, w)
    return w


def stl_decompose(data: np.ndarray, config: StlConfig) -> Decomposition:
    """Run the STL inner/outer iteration on one series."""
    y = np.asarray(data, dtype=np.float64)
    n = len(y)
    period = config.period

    trend = np.zeros(n)
    seasonal = np.zeros(n)
    weights = np.ones(n)

    outer = 0
    while True:
        use_rw = outer > 0
        rw = weights if use_rw else None
        for _ in range(config.inner_iterations):
            # seasonal: smooth the detrended cyclic sub-series, extrapolating
            # one period beyond each end
            detrend = y - trend
            extended = cyclic_subseries_smooth(
                detrend,
                period,
                config.seasonal.width,
                config.seasonal.degree,
                config.seasonal.jump,
                n_backward=1,
                n_forward=1,
                weights=rw,
            )
            # lowpass: 2x SMA(period) + SMA(3) erode the extension back to n,
            # then LOESS removes what seasonal smoothing leaked into the mean
            pass1 = simple_moving_average(extended, period)
            pass2 = simple_moving_average(pass1, period)
            pass3 = simple_moving_average(pass2, 3)
            deseasonalized = loess_smooth(
                pass3, config.lowpass.width, config.lowpass.degree, config.lowpass.jump
            )
            seasonal = extended[period : period + n] - deseasonalized
            # trend: LOESS of the deseasonalized data
            trend = loess_smooth(
                y - seasonal,
                config.trend.width,
                config.trend.degree,
                config.trend.jump,
                external_weights=rw,
            )

        outer += 1
        if outer > config.outer_iterations:
            break
        weights = _residual_weights(y, seasonal, trend)

    residual = y - seasonal - trend
    return Decomposition(data=y, trend=trend, seasonal=seasonal, residual=residual, weights=weights)


def decompose(
    data: np.ndarray,
    period: int,
    **kwargs,
) -> Decomposition:
    """Convenience: derive the config for this series length and decompose."""
    config = build_stl_config(len(data), period, **kwargs)
    return stl_decompose(data, config)


def periodic_decomposition(data: np.ndarray, period: int) -> Decomposition:
    """Diagnostic strictly-periodic non-robust decomposition
    (ref: SeasonalTrendLoess.java:494-514)."""
    return decompose(data, period, periodic=True, inner_iterations=1, outer_iterations=0)


def robust_periodic_decomposition(data: np.ndarray, period: int) -> Decomposition:
    """Diagnostic strictly-periodic robust decomposition
    (ref: SeasonalTrendLoess.java:525-545)."""
    return decompose(data, period, periodic=True, inner_iterations=1, outer_iterations=1)

"""Loess settings normalization and STL configuration derivation.

Semantics match the reference library (parity-critical — the width/jump
rounding changes results, not just speed):
  - width -> odd, min 3; default jump = max(1, int(0.1*width + 0.9)) computed
    AFTER width normalization; explicit jump floored at 1; degree clamped to
    [0, 2].  (ref: main/stl/LoessSettings.java:27-71)
  - builder defaults: ni=2/no=0 non-robust, ni=1/no=15 robust; periodic =>
    seasonal width 100*n, degree 0; flat/linear trend => width 100*period*n,
    degree 0/1; default trend width from the STL paper's stability formula;
    default lowpass width = period.  (ref: main/stl/SeasonalTrendLoess.java:41-433)
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LoessSpec:
    width: int
    degree: int
    jump: int

    def __str__(self) -> str:
        return f"[width = {self.width}, degree = {self.degree}, jump = {self.jump}]"


def loess_spec(width: int, degree: int = 1, jump: int | None = None) -> LoessSpec:
    """Normalize a (width, degree, jump) triple the way the reference does."""
    width = max(3, int(width))
    if width % 2 == 0:
        width += 1
    if jump is None:
        jump = max(1, int(0.1 * width + 0.9))
    else:
        jump = max(1, int(jump))
    degree = max(0, min(2, int(degree)))
    return LoessSpec(width, degree, jump)


@dataclass(frozen=True)
class StlConfig:
    period: int
    seasonal: LoessSpec
    trend: LoessSpec
    lowpass: LoessSpec
    inner_iterations: int
    outer_iterations: int


def build_stl_config(
    n: int,
    period: int,
    seasonal_width: int | None = None,
    seasonal_degree: int | None = None,
    seasonal_jump: int | None = None,
    trend_width: int | None = None,
    trend_degree: int | None = None,
    trend_jump: int | None = None,
    lowpass_width: int | None = None,
    lowpass_degree: int = 1,
    lowpass_jump: int | None = None,
    inner_iterations: int = 2,
    outer_iterations: int = 0,
    robust: bool | None = None,
    periodic: bool = False,
    flat_trend: bool = False,
    linear_trend: bool = False,
) -> StlConfig:
    """Derive the full STL configuration for a series of length ``n``.

    Mirrors SeasonalTrendLoess.Builder.buildSmoother + sanityCheck
    (ref: main/stl/SeasonalTrendLoess.java:305-433).
    """
    if period is None:
        raise ValueError("StlConfig: Period Length must be specified")
    if period < 2:
        raise ValueError("periodicity must be at least 2")
    if n < 2 * period:
        raise ValueError("StlConfig: Data series must be at least 2 * periodicity in length")

    if robust is not None:
        inner_iterations = 1 if robust else 2
        outer_iterations = 15 if robust else 0

    if periodic:
        massive = 100 * n
        consistent = (
            seasonal_degree is not None
            and seasonal_width is not None
            and seasonal_width == massive
            and seasonal_degree == 0
        )
        if seasonal_width is not None and not consistent:
            raise ValueError("StlConfig: seasonal_width and periodic cannot both be set")
        if seasonal_degree is not None and not consistent:
            raise ValueError("StlConfig: seasonal_degree and periodic cannot both be set")
        if seasonal_jump is not None:
            raise ValueError("StlConfig: seasonal_jump and periodic cannot both be set")
        seasonal_width = massive
        seasonal_degree = 0
    else:
        if seasonal_width is None:
            raise ValueError("StlConfig: seasonal_width or periodic must be set")
        if seasonal_degree is None:
            seasonal_degree = 1

    seasonal = loess_spec(seasonal_width, seasonal_degree, seasonal_jump)

    if flat_trend or linear_trend:
        massive = 100 * period * n
        want_degree = 0 if flat_trend else 1
        consistent = (
            trend_width is not None
            and trend_degree is not None
            and trend_width == massive
            and trend_degree == want_degree
        )
        kind = "flat" if flat_trend else "linear"
        if trend_width is not None and not consistent:
            raise ValueError(f"StlConfig: trend_width incompatible with {kind} trend")
        if trend_degree is not None and not consistent:
            raise ValueError(f"StlConfig: trend_degree incompatible with {kind} trend")
        if trend_jump is not None:
            raise ValueError(f"StlConfig: trend_jump incompatible with {kind} trend")
        trend_width = massive
        trend_degree = want_degree
    elif trend_degree is None:
        trend_degree = 1

    if trend_width is None:
        # Stability-analysis default from the original STL paper; uses the RAW
        # (pre-normalization) seasonal width, as the reference does.
        trend_width = int(1.5 * period / (1 - 1.5 / seasonal_width) + 0.5)

    trend = loess_spec(trend_width, trend_degree, trend_jump)

    if lowpass_width is None:
        lowpass_width = period
    lowpass = loess_spec(lowpass_width, lowpass_degree, lowpass_jump)

    return StlConfig(
        period=period,
        seasonal=seasonal,
        trend=trend,
        lowpass=lowpass,
        inner_iterations=inner_iterations,
        outer_iterations=outer_iterations,
    )

"""Per-decomposition fit statistics (ref: main/stl/StlFitStats.java:32-318)."""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .core import Decomposition


@dataclass(frozen=True)
class StlFitStats:
    sample_size: int
    data_mean: float
    data_variance: float
    trend_mean: float
    trend_range: float
    seasonal_mean: float
    seasonal_variance: float
    seasonal_range: float
    residual_mean: float
    residual_variance: float
    de_seasonal_mean: float
    de_seasonal_variance: float
    de_trend_mean: float
    de_trend_variance: float
    residual_var_mle: float
    residual_log_likelihood: float

    @property
    def data_std_dev(self) -> float:
        return math.sqrt(self.data_variance)

    @property
    def seasonal_std_dev(self) -> float:
        return math.sqrt(self.seasonal_variance)

    @property
    def residual_std_dev(self) -> float:
        return math.sqrt(self.residual_variance)

    @property
    def estimated_variance_of_residual_sample_variance(self) -> float:
        v = self.residual_variance
        return 2.0 * v * v / (self.sample_size - 1)

    @property
    def trendiness_z_score(self) -> float:
        rvv = self.estimated_variance_of_residual_sample_variance
        return (self.de_seasonal_variance - self.residual_variance) / math.sqrt(max(1.0e-12, rvv))

    @property
    def seasonal_z_score(self) -> float:
        rvv = self.estimated_variance_of_residual_sample_variance
        return (self.de_trend_variance - self.residual_variance) / math.sqrt(max(1.0e-12, rvv))

    def residual_log_likelihood_at(self, sigma: float) -> float:
        var = sigma * sigma
        return -0.5 * self.sample_size * (self.residual_var_mle / var + math.log(2 * math.pi * var))

    def __str__(self) -> str:
        """Reference-format report (ref: main/stl/StlFitStats.java:321-349,
        Java '%10f' fields — width 10, 6 decimals)."""
        fields = [
            ("Data Mean           ", self.data_mean),
            ("Data Variance       ", self.data_variance),
            ("Trend Mean          ", self.trend_mean),
            ("Trend Range         ", self.trend_range),
            ("Seasonal Mean       ", self.seasonal_mean),
            ("Seasonal Variance   ", self.seasonal_variance),
            ("Seasonal Range      ", self.seasonal_range),
            ("De-Seasonal Mean    ", self.de_seasonal_mean),
            ("De-Seasonal Variance", self.de_seasonal_variance),
            ("De-Trend Mean       ", self.de_trend_mean),
            ("De-Trend Variance   ", self.de_trend_variance),
            ("Residual Mean       ", self.residual_mean),
            ("Residual Variance   ", self.residual_variance),
            ("Var(ResSampleVar)   ", self.estimated_variance_of_residual_sample_variance),
            ("Trend Test ZScore   ", self.trendiness_z_score),
            ("Seasonal Test ZScore", self.seasonal_z_score),
            ("SeasonalVar/ResidVar", self.seasonal_variance / self.residual_variance),
        ]
        return "\n".join(f"{name} = {value:10f}" for name, value in fields)


def _mean_var(x: np.ndarray, n: int):
    """Mean and Bessel-corrected variance via the reference's sum-of-squares
    formula (var = sq/(n-1) - mean^2 * n/(n-1))."""
    mean = float(np.sum(x)) / n
    sq = float(np.sum(x * x))
    corr = n / (n - 1.0)
    return mean, sq / (n - 1.0) - mean * mean * corr


def stl_fit_stats(d: Decomposition) -> StlFitStats:
    n = len(d.data)
    data_mean, data_var = _mean_var(d.data, n)
    seas_mean, seas_var = _mean_var(d.seasonal, n)
    res_mean, res_var = _mean_var(d.residual, n)
    deseas_mean, deseas_var = _mean_var(d.data - d.seasonal, n)
    detrend_mean, detrend_var = _mean_var(d.data - d.trend, n)
    trend_mean = float(np.sum(d.trend)) / n
    trend_range = float(np.max(d.trend) - np.min(d.trend))
    seas_range = float(np.max(d.seasonal) - np.min(d.seasonal))
    res_var_mle = float(np.sum(d.residual * d.residual)) / n
    log_l = -0.5 * n * (1 + math.log(2 * math.pi * res_var_mle))
    return StlFitStats(
        sample_size=n,
        data_mean=data_mean,
        data_variance=data_var,
        trend_mean=trend_mean,
        trend_range=trend_range,
        seasonal_mean=seas_mean,
        seasonal_variance=seas_var,
        seasonal_range=seas_range,
        residual_mean=res_mean,
        residual_variance=res_var,
        de_seasonal_mean=deseas_mean,
        de_seasonal_variance=deseas_var,
        de_trend_mean=detrend_mean,
        de_trend_variance=detrend_var,
        residual_var_mle=res_var_mle,
        residual_log_likelihood=log_l,
    )

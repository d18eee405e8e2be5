from .core import (
    Decomposition,
    decompose,
    periodic_decomposition,
    robust_periodic_decomposition,
    stl_decompose,
)
from .cyclic import cyclic_subseries_smooth
from .loess import loess_smooth, smooth_one_point
from .settings import LoessSpec, StlConfig, build_stl_config, loess_spec
from .sma import simple_moving_average
from .stats import StlFitStats, stl_fit_stats

__all__ = [
    "Decomposition",
    "LoessSpec",
    "StlConfig",
    "StlFitStats",
    "build_stl_config",
    "cyclic_subseries_smooth",
    "decompose",
    "loess_smooth",
    "loess_spec",
    "periodic_decomposition",
    "robust_periodic_decomposition",
    "simple_moving_average",
    "smooth_one_point",
    "stl_decompose",
    "stl_fit_stats",
]

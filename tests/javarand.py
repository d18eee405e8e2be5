"""Exact replica of java.util.Random (48-bit LCG, documented algorithm) plus
nextGaussian (Marsaglia polar method with cached second deviate), used to
reproduce the reference test-data generator
(test/stl/StlTestDataGenerator.java:59-73) for the mirrored statistical
suites.  Validated against a javac-compiled probe in
tests/test_fit_stats_mirror.py::test_java_random_replica (pinned values
captured from a real java.util.Random run on this machine).

Note: Java's nextGaussian uses StrictMath.log/sqrt (fdlibm); Python's libm
may differ in the last ulp on some inputs, which perturbs generated data by
~1e-16 relative — irrelevant to the mirrored tests' 1e-11/statistical
tolerances.
"""
from __future__ import annotations

import math

_MULT = 0x5DEECE66D
_ADD = 0xB
_MASK = (1 << 48) - 1


class JavaRandom:
    def __init__(self, seed: int) -> None:
        self._seed = (seed ^ _MULT) & _MASK
        self._next_gaussian: float | None = None

    def _next(self, bits: int) -> int:
        self._seed = (self._seed * _MULT + _ADD) & _MASK
        return self._seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * 2.0**-53

    def next_gaussian(self) -> float:
        if self._next_gaussian is not None:
            g = self._next_gaussian
            self._next_gaussian = None
            return g
        while True:
            v1 = 2.0 * self.next_double() - 1.0
            v2 = 2.0 * self.next_double() - 1.0
            s = v1 * v1 + v2 * v2
            if not (s >= 1.0 or s == 0.0):
                break
        multiplier = math.sqrt(-2.0 * math.log(s) / s)
        self._next_gaussian = v2 * multiplier
        return v1 * multiplier


def create_noisy_seasonal_data(
    length: int,
    period: int,
    seasonal_amplitude: float,
    trend_slope: float,
    noise_sigma: float,
    seed: int,
):
    """Twin of StlTestDataGenerator.createNoisySeasonalData (exact op order:
    y = slope*x + amplitude*sin(x) + sigma*nextGaussian, x = i*2*pi/period)."""
    import numpy as np

    rand = JavaRandom(seed)
    dx = 2.0 * math.pi / period
    y = np.empty(length)
    for i in range(length):
        x = i * dx
        e = noise_sigma * rand.next_gaussian()
        y[i] = trend_slope * x + seasonal_amplitude * math.sin(x) + e
    return y

"""Cell-size <-> level metrics (quadratic projection values only).

Constants and semantics of reference s2/metric.go:28-155.  Used to pick
join/tile/kNN levels from target sizes on the sphere (radians).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

MAX_LEVEL = 30


@dataclass(frozen=True)
class Metric:
    dim: int
    deriv: float

    def value(self, level: int) -> float:
        """s2/metric.go:109-112."""
        return math.ldexp(self.deriv, -self.dim * level)

    def min_level(self, val: float) -> int:
        """Minimum level such that the metric is at most ``val``.

        s2/metric.go:116-129.
        """
        if val < 0:
            return MAX_LEVEL
        if val == 0:
            return MAX_LEVEL
        level = -(_ilogb(val / self.deriv) >> (self.dim - 1))
        return max(0, min(MAX_LEVEL, level))

    def max_level(self, val: float) -> int:
        """Maximum level such that the metric is at least ``val``.

        s2/metric.go:133-146.
        """
        if val <= 0:
            return MAX_LEVEL
        level = _ilogb(self.deriv / val) >> (self.dim - 1)
        return max(0, min(MAX_LEVEL, level))

    def closest_level(self, val: float) -> int:
        """s2/metric.go:149-155."""
        x = 2.0 if self.dim == 2 else math.sqrt(2.0)
        return self.min_level(x * val)


def _ilogb(v: float) -> int:
    m, e = math.frexp(v)
    return e - 1


_SQRT2 = math.sqrt(2.0)

# s2/metric.go:45-106 (quadratic projection)
MIN_ANGLE_SPAN = Metric(1, 4.0 / 3)
AVG_ANGLE_SPAN = Metric(1, math.pi / 2)
MAX_ANGLE_SPAN = Metric(1, 1.704897179199218452)

MIN_WIDTH = Metric(1, 2 * _SQRT2 / 3)
AVG_WIDTH = Metric(1, 1.434523672886099389)
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)

MIN_EDGE = Metric(1, 2 * _SQRT2 / 3)
AVG_EDGE = Metric(1, 1.459213746386106062)
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)

MIN_DIAG = Metric(1, 8 * _SQRT2 / 9)
AVG_DIAG = Metric(1, 2.060422738998471683)
MAX_DIAG = Metric(1, 2.438654594434021032)

MIN_AREA = Metric(2, 8 * _SQRT2 / 9)
AVG_AREA = Metric(2, 4 * math.pi / 6)
MAX_AREA = Metric(2, 2.635799256963161491)

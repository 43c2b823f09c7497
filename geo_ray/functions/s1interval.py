"""S1Interval: closed intervals on the unit circle (longitude
intervals), wrap-aware.

Semantics of reference s1/interval.go: both endpoints in [-pi, pi];
lo > hi encodes wrap; empty is (pi, -pi), full is (-pi, pi); -pi is
normalized to pi except for the full/empty sentinels.
"""

from __future__ import annotations

import math
from typing import Tuple

PI = math.pi


def empty() -> Tuple[float, float]:
    return (PI, -PI)


def full() -> Tuple[float, float]:
    return (-PI, PI)


def is_empty(i) -> bool:
    return i[0] == PI and i[1] == -PI


def is_full(i) -> bool:
    return i[0] == -PI and i[1] == PI


def is_inverted(i) -> bool:
    return i[0] > i[1]


def _positive_distance(a: float, b: float) -> float:
    """Distance from a to b in the CCW direction, in [0, 2*pi)."""
    d = b - a
    if d >= 0:
        return d
    return (b + PI) - (a - PI)


def length(i) -> float:
    l = i[1] - i[0]
    if l >= 0:
        return l
    l += 2 * PI
    return l if l > 0 else -1.0


def fast_contains(i, p: float) -> bool:
    if is_inverted(i):
        return (p >= i[0] or p <= i[1]) and not is_empty(i)
    return i[0] <= p <= i[1]


def contains(i, p: float) -> bool:
    if p == -PI:
        p = PI
    return fast_contains(i, p)


def contains_interval(i, o) -> bool:
    """s1/interval.go ContainsInterval."""
    if is_inverted(i):
        if is_inverted(o):
            return o[0] >= i[0] and o[1] <= i[1]
        return (o[0] >= i[0] or o[1] <= i[1]) and not is_empty(i)
    if is_inverted(o):
        return is_full(i) or is_empty(o)
    return o[0] >= i[0] and o[1] <= i[1]


def from_point_pair(a: float, b: float) -> Tuple[float, float]:
    """Minimal interval containing both points (s1/interval.go:53-63)."""
    if a == -PI:
        a = PI
    if b == -PI:
        b = PI
    if _positive_distance(a, b) <= PI:
        return (a, b)
    return (b, a)


def add_point(i, p: float) -> Tuple[float, float]:
    """s1/interval.go AddPoint."""
    if abs(p) > PI:
        return i
    if p == -PI:
        p = PI
    if fast_contains(i, p):
        return i
    if is_empty(i):
        return (p, p)
    if _positive_distance(p, i[0]) < _positive_distance(i[1], p):
        return (p, i[1])
    return (i[0], p)


def union(i, o) -> Tuple[float, float]:
    """s1/interval.go Union."""
    if is_empty(o):
        return i
    if fast_contains(i, o[0]):
        if fast_contains(i, o[1]):
            if contains_interval(i, o):
                return i
            return full()
        return (i[0], o[1])
    if fast_contains(i, o[1]):
        return (o[0], i[1])
    if is_empty(i) or fast_contains(o, i[0]):
        return o
    dlo = _positive_distance(o[1], i[0])
    dhi = _positive_distance(i[1], o[0])
    if dlo < dhi:
        return (o[0], i[1])
    return (i[0], o[1])


def intersects(i, o) -> bool:
    if is_empty(i) or is_empty(o):
        return False
    if is_inverted(i):
        return is_inverted(o) or o[0] <= i[1] or o[1] >= i[0]
    if is_inverted(o):
        return o[0] <= i[1] or o[1] >= i[0]
    return o[0] <= i[1] and o[1] >= i[0]


def from_endpoints(lo: float, hi: float) -> Tuple[float, float]:
    """Directed interval with the given endpoints; -pi normalized to pi
    unless forming full/empty (s1/interval.go IntervalFromEndpoints)."""
    if lo == -PI and hi != PI:
        lo = PI
    if hi == -PI and lo != PI:
        hi = PI
    return (lo, hi)


def center(i) -> float:
    """Midpoint, wrap-aware (s1/interval.go Center)."""
    c = 0.5 * (i[0] + i[1])
    if not is_inverted(i):
        return c
    if c <= 0:
        return c + PI
    return c - PI


def complement(i) -> Tuple[float, float]:
    if i[0] == i[1]:
        return full()
    return (i[1], i[0])


def complement_center(i) -> float:
    """s1/interval.go ComplementCenter."""
    if i[0] != i[1]:
        return center(complement(i))
    return i[1]


def directed_hausdorff(i, y) -> float:
    """max over p in i of min distance to y, along S1
    (s1/interval.go:416-448)."""
    if contains_interval(y, i):
        return 0.0  # includes empty i
    if is_empty(y):
        return PI
    y_cc = complement_center(y)
    if contains(i, y_cc):
        return _positive_distance(y[1], y_cc)
    hi_hi = 0.0
    if contains(from_endpoints(y[1], y_cc), i[1]):
        hi_hi = _positive_distance(y[1], i[1])
    lo_lo = 0.0
    if contains(from_endpoints(y_cc, y[0]), i[0]):
        lo_lo = _positive_distance(i[0], y[0])
    return max(hi_hi, lo_lo)

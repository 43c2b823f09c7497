"""Exact RectBounder: conservative lat/lng bound of an edge chain.

Faithful port of the semantics of reference s2/rect_bounder.go:36-230:
edge latitude extrema via the robust normal N = (A-B)x(A+B) with the
documented error ladder (nearly-identical / nearly-antipodal
fallbacks, m-projection sign tests with mError, the latitude budget),
and the final bound expanded by 2*eps in latitude with polar closure.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from ..functions import s1interval as s1

EPS = 2.220446049250313e-16  # machineEpsilon64


class RectBounder:
    def __init__(self):
        self.a = None          # previous vertex (np array)
        self.a_lat = 0.0
        self.a_lng = 0.0
        # bound: lat interval [lo, hi] (empty: lo > hi), lng s1 interval
        self.lat = (1.0, -1.0)
        self.lng = s1.empty()

    def add_point(self, b) -> None:
        b = np.asarray(b, dtype=np.float64)
        b_lat = math.asin(max(-1.0, min(1.0, b[2])))
        b_lng = math.atan2(b[1], b[0])

        if self.lat[0] > self.lat[1]:  # empty
            self.a = b
            self.a_lat, self.a_lng = b_lat, b_lng
            self.lat = (b_lat, b_lat)
            self.lng = s1.add_point(self.lng, b_lng)
            return

        a = self.a
        # N = 2 * (A x B), computed robustly
        n = np.cross(a - b, a + b)
        n_norm = float(np.linalg.norm(n))
        if n_norm < 1.91346e-15:
            # nearly identical or nearly antipodal
            if float(a @ b) < 0:
                self.lat = (-math.pi / 2, math.pi / 2)
                self.lng = s1.full()
            else:
                self.lat = (min(self.lat[0], min(self.a_lat, b_lat)),
                            max(self.lat[1], max(self.a_lat, b_lat)))
                self.lng = s1.union(self.lng,
                                    s1.from_point_pair(self.a_lng, b_lng))
            self.a = b
            self.a_lat, self.a_lng = b_lat, b_lng
            return

        # longitude range spanned by AB
        lng_ab = s1.add_point(s1.add_point(s1.empty(), self.a_lng), b_lng)
        if s1.length(lng_ab) >= math.pi - 2 * EPS:
            lng_ab = s1.full()

        lat_lo = min(self.a_lat, b_lat)
        lat_hi = max(self.a_lat, b_lat)

        m = np.cross(n, np.array([0.0, 0.0, 1.0]))
        m_a = float(m @ a)
        m_b = float(m @ b)
        m_error = 6.06638e-16 * n_norm + 6.83174e-31
        if m_a * m_b < 0 or abs(m_a) <= m_error or abs(m_b) <= m_error:
            # min/max latitude may occur in the edge interior
            max_lat = min(math.atan2(math.sqrt(n[0] ** 2 + n[1] ** 2),
                                     abs(n[2])) + 3 * EPS, math.pi / 2)
            lat_budget = 2 * math.asin(min(1.0, 0.5 * float(
                np.linalg.norm(a - b)) * math.sin(max_lat)))
            max_delta = 0.5 * (lat_budget - (lat_hi - lat_lo)) + EPS
            if m_a <= m_error and m_b >= -m_error:
                lat_hi = min(max_lat, lat_hi + max_delta)
            if m_b <= m_error and m_a >= -m_error:
                lat_lo = max(-max_lat, lat_lo - max_delta)

        self.a = b
        self.a_lat, self.a_lng = b_lat, b_lng
        self.lat = (min(self.lat[0], lat_lo), max(self.lat[1], lat_hi))
        self.lng = s1.union(self.lng, lng_ab)

    def rect_bound(self) -> Tuple[float, float, float, float]:
        """(lat_lo, lat_hi, lng_lo, lng_hi) radians; expanded by 2*eps
        in latitude with polar closure (s2/rect_bounder.go:199-205)."""
        lat_lo = max(-math.pi / 2, self.lat[0] - 2 * EPS)
        lat_hi = min(math.pi / 2, self.lat[1] + 2 * EPS)
        lng_lo, lng_hi = self.lng
        # polar closure: touching a pole forces the full lng interval
        if lat_lo == -math.pi / 2 or lat_hi == math.pi / 2:
            lng_lo, lng_hi = -math.pi, math.pi
        return (lat_lo, lat_hi, lng_lo, lng_hi)


def rect_bound_of_chain(vertices) -> Tuple[float, float, float, float]:
    """Bound of a CLOSED chain (loop): feeds every vertex plus the
    closing edge."""
    rb = RectBounder()
    for v in vertices:
        rb.add_point(v)
    if len(vertices) > 1:
        rb.add_point(vertices[0])
    return rb.rect_bound()

"""Point/triangle measures: areas, angles, centroids (vectorized).

Semantics of reference s2/point_measures.go:33-150 and
s2/centroids.go:61-140.
"""

from __future__ import annotations

import math

import numpy as np


def angle_between(a, b):
    """Stable angle between unit vectors (s1.Angle)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cr = np.cross(a, b)
    return np.arctan2(np.sqrt(np.einsum("...i,...i->...", cr, cr)),
                      np.einsum("...i,...i->...", a, b))


def point_area(a, b, c):
    """Triangle area via l'Huilier's formula, stable for small
    triangles (s2/point_measures.go:33-76)."""
    sa = angle_between(b, c)
    sb = angle_between(c, a)
    sc = angle_between(a, b)
    s = 0.5 * (sa + sb + sc)
    big = np.maximum.reduce([sa, sb, sc])
    with np.errstate(invalid="ignore"):
        out = 4 * np.arctan(np.sqrt(np.maximum(0.0,
            np.tan(0.5 * s) * np.tan(0.5 * (s - sa)) *
            np.tan(0.5 * (s - sb)) * np.tan(0.5 * (s - sc)))))
    # fall back to Girard for very large triangles (numerical validity)
    girard_needed = big > math.pi - 1e-5
    if np.any(girard_needed):
        g = girard_area(a, b, c)
        out = np.where(girard_needed, g, out)
    return out


def girard_area(a, b, c):
    """Girard's formula: sum of angles - pi (s2/point_measures.go:79-105)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    ab = np.cross(a, b)
    bc = np.cross(b, c)
    ac = np.cross(a, c)
    def _ang(u, v):
        cr = np.cross(u, v)
        return np.arctan2(np.sqrt(np.einsum("...i,...i->...", cr, cr)),
                          np.einsum("...i,...i->...", u, v))
    area = _ang(ab, ac) - _ang(ab, bc) + _ang(ac, bc)
    return np.maximum(0.0, area)


def signed_area(a, b, c):
    """Positive for CCW triangles (s2/point_measures.go:108-112)."""
    from .predicates import robust_sign
    area = point_area(a, b, c)
    s = robust_sign(tuple(np.asarray(a, dtype=float)),
                    tuple(np.asarray(b, dtype=float)),
                    tuple(np.asarray(c, dtype=float)))
    return area * (1.0 if s > 0 else -1.0)


def turn_angle(a, b, c):
    """Exterior angle at b walking a->b->c, CCW positive
    (s2/point_measures.go:124-141)."""
    from .predicates import robust_sign
    n1 = np.cross(a, b)
    n2 = np.cross(b, c)
    angle = float(np.arctan2(np.linalg.norm(np.cross(n1, n2)),
                             float(np.dot(n1, n2))))
    s = robust_sign(tuple(np.asarray(a, dtype=float)),
                    tuple(np.asarray(b, dtype=float)),
                    tuple(np.asarray(c, dtype=float)))
    return angle * (1.0 if s > 0 else -1.0)


def planar_centroid(a, b, c):
    """(a+b+c)/3 (s2/centroids.go:126-131)."""
    return (np.asarray(a, dtype=np.float64) + np.asarray(b) + np.asarray(c)) / 3.0


def true_centroid_triangle(a, b, c):
    """Integral of position over the triangle (s2/centroids.go:61-101)."""
    def _ang(u, v):
        return math.atan2(float(np.linalg.norm(np.cross(u, v))),
                          float(np.dot(u, v)))

    angle_a = _ang(b, c)
    angle_b = _ang(c, a)
    angle_c = _ang(a, b)
    ra = 1.0 if angle_a == 0 else angle_a / math.sin(angle_a)
    rb = 1.0 if angle_b == 0 else angle_b / math.sin(angle_b)
    rc = 1.0 if angle_c == 0 else angle_c / math.sin(angle_c)
    x = np.array([a[0], b[0], c[0]])
    y = np.array([a[1], b[1], c[1]])
    z = np.array([a[2], b[2], c[2]])
    r = np.array([ra, rb, rc])
    return 0.5 * np.array([float(np.cross(y, z) @ r),
                           float(np.cross(z, x) @ r),
                           float(np.cross(x, y) @ r)])


def edge_true_centroid(a, b):
    """Integral of position over geodesic edge AB (s2/centroids.go:104-123)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    vdiff = a - b
    vsum = a + b
    sin2 = float(vdiff @ vdiff)
    cos2 = float(vsum @ vsum)
    if cos2 == 0:
        return np.zeros(3)
    tan_half = math.sqrt(sin2 / cos2)
    w = 1.0 if tan_half == 0 else math.atan(tan_half) / tan_half
    return 0.5 * vsum * w

"""Map projections + adaptive edge tessellation (raster<->vector
bridge).

Semantics of reference s2/projections.go:26-241 (PlateCarree and
Mercator, wrap-aware) and s2/edge_tessellator.go:187-291 (adaptive
geodesic<->projected polyline conversion within a tolerance).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

from .latlng import latlng_to_xyz, xyz_to_latlng

# s2/edge_tessellator.go:59-76
MIN_TESSELLATION_TOLERANCE_RAD = 1e-13


class PlateCarreeProjection:
    """x = scale*lng/pi, y = scale*lat/pi (s2/projections.go:74-145)."""

    def __init__(self, x_scale: float = 180.0):
        self.x_scale = x_scale
        self.to_radians = math.pi / x_scale
        self.from_radians = x_scale / math.pi

    def project(self, x, y, z):
        lat, lng = xyz_to_latlng(x, y, z)
        return lng * self.from_radians, lat * self.from_radians

    def unproject(self, px, py):
        lat = np.asarray(py) * self.to_radians
        lng = np.asarray(px) * self.to_radians
        return latlng_to_xyz(np.clip(lat, -math.pi / 2, math.pi / 2),
                             _wrap_lng(lng))

    def wrap_distance(self) -> Tuple[float, float]:
        return (2 * self.x_scale, 0.0)

    def wrap_destination(self, a, b):
        return _wrap_destination(a, b, self.wrap_distance())

    def interpolate(self, f, a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        return (1 - f) * a + f * b


class MercatorProjection:
    """Web-Mercator; poles project to +-inf (s2/projections.go:147-241)."""

    def __init__(self, max_x: float = 180.0):
        self.x_scale = max_x / math.pi

    def project(self, x, y, z):
        lat, lng = xyz_to_latlng(x, y, z)
        with np.errstate(divide="ignore"):
            py = np.log(np.tan(math.pi / 4 + np.asarray(lat) / 2))
        return np.asarray(lng) * self.x_scale, py * self.x_scale

    def unproject(self, px, py):
        lat = 2 * np.arctan(np.exp(np.asarray(py) / self.x_scale)) - math.pi / 2
        lng = np.asarray(px) / self.x_scale
        return latlng_to_xyz(lat, _wrap_lng(lng))

    def wrap_distance(self) -> Tuple[float, float]:
        return (2 * math.pi * self.x_scale, 0.0)

    def wrap_destination(self, a, b):
        return _wrap_destination(a, b, self.wrap_distance())

    def interpolate(self, f, a, b):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        return (1 - f) * a + f * b


def _wrap_lng(lng):
    return np.mod(np.asarray(lng) + math.pi, 2 * math.pi) - math.pi


def _wrap_destination(a, b, wrap) -> Tuple[float, float]:
    """Wrap B's coordinates so edge AB takes the shortest path along
    any wrapping axis (s2/projections.go:229-241): B is unmodified
    unless its distance from A along a wrapping axis exceeds half the
    wrap period."""
    x, y = float(b[0]), float(b[1])
    ax, ay = float(a[0]), float(a[1])
    wx, wy = wrap
    if wx > 0 and abs(x - ax) > 0.5 * wx:
        x = ax + math.remainder(x - ax, wx)
    if wy > 0 and abs(y - ay) > 0.5 * wy:
        y = ay + math.remainder(y - ay, wy)
    return (x, y)


class EdgeTessellator:
    """Adaptive subdivision converting between geodesic edges and
    projected line segments within ``tolerance_rad``
    (s2/edge_tessellator.go:187-291)."""

    def __init__(self, projection, tolerance_rad: float):
        self.proj = projection
        self.tol_chord2 = (2 * math.sin(
            max(tolerance_rad, MIN_TESSELLATION_TOLERANCE_RAD) / 2)) ** 2

    def append_projected(self, a_xyz, b_xyz, out: List[Tuple[float, float]]):
        """Geodesic AB -> projected vertex chain (appends to out; the
        first vertex is included only when out is empty).  Every
        vertex is wrapped as close as possible to the PREVIOUS vertex
        (WrapDestination, s2/edge_tessellator.go:203-238), so chains
        crossing the antimeridian stay continuous in projected space
        — coordinates may leave the canonical range (0:170 -> 0:190
        rather than a 340-unit jump to 0:-170)."""
        pa = tuple(float(v) for v in self.proj.project(*a_xyz))
        if not out:
            out.append(pa)
        else:
            pa = self.proj.wrap_destination(out[-1], pa)
        self._split_projected(np.asarray(a_xyz, dtype=np.float64), pa,
                              np.asarray(b_xyz, dtype=np.float64),
                              tuple(float(v) for v in self.proj.project(*b_xyz)),
                              out, 0)

    def _split_projected(self, a, pa, b, pb, out, depth):
        pb = self.proj.wrap_destination(pa, pb)
        mid_geo = a + b
        mid_geo = mid_geo / np.linalg.norm(mid_geo)
        mid_proj = self.proj.interpolate(0.5, pa, pb)
        mid_unproj = np.array(self.proj.unproject(mid_proj[0], mid_proj[1]),
                              dtype=np.float64)
        err = float(np.sum((mid_geo - mid_unproj) ** 2))
        if err <= self.tol_chord2 or depth >= 31:
            out.append(pb)
            return
        pm = self.proj.wrap_destination(
            pa, tuple(float(v) for v in self.proj.project(*mid_geo)))
        self._split_projected(a, pa, mid_geo, pm, out, depth + 1)
        self._split_projected(mid_geo, pm, b, pb, out, depth + 1)

    def append_unprojected(self, pa, pb, out: List[Tuple[float, float, float]]):
        """Projected segment -> geodesic vertex chain."""
        a = np.array(self.proj.unproject(*pa), dtype=np.float64)
        if not out:
            out.append(tuple(float(v) for v in a))
        self._split_unprojected(pa, a, pb,
                                np.array(self.proj.unproject(*pb),
                                         dtype=np.float64), out, 0)

    def _split_unprojected(self, pa, a, pb, b, out, depth):
        pb = self.proj.wrap_destination(pa, pb)
        mid_proj = self.proj.interpolate(0.5, pa, pb)
        mid_unproj = np.array(self.proj.unproject(mid_proj[0], mid_proj[1]),
                              dtype=np.float64)
        mid_geo = a + b
        n = np.linalg.norm(mid_geo)
        mid_geo = mid_geo / (n if n else 1.0)
        err = float(np.sum((mid_geo - mid_unproj) ** 2))
        if err <= self.tol_chord2 or depth >= 31:
            out.append(tuple(float(v) for v in b))
            return
        self._split_unprojected(pa, a, tuple(mid_proj), mid_unproj, out, depth + 1)
        self._split_unprojected(tuple(mid_proj), mid_unproj, pb, b, out, depth + 1)

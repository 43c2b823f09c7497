"""Lat/lng rectangle region (degrees at the API, radians internally).

Semantics of reference s2/rect.go:  lat interval [lo,hi], lng interval
possibly wrapping (lo > hi means the interval crosses the antimeridian).
Implements vectorized point filtering plus the cell predicates needed by
the covering generator, computed via the cell's vertex/edge geometry
(conservative-exact, like Rect.IntersectsCell s2/rect.go:303-367 in
effect if not in method).
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from .cap import Cap
from .cell import Cell
from ..functions.latlng import latlng_deg_to_xyz, xyz_to_latlng


class Rect:
    __slots__ = ("lat_lo", "lat_hi", "lng_lo", "lng_hi")

    def __init__(self, lat_lo: float, lat_hi: float, lng_lo: float,
                 lng_hi: float):
        """Degrees. lng_lo > lng_hi encodes antimeridian wrap."""
        self.lat_lo = float(lat_lo)
        self.lat_hi = float(lat_hi)
        self.lng_lo = float(lng_lo)
        self.lng_hi = float(lng_hi)

    def contains_latlng(self, lat: float, lng: float) -> bool:
        """s2/rect.go:284-292."""
        if not (self.lat_lo <= lat <= self.lat_hi):
            return False
        if self.lng_lo <= self.lng_hi:
            return self.lng_lo <= lng <= self.lng_hi
        return lng >= self.lng_lo or lng <= self.lng_hi

    def contains_latlng_v(self, lat, lng) -> np.ndarray:
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        ok = (lat >= self.lat_lo) & (lat <= self.lat_hi)
        if self.lng_lo <= self.lng_hi:
            return ok & (lng >= self.lng_lo) & (lng <= self.lng_hi)
        return ok & ((lng >= self.lng_lo) | (lng <= self.lng_hi))

    def contains_point(self, p) -> bool:
        lat, lng = xyz_to_latlng(*p)
        return self.contains_latlng(math.degrees(float(lat)),
                                    math.degrees(float(lng)))

    def _sample_boundary(self, per_edge: int = 8):
        """Dense boundary sample in degrees (for conservative cell
        predicates; rect edges along parallels are not geodesics)."""
        pts = []
        if self.lng_lo <= self.lng_hi:
            lngs = np.linspace(self.lng_lo, self.lng_hi, per_edge)
        else:
            span = (self.lng_hi + 360.0) - self.lng_lo
            lngs = (self.lng_lo + np.linspace(0, span, per_edge)) % 360.0
            lngs = np.where(lngs > 180.0, lngs - 360.0, lngs)
        lats = np.linspace(self.lat_lo, self.lat_hi, per_edge)
        for lng in lngs:
            pts.append((self.lat_lo, float(lng)))
            pts.append((self.lat_hi, float(lng)))
        for lat in lats:
            pts.append((float(lat), float(lngs[0])))
            pts.append((float(lat), float(lngs[-1])))
        return pts

    def intersects_cell(self, cell: Cell) -> bool:
        """Conservative: true if any cell vertex is inside the rect, any
        boundary sample point is inside the cell, or the cell center is
        inside the rect.  Slightly over-inclusive (never misses an
        intersection at the sample density used for covering levels)."""
        for v in cell.vertices():
            if self.contains_point(v):
                return True
        if self.contains_point(cell.center()):
            return True
        for lat, lng in self._sample_boundary():
            x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
            if cell.contains_point((float(x), float(y), float(z))):
                return True
        return False

    def contains_cell(self, cell: Cell) -> bool:
        """Conservative: all cell vertices and edge midpoints inside."""
        verts = cell.vertices()
        for v in verts:
            if not self.contains_point(v):
                return False
        # check edge midpoints (cell edges can bulge in latitude)
        for k in range(4):
            a = np.array(verts[k]); b = np.array(verts[(k + 1) & 3])
            m = a + b
            m = m / np.linalg.norm(m)
            if not self.contains_point(tuple(m)):
                return False
        return True

    def cap_bound(self) -> Cap:
        """s2/rect.go:438-467."""
        if self.lat_lo > self.lat_hi:
            return Cap.empty()
        lat_lo_r = math.radians(self.lat_lo)
        lat_hi_r = math.radians(self.lat_hi)
        if lat_hi_r + lat_lo_r < 0:
            pole, pole_angle = (0.0, 0.0, -1.0), math.pi / 2 + lat_hi_r
        else:
            pole, pole_angle = (0.0, 0.0, 1.0), math.pi / 2 - lat_lo_r
        pole_cap = Cap.from_center_angle(pole, pole_angle + 1e-12)
        lng_span = (self.lng_hi - self.lng_lo) if self.lng_lo <= self.lng_hi \
            else (self.lng_hi + 360.0 - self.lng_lo)
        if lng_span < 360.0 - 1e-9:
            mid_lat = (self.lat_lo + self.lat_hi) / 2
            mid_lng = self.lng_lo + lng_span / 2
            if mid_lng > 180.0:
                mid_lng -= 360.0
            cx, cy, cz = (float(v) for v in latlng_deg_to_xyz(
                np.float64(mid_lat), np.float64(mid_lng)))
            r2 = 0.0
            for la in (self.lat_lo, self.lat_hi):
                for ln in (self.lng_lo, self.lng_hi):
                    vx, vy, vz = (float(v) for v in latlng_deg_to_xyz(
                        np.float64(la), np.float64(ln)))
                    r2 = max(r2, (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2)
            mid_cap = Cap((cx, cy, cz), min(4.0, r2 * (1 + 1e-9) + 1e-15))
            if mid_cap.radius_chord2 < pole_cap.radius_chord2:
                return mid_cap
        return pole_cap

    def cell_union_bound(self) -> List[int]:
        return self.cap_bound().cell_union_bound()

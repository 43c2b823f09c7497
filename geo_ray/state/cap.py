"""Spherical cap (disc) region.

Semantics of reference s2/cap.go: center point + ChordAngle radius
(squared chord length, closed under cheap comparison).  Implements the
Region interface pieces the covering generator needs
(s2/region.go:22-59) plus a vectorized point filter for map_batches.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np

from ..functions import cellid as cid
from ..functions import chordangle as ca
from ..functions import metric
from ..functions.latlng import (angle_to_chord2, chord2, chord2_to_angle,
                                latlng_deg_to_xyz)
from .cell import Cell


_MACHINE_EPS = float(np.finfo(np.float64).eps) / 2.0  # 2^-53


class Cap:
    __slots__ = ("center", "radius_chord2")

    def __init__(self, center_xyz, radius_chord2: float):
        self.center = tuple(float(c) for c in center_xyz)
        self.radius_chord2 = float(radius_chord2)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_center_angle(cls, center_xyz, angle_rad: float) -> "Cap":
        """s2/cap.go:99-103."""
        return cls(center_xyz, float(angle_to_chord2(angle_rad)))

    @classmethod
    def from_latlng_deg(cls, lat_deg: float, lng_deg: float,
                        angle_rad: float) -> "Cap":
        x, y, z = latlng_deg_to_xyz(np.float64(lat_deg), np.float64(lng_deg))
        return cls.from_center_angle((float(x), float(y), float(z)), angle_rad)

    @classmethod
    def from_point(cls, p) -> "Cap":
        """Zero-height cap containing exactly ``p`` (s2/cap.go:106)."""
        return cls(p, 0.0)

    @classmethod
    def empty(cls) -> "Cap":
        return cls((1.0, 0.0, 0.0), -1.0)

    @classmethod
    def full(cls) -> "Cap":
        return cls((1.0, 0.0, 0.0), 4.0)

    # -- accessors ----------------------------------------------------------
    def is_empty(self) -> bool:
        return self.radius_chord2 < 0

    def is_full(self) -> bool:
        return self.radius_chord2 >= 4.0

    def radius_rad(self) -> float:
        """s2/cap.go:131-137."""
        if self.is_empty():
            return -1.0
        return float(chord2_to_angle(self.radius_chord2))

    def expanded(self, distance_rad: float) -> "Cap":
        """s2/cap.go:324-330."""
        if self.is_empty():
            return Cap.from_center_angle(self.center, distance_rad)
        return Cap.from_center_angle(self.center,
                                     self.radius_rad() + distance_rad)

    # -- incremental bounding folds ------------------------------------------
    def add_point(self, p) -> "Cap":
        """Smallest enlargement containing ``p`` (s2/cap.go:278-294):
        an empty cap centers on the point with zero height; otherwise
        the center is FIXED and only the radius grows, which is what
        makes a fold over a point stream cheap (no re-centering)."""
        if self.is_empty():
            return Cap(p, 0.0)
        r2 = float(chord2(p[0], p[1], p[2], *self.center))
        r2 = min(r2, 4.0)
        if r2 > self.radius_chord2:
            return Cap(self.center, r2)
        return self

    def add_cap(self, other: "Cap") -> "Cap":
        """Enlarge to contain ``other`` (s2/cap.go:296-312): radius
        becomes at least angle(centers) + other.radius, rounded up by
        one machine epsilon so containment survives the rounding."""
        if self.is_empty():
            return other
        if other.is_empty():
            return self
        center_c2 = min(4.0, float(chord2(*other.center, *self.center)))
        dist = ca.add(center_c2, other.radius_chord2)
        new_rad = ca.expanded(dist, _MACHINE_EPS * dist)
        if new_rad > self.radius_chord2:
            return Cap(self.center, new_rad)
        return self

    def approx_equal(self, other: "Cap", epsilon: float = 1e-14) -> bool:
        """s2/cap.go:262-276."""
        r2, o2 = self.radius_chord2, other.radius_chord2
        same_center = chord2(*self.center, *other.center) <= epsilon ** 2
        return ((same_center and abs(r2 - o2) <= epsilon)
                or (self.is_empty() and o2 <= epsilon)
                or (other.is_empty() and r2 <= epsilon)
                or (self.is_full() and o2 >= 2 - epsilon)
                or (other.is_full() and r2 >= 2 - epsilon))

    def complement_contains_any_of(self, points) -> bool:
        return any(not self.contains_point(p) for p in points)

    # -- point tests --------------------------------------------------------
    def contains_point(self, p) -> bool:
        """s2/cap.go:179-183."""
        return chord2(p[0], p[1], p[2], *self.center) <= self.radius_chord2

    def contains_points_v(self, x, y, z) -> np.ndarray:
        """Vectorized batch filter."""
        return chord2(np.asarray(x), np.asarray(y), np.asarray(z),
                      *self.center) <= self.radius_chord2

    # -- region interface (coverer callbacks) -------------------------------
    def contains_cell(self, cell: Cell) -> bool:
        """s2/cap.go:341-348: contains all vertices and the complement
        does not intersect the cell."""
        vertices = cell.vertices()
        for v in vertices:
            if not self.contains_point(v):
                return False
        return not self.complement()._intersects(cell, vertices)

    def intersects_cell(self, cell: Cell) -> bool:
        """s2/cap.go:351-358."""
        vertices = cell.vertices()
        for v in vertices:
            if self.contains_point(v):
                return True
        return self._intersects(cell, vertices)

    def complement(self) -> "Cap":
        """s2/cap.go:249-259."""
        if self.is_full():
            return Cap.empty()
        if self.is_empty():
            return Cap.full()
        return Cap((-self.center[0], -self.center[1], -self.center[2]),
                   4.0 - self.radius_chord2)

    def _intersects(self, cell: Cell, vertices) -> bool:
        """Whether the cap intersects any point of the cell excluding
        its vertices.  s2/cap.go:361-419."""
        if self.radius_chord2 >= 2.0:  # >= 90 degrees: ChordAngle(Right)
            return False  # handled by vertex checks (s2/cap.go:368-372)
        if self.is_empty():
            return False
        if cell.contains_point(self.center):
            return True
        sin2_angle = self.radius_chord2 * (1 - self.radius_chord2 / 4)
        for k in range(4):
            edge = cell.edge_normal(k)
            dot = (self.center[0] * edge[0] + self.center[1] * edge[1] +
                   self.center[2] * edge[2])
            if dot > 0:
                # The center is on the interior side of this edge: the
                # cap might intersect other edges instead.
                continue
            edge_norm2 = edge[0] ** 2 + edge[1] ** 2 + edge[2] ** 2
            if dot * dot > sin2_angle * edge_norm2:
                return False  # entirely below this edge's great circle
            # Check whether the closest great-circle point is inside the
            # edge segment.
            dirv = _cross(edge, self.center)
            va = vertices[k]
            vb = vertices[(k + 1) & 3]
            if (_dot(dirv, va) < 0) and (_dot(dirv, vb) > 0):
                return True
        return False

    def cell_union_bound(self) -> List[int]:
        """Seed covering: 4 vertex neighbors at the natural level, or
        the 6 face cells.  s2/cap.go:421-452."""
        level = metric.MIN_WIDTH.max_level(self.radius_rad()) - 1
        if level < 0:
            return [cid.parent(cid.cell_id_from_face_ij(f, 0, 0), 0)
                    for f in range(6)]
        x, y, z = self.center
        leaf = cid.cell_id_from_point(x, y, z)
        return cid.vertex_neighbors(leaf, level)

    def cap_bound(self) -> "Cap":
        return self

    def approx_area(self) -> float:
        """2*pi*(1-cos(r)) = pi * chord2 (exact for a cap)."""
        return math.pi * min(self.radius_chord2, 4.0) if not self.is_empty() else 0.0


def _cross(u, v):
    return (u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0])


def _dot(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]

"""Polyline: dimension-1 shape with measures and simplification.

Semantics of reference s2/polyline.go:48-645 and
s2/polyline_measures.go:28-66.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..functions.distance import (chord2_point_edge, interpolate_at_distance,
                                  project_to_edge)
from ..functions.edges import crossing_sign
from ..functions.latlng import latlng_deg_to_xyz
from ..functions.measures import angle_between, edge_true_centroid

Vec = Tuple[float, float, float]


class Polyline:
    def __init__(self, vertices: Sequence[Vec]):
        self.vertices = [tuple(float(c) for c in v) for v in vertices]
        self._varr = np.array(self.vertices, dtype=np.float64).reshape(-1, 3)

    @classmethod
    def from_latlngs_deg(cls, latlngs) -> "Polyline":
        lats = np.array([p[0] for p in latlngs], dtype=np.float64)
        lngs = np.array([p[1] for p in latlngs], dtype=np.float64)
        x, y, z = latlng_deg_to_xyz(lats, lngs)
        return cls(list(zip(x.tolist(), y.tolist(), z.tolist())))

    @classmethod
    def from_text(cls, text: str) -> "Polyline":
        pts = []
        for part in text.split(","):
            part = part.strip()
            if part:
                lat, lng = part.split(":")
                pts.append((float(lat), float(lng)))
        return cls.from_latlngs_deg(pts)

    def length(self) -> float:
        """Sum of edge angles (s2/polyline_measures.go:28-36)."""
        if len(self.vertices) < 2:
            return 0.0
        return float(angle_between(self._varr[:-1], self._varr[1:]).sum())

    def centroid(self):
        """Sum of edge true centroids, not normalized
        (s2/polyline_measures.go:39-66)."""
        out = np.zeros(3)
        for i in range(len(self.vertices) - 1):
            out += edge_true_centroid(self._varr[i], self._varr[i + 1])
        return tuple(float(c) for c in out)

    def interpolate(self, fraction: float):
        """Point at ``fraction`` of total length (s2/polyline.go:459-500).
        Returns (point, next_vertex_index)."""
        if fraction <= 0:
            return self.vertices[0], 1
        target = fraction * self.length()
        return self.interpolate_at_distance(target)

    def interpolate_at_distance(self, target: float):
        for i in range(len(self.vertices) - 1):
            a, b = self._varr[i], self._varr[i + 1]
            length = float(angle_between(a, b))
            if target < length:
                p = interpolate_at_distance(a, b, target)
                return tuple(float(c) for c in p), i + 1
            target -= length
        return self.vertices[-1], len(self.vertices)

    def uninterpolate(self, point: Vec, next_vertex: int) -> float:
        """Inverse of interpolate (s2/polyline.go:502-527)."""
        if len(self.vertices) < 2:
            return 0.0
        total = self.length()
        before = 0.0
        for i in range(1, next_vertex):
            before += float(angle_between(self._varr[i - 1], self._varr[i]))
        before += float(angle_between(self._varr[next_vertex - 1],
                                      np.asarray(point, dtype=np.float64)))
        return min(1.0, before / total)

    def project(self, point: Vec):
        """Closest point on the polyline; returns (point, next_vertex)
        (s2/polyline.go:529-566)."""
        x = np.asarray(point, dtype=np.float64)
        best_d = np.inf
        best = (self.vertices[0], 1)
        for i in range(len(self.vertices) - 1):
            q = project_to_edge(x, self._varr[i], self._varr[i + 1])
            d = float(np.sum((x - q) ** 2))
            if d < best_d:
                best_d = d
                best = (tuple(float(c) for c in q), i + 1)
        return best

    def is_on_right(self, point: Vec) -> bool:
        """s2/polyline.go:568-585: whether the point is on the right of
        the polyline (looking along it) at its closest point."""
        from ..functions.predicates import robust_sign
        closest, nxt = self.project(point)
        if closest == point:
            return False
        a = self.vertices[nxt - 1]
        b = self.vertices[nxt] if nxt < len(self.vertices) else a
        return robust_sign(a, b, point) == -1

    def intersects(self, other: "Polyline") -> bool:
        """Edge-pair crossing scan (s2/polyline.go:540-579)."""
        if len(self.vertices) < 2 or len(other.vertices) < 2:
            return False
        for i in range(len(self.vertices) - 1):
            for j in range(len(other.vertices) - 1):
                if crossing_sign(self.vertices[i], self.vertices[i + 1],
                                 other.vertices[j], other.vertices[j + 1]) >= 0:
                    return True
        return False

    def subsample_vertices(self, tolerance_rad: float) -> List[int]:
        """Greedy radial simplification: keep the longest prefix of
        edges staying within tolerance of the line (s2/polyline.go:
        226-354).  Returns kept vertex indices."""
        n = len(self.vertices)
        if n < 1:
            return []
        result = [0]
        tol_chord2 = (2 * math.sin(min(tolerance_rad, math.pi) / 2)) ** 2
        index = 0
        while index < n - 1:
            next_index = self._find_end_vertex(index, tol_chord2)
            # skip duplicate vertices
            if self.vertices[next_index] != self.vertices[result[-1]]:
                result.append(next_index)
            index = next_index
        return result

    def _find_end_vertex(self, index: int, tol_chord2: float) -> int:
        n = len(self.vertices)
        best = index + 1
        for candidate in range(index + 2, n):
            a = self._varr[index]
            b = self._varr[candidate]
            ok = True
            for mid in range(index + 1, candidate):
                if float(chord2_point_edge(self._varr[mid], a, b)) > tol_chord2:
                    ok = False
                    break
            if ok:
                best = candidate
            else:
                break
        return best

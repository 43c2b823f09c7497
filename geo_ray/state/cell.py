"""Scalar Cell geometry: uv bounds, vertices, edge normals, containment.

Semantics of reference s2/cell.go:59-491 and s2/cellid.go:656-671
(ijLevelToBoundUV).  Used by region predicates inside the covering
generator; the per-record hot paths use the vectorized kernels instead.
"""

from __future__ import annotations

import numpy as np

from ..functions import cellid as cid
from ..functions import stuv
from ..functions.predicates import DBL_EPSILON


class Cell:
    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, ci: int):
        self.id = ci
        f, i, j, _ = cid.face_ij_orientation(ci)
        self.face = f
        self.level = cid.level(ci)
        size = 1 << (30 - self.level)
        i_lo = i & -size
        j_lo = j & -size
        # s2/cellid.go:656-671
        self.u_lo = float(stuv.st_to_uv(i_lo / stuv.MAX_SIZE))
        self.u_hi = float(stuv.st_to_uv((i_lo + size) / stuv.MAX_SIZE))
        self.v_lo = float(stuv.st_to_uv(j_lo / stuv.MAX_SIZE))
        self.v_hi = float(stuv.st_to_uv((j_lo + size) / stuv.MAX_SIZE))

    def vertices(self):
        """4 vertices in CCW order (lower-left first), normalized.

        s2/cell.go:117-126.
        """
        uv = ((self.u_lo, self.v_lo), (self.u_hi, self.v_lo),
              (self.u_hi, self.v_hi), (self.u_lo, self.v_hi))
        out = []
        for u, v in uv:
            x, y, z = stuv.face_uv_to_xyz(self.face, u, v)
            n = float(np.sqrt(x * x + y * y + z * z))
            out.append((float(x) / n, float(y) / n, float(z) / n))
        return out

    def edge_normal(self, k: int):
        """Inward-pointing normal of edge k (bottom,right,top,left).

        s2/cell.go:146-157 returns the outward normal of the edge plane;
        like the reference we return the raw (unnormalized) vector with
        the reference's sign convention: Edge(k) such that the cell
        interior is on the NEGATIVE side for k in {2,3} ... concretely
        EdgeRaw: k0 vNorm(v_lo), k1 uNorm(u_hi), k2 -vNorm(v_hi),
        k3 -uNorm(u_lo).
        """
        if k == 0:
            return stuv.v_norm(self.face, self.v_lo)
        if k == 1:
            return stuv.u_norm(self.face, self.u_hi)
        if k == 2:
            n = stuv.v_norm(self.face, self.v_hi)
            return (-n[0], -n[1], -n[2])
        n = stuv.u_norm(self.face, self.u_lo)
        return (-n[0], -n[1], -n[2])

    def contains_point(self, p) -> bool:
        """s2/cell.go:462-491: project to this face's uv, compare with
        the uv rect expanded by 2*dblEpsilon."""
        x, y, z = p
        f = self.face
        # faceXYZToUV: requires the point to be on the correct side
        major = (x, y, z)[f % 3]
        if f < 3:
            if major <= 0:
                return False
        else:
            if major >= 0:
                return False
        u, v = (float(a) for a in stuv.valid_face_xyz_to_uv(
            np.int64(f), np.float64(x), np.float64(y), np.float64(z)))
        eps = 2 * DBL_EPSILON
        return (self.u_lo - eps <= u <= self.u_hi + eps and
                self.v_lo - eps <= v <= self.v_hi + eps)

    def contains_any_point(self, varr: np.ndarray) -> bool:
        """Vectorized: does ANY row of the (n,3) array lie in this
        cell?  Same uv-rect semantics as :meth:`contains_point`."""
        varr = np.asarray(varr, dtype=np.float64).reshape(-1, 3)
        f = self.face
        major = varr[:, f % 3]
        ok = major > 0 if f < 3 else major < 0
        if not ok.any():
            return False
        u, v = stuv.valid_face_xyz_to_uv(
            np.int64(f), varr[ok, 0], varr[ok, 1], varr[ok, 2])
        eps = 2 * DBL_EPSILON
        return bool(((u >= self.u_lo - eps) & (u <= self.u_hi + eps) &
                     (v >= self.v_lo - eps) & (v <= self.v_hi + eps)).any())

    def contains_points_mask(self, varr: np.ndarray) -> np.ndarray:
        """Vectorized per-row containment mask over an (n,3) array —
        same uv-rect + 2*dblEpsilon semantics as
        :meth:`contains_point` (s2/cell.go:462-491)."""
        varr = np.asarray(varr, dtype=np.float64).reshape(-1, 3)
        f = self.face
        major = varr[:, f % 3]
        ok = major > 0 if f < 3 else major < 0
        out = np.zeros(len(varr), dtype=bool)
        if ok.any():
            u, v = stuv.valid_face_xyz_to_uv(
                np.int64(f), varr[ok, 0], varr[ok, 1], varr[ok, 2])
            eps = 2 * DBL_EPSILON
            out[ok] = ((u >= self.u_lo - eps) & (u <= self.u_hi + eps) &
                       (v >= self.v_lo - eps) & (v <= self.v_hi + eps))
        return out

    def center(self):
        x, y, z = cid.cell_id_to_point(self.id)
        return (x, y, z)

    def children(self):
        return [Cell(c) for c in cid.children(self.id)]

    # -- bounds (s2/cell.go:362-460) ---------------------------------------
    _POLE_MIN_LAT = 0.6154797086703873 - 1e-15  # asin(sqrt(1/3)) - maxError

    def rect_bound(self):
        """Conservative-exact lat/lng bound (radians):
        (lat_lo, lat_hi, lng_lo, lng_hi), lng possibly wrapping.

        For level > 0 the extremes are attained at the vertices
        (s2/cell.go:366-370); face cells use the reference's closed
        forms (s2/cell.go:415-443).
        """
        import math
        if self.level == 0:
            q = math.pi / 4
            pole = self._POLE_MIN_LAT
            return [
                (-q, q, -q, q),
                (-q, q, q, 3 * q),
                (pole, math.pi / 2, -math.pi, math.pi),
                (-q, q, 3 * q, -3 * q),
                (-q, q, -3 * q, -q),
                (-math.pi / 2, -pole, -math.pi, math.pi),
            ][self.face]
        verts = np.array(self.vertices())
        lat = np.arcsin(np.clip(verts[:, 2], -1, 1))
        lng = np.arctan2(verts[:, 1], verts[:, 0])
        eps = 2e-15
        lat_lo = float(lat.min()) - eps
        lat_hi = float(lat.max()) + eps
        # longitude: cells at level>0 never contain a pole in their
        # interior unless they touch it; wrap-aware union of vertices
        from .loop import _lng_interval_union
        lng_lo, lng_hi = _lng_interval_union(lng)
        if lat_hi >= math.pi / 2 - 1e-12 or lat_lo <= -math.pi / 2 + 1e-12:
            lng_lo, lng_hi = -math.pi, math.pi  # polar closure
        return (max(-math.pi / 2, lat_lo), min(math.pi / 2, lat_hi),
                lng_lo, lng_hi)

    def cap_bound(self):
        """Bounding cap from the uv-center axis expanded to the 4
        vertices (s2/cell.go:445-460)."""
        from .cap import Cap
        u = 0.5 * (self.u_lo + self.u_hi)
        v = 0.5 * (self.v_lo + self.v_hi)
        x, y, z = stuv.face_uv_to_xyz(self.face, u, v)
        n = float(np.sqrt(x * x + y * y + z * z))
        center = (float(x) / n, float(y) / n, float(z) / n)
        r2 = 0.0
        for vert in self.vertices():
            d2 = ((vert[0] - center[0]) ** 2 + (vert[1] - center[1]) ** 2 +
                  (vert[2] - center[2]) ** 2)
            r2 = max(r2, d2)
        return Cap(center, min(4.0, r2 * (1 + 1e-12) + 1e-30))

    # -- areas (s2/cell.go:494-540) ----------------------------------------
    def average_area(self) -> float:
        """AvgArea metric value for the level (s2/cell.go:496-500)."""
        from ..functions import metric
        return metric.AVG_AREA.value(self.level)

    def approx_area(self) -> float:
        """Quadrilateral approximation, accurate to ~3% for level >= 2
        (s2/cell.go:502-523): flat-quad area scaled for sphere bulge."""
        import math
        if self.level < 2:
            return self.average_area()
        v = np.asarray(self.vertices())
        flat_area = 0.5 * float(
            np.linalg.norm(np.cross(v[2] - v[0], v[3] - v[1])))
        return flat_area * 2 / (1 + math.sqrt(1 - min(1 / math.pi * flat_area,
                                                      1.0)))

    def exact_area(self) -> float:
        """Sum of the two triangle areas (s2/cell.go:525-532)."""
        from ..functions.measures import point_area
        v0, v1, v2, v3 = self.vertices()
        return float(point_area(v0, v1, v2)) + float(point_area(v0, v2, v3))

    # -- distances (s2/cell.go:581-700) ------------------------------------
    def distance_chord2(self, p) -> float:
        """Min squared-chord distance from the cell to a point: 0 if
        the point projects inside, else min over the 4 edges."""
        from ..functions.distance import chord2_point_edge
        if self.contains_point(p):
            return 0.0
        verts = self.vertices()
        x = np.asarray(p, dtype=np.float64)
        best = 4.0
        for k in range(4):
            a = np.asarray(verts[k])
            b = np.asarray(verts[(k + 1) & 3])
            best = min(best, float(chord2_point_edge(x, a, b)))
        return best

    def max_distance_chord2(self, p) -> float:
        """Max squared-chord distance (s2/cell.go:662-700): attained at
        a vertex unless the antipode projects into the cell (then 4)."""
        neg = (-p[0], -p[1], -p[2])
        if self.contains_point(neg):
            return 4.0
        from ..functions.distance import max_chord2_point_edge
        verts = self.vertices()
        x = np.asarray(p, dtype=np.float64)
        best = 0.0
        for k in range(4):
            a = np.asarray(verts[k])
            b = np.asarray(verts[(k + 1) & 3])
            best = max(best, float(max_chord2_point_edge(x, a, b)))
        return best

    def distance_to_cell_chord2(self, other: "Cell") -> float:
        """Min distance between two cells (s2/cell.go:702-760): 0 if
        they overlap, else min over edge pairs."""
        if self.id == other.id or cid.intersects(self.id, other.id):
            return 0.0
        from ..functions.distance import chord2_edge_edge
        va = self.vertices()
        vb = other.vertices()
        # vertex-in-cell overlap (different faces)
        for v in vb:
            if self.contains_point(v):
                return 0.0
        for v in va:
            if other.contains_point(v):
                return 0.0
        best = 4.0
        for i in range(4):
            for j in range(4):
                best = min(best, chord2_edge_edge(
                    va[i], va[(i + 1) & 3], vb[j], vb[(j + 1) & 3]))
        return best

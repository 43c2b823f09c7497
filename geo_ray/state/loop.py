"""Simple spherical polygon (single loop) region.

Semantics of reference s2/loop.go: a closed CCW chain of unit vectors
whose interior is on the left of each edge; special one-vertex "empty"
and "full" loops (s2/loop.go:107-121).  Containment is crossing parity
from a fixed origin (s2/loop.go:590-629); cell relations are computed
geometrically for the covering generator.

The vectorized batch containment test (the refine stage of the spatial
join) lives in ``contains_points_batch``: four triage sign matrices via
matmuls, with scalar robust fallback for ambiguous rows — semantics
identical to the scalar brute-force test (s2/loop.go:590-598).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..functions import cellid as cid
from ..functions.edges import (ORIGIN, crossing_sign, edge_or_vertex_crossing,
                               ortho)
from ..functions.latlng import latlng_deg_to_xyz, xyz_to_latlng
from ..functions.predicates import (MAX_DETERMINANT_ERROR, ordered_ccw,
                                    robust_sign)
from .cap import Cap
from .cell import Cell

Vec = Tuple[float, float, float]


class Loop:
    def __init__(self, vertices: Sequence[Vec]):
        self.vertices: List[Vec] = [tuple(float(c) for c in v) for v in vertices]
        self._varr = np.array(self.vertices, dtype=np.float64).reshape(-1, 3)
        self.origin_inside = False
        self._init_origin()
        self._bound = None  # lazy lat/lng rect tuple
        self._edge_cache = None  # lazy (cvs, dvs, cxd) arrays

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_latlngs_deg(cls, latlngs: Sequence[Tuple[float, float]]) -> "Loop":
        lats = np.array([p[0] for p in latlngs], dtype=np.float64)
        lngs = np.array([p[1] for p in latlngs], dtype=np.float64)
        x, y, z = latlng_deg_to_xyz(lats, lngs)
        return cls(list(zip(x.tolist(), y.tolist(), z.tolist())))

    @classmethod
    def from_text(cls, text: str) -> "Loop":
        """Reference test DSL "lat:lng, lat:lng, ..." degrees
        (s2/textformat_test.go:22-137)."""
        pts = []
        for part in text.split(","):
            part = part.strip()
            if not part:
                continue
            lat, lng = part.split(":")
            pts.append((float(lat), float(lng)))
        return cls.from_latlngs_deg(pts)

    @classmethod
    def regular_loop(cls, center_xyz, radius_rad: float,
                     num_vertices: int) -> "Loop":
        """CCW circle approximation: num_vertices points at angular
        radius ``radius_rad`` around center (s2/loop.go:742-780 via the
        frame construction of RegularPointsForFrame)."""
        from ..functions.frames import get_frame, from_frame

        m = get_frame(center_xyz)
        r = math.sin(radius_rad)
        h = math.cos(radius_rad)
        verts = []
        for k in range(num_vertices):
            theta = 2 * math.pi * k / num_vertices
            p = np.array([r * math.cos(theta), r * math.sin(theta), h])
            w = from_frame(m, p)
            w = w / np.linalg.norm(w)
            verts.append(tuple(float(c) for c in w))
        return cls(verts)

    @classmethod
    def empty(cls) -> "Loop":
        """Single-vertex loop containing nothing, s2/loop.go:107-113."""
        return cls([(0.0, 0.0, 1.0)])

    @classmethod
    def full(cls) -> "Loop":
        """Single-vertex loop containing everything, s2/loop.go:115-121."""
        return cls([(0.0, 0.0, -1.0)])

    # -- structure ----------------------------------------------------------
    def is_empty_or_full(self) -> bool:
        return len(self.vertices) == 1

    def is_empty(self) -> bool:
        return self.is_empty_or_full() and not self.origin_inside

    def is_full(self) -> bool:
        return self.is_empty_or_full() and self.origin_inside

    def num_edges(self) -> int:
        return 0 if self.is_empty_or_full() else len(self.vertices)

    def edges(self):
        n = len(self.vertices)
        if self.is_empty_or_full():
            return []
        return [(self.vertices[i], self.vertices[(i + 1) % n])
                for i in range(n)]

    def invert(self) -> "Loop":
        """Reversed loop = complement region, s2/loop.go:168-178."""
        if self.is_empty_or_full():
            inv = Loop.full() if self.is_empty() else Loop.empty()
            return inv
        return Loop(list(reversed(self.vertices)))

    def boundary_equal(self, other: "Loop") -> bool:
        """Same vertices in the same cyclic order (rotations allowed).
        Port of Loop.BoundaryEqual (s2/loop.go:383-414)."""
        if len(self.vertices) != len(other.vertices):
            return False
        if self.is_empty_or_full():
            return self.is_empty() == other.is_empty()
        n = len(self.vertices)
        for offset in range(n):
            if self.vertices[offset] == other.vertices[0]:
                return all(self.vertices[(offset + i) % n] ==
                           other.vertices[i] for i in range(n))
        return False

    def _init_origin(self) -> None:
        """s2/loop.go initOriginAndBound (:132-166)."""
        if len(self.vertices) < 3:
            if not self.is_empty_or_full():
                self.origin_inside = False
                return
            self.origin_inside = self.vertices[0][2] < 0
            return
        v0, v1, v2 = self.vertices[0], self.vertices[1], self.vertices[2]
        self.origin_inside = False
        v1_inside = ordered_ccw(ortho(v1), v0, v2, v1)
        if v1_inside != self.contains_point(v1):
            self.origin_inside = True

    # -- point containment --------------------------------------------------
    def contains_point(self, p: Vec) -> bool:
        """Crossing parity from ORIGIN, s2/loop.go:590-598."""
        if self.is_empty_or_full():
            return self.origin_inside
        inside = self.origin_inside
        p = tuple(float(c) for c in p)
        n = len(self.vertices)
        for i in range(n):
            c = self.vertices[i]
            d = self.vertices[(i + 1) % n]
            if edge_or_vertex_crossing(ORIGIN, p, c, d):
                inside = not inside
        return inside

    def boundary_contains_point(self, p: Vec) -> bool:
        """Whether p lies exactly on the loop boundary (a vertex, or on
        an edge's great circle between its endpoints)."""
        from ..functions.predicates import exact_sign
        p = tuple(float(c) for c in p)
        if self.is_empty_or_full():
            return False
        n = len(self.vertices)
        for i in range(n):
            c = self.vertices[i]
            if p == c:
                return True
            d = self.vertices[(i + 1) % n]
            # exact (unperturbed) coplanarity test
            if exact_sign(c, d, p, perturb=False) == 0:
                # between c and d along the circle: dot tests
                cd = np.asarray(d) - np.asarray(c)
                t = float(np.asarray(p) @ cd)
                if float(np.asarray(c) @ cd) <= t <= float(np.asarray(d) @ cd):
                    return True
        return False

    def contains_point_with_model(self, p: Vec, model: str = "semi_open") -> bool:
        """Vertex-model containment (s2/contains_point_query.go:25-40):
        'open' excludes the boundary, 'closed' includes it, 'semi_open'
        assigns each boundary point to exactly one of the adjacent
        regions (the crossing-parity rule used everywhere else)."""
        if model == "semi_open":
            return self.contains_point(p)
        on_boundary = self.boundary_contains_point(p)
        if model == "open":
            return (not on_boundary) and self.contains_point(p)
        if model == "closed":
            return on_boundary or self.contains_point(p)
        raise ValueError(f"unknown vertex model {model!r}")

    def contains_points_batch(self, pts: np.ndarray) -> np.ndarray:
        """Vectorized parity test for an (n,3) float64 array.

        Computes the four sign matrices of the crossing ladder
        (s2/edge_crosser.go:37-228) with one matmul each; rows with any
        |det| under the triage bound or any exact vertex hit fall back
        to the scalar robust path.
        """
        if self.is_empty_or_full():
            return np.full(len(pts), self.origin_inside, dtype=bool)
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
        cvs, dvs, cxd = self._edge_arrays()
        n, e = len(pts), len(cvs)
        # chunk so the (n_chunk, e) sign matrices stay memory-bounded
        if n * e > 8_000_000 and n > 1:
            chunk = max(1, 8_000_000 // e)
            return np.concatenate([
                self.contains_points_batch(pts[i:i + chunk])
                for i in range(0, n, chunk)])
        o = np.array(ORIGIN, dtype=np.float64)
        # sign(o,p,x) = (o x p) . x ; per point cross, then matmul
        oxp = np.cross(o[None, :], pts)                     # (n,3)
        det_c = oxp @ cvs.T                                 # (n,e) = sign(o,p,c)
        det_d = oxp @ dvs.T                                 # (n,e) = sign(o,p,d)
        det_b = pts @ cxd.T                                 # (n,e) = sign(c,d,p)
        det_a = cxd @ o                                     # (e,)  = sign(c,d,o)
        eps = MAX_DETERMINANT_ERROR
        ambiguous = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
                     (np.abs(det_b) <= eps) | (np.abs(det_a) <= eps)[None, :])
        amb_rows = ambiguous.any(axis=1)
        # clear-path parity:
        # acb = -sign(o,p,c); bda = sign(o,p,d); cbd = -sign(c,d,p);
        # dac = sign(c,d,o); crossing iff bda==acb and cbd==acb and dac==acb
        acb = -np.sign(det_c)
        crossing = ((np.sign(det_d) == acb) & (-np.sign(det_b) == acb) &
                    (np.sign(det_a)[None, :] == acb))
        parity = crossing.sum(axis=1) & 1
        inside = np.asarray(parity == 1)
        if self.origin_inside:
            inside = ~inside
        if amb_rows.any():
            for idx in np.nonzero(amb_rows)[0]:
                inside[idx] = self.contains_point(tuple(pts[idx]))
        return inside

    def _edge_arrays(self):
        """Cached (cvs, dvs, cxd) edge arrays — recomputing the crosses
        per probe dominates coverer time on dense loops."""
        if self._edge_cache is None:
            cvs = self._varr
            dvs = np.roll(self._varr, -1, axis=0)
            self._edge_cache = (cvs, dvs, np.cross(cvs, dvs))
        return self._edge_cache

    # -- cell relations (covering generator callbacks) ----------------------
    def _any_edge_crosses_cell(self, cell: Cell) -> bool:
        """Any loop edge crossing any cell edge.  Vectorized triage over
        all (cell-edge, loop-edge) pairs; scalar robust ladder only for
        pairs whose four determinants aren't all clear."""
        if self.is_empty_or_full():
            return False
        verts = cell.vertices()
        cvs, dvs, cxd = self._edge_arrays()
        eps = MAX_DETERMINANT_ERROR
        for k in range(4):
            a = np.asarray(verts[k])
            b = np.asarray(verts[(k + 1) & 3])
            axb = np.cross(a, b)
            det_c = cxd @ a          # sign(c,d,a) per loop edge
            det_d = cxd @ b          # sign(c,d,b)
            det_a = axb @ cvs.T      # sign(a,b,c)
            det_b = axb @ dvs.T      # sign(a,b,d)
            ambiguous = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
                         (np.abs(det_a) <= eps) | (np.abs(det_b) <= eps))
            # proper crossing: acb == bda and cbd == acb and dac == acb
            acb = -np.sign(det_a)
            crossing = ((np.sign(det_b) == acb) &
                        (-np.sign(det_d) == acb) &
                        (np.sign(det_c) == acb))
            if (crossing & ~ambiguous).any():
                return True
            for e in np.nonzero(ambiguous)[0]:
                c = tuple(cvs[e])
                d = tuple(dvs[e])
                ta = tuple(a)
                tb = tuple(b)
                if edge_or_vertex_crossing(ta, tb, c, d) or \
                        edge_or_vertex_crossing(tb, ta, c, d):
                    return True
        return False

    def intersects_cell(self, cell: Cell) -> bool:
        """Conservative-exact: any cell vertex inside the loop, any loop
        vertex inside the cell, or any edge pair crossing.  Semantics of
        Loop.IntersectsCell (s2/loop.go:632-716) without the index."""
        if self.is_empty():
            return False
        if self.is_full():
            return True
        if self.contains_points_batch(np.asarray(cell.vertices())).any():
            return True
        if cell.contains_any_point(self._varr):
            return True
        return self._any_edge_crosses_cell(cell)

    def contains_cell(self, cell: Cell) -> bool:
        """All 4 cell vertices inside, no loop vertex in the cell, no
        boundary crossing.  Semantics of Loop.ContainsCell
        (s2/loop.go:632-716)."""
        if self.is_empty():
            return False
        if self.is_full():
            return True
        if not self.contains_points_batch(np.asarray(cell.vertices())).all():
            return False
        if cell.contains_any_point(self._varr):
            return False
        return not self._any_edge_crosses_cell(cell)

    # -- loop-loop relations (s2/loop.go:274-369,917-1005) ------------------
    def _has_crossing_relation(self, other: "Loop", relation) -> bool:
        """Brute-force port of hasCrossingRelation (s2/loop.go:1683-
        1715, minus the ShapeIndex walk): any proper edge crossing, or
        any shared vertex whose wedge processor reports a crossing.
        Mutates ``relation`` (found_shared_vertex etc.)."""
        n, m = len(self.vertices), len(other.vertices)
        for i in range(n):
            ai, ai1 = self.vertices[i], self.vertices[(i + 1) % n]
            for j in range(m):
                bj, bj1 = other.vertices[j], other.vertices[(j + 1) % m]
                if crossing_sign(ai, ai1, bj, bj1) > 0:
                    return True
            for j in range(m):
                if ai == other.vertices[j]:
                    if relation.wedges_cross(
                            self.vertices[(i - 1) % n], ai, ai1,
                            other.vertices[(j - 1) % m],
                            other.vertices[(j + 1) % m]):
                        return True
        return False

    def contains_loop(self, other: "Loop") -> bool:
        """Whether this loop's region contains the other's.

        Exact port of Loop.Contains (s2/loop.go:274-324): (1) no edge
        crossings, (2) at every shared vertex the wedges imply A
        contains B, (3) otherwise A contains a vertex of B and B does
        not contain a vertex of A (detects the union-is-sphere case).
        """
        if self.is_empty_or_full() or other.is_empty_or_full():
            return self.is_full() or other.is_empty()
        relation = _ContainsRelation()
        if self._has_crossing_relation(other, relation):
            return False
        if relation.found_shared_vertex:
            return True
        if not self.contains_point(other.vertices[0]):
            return False
        if other.contains_point(self.vertices[0]):
            return False
        return True

    def intersects_loop(self, other: "Loop") -> bool:
        """Whether the two regions' interiors intersect
        (exact port of Loop.Intersects, s2/loop.go:326-369)."""
        if self.is_empty() or other.is_empty():
            return False
        if self.is_full() or other.is_full():
            return True
        relation = _IntersectsRelation()
        if self._has_crossing_relation(other, relation):
            return True
        if relation.found_shared_vertex:
            return False
        if self.contains_point(other.vertices[0]):
            return True
        if other.contains_point(self.vertices[0]):
            return True
        return False

    def compare_boundary(self, other: "Loop",
                         other_is_hole: bool = False) -> int:
        """+1 if this loop contains the other's boundary, -1 if it
        excludes it, 0 if the boundaries cross.  Shared edge XY is
        contained iff Reversed(XY) == other_is_hole.  Port of
        Loop.compareBoundary (s2/loop.go:917-962)."""
        if self.is_full():
            return 1
        if other.is_full():
            return -1
        relation = _CompareBoundaryRelation(other_is_hole)
        if self._has_crossing_relation(other, relation):
            return 0
        if relation.found_shared_vertex:
            return 1 if relation.contains_edge else -1
        return 1 if self.contains_point(other.vertices[0]) else -1

    def _find_vertex(self, p) -> int:
        """Index of vertex ``p`` in 1..n, or 0 if absent
        (s2/loop.go:915-948, exhaustive branch)."""
        p = tuple(float(c) for c in p)
        n = len(self.vertices)
        for i in range(1, n + 1):
            if self.vertices[i % n] == p:
                return i
        return 0

    def _vertex(self, i: int):
        return self.vertices[i % len(self.vertices)]

    def contains_nested(self, other: "Loop") -> bool:
        """Containment assuming no edge crossings or shared edges
        (shared vertices allowed) — Loop.ContainsNested
        (s2/loop.go:951-983)."""
        from ..functions.edges import wedge_contains
        if self.is_empty_or_full() or len(other.vertices) < 2:
            return self.is_full() or other.is_empty()
        m = self._find_vertex(other._vertex(1))
        if m == 0:
            return self.contains_point(other._vertex(1))
        return wedge_contains(self._vertex(m - 1), self._vertex(m),
                              self._vertex(m + 1), other._vertex(0),
                              other._vertex(2))

    def contains_non_crossing_boundary(self, other: "Loop",
                                       reverse_other: bool) -> bool:
        """Whether this loop contains the other's boundary, given the
        boundaries do not cross (cheaper than compare_boundary).
        Port of Loop.containsNonCrossingBoundary (s2/loop.go:1815-
        1844)."""
        from ..functions.edges import wedge_contains_semiwedge
        if self.is_full():
            return True
        if other.is_full():
            return False
        m = self._find_vertex(other._vertex(0))
        if m == 0:
            return self.contains_point(other._vertex(0))
        return wedge_contains_semiwedge(
            self._vertex(m - 1), self._vertex(m), self._vertex(m + 1),
            other._vertex(1), reverse_other)

    # -- bounds -------------------------------------------------------------
    def rect_bound(self):
        """Conservative-exact lat/lng bound (lat_lo, lat_hi, lng_lo,
        lng_hi) radians, lng interval possibly wrapping (lo > hi).

        Exact RectBounder port (s2/rect_bounder.go:36-230, see
        state/rect_bounder.py) plus the pole adjustment of
        s2/loop.go:191-215.
        """
        if self._bound is not None:
            return self._bound
        if self.is_empty():
            self._bound = (1.0, -1.0, 1.0, -1.0)  # empty
            return self._bound
        if self.is_full():
            self._bound = (-math.pi / 2, math.pi / 2, -math.pi, math.pi)
            return self._bound
        from .rect_bounder import rect_bound_of_chain
        lat_lo, lat_hi, lng_lo, lng_hi = rect_bound_of_chain(
            [tuple(v) for v in self.vertices])
        # Pole handling (s2/loop.go:191-215).
        if self.contains_point((0.0, 0.0, 1.0)):
            lat_hi = math.pi / 2
            lng_lo, lng_hi = -math.pi, math.pi
        if (lng_lo, lng_hi) == (-math.pi, math.pi) and \
                self.contains_point((0.0, 0.0, -1.0)):
            lat_lo = -math.pi / 2
        self._bound = (lat_lo, lat_hi, lng_lo, lng_hi)
        return self._bound

    def cap_bound(self) -> Cap:
        """Bounding cap via the rect bound (semantics of
        s2/loop.go:181-189 -> Rect.CapBound, s2/rect.go:438-467)."""
        if self.is_empty():
            return Cap.empty()
        if self.is_full():
            return Cap.full()
        lat_lo, lat_hi, lng_lo, lng_hi = self.rect_bound()
        # Pole cap
        if lat_hi + lat_lo < 0:
            pole = (0.0, 0.0, -1.0)
            pole_angle = math.pi / 2 + lat_hi
        else:
            pole = (0.0, 0.0, 1.0)
            pole_angle = math.pi / 2 - lat_lo
        pole_cap = Cap.from_center_angle(pole, pole_angle + 1e-12)
        # Mid cap (only valid when the lng interval is not full/wrapping)
        if lng_lo <= lng_hi and (lng_hi - lng_lo) < 2 * math.pi - 1e-12:
            mid_lat = (lat_lo + lat_hi) / 2
            mid_lng = (lng_lo + lng_hi) / 2
            cx, cy, cz = (float(v) for v in latlng_deg_to_xyz(
                np.degrees(mid_lat), np.degrees(mid_lng)))
            r2 = 0.0
            for la, ln in ((lat_lo, lng_lo), (lat_lo, lng_hi),
                           (lat_hi, lng_lo), (lat_hi, lng_hi)):
                vx, vy, vz = (float(v) for v in latlng_deg_to_xyz(
                    np.degrees(la), np.degrees(ln)))
                d2 = (vx - cx) ** 2 + (vy - cy) ** 2 + (vz - cz) ** 2
                r2 = max(r2, d2)
            mid_cap = Cap((cx, cy, cz), min(4.0, r2 * (1 + 1e-9) + 1e-15))
            if mid_cap.radius_chord2 < pole_cap.radius_chord2:
                return mid_cap
        return pole_cap

    def cell_union_bound(self) -> List[int]:
        return self.cap_bound().cell_union_bound()

    # -- measures -----------------------------------------------------------
    def turning_angle_and_area(self):
        """Signed area via Green's theorem / l'Huilier accumulation.

        Semantics of s2/loop.go:1007-1066: area = 2*pi - turning angle
        for CCW loops; normalized into [0, 4*pi].
        """
        if self.is_empty():
            return 0.0
        if self.is_full():
            return 4 * math.pi
        total = 0.0
        n = len(self.vertices)
        for i in range(n):
            a = self._varr[(i - 1) % n]
            b = self._varr[i]
            c = self._varr[(i + 1) % n]
            total += _turn_angle(a, b, c)
        area = 2 * math.pi - total
        if area < 0:
            area += 4 * math.pi
        if area > 4 * math.pi:
            area -= 4 * math.pi
        return max(0.0, min(4 * math.pi, area))

    def area(self) -> float:
        return self.turning_angle_and_area()

    def centroid(self):
        """True centroid * area (not normalized), via the triangle
        centroid accumulation of s2/centroids.go:61-101."""
        if self.is_empty_or_full():
            return (0.0, 0.0, 0.0)
        origin = self._varr[0]
        total = np.zeros(3)
        for i in range(1, len(self.vertices) - 1):
            total += _triangle_true_centroid(origin, self._varr[i],
                                             self._varr[i + 1])
        return tuple(float(c) for c in total)

    def validate(self):
        """Structural validity, s2/loop.go:219-270: >=3 vertices (unless
        empty/full), unit length, no duplicate or antipodal adjacent
        vertices.  Raises ValueError."""
        if self.is_empty_or_full():
            return
        if len(self.vertices) < 3:
            raise ValueError("non-empty, non-full loops must have >= 3 vertices")
        n = len(self.vertices)
        for i, v in enumerate(self.vertices):
            norm = v[0] ** 2 + v[1] ** 2 + v[2] ** 2
            if abs(norm - 1.0) > 1e-10:
                raise ValueError(f"vertex {i} is not unit length")
            nxt = self.vertices[(i + 1) % n]
            if v == nxt:
                raise ValueError(f"duplicate adjacent vertices at {i}")
            if v == (-nxt[0], -nxt[1], -nxt[2]):
                raise ValueError(f"antipodal adjacent vertices at {i}")


class _ContainsRelation:
    """loopRelation for Contains (s2/loop.go:1734-1746): a shared
    vertex whose wedge fails WedgeContains is equivalent to an edge
    crossing."""

    def __init__(self):
        self.found_shared_vertex = False

    def wedges_cross(self, a0, ab1, a2, b0, b2) -> bool:
        from ..functions.edges import wedge_contains
        self.found_shared_vertex = True
        return not wedge_contains(a0, ab1, a2, b0, b2)


class _IntersectsRelation:
    """loopRelation for Intersects (s2/loop.go:1748-1760)."""

    def __init__(self):
        self.found_shared_vertex = False

    def wedges_cross(self, a0, ab1, a2, b0, b2) -> bool:
        from ..functions.edges import wedge_intersects
        self.found_shared_vertex = True
        return wedge_intersects(a0, ab1, a2, b0, b2)


class _CompareBoundaryRelation:
    """loopRelation for compareBoundary (s2/loop.go:1762-1799): tracks
    whether any edge of the other loop is contained/excluded; both at
    once means the boundaries cross."""

    def __init__(self, reverse: bool):
        self.reverse = reverse
        self.found_shared_vertex = False
        self.contains_edge = False
        self.excludes_edge = False

    def wedges_cross(self, a0, ab1, a2, b0, b2) -> bool:
        from ..functions.edges import wedge_contains_semiwedge
        self.found_shared_vertex = True
        if wedge_contains_semiwedge(a0, ab1, a2, b2, self.reverse):
            self.contains_edge = True
        else:
            self.excludes_edge = True
        return self.contains_edge and self.excludes_edge


def _turn_angle(a, b, c):
    """TurnAngle(a,b,c), s2/point_measures.go:124-141: positive for CCW
    turns, computed stably via the angle between the edge normals."""
    n1 = np.cross(a, b)
    n2 = np.cross(b, c)
    angle = math.atan2(float(np.linalg.norm(np.cross(n1, n2))),
                       float(n1 @ n2))
    s = robust_sign(tuple(a), tuple(b), tuple(c))
    return angle * (1.0 if s > 0 else -1.0)


def _triangle_true_centroid(a, b, c):
    """TrueCentroid of a spherical triangle (times its signed area),
    s2/centroids.go:61-101: with angle_x the angle at the edge opposite
    vertex x and r_x = angle_x/sin(angle_x), the centroid integral is
    0.5 * (det-weighted combination of the component vectors)."""
    def _angle(u, v):
        return math.atan2(float(np.linalg.norm(np.cross(u, v))), float(u @ v))

    angle_a = _angle(b, c)
    angle_b = _angle(c, a)
    angle_c = _angle(a, b)
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


def _lng_interval_union(lngs: np.ndarray):
    """Union of the shortest-arc longitude intervals of consecutive
    vertices (radians).  Returns (lo, hi); lo > hi encodes wrap; the
    full interval is (-pi, pi).  Semantics of s1.Interval AddPoint
    (s1/interval.go) as used by RectBounder."""
    lo = hi = float(lngs[0])
    full = (-math.pi, math.pi)

    def _contains(lo, hi, p):
        if lo <= hi:
            return lo <= p <= hi
        return p >= lo or p <= hi

    def _add(lo, hi, p):
        if _contains(lo, hi, p):
            return lo, hi
        # distance from hi forward to p, and from p forward to lo
        fwd = (p - hi) % (2 * math.pi)
        bwd = (lo - p) % (2 * math.pi)
        if fwd <= bwd:
            return lo, p
        return p, hi

    n = len(lngs)
    for i in range(1, n + 1):
        p = float(lngs[i % n])
        new = _add(lo, hi, p)
        lo, hi = new
        span = (hi - lo) if lo <= hi else (2 * math.pi - (lo - hi))
        if span >= 2 * math.pi - 1e-9:
            return full
    # pad slightly (conservative)
    pad = 1e-11
    lo2 = lo - pad
    hi2 = hi + pad
    if lo2 < -math.pi:
        lo2 += 2 * math.pi
    if hi2 > math.pi:
        hi2 -= 2 * math.pi
    return lo2, hi2

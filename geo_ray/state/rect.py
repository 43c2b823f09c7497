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

    # -- exact cell relations (s2/rect.go:303-431) --------------------------
    def _lat_rad(self):
        return math.radians(self.lat_lo), math.radians(self.lat_hi)

    def _lng_rad(self):
        return math.radians(self.lng_lo), math.radians(self.lng_hi)

    def center_latlng(self) -> tuple:
        lat = (self.lat_lo + self.lat_hi) / 2
        if self.lng_lo <= self.lng_hi:
            lng = (self.lng_lo + self.lng_hi) / 2
        else:
            span = self.lng_hi + 360.0 - self.lng_lo
            lng = self.lng_lo + span / 2
            if lng > 180.0:
                lng -= 360.0
        return lat, lng

    def contains_rect_rad(self, lat_lo, lat_hi, lng_lo, lng_hi) -> bool:
        """Wrap-aware rect-contains-rect (radians other)."""
        slat_lo, slat_hi = self._lat_rad()
        if not (slat_lo <= lat_lo and lat_hi <= slat_hi):
            return False
        return _lng_interval_contains(self._lng_rad(), (lng_lo, lng_hi))

    def intersects_rect_rad(self, lat_lo, lat_hi, lng_lo, lng_hi) -> bool:
        slat_lo, slat_hi = self._lat_rad()
        if lat_hi < slat_lo or lat_lo > slat_hi:
            return False
        return _lng_interval_intersects(self._lng_rad(), (lng_lo, lng_hi))

    def is_empty(self) -> bool:
        return self.lat_lo > self.lat_hi

    # -- rect algebra (s2/rect.go:197-225) ----------------------------------
    @classmethod
    def empty(cls) -> "Rect":
        """r1.EmptyInterval x s1.EmptyInterval (s2/rect.go:40)."""
        return cls(1.0, 0.0, 180.0, -180.0)

    @classmethod
    def full(cls) -> "Rect":
        return cls(-90.0, 90.0, -180.0, 180.0)

    def union(self, other: "Rect") -> "Rect":
        """Smallest Rect containing both (s2/rect.go:197-204): the
        lat intervals union as plain r1 intervals, the lng intervals
        as wrap-aware s1 intervals (closest-endpoints rule when
        disjoint)."""
        if self.is_empty():
            lat = (other.lat_lo, other.lat_hi)
        elif other.is_empty():
            lat = (self.lat_lo, self.lat_hi)
        else:
            lat = (min(self.lat_lo, other.lat_lo),
                   max(self.lat_hi, other.lat_hi))
        lng = _s1_union((self.lng_lo, self.lng_hi),
                        (other.lng_lo, other.lng_hi))
        return Rect(lat[0], lat[1], lng[0], lng[1])

    def intersection(self, other: "Rect") -> "Rect":
        """Smallest Rect containing the intersection
        (s2/rect.go:206-218); a two-piece lng intersection returns
        one interval spanning both pieces, and an empty axis on
        either side empties the whole rect."""
        lat = (max(self.lat_lo, other.lat_lo),
               min(self.lat_hi, other.lat_hi))
        lng = _s1_intersection((self.lng_lo, self.lng_hi),
                               (other.lng_lo, other.lng_hi))
        if lat[0] > lat[1] or _s1_is_empty(lng):
            return Rect.empty()
        return Rect(lat[0], lat[1], lng[0], lng[1])

    def contains_rect(self, other: "Rect") -> bool:
        """s2/rect.go Contains(other Rect) via the radian helper."""
        if other.is_empty():
            return True
        if self.is_empty():
            return False
        return self.contains_rect_rad(math.radians(other.lat_lo),
                                      math.radians(other.lat_hi),
                                      math.radians(other.lng_lo),
                                      math.radians(other.lng_hi))

    def intersects_rect(self, other: "Rect") -> bool:
        if self.is_empty() or other.is_empty():
            return False
        return self.intersects_rect_rad(math.radians(other.lat_lo),
                                        math.radians(other.lat_hi),
                                        math.radians(other.lng_lo),
                                        math.radians(other.lng_hi))

    def contains_cell_exact(self, cell: Cell) -> bool:
        """r.Contains(cell.RectBound()) — exact because a lat/lng rect
        contains a cell iff it contains the cell's bounding rect
        (s2/rect.go:294-300)."""
        if self.is_empty():
            return False
        return self.contains_rect_rad(*cell.rect_bound())

    def intersects_cell_exact(self, cell: Cell) -> bool:
        """Exact boundary-intersection algorithm of s2/rect.go:303-367."""
        if self.is_empty():
            return False
        # containment fast paths
        lat_c, lng_c = self.center_latlng()
        cx, cy, cz = (float(v) for v in latlng_deg_to_xyz(
            np.float64(lat_c), np.float64(lng_c)))
        if cell.contains_point((cx, cy, cz)):
            return True
        if self.contains_point(cell.center()):
            return True
        if not self.intersects_rect_rad(*cell.rect_bound()):
            return False
        verts = cell.vertices()
        latlngs = []
        for v in verts:
            lat = math.asin(max(-1.0, min(1.0, v[2])))
            lng = math.atan2(v[1], v[0])
            latlngs.append((lat, lng))
            if self.contains_latlng(math.degrees(lat), math.degrees(lng)):
                return True
        for la in (self.lat_lo, self.lat_hi):
            for ln in (self.lng_lo, self.lng_hi):
                x, y, z = (float(v) for v in latlng_deg_to_xyz(
                    np.float64(la), np.float64(ln)))
                if cell.contains_point((x, y, z)):
                    return True
        lat_lo_r, lat_hi_r = self._lat_rad()
        lng_r = self._lng_rad()
        for i in range(4):
            a, b = verts[i], verts[(i + 1) & 3]
            edge_lng = _lng_interval_from_pair(latlngs[i][1],
                                               latlngs[(i + 1) & 3][1])
            if not _lng_interval_intersects(lng_r, edge_lng):
                continue
            for ln in lng_r:
                if _lng_interval_contains_point(edge_lng, ln):
                    if _intersects_lng_edge(a, b, lat_lo_r, lat_hi_r, ln):
                        return True
            if _intersects_lat_edge(a, b, lat_lo_r, lng_r):
                return True
            if _intersects_lat_edge(a, b, lat_hi_r, lng_r):
                return True
        return False

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
        """Exact (s2/rect.go:303-367) — see intersects_cell_exact."""
        return self.intersects_cell_exact(cell)

    def contains_cell(self, cell: Cell) -> bool:
        """Exact: a lat/lng rect contains a cell iff it contains the
        cell's bounding rect (s2/rect.go:294-300)."""
        return self.contains_cell_exact(cell)

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

    # -- Hausdorff distances, closed form (s2/rect.go:469-653) --------------

    def distance_to_latlng(self, lat_deg: float, lng_deg: float) -> float:
        """Min distance (radians) from a point to the rect, boundary or
        interior (s2/rect.go:469-484)."""
        from ..functions import s1interval as s1
        lat, lng = math.radians(lat_deg), math.radians(lng_deg)
        lat_iv, lng_iv = self._lat_rad(), self._lng_rad()
        if s1.contains(lng_iv, lng):
            return max(0.0, lat - lat_iv[1], lat_iv[0] - lat)
        i = s1.from_endpoints(lng_iv[1], s1.complement_center(lng_iv))
        rect_lng = lng_iv[1] if s1.contains(i, lng) else lng_iv[0]
        lo = _pt_rad(lat_iv[0], rect_lng)
        hi = _pt_rad(lat_iv[1], rect_lng)
        return _dist_seg(_pt_rad(lat, lng), lo, hi)

    def directed_hausdorff_distance(self, other: "Rect") -> float:
        """h(A, B) = max_{p in A} min_{q in B} d(p, q), radians
        (s2/rect.go:486-499 closed form; replaces the sampled
        approximation of functions/distance.directed_hausdorff_chord2
        for exact rect-to-rect queries)."""
        from ..functions import s1interval as s1
        if self.is_empty():
            return 0.0
        if other.is_empty():
            return math.pi
        lng = s1.directed_hausdorff(self._lng_rad(), other._lng_rad())
        return _directed_hausdorff_lat(lng, self._lat_rad(),
                                       other._lat_rad())

    def hausdorff_distance(self, other: "Rect") -> float:
        """H(A, B) = max{h(A, B), h(B, A)} (s2/rect.go:501-509)."""
        return max(self.directed_hausdorff_distance(other),
                   other.directed_hausdorff_distance(self))


# -- s1.Interval algebra in DEGREES (s1/interval.go, 180 == pi) ------------
# Exact ports used by Rect.union / Rect.intersection; an interval is a
# (lo, hi) degree pair, lo > hi == inverted (wraps the antimeridian),
# empty == (180, -180), full == (-180, 180).

def s1_interval_from_endpoints(lo: float, hi: float):
    """s1/interval.go:60-70: -180 endpoints normalize to +180 unless
    the interval is full."""
    lo0, hi0 = lo, hi
    if lo0 == -180.0 and hi0 != 180.0:
        lo = 180.0
    if hi0 == -180.0 and lo0 != 180.0:
        hi = 180.0
    return (lo, hi)


def _s1_is_empty(iv) -> bool:
    return iv[0] == 180.0 and iv[1] == -180.0


def _s1_is_full(iv) -> bool:
    return iv[0] == -180.0 and iv[1] == 180.0


def _s1_is_inverted(iv) -> bool:
    return iv[0] > iv[1]


def _s1_fast_contains(iv, p: float) -> bool:
    """s1/interval.go:131-136 (assumes p already in [-180, 180])."""
    if _s1_is_inverted(iv):
        return (p >= iv[0] or p <= iv[1]) and not _s1_is_empty(iv)
    return iv[0] <= p <= iv[1]


def _s1_contains_interval(a, b) -> bool:
    """s1/interval.go:148-159."""
    if _s1_is_inverted(a):
        if _s1_is_inverted(b):
            return b[0] >= a[0] and b[1] <= a[1]
        return (b[0] >= a[0] or b[1] <= a[1]) and not _s1_is_empty(a)
    if _s1_is_inverted(b):
        return _s1_is_full(a) or _s1_is_empty(b)
    return b[0] >= a[0] and b[1] <= a[1]


def _s1_length(iv) -> float:
    """s1/interval.go:118-127 (negative == empty)."""
    l = iv[1] - iv[0]
    if l >= 0:
        return l
    l += 360.0
    return l if l > 0 else -1.0


def _s1_positive_distance(a: float, b: float) -> float:
    """Distance a -> b counterclockwise in [0, 360)
    (s1/interval.go:216-222)."""
    d = b - a
    if d >= 0:
        return d
    return (b + 180.0) - (a - 180.0)


def _s1_union(i, oi):
    """s1/interval.go:225-253."""
    if _s1_is_empty(oi):
        return i
    if _s1_fast_contains(i, oi[0]):
        if _s1_fast_contains(i, oi[1]):
            # either oi inside i, or the union is full
            if _s1_contains_interval(i, oi):
                return i
            return (-180.0, 180.0)
        return (i[0], oi[1])
    if _s1_fast_contains(i, oi[1]):
        return (oi[0], i[1])
    # neither endpoint of oi is inside i: i inside oi, or disjoint
    if _s1_is_empty(i) or _s1_fast_contains(oi, i[0]):
        return oi
    # disjoint: bridge the closer pair of endpoints
    if _s1_positive_distance(oi[1], i[0]) < _s1_positive_distance(i[1], oi[0]):
        return (oi[0], i[1])
    return (i[0], oi[1])


def _s1_intersection(i, oi):
    """s1/interval.go:256-283."""
    if _s1_is_empty(oi):
        return (180.0, -180.0)
    if _s1_fast_contains(i, oi[0]):
        if _s1_fast_contains(i, oi[1]):
            # oi inside i, or they intersect twice: return the shorter
            if _s1_length(oi) < _s1_length(i):
                return oi
            return i
        return (oi[0], i[1])
    if _s1_fast_contains(i, oi[1]):
        return (i[0], oi[1])
    if _s1_fast_contains(oi, i[0]):
        return i
    return (180.0, -180.0)


# -- wrap-aware longitude interval helpers (s1.Interval semantics) ---------

def _lng_norm(x: float) -> float:
    while x > math.pi:
        x -= 2 * math.pi
    while x < -math.pi:
        x += 2 * math.pi
    return x


def _lng_interval_from_pair(a: float, b: float):
    """Shortest interval containing both points (s1.IntervalFromEndpoints
    + AddPoint semantics)."""
    a, b = _lng_norm(a), _lng_norm(b)
    if abs(b - a) <= math.pi:
        return (min(a, b), max(a, b))
    return (max(a, b), min(a, b))  # wraps


def _lng_interval_contains_point(iv, p: float) -> bool:
    lo, hi = iv
    p = _lng_norm(p)
    if lo <= hi:
        return lo <= p <= hi
    return p >= lo or p <= hi


def _lng_interval_contains(a, b) -> bool:
    """Interval a contains interval b (both possibly wrapping)."""
    alo, ahi = a
    blo, bhi = b
    if alo <= ahi and blo > bhi:
        return alo == -math.pi and ahi == math.pi
    return (_lng_interval_contains_point(a, blo) and
            _lng_interval_contains_point(a, bhi) and
            (_span(a) >= _span(b)))


def _span(iv) -> float:
    lo, hi = iv
    return (hi - lo) if lo <= hi else (2 * math.pi - (lo - hi))


def _lng_interval_intersects(a, b) -> bool:
    return (_lng_interval_contains_point(a, b[0]) or
            _lng_interval_contains_point(a, b[1]) or
            _lng_interval_contains_point(b, a[0]) or
            _lng_interval_contains_point(b, a[1]))


def _intersects_lng_edge(a, b, lat_lo: float, lat_hi: float,
                         lng: float) -> bool:
    """Edge AB vs the constant-longitude segment (a geodesic),
    s2/rect.go:369-377."""
    from ..functions.edges import crossing_sign

    c = tuple(float(v) for v in latlng_deg_to_xyz(
        np.float64(math.degrees(lat_lo)), np.float64(math.degrees(lng))))
    d = tuple(float(v) for v in latlng_deg_to_xyz(
        np.float64(math.degrees(lat_hi)), np.float64(math.degrees(lng))))
    return crossing_sign(tuple(a), tuple(b), c, d) > 0


def _intersects_lat_edge(a, b, lat: float, lng_iv) -> bool:
    """Edge AB vs a constant-latitude curve segment (NOT a geodesic),
    s2/rect.go:379-431."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    z = np.cross(a, b)
    nz = np.linalg.norm(z)
    if nz == 0:
        return False
    z = z / nz
    if z[2] < 0:
        z = -z
    # orthonormal frame: x = direction of max latitude on circle AB
    y = np.cross(z, [0.0, 0.0, 1.0])
    ny = np.linalg.norm(y)
    if ny == 0:
        return False  # AB lies on a meridian circle through the poles? (z=+-z axis)
    y = y / ny
    x = np.cross(y, z)
    sin_lat = math.sin(lat)
    if abs(sin_lat) >= x[2]:
        return False  # the circle never reaches this latitude
    cos_theta = sin_lat / x[2]
    sin_theta = math.sqrt(1 - cos_theta * cos_theta)
    theta = math.atan2(sin_theta, cos_theta)
    # range of theta spanned by edge AB
    ab_theta = _lng_interval_from_pair(
        math.atan2(float(a @ y), float(a @ x)),
        math.atan2(float(b @ y), float(b @ x)))
    for t in (theta, -theta):
        if _lng_interval_contains_point(ab_theta, t):
            isect = x * math.cos(t) + y * math.sin(t)
            if _lng_interval_contains_point(lng_iv,
                                            math.atan2(isect[1], isect[0])):
                return True
    return False


# -- Hausdorff helpers (s2/rect.go:520-653) ---------------------------------

def _pt_rad(lat: float, lng: float) -> np.ndarray:
    """PointFromLatLng on radian inputs."""
    cos_lat = math.cos(lat)
    return np.array([cos_lat * math.cos(lng), cos_lat * math.sin(lng),
                     math.sin(lat)])


def _angle_vv(p: np.ndarray, q: np.ndarray) -> float:
    """r3.Vector.Angle: atan2(|pxq|, p.q) -- scale invariant."""
    return math.atan2(float(np.linalg.norm(np.cross(p, q))),
                      float(np.dot(p, q)))


def _dist_seg(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> float:
    """DistanceFromSegment in radians via the chord2 kernel."""
    from ..functions.distance import chord2_point_edge
    c2 = chord2_point_edge(x, a, b)
    return 2.0 * math.asin(min(1.0, 0.5 * math.sqrt(max(0.0, c2))))


def _directed_hausdorff_lat(lng_diff: float, a, b) -> float:
    """Directed Hausdorff distance between two longitudinal edges with
    latitude ranges ``a``/``b`` and longitude separation ``lng_diff``
    (s2/rect.go:520-601; see that comment block for the Voronoi-region
    case analysis)."""
    assert 0.0 <= lng_diff <= math.pi
    if lng_diff == 0.0:
        # r1.Interval.DirectedHausdorffDistance (r1/interval.go:166-178)
        if a[0] > a[1]:
            return 0.0
        if b[0] > b[1]:
            return math.inf
        return max(0.0, a[1] - b[1], b[0] - a[0])

    b_lng = lng_diff
    b_lo = _pt_rad(b[0], b_lng)
    b_hi = _pt_rad(b[1], b_lng)
    a_lo = _pt_rad(a[0], 0.0)
    a_hi = _pt_rad(a[1], 0.0)
    max_d = max(_dist_seg(a_lo, b_lo, b_hi), _dist_seg(a_hi, b_lo, b_hi))

    if lng_diff <= math.pi / 2:
        # Case A2: both edges cross the equator.
        if a[0] <= 0.0 <= a[1] and b[0] <= 0.0 <= b[1]:
            max_d = max(max_d, lng_diff)
        return max_d

    # Case B2: intersection of edge a with the bisector great circle E3.
    p = _bisector_intersection(b, b_lng)
    p_lat = math.asin(max(-1.0, min(1.0, p[2] / float(np.linalg.norm(p)))))
    if a[0] <= p_lat <= a[1]:
        max_d = max(max_d, _angle_vv(p, b_lo))

    # Case B3: interior maxima below/above the bisector intersection.
    if p_lat > a[0]:
        d = _interior_max_distance((a[0], min(p_lat, a[1])), b_lo)
        if d is not None:
            max_d = max(max_d, d)
    if p_lat < a[1]:
        d = _interior_max_distance((max(p_lat, a[0]), a[1]), b_hi)
        if d is not None:
            max_d = max(max_d, d)
    return max_d


def _interior_max_distance(a_lat, b: np.ndarray):
    """Max distance from b to the lat range a_lat on longitude 0 if the
    max occurs in the interior (s2/rect.go:604-620); None otherwise."""
    if a_lat[0] > a_lat[1] or b[0] >= 0.0:
        return None
    ip = np.array([-b[0], 0.0, -b[2]])
    n = float(np.linalg.norm(ip))
    if n == 0.0:
        return None
    ip /= n
    ip_lat = math.asin(max(-1.0, min(1.0, ip[2])))
    if not (a_lat[0] < ip_lat < a_lat[1]):
        return None
    return _angle_vv(b, ip)


def _bisector_intersection(lat_iv, lng: float) -> np.ndarray:
    """Intersection of longitude 0 with the bisector of the edge on
    longitude ``lng`` spanning ``lat_iv`` (s2/rect.go:622-640)."""
    lng = abs(lng)
    lat_center = 0.5 * (lat_iv[0] + lat_iv[1])
    if lat_center < 0:
        ortho_bisector = _pt_rad(-lat_center - math.pi / 2, lng - math.pi)
    else:
        ortho_bisector = _pt_rad(lat_center - math.pi / 2, lng)
    ortho_lng = np.array([0.0, -1.0, 0.0])
    # Point.PointCross: (a+b) x (b-a) = 2 a x b, nonzero for antipodal
    return np.cross(ortho_lng + ortho_bisector, ortho_bisector - ortho_lng)

"""Point-edge and edge-edge distance kernels (vectorized).

Semantics of reference s2/edge_distances.go:30-418: distances are
ChordAngles (squared chord lengths) for cheap comparison; projection
onto an edge; geodesic interpolation.  These are the scoring kernels
for kNN refinement and distance joins.
"""

from __future__ import annotations

import numpy as np


def _dot(a, b):
    return np.einsum("...i,...i->...", a, b)


def _norm(a):
    return np.sqrt(_dot(a, a))


def _cross(a, b):
    return np.cross(a, b)


def _normalize(a):
    n = _norm(a)
    return a / np.where(n == 0, 1.0, n)[..., None]


def chord2_point_point(p, q):
    d = p - q
    return _dot(d, d)


def project_to_edge(x, a, b):
    """Closest point on geodesic edge AB to X, s2/edge_distances.go:190-230
    (Project): the interior projection if it lies on the edge, else the
    closer endpoint."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a_cross_b = _cross(a, b)
    # component of x perpendicular to the plane of AB, removed:
    p = x - (a_cross_b * (_dot(x, a_cross_b) / _dot(a_cross_b, a_cross_b))[..., None])
    p = _normalize(p)
    # interior iff p is between a and b along the great circle
    on_ab = (_dot(_cross(a, p), a_cross_b) > 0) & (_dot(_cross(p, b), a_cross_b) > 0)
    da = chord2_point_point(x, a)
    db = chord2_point_point(x, b)
    endpoint = np.where(da[..., None] <= db[..., None], a, b)
    return np.where(on_ab[..., None], p, endpoint)


def chord2_point_edge(x, a, b):
    """Min squared-chord distance from X to edge AB (semantics of
    updateMinDistance, s2/edge_distances.go:224-270)."""
    closest = project_to_edge(x, a, b)
    return chord2_point_point(np.asarray(x, dtype=np.float64), closest)


def max_chord2_point_edge(x, a, b):
    """Max distance from X to edge AB = max over endpoints unless the
    antipode of x projects onto the edge (s2/edge_distances.go:284-330)."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d = np.maximum(chord2_point_point(x, a), chord2_point_point(x, b))
    # antipodal interior case
    neg = chord2_point_edge(-x, a, b)
    anti = 4.0 - neg
    interior = neg < np.minimum(chord2_point_point(-x, a),
                                chord2_point_point(-x, b))
    return np.where(interior, np.maximum(d, anti), d)


def interpolate(a, b, t):
    """Point at fraction t along geodesic AB, s2/edge_distances.go:129-152."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    angle = np.arctan2(_norm(_cross(a, b)), _dot(a, b))
    return interpolate_at_distance(a, b, t * angle)


def interpolate_at_distance(a, b, rad):
    """Point at angular distance ``rad`` along AB from A,
    s2/edge_distances.go:154-170."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    rad = np.asarray(rad, dtype=np.float64)
    # unit tangent at a toward b
    tangent = _normalize(b - a * _dot(a, b)[..., None])
    return a * np.cos(rad)[..., None] + tangent * np.sin(rad)[..., None]


def chord2_edge_edge(a, b, c, d):
    """Min distance between edges AB and CD: zero if they cross, else
    min over endpoint-edge distances (updateEdgePairMinDistance,
    s2/edge_distances.go:334-370)."""
    from .edges import crossing_sign
    if crossing_sign(tuple(a), tuple(b), tuple(c), tuple(d)) > 0:
        return 0.0
    return float(min(chord2_point_edge(np.asarray(c), np.asarray(a), np.asarray(b)),
                     chord2_point_edge(np.asarray(d), np.asarray(a), np.asarray(b)),
                     chord2_point_edge(np.asarray(a), np.asarray(c), np.asarray(d)),
                     chord2_point_edge(np.asarray(b), np.asarray(c), np.asarray(d))))


_EPS64 = 2.220446049250313e-16
_UNIT_ROUNDOFF = _EPS64 / 2          # s2/predicates.go:42
_T_ERR = _EPS64 / 2                  # roundingEpsilon(float64)
INTERSECTION_ERROR = 8 * _UNIT_ROUNDOFF  # s2/edge_crossings.go:32


def _cmp_vec(a, b) -> int:
    """r3.Vector.Cmp: lexicographic (x, y, z)."""
    for i in range(3):
        if a[i] < b[i]:
            return -1
        if a[i] > b[i]:
            return 1
    return 0


def _compare_edges(a0, a1, b0, b1) -> bool:
    """s2/edge_crossings.go:271-279."""
    if _cmp_vec(a0, a1) != -1:
        a0, a1 = a1, a0
    if _cmp_vec(b0, b1) != -1:
        b0, b1 = b1, b0
    return _cmp_vec(a0, b0) == -1 or \
        (tuple(a0) == tuple(b0) and _cmp_vec(b0, b1) == -1)


def _projection(x, a_norm, a_norm_len, a0, a1):
    """Signed distance of x from the plane through (a0,a1) scaled by
    |a_norm|, with a rigorous error bound.  s2/edge_crossings.go:228-267."""
    import math
    x0 = x - a0
    x1 = x - a1
    x0d2 = float(x0 @ x0)
    x1d2 = float(x1 @ x1)
    if x0d2 < x1d2 or (x0d2 == x1d2 and _cmp_vec(x0, x1) == -1):
        dist = math.sqrt(x0d2)
        proj = float(x0 @ a_norm)
    else:
        dist = math.sqrt(x1d2)
        proj = float(x1 @ a_norm)
    bound = (((3.5 + 2 * math.sqrt(3)) * a_norm_len +
              32 * math.sqrt(3) * _UNIT_ROUNDOFF) * dist +
             1.5 * abs(proj)) * _T_ERR
    return proj, bound


def _intersection_stable_sorted(a0, a1, b0, b1):
    """s2/edge_crossings.go:300-360; first edge must be the longer."""
    import math
    a_norm = np.cross(a0 - a1, a0 + a1)
    a_norm_len = float(np.linalg.norm(a_norm))
    b_len = float(np.linalg.norm(b1 - b0))
    b0_dist, b0_err = _projection(b0, a_norm, a_norm_len, a0, a1)
    b1_dist, b1_err = _projection(b1, a_norm, a_norm_len, a0, a1)
    dist_sum = abs(b0_dist - b1_dist)
    err_sum = b0_err + b1_err
    if dist_sum <= err_sum:
        return None
    x = b1 * b0_dist - b0 * b1_dist
    err = (b_len * abs(b0_dist * b1_err - b1_dist * b0_err) /
           (dist_sum - err_sum) + 2 * dist_sum * _T_ERR)
    x_len = float(np.linalg.norm(x))
    if err > (INTERSECTION_ERROR - _T_ERR) * x_len:
        return None
    return x / x_len


def _intersection_stable(a0, a1, b0, b1):
    """s2/edge_crossings.go:283-297: longer edge provides the normal."""
    a_len2 = float((a1 - a0) @ (a1 - a0))
    b_len2 = float((b1 - b0) @ (b1 - b0))
    if a_len2 < b_len2 or (a_len2 == b_len2 and
                           _compare_edges(a0, a1, b0, b1)):
        return _intersection_stable_sorted(b0, b1, a0, a1)
    return _intersection_stable_sorted(a0, a1, b0, b1)


def _intersection_exact(a0, a1, b0, b1) -> np.ndarray:
    """Exact-rational cross-of-crosses, rounded to double at the end
    (s2/edge_crossings.go:362-400); collinear edges fall back to the
    lexicographically-smallest interior shared endpoint."""
    from fractions import Fraction

    def _fr(v):
        return (Fraction(float(v[0])), Fraction(float(v[1])),
                Fraction(float(v[2])))

    def _cross(u, v):
        return (u[1] * v[2] - u[2] * v[1],
                u[2] * v[0] - u[0] * v[2],
                u[0] * v[1] - u[1] * v[0])

    a_norm = _cross(_fr(a0), _fr(a1))
    b_norm = _cross(_fr(b0), _fr(b1))
    xf = _cross(a_norm, b_norm)
    if xf == (0, 0, 0):
        # exactly collinear: of the four endpoints exactly two lie in
        # the other edge's interior; return the lexicographically
        # smaller (SoS still calls this a crossing).
        from .predicates import ordered_ccw
        an = np.array([float(c) for c in a_norm])
        bn = np.array([float(c) for c in b_norm])
        x = np.array([10.0, 10.0, 10.0])
        for p, (e0, e1, nrm) in ((a0, (b0, b1, bn)), (a1, (b0, b1, bn)),
                                 (b0, (a0, a1, an)), (b1, (a0, a1, an))):
            if ordered_ccw(tuple(e0), tuple(p), tuple(e1), tuple(nrm)) \
                    and _cmp_vec(p, x) == -1:
                x = np.asarray(p, dtype=np.float64)
        return x
    x = np.array([float(c) for c in xf])
    n = np.linalg.norm(x)
    return x / n if n > 0 else x


def edge_intersection_robust(a, b, c, d) -> np.ndarray:
    """Intersection point of crossing edges AB and CD within
    INTERSECTION_ERROR of the true point: the stable projection /
    interpolation path with an exact-arithmetic fallback when its
    error bound fails (Intersection, s2/edge_crossings.go:172-205)."""
    a0 = np.asarray(a, dtype=np.float64)
    a1 = np.asarray(b, dtype=np.float64)
    b0 = np.asarray(c, dtype=np.float64)
    b1 = np.asarray(d, dtype=np.float64)
    pt = _intersection_stable(a0, a1, b0, b1)
    if pt is None:
        pt = _intersection_exact(a0, a1, b0, b1)
    if float(pt @ ((a0 + a1) + (b0 + b1))) < 0:
        pt = -pt
    return pt


def edge_intersection(a, b, c, d) -> np.ndarray:
    """Intersection point of crossing edges AB and CD (stable variant
    of s2/edge_crossings.go:172-250): the direction (A x B) x (C x D)
    normalized and oriented toward the edge midpoints.  Caller must
    ensure the edges actually cross (crossing_sign > 0); the result is
    within ~intersectionError of the true point for non-degenerate
    crossings."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    x = np.cross(np.cross(a, b), np.cross(c, d))
    n = np.linalg.norm(x)
    if n == 0:
        # nearly-parallel great circles: fall back to the closest
        # endpoint midpoint
        m = a + b + c + d
        return m / np.linalg.norm(m)
    x = x / n
    if float(x @ (a + b + c + d)) < 0:
        x = -x
    return x


def directed_hausdorff_chord2(a_pts: np.ndarray, b_pts: np.ndarray) -> float:
    """Directed Hausdorff distance (squared chord) from point set A to
    point set B: max over A of min distance to B.  Semantics of the
    rect DirectedHausdorffDistance family (s2/rect.go:497-653) for
    sampled/vertex geometries; fully vectorized (|A| x |B| matmul in
    chunks)."""
    A = np.asarray(a_pts, dtype=np.float64).reshape(-1, 3)
    B = np.asarray(b_pts, dtype=np.float64).reshape(-1, 3)
    if len(A) == 0:
        return 0.0
    if len(B) == 0:
        return 4.0
    worst = 0.0
    for lo in range(0, len(A), 4096):
        chunk = A[lo:lo + 4096]
        # chord2 = 2 - 2 * dot for unit vectors
        d = np.clip(2.0 - 2.0 * (chunk @ B.T), 0.0, 4.0)
        worst = max(worst, float(d.min(axis=1).max()))
    return worst


def hausdorff_chord2(a_pts: np.ndarray, b_pts: np.ndarray) -> float:
    """Symmetric Hausdorff distance (squared chord)."""
    return max(directed_hausdorff_chord2(a_pts, b_pts),
               directed_hausdorff_chord2(b_pts, a_pts))


def edge_pair_closest_points(a, b, c, d):
    """Closest point pair between AB and CD (EdgePairClosestPoints,
    s2/edge_distances.go:372-418)."""
    from .edges import crossing_sign
    import numpy as _np
    if crossing_sign(tuple(a), tuple(b), tuple(c), tuple(d)) > 0:
        from .edges import ORIGIN  # placeholder import to keep symmetry
        # crossing point: use the robust intersection direction
        x = _np.cross(_np.cross(_np.asarray(a), _np.asarray(b)),
                      _np.cross(_np.asarray(c), _np.asarray(d)))
        n = _np.linalg.norm(x)
        if n > 0:
            x = x / n
            # orient toward the edge midpoints
            mid = _np.asarray(a) + _np.asarray(b) + _np.asarray(c) + _np.asarray(d)
            if _np.dot(x, mid) < 0:
                x = -x
            return x, x
    cands = []
    for (p, e1, e2, swap) in ((c, a, b, False), (d, a, b, False),
                              (a, c, d, True), (b, c, d, True)):
        q = project_to_edge(_np.asarray(p), _np.asarray(e1), _np.asarray(e2))
        d2 = float(chord2_point_point(_np.asarray(p, dtype=float), q))
        cands.append((d2, (q, _np.asarray(p)) if swap else (_np.asarray(p), q)))
    cands.sort(key=lambda t: t[0])
    return cands[0][1]

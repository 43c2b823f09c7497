"""Robust orientation predicates.

Semantics of reference s2/predicates.go: a ladder of
triage (fast float64 determinant with error bound, vectorized here) ->
stable (recomputed around the longest edge) -> exact (arbitrary
precision over the exact rational values of the float64 coordinates,
via Python ints scaled by a power of two) -> symbolic perturbation
(Edelsbrunner & Mucke "Simulation of Simplicity", the case ladder of
s2/predicates.go:354-475) so that RobustSign(a,b,c) is never zero for
three distinct points.

Scalar entry points take 3-tuples of float64; the vectorized triage
operates on (n,3) arrays and reports which rows need the exact path.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = 2.220446049250313e-16
# s2/predicates.go:117-124
MAX_DETERMINANT_ERROR = 1.8274 * DBL_EPSILON
DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON

CLOCKWISE = -1
INDETERMINATE = 0
COUNTER_CLOCKWISE = 1


def sign(a, b, c) -> bool:
    """Simple (non-robust) CCW test (b x c) . a > 0, s2/predicates.go:142-154."""
    bx, by, bz = b
    cx, cy, cz = c
    ax, ay, az = a
    return ((by * cz - bz * cy) * ax + (bz * cx - bx * cz) * ay +
            (bx * cy - by * cx) * az) > 0


def triage_sign(a, b, c) -> int:
    """s2/predicates.go:251-260."""
    ax, ay, az = a
    bx, by, bz = b
    cx, cy, cz = c
    det = ((ay * bz - az * by) * cx + (az * bx - ax * bz) * cy +
           (ax * by - ay * bx) * cz)
    if det > MAX_DETERMINANT_ERROR:
        return COUNTER_CLOCKWISE
    if det < -MAX_DETERMINANT_ERROR:
        return CLOCKWISE
    return INDETERMINATE


def stable_sign(a, b, c) -> int:
    """Recompute the determinant from differences around the longest
    edge; s2/predicates.go:200-243."""
    ab = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    bc = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    ca = (a[0] - c[0], a[1] - c[1], a[2] - c[2])
    ab2 = ab[0] * ab[0] + ab[1] * ab[1] + ab[2] * ab[2]
    bc2 = bc[0] * bc[0] + bc[1] * bc[1] + bc[2] * bc[2]
    ca2 = ca[0] * ca[0] + ca[1] * ca[1] + ca[2] * ca[2]
    # The two shorter edges and the opposite vertex give the most
    # accurate cross product.
    if ab2 >= bc2 and ab2 >= ca2:
        det = -_dot(_cross(ca, bc), c)
        maxe = ca2 * bc2
    elif bc2 >= ca2:
        det = -_dot(_cross(ab, ca), a)
        maxe = ab2 * ca2
    else:
        det = -_dot(_cross(bc, ab), b)
        maxe = bc2 * ab2
    err = DET_ERROR_MULTIPLIER * np.sqrt(maxe)
    if det > err:
        return COUNTER_CLOCKWISE
    if det < -err:
        return CLOCKWISE
    return INDETERMINATE


def _cross(u, v):
    return (u[1] * v[2] - u[2] * v[1], u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0])


def _dot(u, v):
    return u[0] * v[0] + u[1] * v[1] + u[2] * v[2]


def _fr(t):
    return (Fraction(float(t[0])), Fraction(float(t[1])), Fraction(float(t[2])))


def exact_sign(a, b, c, perturb: bool = True) -> int:
    """Exact determinant over the rational values of the coordinates,
    with optional symbolic perturbation; s2/predicates.go:265-346."""
    perm_sign = COUNTER_CLOCKWISE
    pa, pb, pc = tuple(map(float, a)), tuple(map(float, b)), tuple(map(float, c))
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if pb > pc:
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    xa, xb, xc = _fr(pa), _fr(pb), _fr(pc)
    b_cross_c = _cross(xb, xc)
    det = _dot(b_cross_c, xa)
    det_sign = (det > 0) - (det < 0)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(xa, xb, xc, b_cross_c)
    return perm_sign * det_sign


def _sgn(x) -> int:
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c, b_cross_c) -> int:
    """Case ladder of s2/predicates.go:354-475 (Simulation of
    Simplicity with perturbations eps(a) >> eps(b) >> eps(c) and per
    coordinate z >> y >> x)."""
    det_sign = _sgn(b_cross_c[2])
    if det_sign:
        return det_sign
    det_sign = _sgn(b_cross_c[1])
    if det_sign:
        return det_sign
    det_sign = _sgn(b_cross_c[0])
    if det_sign:
        return det_sign

    det_sign = _sgn(c[0] * a[1] - c[1] * a[0])
    if det_sign:
        return det_sign
    det_sign = _sgn(c[0])
    if det_sign:
        return det_sign
    det_sign = -_sgn(c[1])
    if det_sign:
        return det_sign
    det_sign = _sgn(c[2] * a[0] - c[0] * a[2])
    if det_sign:
        return det_sign
    det_sign = _sgn(c[2])
    if det_sign:
        return det_sign
    # a and c are linearly dependent; the final cases of
    # s2/predicates.go:458-475.
    det_sign = _sgn(a[0] * b[1] - a[1] * b[0])
    if det_sign:
        return det_sign
    return COUNTER_CLOCKWISE


def robust_sign(a, b, c) -> int:
    """Triage -> stable -> exact; never 0 for distinct points.

    s2/predicates.go:180-186.
    """
    if a == b or b == c or c == a:
        return INDETERMINATE
    s = triage_sign(a, b, c)
    if s == INDETERMINATE:
        s = stable_sign(a, b, c)
    if s == INDETERMINATE:
        s = exact_sign(a, b, c, True)
    return s


def ordered_ccw(a, b, c, o) -> bool:
    """(a,b,c) in CCW order around o; s2/predicates.go (OrderedCCW in
    s2/edgeutil — reference s2/edge_crossings.go:75 family)."""
    total = 0
    if robust_sign(b, o, a) != CLOCKWISE:
        total += 1
    if robust_sign(c, o, b) != CLOCKWISE:
        total += 1
    if robust_sign(a, o, c) == COUNTER_CLOCKWISE:
        total += 1
    return total >= 2


def compare_distances(x, a, b) -> int:
    """Exact comparison of d(x,a) vs d(x,b): -1/0/+1.

    Semantics of CompareDistances (s2/predicates.go:478-560): the float
    coordinates are exact rationals, so the squared chord lengths are
    compared exactly (one Fraction evaluation replaces the reference's
    triage/exact ladder; correctness identical, speed adequate for the
    tie-breaking tail it serves)."""
    fx, fa, fb = _fr(x), _fr(a), _fr(b)
    da = sum((fx[i] - fa[i]) ** 2 for i in range(3))
    db = sum((fx[i] - fb[i]) ** 2 for i in range(3))
    return (da > db) - (da < db)


def compare_distance(x, y, r2) -> int:
    """Exact comparison of the chord distance XY vs the limit r2:
    -1/0/+1, AS IF both points were reprojected to lie exactly on the
    unit sphere (CompareDistance / exactCompareDistance,
    s2/predicates.go:680-731) — scale-invariant via
    cos(XY) = x.y / (|x||y|) against cos(r) = 1 - r2/2, all in exact
    rational arithmetic (Fraction replaces the reference's
    big.Float)."""
    from fractions import Fraction
    fx, fy = _fr(x), _fr(y)
    dot = sum(fx[i] * fy[i] for i in range(3))
    cos_r = 1 - Fraction(float(r2)) / 2
    xy_sign = (dot > 0) - (dot < 0)
    r_sign = (cos_r > 0) - (cos_r < 0)
    if xy_sign != r_sign:
        # cos(XY) > cos(r)  <=>  XY < r
        return -1 if xy_sign > r_sign else 1
    n2 = sum(v * v for v in fx) * sum(v * v for v in fy)
    cmp = cos_r * cos_r * n2 - dot * dot
    return xy_sign * ((cmp > 0) - (cmp < 0))


def triage_sign_batch(a: np.ndarray, b: np.ndarray, c: np.ndarray):
    """Vectorized triage over rows of (n,3) arrays.

    Returns (signs int8 array with 0 = indeterminate).  Rows where the
    result is 0 must be re-resolved with ``robust_sign``.
    """
    det = np.einsum("ij,ij->i", np.cross(a, b), c)
    out = np.zeros(det.shape, dtype=np.int8)
    out[det > MAX_DETERMINANT_ERROR] = COUNTER_CLOCKWISE
    out[det < -MAX_DETERMINANT_ERROR] = CLOCKWISE
    return out


def robust_sign_rows(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized robust sign: triage pass then scalar ladder on the
    (rare) indeterminate rows."""
    out = triage_sign_batch(a, b, c).astype(np.int8)
    todo = np.nonzero(out == 0)[0]
    for idx in todo:
        out[idx] = robust_sign(tuple(a[idx]), tuple(b[idx]), tuple(c[idx]))
    return out

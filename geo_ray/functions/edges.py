"""Edge crossing predicates (scalar, robust).

Semantics of reference s2/edge_crossings.go:75-159 and the EdgeCrosser
state machine (s2/edge_crosser.go) reduced to pure functions: the
vectorized hot path lives in stages/join.py (triage sign matrices); the
scalar ladder here resolves the ambiguous rows exactly.
"""

from __future__ import annotations

from .predicates import robust_sign, ordered_ccw

# OriginPoint: the fixed reference point for crossing-parity containment
# tests, s2/point.go:53-63 (chosen to be far from cell-vertex lattices).
ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


def ortho(p):
    """Unit vector orthogonal to p with Ortho(-p) == -Ortho(p).

    Bit-faithful to s2/point.go:250-261: cross with the perturbed
    near-basis vector (0.012, 0.0053, 0.00457) whose component after
    the largest component of p is set to 1 — the perturbation keeps
    the result stable when p sits near a coordinate axis, and this
    exact vector is what referenceDir / ContainsVertexQuery and
    Loop.initOriginAndBound decisions depend on.
    """
    x, y, z = p
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax > ay:
        largest = 0 if ax > az else 2
    else:
        largest = 1 if ay > az else 2
    ov = [0.012, 0.0053, 0.00457]
    ov[(largest + 2) % 3] = 1.0
    cx = y * ov[2] - z * ov[1]
    cy = z * ov[0] - x * ov[2]
    cz = x * ov[1] - y * ov[0]
    n = (cx * cx + cy * cy + cz * cz) ** 0.5
    return (cx / n, cy / n, cz / n)


def crossing_sign(a, b, c, d) -> int:
    """+1 interior crossing, 0 shared vertex, -1 no crossing.

    Semantics of s2/edge_crossings.go:88-112 / s2/edge_crosser.go
    (sign-ladder formulation; robust_sign is never 0 for distinct
    points).
    """
    if a == c or a == d or b == c or b == d:
        return 0
    if a == b or c == d:
        return -1
    acb = -robust_sign(a, b, c)
    bda = robust_sign(a, b, d)
    if acb == -bda:
        return -1
    cbd = -robust_sign(c, d, b)
    if cbd != acb:
        return -1
    dac = robust_sign(c, d, a)
    return 1 if dac == acb else -1


def vertex_crossing(a, b, c, d) -> bool:
    """Shared-vertex crossing parity rule, s2/edge_crossings.go:115-145."""
    if a == b or c == d:
        return False
    if a == d:
        return ordered_ccw(ortho(a), c, b, a)
    if b == c:
        return ordered_ccw(ortho(b), d, a, b)
    if a == c:
        return ordered_ccw(ortho(a), d, b, a)
    if b == d:
        return ordered_ccw(ortho(b), c, a, b)
    return False


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """Wedge A=(a0,ab1,a2) contains wedge B=(b0,ab1,b2): the CCW edge
    order around ab1 must be a2 b2 b0 a0 (s2/wedge_relations.go).
    Identical wedges contain each other."""
    if a0 == b0 and a2 == b2:
        return True
    return (ordered_ccw(a2, b2, b0, ab1) and ordered_ccw(b0, a0, a2, ab1))


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """Wedges share interior points iff the CCW order is NOT
    a2 b0 b2 a0 ... (s2/wedge_relations.go)."""
    if a0 == b0 and a2 == b2:
        return True
    return not (ordered_ccw(a0, b2, b0, ab1) and ordered_ccw(b0, a2, a0, ab1))


WEDGE_EQUALS = 0
WEDGE_PROPERLY_CONTAINS = 1
WEDGE_IS_PROPERLY_CONTAINED = 2
WEDGE_PROPERLY_OVERLAPS = 3
WEDGE_IS_DISJOINT = 4


def wedge_relation(a0, ab1, a2, b0, b2) -> int:
    """Five-way relation between non-empty wedges A=(a0, ab1, a2) and
    B=(b0, ab1, b2): equals / properly contains / is properly
    contained / properly overlaps / disjoint
    (WedgeRelation, s2/wedge_relations.go:33-78 — overlapping-edge
    cases take the most specific ordering)."""
    if a0 == b0 and a2 == b2:
        return WEDGE_EQUALS
    if ordered_ccw(a0, a2, b2, ab1):
        # cases 1, 5, 6 (or 2 when a2 == b2)
        if ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        if a2 == b2:
            return WEDGE_IS_PROPERLY_CONTAINED
        return WEDGE_PROPERLY_OVERLAPS
    if ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    if ordered_ccw(a0, b0, a2, ab1):
        return WEDGE_IS_DISJOINT
    return WEDGE_PROPERLY_OVERLAPS


def wedge_contains_semiwedge(a0, ab1, a2, b2, reverse: bool) -> bool:
    """Whether wedge (a0, ab1, a2) contains the "semiwedge": any
    non-empty open set of rays immediately CCW from edge (ab1, b2);
    with ``reverse`` substitute CW (simulates reversing the other
    loop).  s2/loop.go:1802-1813."""
    if b2 == a0 or b2 == a2:
        # shared or reversed edge
        return (b2 == a0) == reverse
    return ordered_ccw(a0, a2, b2, ab1)


def edge_or_vertex_crossing(a, b, c, d) -> bool:
    """s2/edge_crossings.go:148-159."""
    crossing = crossing_sign(a, b, c, d)
    if crossing < 0:
        return False
    if crossing > 0:
        return True
    return vertex_crossing(a, b, c, d)

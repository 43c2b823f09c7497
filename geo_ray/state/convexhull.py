"""Spherical convex hull.

Semantics of reference s2/convex_hull_query.go:60-258: collect points
(and cap/polygon bounds), compute the hull via Andrew's monotone chain
run in a coordinate frame centered on the point set's bounding cap,
with robust sign comparisons.  Degenerate cases: empty -> empty loop,
one point -> single-vertex loop, two points -> degenerate two-vertex
loop.

Distributed shape (SURVEY.md §2.7): per-partition hull inside
map_batches, then a driver/tree reduce over the (tiny) partial hulls —
the classic parallel convex hull; ``hull_partial`` is the combiner.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..functions.predicates import robust_sign
from .loop import Loop

Vec = Tuple[float, float, float]


def _cap_axis(points: np.ndarray) -> np.ndarray:
    c = points.sum(axis=0)
    n = np.linalg.norm(c)
    if n == 0:
        return np.array([0.0, 0.0, 1.0])
    return c / n


def convex_hull(points: Sequence[Vec]) -> Loop:
    """Hull of a point set as a CCW Loop (s2/convex_hull_query.go:139-218).

    Andrew's monotone chain in the reference's spherical form: points
    are sorted in CCW angular order around an origin O = Ortho(cap
    axis), chosen so every point lies strictly on one side of the
    geodesic through O — which makes the scan order angle-monotone
    (sorting by orthographic coordinates instead, as a planar chain
    would, breaks the chain invariant for wide caps and emits
    non-extreme vertices).  Point sets not contained in an open
    hemisphere around their centroid have no convex bounding cap, so
    the hull is the full sphere (s2/convex_hull_query.go:139-150)."""
    pts = np.asarray(sorted(set(tuple(float(c) for c in p) for p in points)),
                     dtype=np.float64).reshape(-1, 3)
    if len(pts) == 0:
        return Loop.empty()
    if len(pts) == 1:
        return Loop([tuple(pts[0])])
    if len(pts) == 2:
        return Loop([tuple(pts[0]), tuple(pts[1])])
    z = _cap_axis(pts)
    if (pts @ z).min() <= 1e-15:
        return Loop.full()
    from ..functions.edges import ortho
    origin = np.asarray(ortho(tuple(z)))
    # CCW azimuth around O: with e1 = z and e2 = O x z, every point has
    # p.e1 > 0 (hemisphere check above), so atan2(p.e2, p.e1) lies in
    # (-pi/2, pi/2) and float order equals the RobustSign comparator
    # order away from exact angular ties (the exact chain pops below
    # decide every hull membership).
    e2 = np.cross(origin, z)
    az = np.arctan2(pts @ e2, pts @ z)
    order = np.argsort(az, kind="stable")
    sorted_pts = [tuple(pts[i]) for i in order]

    def _chain(seq):
        out: List[Vec] = []
        for p in seq:
            while len(out) >= 2 and robust_sign(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = _chain(sorted_pts)
    upper = _chain(list(reversed(sorted_pts)))
    hull = lower[:-1] + upper[:-1]
    return Loop(hull)


def hull_partial(points: Sequence[Vec]) -> List[Vec]:
    """Per-partition combiner: returns the partial hull's vertices (the
    only rows that shuffle)."""
    loop = convex_hull(points)
    return list(loop.vertices)


def hull_of_partials(partials: Sequence[Sequence[Vec]]) -> Loop:
    merged: List[Vec] = []
    for p in partials:
        merged.extend(p)
    return convex_hull(merged)

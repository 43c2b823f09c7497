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
    """Hull of a point set as a CCW Loop (s2/convex_hull_query.go:102-160)."""
    pts = np.asarray(sorted(set(tuple(float(c) for c in p) for p in points)),
                     dtype=np.float64).reshape(-1, 3)
    if len(pts) == 0:
        return Loop.empty()
    if len(pts) == 1:
        return Loop([tuple(pts[0])])
    if len(pts) == 2:
        return Loop([tuple(pts[0]), tuple(pts[1])])
    # Orient via a frame around the centroid direction so the monotone
    # chain's x/y ordering is well defined for hemispherical sets.
    z = _cap_axis(pts)
    x = np.cross(z, [0.012, 0.0053, 0.00457])
    xn = np.linalg.norm(x)
    if xn == 0:
        x = np.cross(z, [1.0, 0.0, 0.0])
        xn = np.linalg.norm(x)
    x /= xn
    y = np.cross(z, x)
    u = pts @ x
    v = pts @ y
    order = np.lexsort((v, u))
    sorted_pts = [tuple(pts[i]) for i in order]

    def _chain(seq):
        out: List[Vec] = []
        for p in seq:
            while len(out) >= 2 and robust_sign(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = _chain(sorted_pts)
    upper = _chain(reversed(sorted_pts))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return Loop(hull)
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

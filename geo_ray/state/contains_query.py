"""ContainsVertexQuery and ContainsPointQuery.

Ports of s2/contains_vertex_query.go:24-63 and
s2/contains_point_query.go:17-190.  The reference's query walks a lazy
ShapeIndex cell; per SURVEY.md §2.6 this repo replaces ShapeIndex with
eagerly-built actor state, so ContainsPointQuery here evaluates the
crossing parity directly from ORIGIN over the shape's edges (identical
semantics: the reference's center-to-p segment is just a shorter
crossing path seeded by containsCenter; ours is seeded by the loops'
origin_inside).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from ..functions.edges import (ORIGIN, crossing_sign, ortho,
                               vertex_crossing)
from ..functions.predicates import ordered_ccw

Vec = Tuple[float, float, float]

OPEN = "open"
SEMI_OPEN = "semi_open"
CLOSED = "closed"


class ContainsVertexQuery:
    """Tracks edges entering/leaving a polygon vertex to decide
    semi-open containment of that vertex
    (s2/contains_vertex_query.go:24-63)."""

    def __init__(self, target: Vec):
        self.target = tuple(float(c) for c in target)
        self.edge_map: Dict[Vec, int] = {}

    def add_edge(self, v: Vec, direction: int) -> None:
        """direction: +1 outgoing, -1 incoming, 0 degenerate."""
        k = tuple(float(c) for c in v)
        self.edge_map[k] = self.edge_map.get(k, 0) + direction

    def contains_vertex(self) -> int:
        """+1 contained, -1 not contained, 0 if all incident edges are
        matched sibling pairs: find the unmatched edge immediately
        clockwise from referenceDir (= Ortho(target))."""
        ref_dir = ortho(self.target)
        best_point = ref_dir
        best_dir = 0
        for k, v in self.edge_map.items():
            if v == 0:
                continue  # matched sibling pair
            if ordered_ccw(ref_dir, best_point, k, self.target):
                best_point = k
                best_dir = v
        return best_dir


def _shape_loops(shape):
    """Loops of a 2D shape (Polygon or single Loop); None for lower
    dimensions."""
    if hasattr(shape, "loops"):
        return shape.loops
    if hasattr(shape, "origin_inside"):  # a Loop
        return [shape]
    return None


def _shape_vertices(shape):
    if hasattr(shape, "vertices"):
        return shape.vertices
    return [tuple(float(c) for c in shape)]  # a bare point


class ContainsPointQuery:
    """Whether shapes contain a point under a vertex model
    (s2/contains_point_query.go:52-135).

    ``shapes`` may hold Loop, Polygon, Polyline, or bare point tuples.
    The 2D containment test is the reference's crossing count with the
    MaybeCross vertex handling per model; 0D/1D shapes contain only
    their exact vertices and only under the closed model.
    """

    def __init__(self, shapes: Sequence, model: str = SEMI_OPEN):
        if model not in (OPEN, SEMI_OPEN, CLOSED):
            raise ValueError(f"unknown vertex model {model!r}")
        self.shapes = list(shapes)
        self.model = model

    def shape_contains(self, shape, p: Vec) -> bool:
        p = tuple(float(c) for c in p)
        loops = _shape_loops(shape)
        if loops is None:
            # points / polylines: only exact vertices, only when closed
            if self.model != CLOSED:
                return False
            return any(tuple(v) == p for v in _shape_vertices(shape))
        inside = False
        for loop in loops:
            inside ^= bool(loop.origin_inside)
            if loop.is_empty_or_full():
                continue
            verts = loop.vertices
            n = len(verts)
            for i in range(n):
                c, d = verts[i], verts[(i + 1) % n]
                sign = crossing_sign(ORIGIN, p, c, d)
                if sign < 0:
                    continue
                if sign == 0:
                    # p may coincide with an edge vertex
                    if self.model != SEMI_OPEN and (c == p or d == p):
                        return self.model == CLOSED
                    sign = 1 if vertex_crossing(ORIGIN, p, c, d) else -1
                inside ^= sign > 0
        return inside

    def contains(self, p: Vec) -> bool:
        return any(self.shape_contains(s, p) for s in self.shapes)

    def containing_shapes(self, p: Vec) -> List:
        return [s for s in self.shapes if self.shape_contains(s, p)]

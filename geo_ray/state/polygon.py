"""Polygon: a set of loops where a point is contained iff it is inside
an odd number of loops (s2/polygon.go:591-613,706-728).  Holes are
loops nested at odd depth; the xor rule makes explicit depth tracking
unnecessary for containment.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .cap import Cap
from .cell import Cell
from .loop import Loop


class Polygon:
    def __init__(self, loops: Sequence[Loop]):
        self.loops: List[Loop] = list(loops)

    @classmethod
    def from_loop(cls, loop: Loop) -> "Polygon":
        return cls([loop])

    @classmethod
    def from_unoriented_loops(cls, loops) -> "Polygon":
        """Polygon assembly (PolygonFromLoops semantics,
        s2/polygon.go:92-186): loops may have either orientation; each
        is normalized so its enclosed area is <= 2*pi (holes are then
        determined purely by nesting depth, which the xor containment
        rule resolves)."""
        import math
        normalized = []
        for l in loops:
            if l.is_empty_or_full():
                normalized.append(l)
            elif l.area() > 2 * math.pi:
                normalized.append(l.invert())
            else:
                normalized.append(l)
        poly = cls(normalized)
        # validate nesting forms a laminar family
        depths = poly._loop_depths()
        for i, li in enumerate(poly.loops):
            for j, lj in enumerate(poly.loops):
                if i < j and li.intersects_loop(lj) and \
                        not (li.contains_loop(lj) or lj.contains_loop(li)):
                    raise ValueError(
                        f"loops {i} and {j} cross: not a valid polygon")
        return poly

    def is_empty(self) -> bool:
        return not self.loops or all(l.is_empty() for l in self.loops)

    def num_edges(self) -> int:
        return sum(l.num_edges() for l in self.loops)

    def contains_point(self, p) -> bool:
        """xor of loop containments, s2/polygon.go:591-613."""
        inside = False
        for l in self.loops:
            inside ^= l.contains_point(p)
        return inside

    def contains_points_batch(self, pts: np.ndarray) -> np.ndarray:
        out = np.zeros(len(pts), dtype=bool)
        for l in self.loops:
            out ^= l.contains_points_batch(pts)
        return out

    def intersects_cell(self, cell: Cell) -> bool:
        """Conservative semantics of s2/polygon.go:615-705: the polygon
        intersects the cell if any point of the cell is contained, which
        is true iff a cell vertex is contained, a loop boundary meets the
        cell, or the cell is entirely inside the region."""
        for v in cell.vertices():
            if self.contains_point(v):
                return True
        for l in self.loops:
            if l.is_empty_or_full():
                continue
            if cell.contains_any_point(l._varr):
                return True
            if l._any_edge_crosses_cell(cell):
                return True
        return any(l.is_full() for l in self.loops) and len(self.loops) == 1

    def contains_cell(self, cell: Cell) -> bool:
        for v in cell.vertices():
            if not self.contains_point(v):
                return False
        for l in self.loops:
            if l.is_empty_or_full():
                continue
            if cell.contains_any_point(l._varr):
                return False
            if l._any_edge_crosses_cell(cell):
                return False
        return True

    def cap_bound(self) -> Cap:
        """Union bound over loops (s2/polygon.go RectBound/CapBound)."""
        if not self.loops:
            return Cap.empty()
        if len(self.loops) == 1:
            return self.loops[0].cap_bound()
        # shell (first loop) dominates for valid nested polygons; for
        # multi-shell polygons fall back to a cap containing all loops.
        caps = [l.cap_bound() for l in self.loops if not l.is_empty()]
        if not caps:
            return Cap.empty()
        best = caps[0]
        for c in caps[1:]:
            if not best.contains_point(c.center) or \
                    c.radius_chord2 > best.radius_chord2:
                # grow: recompute a cap around the first center that
                # contains every other cap (conservative)
                import math
                from ..functions.latlng import chord2, chord2_to_angle
                r = best.radius_rad()
                for cc in caps[1:]:
                    d = float(chord2_to_angle(chord2(*best.center, *cc.center)))
                    r = max(r, d + cc.radius_rad())
                return Cap.from_center_angle(best.center, min(math.pi, r))
        return best

    def cell_union_bound(self):
        return self.cap_bound().cell_union_bound()

    def area(self) -> float:
        """Region area, s2/polygon.go:1005-1017.  A single loop uses its
        own orientation semantics (a clockwise loop covers >2*pi);
        multi-loop polygons follow the xor convention here: every loop
        is CCW and loops at odd nesting depth are holes, so their areas
        subtract."""
        import math
        if len(self.loops) <= 1:
            return self.loops[0].area() if self.loops else 0.0
        total = 0.0
        for l, d in zip(self.loops, self._loop_depths()):
            a = l.area()
            if a > 2 * math.pi:  # clockwise loop given explicitly
                a -= 4 * math.pi
            total += a if d % 2 == 0 else -a
        return max(0.0, min(4 * math.pi, total))

    def _loop_depths(self):
        """Nesting depth of each loop = number of other loops containing
        it (s2/polygon.go loop nesting semantics; holes at odd depth)."""
        depths = []
        for i, li in enumerate(self.loops):
            d = 0
            for j, lj in enumerate(self.loops):
                if i != j and lj.contains_loop(li):
                    d += 1
            depths.append(d)
        return depths

    def centroid(self):
        """Area-weighted true centroid (times total area), sign by loop
        depth (s2/polygon.go:1019-1033)."""
        import numpy as np
        total = np.zeros(3)
        for l, d in zip(self.loops, self._loop_depths()):
            c = np.asarray(l.centroid())
            total += c if d % 2 == 0 else -c
        return tuple(float(v) for v in total)

    def is_full(self) -> bool:
        return len(self.loops) == 1 and self.loops[0].is_full()

    def _ordered_loops_holes(self):
        """Loops sorted shells-first (stable), paired with is_hole =
        depth odd — the reference's storage invariant (loop 0 is a
        depth-0 shell) reconstructed from the xor representation."""
        depths = self._loop_depths()
        order = sorted(range(len(self.loops)), key=lambda i: depths[i])
        return [(self.loops[i], depths[i] % 2 == 1) for i in order]

    def _has_holes(self) -> bool:
        return any(d % 2 == 1 for d in self._loop_depths())

    def compare_boundary_loop(self, o: Loop, o_is_hole: bool = False) -> int:
        """+1 contains / -1 excludes / 0 crosses the boundary of loop
        ``o``: the sign flips once per containing loop
        (s2/polygon.go:920-929)."""
        result = -1
        for l in self.loops:
            if result == 0:
                break
            result *= -l.compare_boundary(o, o_is_hole)
        return result

    def _contains_boundary(self, other: "Polygon") -> bool:
        return all(self.compare_boundary_loop(l, hole) > 0
                   for l, hole in other._ordered_loops_holes())

    def _excludes_boundary(self, other: "Polygon") -> bool:
        return all(self.compare_boundary_loop(l, hole) < 0
                   for l, hole in other._ordered_loops_holes())

    def contains_non_crossing_boundary(self, o: Loop,
                                       reverse: bool) -> bool:
        """s2/polygon.go:927-937: xor over loops."""
        inside = False
        for l in self.loops:
            inside ^= l.contains_non_crossing_boundary(o, reverse)
        return inside

    def _excludes_non_crossing_shells(self, other: "Polygon") -> bool:
        """s2/polygon.go:939-951."""
        for l, hole in other._ordered_loops_holes():
            if hole:
                continue
            if self.contains_non_crossing_boundary(l, False):
                return False
        return True

    def _excludes_non_crossing_complement_shells(
            self, other: "Polygon") -> bool:
        """s2/polygon.go:953-980: the complement's shells are other's
        first (depth-0) loop inverted plus other's holes."""
        if other.is_empty():
            return not self.is_full()
        if other.is_full():
            return True
        for j, (l, hole) in enumerate(other._ordered_loops_holes()):
            if j > 0 and not hole:
                continue
            if self.contains_non_crossing_boundary(l, j == 0):
                return False
        return True

    def _any_loop_contains(self, o: Loop) -> bool:
        return any(l.contains_loop(o) for l in self.loops)

    def _any_loop_intersects(self, o: Loop) -> bool:
        return any(l.intersects_loop(o) for l in self.loops)

    def contains_polygon(self, other: "Polygon") -> bool:
        """Region containment — full port of Polygon.Contains
        (s2/polygon.go:846-889): loop relations when hole-free, else
        A contains the boundary of B and B excludes the shell
        boundaries of A's complement."""
        if len(self.loops) == 1 and len(other.loops) == 1:
            return self.loops[0].contains_loop(other.loops[0])
        if not self._has_holes() and not other._has_holes():
            return all(self._any_loop_contains(l) for l in other.loops) \
                if other.loops else True
        return self._contains_boundary(other) and \
            other._excludes_non_crossing_complement_shells(self)

    def intersects_polygon(self, other: "Polygon") -> bool:
        """Region intersection — full port of Polygon.Intersects
        (s2/polygon.go:891-918)."""
        if len(self.loops) == 1 and len(other.loops) == 1:
            return self.loops[0].intersects_loop(other.loops[0])
        if not self._has_holes() and not other._has_holes():
            return any(self._any_loop_intersects(l) for l in other.loops)
        return not self._excludes_boundary(other) or \
            not other._excludes_non_crossing_shells(self)

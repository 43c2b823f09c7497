"""RegionUnion: the union of several regions as one coverable region.

Semantics of reference s2/regionunion.go:30-80: predicates are the
disjunction (intersects) / any-single-member containment (contains —
conservative exactly like the reference, which does not merge member
interiors) over the members.  Usable directly with RegionCoverer.
"""

from __future__ import annotations

from typing import List, Sequence

from .cap import Cap
from .cell import Cell


class RegionUnion:
    def __init__(self, regions: Sequence):
        self.regions = list(regions)

    def contains_point(self, p) -> bool:
        return any(r.contains_point(p) for r in self.regions)

    def contains_cell(self, cell: Cell) -> bool:
        # Conservative like the reference: true iff some single member
        # contains the whole cell (s2/regionunion.go:49-58).
        return any(r.contains_cell(cell) for r in self.regions)

    def intersects_cell(self, cell: Cell) -> bool:
        return any(r.intersects_cell(cell) for r in self.regions)

    def cap_bound(self) -> Cap:
        caps = [r.cap_bound() for r in self.regions]
        caps = [c for c in caps if not c.is_empty()]
        if not caps:
            return Cap.empty()
        best = caps[0]
        if len(caps) == 1:
            return best
        import math
        from ..functions.latlng import chord2, chord2_to_angle
        r = best.radius_rad()
        for c in caps[1:]:
            d = float(chord2_to_angle(chord2(*best.center, *c.center)))
            r = max(r, d + c.radius_rad())
        return Cap.from_center_angle(best.center, min(math.pi, r))

    def cell_union_bound(self) -> List[int]:
        from . import cellunion as cu
        out: List[int] = []
        for r in self.regions:
            out.extend(r.cell_union_bound())
        return cu.normalize(out)

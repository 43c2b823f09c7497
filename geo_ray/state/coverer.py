"""RegionCoverer: region -> normalized CellUnion covering.

Semantics of reference s2/regioncoverer.go:75-101 (config & defaults),
:143-229 (candidate scoring), :226 (priority), :294-334 (main loop),
:347-402 (Covering / InteriorCovering / FastCovering), :430-499
(normalizeCovering).  Driver-side scalar computation; fan out over a
polygon table with map_batches when the region set is large.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import List, Optional

from ..functions import cellid as cid
from . import cellunion as cu
from .cell import Cell

MAX_LEVEL = 30
FACE_IDS = [cid.parent(cid.cell_id_from_face_ij(f, 0, 0), 0) for f in range(6)]


@dataclass
class _Candidate:
    cell: Cell
    terminal: bool = False
    children: List["_Candidate"] = field(default_factory=list)
    priority: int = 0

    def __lt__(self, other):  # heapq
        return self.priority < other.priority


class RegionCoverer:
    def __init__(self, min_level: int = 0, max_level: int = MAX_LEVEL,
                 level_mod: int = 1, max_cells: int = 8):
        """Defaults per s2/regioncoverer.go:83-90."""
        self.min_level = max(0, min(MAX_LEVEL, min_level))
        self.max_level = max(0, min(MAX_LEVEL, max_level))
        self.level_mod = max(1, min(3, level_mod))
        self.max_cells = max_cells

    # -- public API ---------------------------------------------------------
    def covering(self, region) -> List[int]:
        """Exterior covering, denormalized to honor min_level/level_mod.

        s2/regioncoverer.go:347-352.
        """
        ids = self.cell_union(region)
        return cu.denormalize(ids, self.min_level, self.level_mod)

    def interior_covering(self, region) -> List[int]:
        """Cells fully contained by the region, s2/regioncoverer.go:354-360."""
        ids = self._covering_internal(region, interior=True)
        ids = cu.normalize(ids)
        return cu.denormalize(ids, self.min_level, self.level_mod)

    def cell_union(self, region) -> List[int]:
        """Normalized covering, s2/regioncoverer.go:362-368."""
        return cu.normalize(self._covering_internal(region, interior=False))

    def fast_covering(self, region) -> List[int]:
        """Normalized CellUnionBound seed, s2/regioncoverer.go:389-402."""
        ids = list(region.cell_union_bound())
        return self._normalize_covering(ids)

    # -- internals ----------------------------------------------------------
    def _adjust_level(self, level: int) -> int:
        """Round DOWN to the min_level-anchored level_mod grid
        (s2/regioncoverer.go:231-238; levels below min_level pass
        through, they get expanded later)."""
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _new_candidate(self, cell: Cell, region, interior: bool) -> Optional[_Candidate]:
        """s2/regioncoverer.go:163-189."""
        if not region.intersects_cell(cell):
            return None
        cand = _Candidate(cell=cell)
        level = cell.level
        if level >= self.min_level:
            if interior:
                if region.contains_cell(cell):
                    cand.terminal = True
                elif level + self.level_mod > self.max_level:
                    return None
            else:
                if level + self.level_mod > self.max_level or \
                        region.contains_cell(cell):
                    cand.terminal = True
        return cand

    def _expand_children(self, cand: _Candidate, cell: Cell, num_levels: int,
                         region, interior: bool) -> int:
        """s2/regioncoverer.go:236-260."""
        num_levels -= 1
        num_terminals = 0
        for child_id in cid.children(cell.id):
            child_cell = Cell(child_id)
            if num_levels > 0:
                if region.intersects_cell(child_cell):
                    num_terminals += self._expand_children(
                        cand, child_cell, num_levels, region, interior)
                continue
            child = self._new_candidate(child_cell, region, interior)
            if child is not None:
                cand.children.append(child)
                if child.terminal:
                    num_terminals += 1
        return num_terminals

    def _add_candidate(self, cand: Optional[_Candidate], pq, result,
                       region, interior: bool) -> None:
        """s2/regioncoverer.go:191-229 (priority formula at :226)."""
        if cand is None:
            return
        if cand.terminal:
            result.append(cand.cell.id)
            return
        num_levels = self.level_mod
        level = cand.cell.level
        if level < self.min_level:
            num_levels = 1
        num_terminals = self._expand_children(cand, cand.cell, num_levels,
                                              region, interior)
        max_children_shift = 2 * self.level_mod
        num_children = len(cand.children)
        if num_children == 0:
            return
        if (not interior and num_terminals == (1 << max_children_shift) and
                level >= self.min_level):
            # All children are terminal: add the parent instead.
            cand.terminal = True
            cand.children = []
            self._add_candidate(cand, pq, result, region, interior)
            return
        cand.priority = -((((level << max_children_shift) + num_children)
                           << max_children_shift) + num_terminals)
        heapq.heappush(pq, cand)

    def _initial_candidates(self, region, pq, result, interior: bool) -> None:
        """Seed from a small fast covering, s2/regioncoverer.go:264-278."""
        temp = RegionCoverer(min_level=0, max_level=self.max_level,
                             level_mod=1, max_cells=min(4, self.max_cells))
        seeds = temp.fast_covering(region)
        # adjustCellLevels (s2/regioncoverer.go:240-260): replace each
        # seed by its ancestor at the adjusted (rounded-down) level,
        # then drop redundant cells.
        if self.level_mod > 1:
            adjusted = []
            for ci in seeds:
                lvl = cid.level(ci)
                adj = self._adjust_level(lvl)
                adjusted.append(cid.parent(ci, adj) if adj < lvl else ci)
            seeds = cu.normalize(adjusted)
        for ci in seeds:
            self._add_candidate(self._new_candidate(Cell(ci), region, interior),
                                pq, result, region, interior)

    def _covering_internal(self, region, interior: bool) -> List[int]:
        """Best-first subdivision, s2/regioncoverer.go:294-334."""
        pq: List[_Candidate] = []
        result: List[int] = []
        self._initial_candidates(region, pq, result, interior)
        while pq and (not interior or len(result) < self.max_cells):
            cand = heapq.heappop(pq)
            if (interior or cand.cell.level < self.min_level or
                    len(cand.children) == 1 or
                    len(result) + len(pq) + len(cand.children) <= self.max_cells):
                for child in cand.children:
                    if not interior or len(result) < self.max_cells:
                        self._add_candidate(child, pq, result, region, interior)
            else:
                cand.terminal = True
                cand.children = []
                self._add_candidate(cand, pq, result, region, interior)
        return result

    def is_canonical(self, covering: List[int]) -> bool:
        """Whether ``covering`` could have been produced by this
        coverer's Covering method: valid sorted disjoint ids within the
        level constraints, no mergeable adjacent pair when over
        max_cells, and no collapsible sibling runs.

        s2/regioncoverer.go:404-420,501-555.
        """
        true_max = self.max_level
        if self.level_mod != 1:
            true_max -= (self.max_level - self.min_level) % self.level_mod
        too_many = len(covering) > self.max_cells
        same_parent_count = 1
        prev = None
        for ci in covering:
            if not cid.is_valid(ci):
                return False
            lvl = cid.level(ci)
            if lvl < self.min_level or lvl > true_max:
                return False
            if (lvl - self.min_level) % self.level_mod != 0:
                return False
            if prev is not None:
                if cid.range_max(prev) >= cid.range_min(ci):
                    return False
                anc = cid.common_ancestor_level(ci, prev)
                if too_many and anc is not None and anc >= self.min_level:
                    return False
                p_level = lvl - self.level_mod
                if (p_level < self.min_level or lvl != cid.level(prev) or
                        cid.parent(ci, p_level) != cid.parent(prev, p_level)):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == (1 << (2 * self.level_mod)):
                        return False
            prev = ci
        return True

    def _normalize_covering(self, covering: List[int]) -> List[int]:
        """s2/regioncoverer.go:430-499."""
        if self.max_level < MAX_LEVEL or self.level_mod > 1:
            out = []
            for ci in covering:
                level = cid.level(ci)
                new_level = self._adjust_level(min(level, self.max_level))
                out.append(cid.parent(ci, new_level) if new_level != level else ci)
            covering = out
        covering = cu.normalize(covering)
        while len(covering) > self.max_cells:
            best_index = -1
            best_level = -1
            for i in range(len(covering) - 1):
                level = cid.common_ancestor_level(covering[i], covering[i + 1])
                if level is None:
                    continue
                level = self._adjust_level(level)
                if level > best_level:
                    best_level = level
                    best_index = i
            if best_level < self.min_level:
                break
            covering[best_index] = cid.parent(covering[best_index], best_level)
            covering = cu.normalize(covering)
        if self.min_level > 0 or self.level_mod > 1:
            covering = cu.denormalize(covering, self.min_level, self.level_mod)
        return covering


def simple_region_covering(region, start_point_xyz, level: int) -> List[int]:
    """Fixed-level BFS flood fill from the cell containing start point.

    s2/regioncoverer.go:578-615.
    """
    start = cid.parent(cid.cell_id_from_point(*start_point_xyz), level)
    output: List[int] = []
    all_seen = {start}
    frontier = [start]
    while frontier:
        ci = frontier.pop()
        if not region.intersects_cell(Cell(ci)):
            continue
        output.append(ci)
        for nbr in cid.edge_neighbors(ci):
            if nbr not in all_seen:
                all_seen.add(nbr)
                frontier.append(nbr)
    output.sort()
    return output

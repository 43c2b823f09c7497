"""CellUnion: sorted, normalized sets of cell IDs + set algebra.

Semantics of reference s2/cellunion.go.  A CellUnion here is a plain
sorted ``list[int]``; helpers return numpy arrays of leaf ranges for
broadcast into vectorized join kernels.
"""

from __future__ import annotations

import math
from typing import Iterable, List

import numpy as np

from ..functions import cellid as cid

MASK64 = (1 << 64) - 1


def are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """4 cells that can collapse into their parent, s2/cellunion.go:408-426."""
    if (a ^ b ^ c) != d:
        return False
    mask = (cid.lsb(d) << 1) & MASK64
    mask = ~(mask + (mask << 1)) & MASK64
    masked = d & mask
    return (a & mask == masked and b & mask == masked and
            c & mask == masked and not cid.is_face(d))


def normalize(ids: Iterable[int]) -> List[int]:
    """Sort, drop contained, collapse sibling quads.  s2/cellunion.go:234-277."""
    out: List[int] = []
    for ci in sorted(ids):
        if out and cid.contains(out[-1], ci):
            continue
        while out and cid.contains(ci, out[-1]):
            out.pop()
        while len(out) >= 3 and are_siblings(out[-3], out[-2], out[-1], ci):
            out.pop(); out.pop(); out.pop()
            ci = cid.immediate_parent(ci)
        out.append(ci)
    return out


def denormalize(ids: Iterable[int], min_level: int, level_mod: int) -> List[int]:
    """Expand to satisfy min_level / level_mod.  s2/cellunion.go:311-332."""
    out: List[int] = []
    for ci in ids:
        lvl = cid.level(ci)
        new_level = max(lvl, min_level)
        if level_mod > 1:
            # s2/cellunion.go:315-321 (30 = MaxLevel is divisible by
            # every level_mod in 1..3, so the anchored formulas agree)
            new_level += (30 - (new_level - min_level)) % level_mod
            if new_level > 30:
                new_level = 30
        if new_level == lvl:
            out.append(ci)
        else:
            end = cid.child_end_at_level(ci, new_level)
            c = cid.child_begin_at_level(ci, new_level)
            while c != end:
                out.append(c)
                c = cid.next_cell(c)
    return out


def from_union(*unions: Iterable[int]) -> List[int]:
    """s2/cellunion.go:52-59."""
    merged: List[int] = []
    for u in unions:
        merged.extend(u)
    return normalize(merged)


def from_intersection(x: List[int], y: List[int]) -> List[int]:
    """Sorted two-pointer intersection with range skips.

    s2/cellunion.go:62-111.
    """
    out: List[int] = []
    i = j = 0
    while i < len(x) and j < len(y):
        imin = cid.range_min(x[i])
        jmin = cid.range_min(y[j])
        if imin > jmin:
            if x[i] <= cid.range_max(y[j]):
                out.append(x[i]); i += 1
            else:
                # Advance j to the first cell that might overlap x[i]
                j += 1
                while j < len(y) and cid.range_max(y[j]) < imin:
                    j += 1
        elif jmin > imin:
            if y[j] <= cid.range_max(x[i]):
                out.append(y[j]); j += 1
            else:
                i += 1
                while i < len(x) and cid.range_max(x[i]) < jmin:
                    i += 1
        else:
            if x[i] < y[j]:
                out.append(x[i]); i += 1
            else:
                out.append(y[j]); j += 1
    return normalize(out)


def from_difference(x: List[int], y: List[int]) -> List[int]:
    """x minus y by recursive subdivision.  s2/cellunion.go:136-186."""
    out: List[int] = []
    for ci in x:
        _difference_internal(ci, y, out)
    return normalize(out)


def _difference_internal(ci: int, other: List[int], out: List[int]) -> None:
    if not intersects_cell_id(other, ci):
        out.append(ci)
        return
    if contains_cell_id(other, ci):
        return
    for ch in cid.children(ci):
        _difference_internal(ch, other, out)


def contains_cell_id(union: List[int], ci: int) -> bool:
    """Binary search, s2/cellunion.go:280-290."""
    import bisect
    i = bisect.bisect_right(union, ci)
    if i < len(union) and cid.range_min(union[i]) <= ci:
        return True
    return i > 0 and cid.range_max(union[i - 1]) >= ci


def intersects_cell_id(union: List[int], ci: int) -> bool:
    """s2/cellunion.go:293-304."""
    import bisect
    i = bisect.bisect_right(union, ci)
    if i < len(union) and cid.range_min(union[i]) <= cid.range_max(ci):
        return True
    return i > 0 and cid.range_max(union[i - 1]) >= cid.range_min(ci)


def contains_union(a: List[int], b: List[int]) -> bool:
    return all(contains_cell_id(a, ci) for ci in b)


def intersects_union(a: List[int], b: List[int]) -> bool:
    return any(intersects_cell_id(a, ci) for ci in b)


def from_range(begin: int, end: int) -> List[int]:
    """Minimal tiling of the leaf range [begin, end).  s2/cellunion.go:41-49."""
    out: List[int] = []
    ci = begin
    while ci < end:
        t = cid.max_tile(ci, end)
        out.append(t)
        ci = cid.next_cell(cid.range_max(t))
    return out


def expand_at_level(union: List[int], level: int) -> List[int]:
    """Add a rim of neighbor cells at ``level``.  s2/cellunion.go:475-503."""
    output: List[int] = []
    level_lsb = cid.lsb_for_level(level)
    i = len(union) - 1
    while i >= 0:
        ci = union[i]
        if cid.lsb(ci) < level_lsb:
            ci = cid.parent(ci, level)
            # Skip over input cells contained by this parent.
            while i > 0 and cid.contains(ci, union[i - 1]):
                i -= 1
        output.append(ci)
        output.extend(cid.all_neighbors(ci, level))
        i -= 1
    return normalize(output)


def expand_by_radius(union: List[int], min_radius_rad: float,
                     max_level_diff: int = 8) -> List[int]:
    """Expand so every point within min_radius of the union is covered.

    s2/cellunion.go:508-520: pick the expansion level from
    MinWidthMetric, capped at min_level(union) + max_level_diff.
    """
    from ..functions import metric

    min_level = 30
    for ci in union:
        min_level = min(min_level, cid.level(ci))
    radius_level = metric.MIN_WIDTH.max_level(min_radius_rad)
    if radius_level == 0 and min_radius_rad > metric.MIN_WIDTH.value(0):
        union = expand_at_level(union, 0)
    return expand_at_level(union, min(min_level + max_level_diff, radius_level))


def leaf_cells_covered(union: List[int]) -> int:
    """s2/cellunion.go:396-404."""
    return sum(4 ** (30 - cid.level(ci)) for ci in union)


def average_area(union: List[int]) -> float:
    """AvgAreaMetric based, s2/cellunion.go:536-539."""
    from ..functions import metric
    return metric.AVG_AREA.value(30) * leaf_cells_covered(union)


def to_ranges(union: List[int]):
    """(range_min, range_max) uint64 arrays for vectorized membership
    tests — the broadcast form of the covering semi-join
    (s2/cellunion.go:280-304 vectorized via np.searchsorted)."""
    rmin = np.array([cid.range_min(ci) for ci in union], dtype=np.uint64)
    rmax = np.array([cid.range_max(ci) for ci in union], dtype=np.uint64)
    return rmin, rmax


def contains_leaf_v(union_rmin: np.ndarray, union_rmax: np.ndarray,
                    leaf_ids: np.ndarray) -> np.ndarray:
    """Vectorized: for each leaf id, whether a normalized union contains
    it.  Assumes the union's ranges are sorted and disjoint."""
    leaf_ids = np.asarray(leaf_ids, dtype=np.uint64)
    idx = np.searchsorted(union_rmin, leaf_ids, side="right") - 1
    ok = idx >= 0
    idx = np.maximum(idx, 0)
    return ok & (leaf_ids <= union_rmax[idx])


def cap_bound(union: List[int]) -> "Cap":
    """Bounding cap of a cell union (s2/cellunion.go:343-374): the
    axis is the area-weighted centroid of the cell centers (close to
    the minimal-cap axis but cheap), then the cap is grown with
    ``Cap.add_cap`` over each cell's own bounding cap — vertex bounds
    alone are insufficient because the union's cap may be concave
    (cover more than a hemisphere)."""
    from ..functions import metric
    from .cap import Cap
    from .cell import Cell

    if not union:
        return Cap.empty()
    ids = np.asarray(sorted(union), dtype=np.uint64)
    x, y, z = cid.cell_id_to_point_v(ids)
    lv = cid.level_v(ids).astype(np.int64)
    # AvgArea is deriv * 4^-level (dim 2): vectorized ldexp.
    w = np.ldexp(metric.AVG_AREA.deriv, (-2 * lv).astype(np.int32))
    cx, cy, cz = float((x * w).sum()), float((y * w).sum()), float((z * w).sum())
    n = math.sqrt(cx * cx + cy * cy + cz * cz)
    if n == 0.0:
        centroid = (1.0, 0.0, 0.0)
    else:
        centroid = (cx / n, cy / n, cz / n)
    c = Cap.from_point(centroid)
    for ci in ids:
        c = c.add_cap(Cell(int(ci)).cap_bound())
    return c

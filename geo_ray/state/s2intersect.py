"""N-way CellUnion intersection sweep.

Semantics of reference s2/s2intersect/s2intersect.go (``Find``): given
n CellUnions, return every subset of 2+ unions with a non-empty mutual
intersection, each with the disjoint cell set covering exactly that
intersection region.  O(max(i log i, c)) via a sorted limit sweep —
the same delta-sweep shape as CellIndex, so the distributed variant is
a sort + per-partition stack walk.
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Sequence, Tuple

from ..functions import cellid as cid
from . import cellunion as cu


def find(unions: Sequence[List[int]]) -> Dict[FrozenSet[int], List[int]]:
    """Returns {frozenset(union indices): normalized cell list} for all
    index subsets of size >= 2 whose intersection is non-empty, keyed by
    the maximal subset active over each region (disjoint regions)."""
    events: List[Tuple[int, int, int, int]] = []
    for idx, u in enumerate(unions):
        for ci in u:
            events.append((cid.range_min(ci), 0, 1, idx))
            events.append((cid.range_max(ci) + 2, 1, -1, idx))
    events.sort()
    active: Dict[int, int] = {}
    out: Dict[FrozenSet[int], List[int]] = {}
    i, n = 0, len(events)
    prev_boundary = None
    while i < n:
        boundary = events[i][0]
        if prev_boundary is not None and boundary > prev_boundary:
            live = frozenset(k for k, v in active.items() if v > 0)
            if len(live) >= 2:
                out.setdefault(live, []).extend(
                    cu.from_range(prev_boundary, boundary))
        while i < n and events[i][0] == boundary:
            _, _, delta, idx = events[i]
            c = active.get(idx, 0) + delta
            if c:
                active[idx] = c
            else:
                active.pop(idx, None)
            i += 1
        prev_boundary = boundary
    return {k: cu.normalize(v) for k, v in out.items()}

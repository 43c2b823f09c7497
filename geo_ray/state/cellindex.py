"""CellIndex: a (cell_id, label) multimap decomposed into disjoint leaf
ranges for O(log n) stabbing queries.

Semantics of reference s2/cell_index.go:406-490 (``Build``: emit
(start_leaf, +label) / (limit_leaf, -label) deltas, sort, sweep with a
stack) — realized here as a numpy sweep producing a CSR table:
``seg_starts[i]`` is the first leaf of segment i and
``labels[offsets[i]:offsets[i+1]]`` are the labels whose cells contain
that whole segment.  Lookup for a batch of leaf ids is one
``np.searchsorted`` plus a vectorized ragged gather — this is the
broadcast state of the covering semi-join.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..functions import cellid as cid


class CellIndex:
    __slots__ = ("seg_starts", "offsets", "labels", "num_labels")

    def __init__(self, entries: Sequence[Tuple[int, int]]):
        """entries: (cell_id, label) pairs; labels are small ints."""
        if not entries:
            self.seg_starts = np.array([], dtype=np.uint64)
            self.offsets = np.array([0], dtype=np.int64)
            self.labels = np.array([], dtype=np.int32)
            self.num_labels = 0
            return
        events = []  # (boundary_leaf, order, +1/-1, label)
        for ci, label in entries:
            lo = cid.range_min(ci)
            hi = cid.range_max(ci) + 2  # first leaf beyond (leaves step by 2)
            events.append((lo, 0, 1, label))
            events.append((hi, 1, -1, label))
        events.sort()
        seg_starts: List[int] = []
        offsets: List[int] = [0]
        labels: List[int] = []
        active: dict = {}
        i, n = 0, len(events)
        while i < n:
            boundary = events[i][0]
            while i < n and events[i][0] == boundary:
                _, _, delta, label = events[i]
                c = active.get(label, 0) + delta
                if c:
                    active[label] = c
                else:
                    active.pop(label, None)
                i += 1
            seg_starts.append(boundary)
            labels.extend(sorted(active))
            offsets.append(len(labels))
        self.seg_starts = np.array(seg_starts, dtype=np.uint64)
        self.offsets = np.array(offsets, dtype=np.int64)
        self.labels = np.array(labels, dtype=np.int32)
        self.num_labels = int(self.labels.max()) + 1 if len(self.labels) else 0

    def lookup_batch(self, leaf_ids: np.ndarray):
        """All (row, label) pairs where the cell of ``label`` contains
        ``leaf_ids[row]``.  Returns (rows, labels) int arrays."""
        leaf_ids = np.asarray(leaf_ids, dtype=np.uint64)
        if len(self.seg_starts) == 0:
            return (np.array([], dtype=np.int64), np.array([], dtype=np.int32))
        seg = np.searchsorted(self.seg_starts, leaf_ids, side="right") - 1
        valid = seg >= 0
        seg = np.maximum(seg, 0)
        starts = self.offsets[seg]
        counts = np.where(valid, self.offsets[seg + 1] - starts, 0)
        total = int(counts.sum())
        if total == 0:
            return (np.array([], dtype=np.int64), np.array([], dtype=np.int32))
        rows = np.repeat(np.arange(len(leaf_ids), dtype=np.int64), counts)
        cum = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        label_pos = np.repeat(starts, counts) + within
        return rows, self.labels[label_pos]

    def contains_any(self, leaf_ids: np.ndarray) -> np.ndarray:
        """Boolean mask: leaf covered by at least one label."""
        leaf_ids = np.asarray(leaf_ids, dtype=np.uint64)
        if len(self.seg_starts) == 0:
            return np.zeros(len(leaf_ids), dtype=bool)
        seg = np.searchsorted(self.seg_starts, leaf_ids, side="right") - 1
        valid = seg >= 0
        seg = np.maximum(seg, 0)
        return valid & (self.offsets[seg + 1] > self.offsets[seg])

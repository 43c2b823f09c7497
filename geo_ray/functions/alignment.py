"""Polyline vertex alignment (dynamic timewarp).

Port of s2/polyline_alignment.go:24-503: an alignment ("warp") matches
each vertex of polyline A with at least one vertex of polyline B; its
cost is the summed chordal distance over matched pairs, and dynamic
timewarp finds the minimum-cost alignment.  The windowed machinery
(column strides, upsample, dilate, half-resolution) enables the
multi-resolution approximate alignment the reference documents (the Go
port leaves ApproxVertexAlignment/Medoid as TODOs against the C++
implementation; both are completed here from the same published
algorithm — FastDTW-style pyramid with square dilation).

Distributed use (SURVEY.md §2.11 extension surface): trajectory
similarity / dedup groups polylines by key and runs these kernels
inside ``groupby().map_groups`` — see ``medoid_polyline`` and
tests/test_alignment.py for the grouped medoid pattern.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

INF = math.inf


class Window:
    """Sparse DTW search window: one contiguous column stride per row
    with monotone non-decreasing starts/ends
    (s2/polyline_alignment.go:111-239)."""

    def __init__(self, strides: Sequence[Tuple[int, int]]):
        self.strides = [(int(s), int(e)) for s, e in strides]
        self.rows = len(self.strides)
        self.cols = self.strides[-1][1] if self.strides else 0

    def is_valid(self) -> bool:
        if self.rows == 0:
            return False
        prev = (0, 0)
        if self.strides[0][0] != 0:
            return False
        for s, e in self.strides:
            if e <= s or s < prev[0] or e < prev[1]:
                return False
            prev = (s, e)
        return self.strides[-1][1] == self.cols

    def column_stride(self, row: int) -> Tuple[int, int]:
        return self.strides[row]

    def checked_column_stride(self, row: int) -> Tuple[int, int]:
        """All-pass stride for row < 0 (s2/polyline_alignment.go:231)."""
        if row < 0:
            return (-1, 1 << 62)
        return self.strides[row]

    def upsample(self, new_rows: int, new_cols: int) -> "Window":
        """s2/polyline_alignment.go:241-257."""
        row_scale = new_rows / self.rows
        col_scale = new_cols / self.cols
        out = []
        for row in range(new_rows):
            s, e = self.strides[int((row + 0.5) / row_scale)]
            out.append((int(col_scale * s + 0.5), int(col_scale * e + 0.5)))
        return Window(out)

    def dilate(self, radius: int) -> "Window":
        """Square morphological dilation (s2/polyline_alignment.go:263-284)."""
        out = []
        for row in range(self.rows):
            prev_row = max(0, row - radius)
            next_row = min(row + radius, self.rows - 1)
            out.append((max(0, self.strides[prev_row][0] - radius),
                        min(self.strides[next_row][1] + radius, self.cols)))
        return Window(out)

    def debug_string(self) -> str:
        lines = []
        for s, e in self.strides:
            lines.append("".join(" *" if s <= c < e else " ."
                                 for c in range(self.cols)))
        return "\n".join(lines) + "\n"


def _pts(p) -> np.ndarray:
    if hasattr(p, "_varr"):
        return p._varr
    return np.asarray(p, dtype=np.float64).reshape(-1, 3)


def half_resolution(p) -> np.ndarray:
    """Every other vertex, starting at index 0
    (s2/polyline_alignment.go:306-315)."""
    return _pts(p)[::2]


def exact_vertex_alignment_cost(a, b) -> float:
    """Cost-only DTW in O(B) space (s2/polyline_alignment.go:385-403);
    the inner column recurrence is sequential, so rows vectorize only
    the distance computation."""
    A, B = _pts(a), _pts(b)
    cost = np.full(len(B), INF)
    for row in range(len(A)):
        d = np.linalg.norm(A[row] - B, axis=1)
        left_diag_min = 0.0 if row == 0 else INF
        for col in range(len(B)):
            up = cost[col]
            cost[col] = min(left_diag_min, up) + d[col]
            left_diag_min = min(cost[col], up)
    return float(cost[-1])


def exact_vertex_alignment(a, b):
    """Full DTW with warp-path recovery
    (s2/polyline_alignment.go:408-503).  Returns (cost, warp_path)
    with the path in (a_index, b_index) order."""
    A, B = _pts(a), _pts(b)
    w = Window([(0, len(B))] * len(A))
    return dynamic_timewarp(A, B, w)


def dynamic_timewarp(A: np.ndarray, B: np.ndarray, w: Window):
    """Windowed DTW (s2/polyline_alignment.go:442-503): fills only the
    window's cells; ties prefer the diagonal, then up, as the
    reference's walk-back does."""
    rows, cols = len(A), len(B)
    costs = np.full((rows, cols), INF)

    def cell(r, c, stride):
        if r < 0 or c < 0 or not (stride[0] <= c < stride[1]):
            return 0.0 if (r == -1 and c == -1) else INF
        return costs[r, c]

    prev = (-1, 1 << 62)
    for row in range(rows):
        curr = w.column_stride(row)
        d = np.linalg.norm(A[row] - B[curr[0]:curr[1]], axis=1)
        for col in range(curr[0], curr[1]):
            dc = cell(row - 1, col - 1, prev)
            uc = cell(row - 1, col, prev)
            lc = cell(row, col - 1, curr)
            costs[row, col] = min(dc, uc, lc) + d[col - curr[0]]
        prev = curr

    warp: List[Tuple[int, int]] = []
    row, col = rows - 1, cols - 1
    curr = w.checked_column_stride(row)
    prev = w.checked_column_stride(row - 1)
    while row >= 0 and col >= 0:
        warp.append((row, col))
        dc = cell(row - 1, col - 1, prev)
        uc = cell(row - 1, col, prev)
        lc = cell(row, col - 1, curr)
        if dc <= uc and dc <= lc:
            row -= 1
            col -= 1
            curr = w.checked_column_stride(row)
            prev = w.checked_column_stride(row - 1)
        elif uc <= lc:
            row -= 1
            curr = w.checked_column_stride(row)
            prev = w.checked_column_stride(row - 1)
        else:
            col -= 1
    warp.reverse()
    return float(costs[rows - 1, cols - 1]), warp


def approx_vertex_alignment(a, b, radius: int = 1):
    """Multi-resolution approximate DTW (the FastDTW scheme the
    reference's window machinery exists for; C++ parity — the Go port
    leaves this as a TODO).  Recursively aligns half-resolution
    polylines, upsamples the found path's window, dilates by
    ``radius`` and refines.  Returns (cost, warp_path)."""
    A, B = _pts(a), _pts(b)
    min_size = max(2 * (radius + 1), 16)
    if len(A) <= min_size or len(B) <= min_size:
        return dynamic_timewarp(A, B, Window([(0, len(B))] * len(A)))
    _, path = approx_vertex_alignment(half_resolution(A),
                                      half_resolution(B), radius)
    strides = _window_from_warp_path(path,
                                     (len(A) + 1) // 2, (len(B) + 1) // 2)
    w = strides.upsample(len(A), len(B)).dilate(radius)
    return dynamic_timewarp(A, B, w)


def _window_from_warp_path(path, rows: int, cols: int) -> Window:
    """Tightest window containing a warp path."""
    starts = [cols] * rows
    ends = [0] * rows
    for r, c in path:
        starts[r] = min(starts[r], c)
        ends[r] = max(ends[r], c + 1)
    # enforce monotone structure
    for r in range(1, rows):
        starts[r] = max(starts[r], starts[r - 1])
        ends[r] = max(ends[r], ends[r - 1])
    return Window(list(zip(starts, ends)))


def medoid_polyline(polylines: Sequence, approx: bool = False) -> int:
    """Index of the polyline minimizing the summed alignment cost to
    every other (s2/polyline_alignment.go:103-106 docs; C++ parity).
    The O(n^2) pairwise costs are the per-group work of the grouped
    trajectory-representative pattern."""
    n = len(polylines)
    if n == 0:
        raise ValueError("empty collection")
    pts = [_pts(p) for p in polylines]
    costs = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            c = (approx_vertex_alignment(pts[i], pts[j])[0] if approx
                 else exact_vertex_alignment_cost(pts[i], pts[j]))
            costs[i, j] = costs[j, i] = c
    return int(np.argmin(costs.sum(axis=1)))

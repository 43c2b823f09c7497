"""Polyline vertex alignment (dynamic timewarp).

Port of s2/polyline_alignment.go:24-503: an alignment ("warp") matches
each vertex of polyline A with at least one vertex of polyline B; its
cost is the summed CHORDAL distance (|a - b|, the plain Norm — the
reference deliberately uses distance, not squared distance) over
matched pairs, and dynamic timewarp finds the minimum-cost alignment
with the recurrence

    T[i][j] = dist(i, j) + min(T[i-1][j-1], T[i-1][j], T[i][j-1])

The DP is vectorized over ANTI-DIAGONALS (every cell of diagonal d
depends only on diagonals d-1 and d-2), so cost tables fill with
O(R + C) numpy calls instead of O(R * C) Python steps; the walk-back
reproduces the reference's exact tie rule (diagonal wins ties, then
up).  The windowed machinery (column strides, upsample, dilate,
half-resolution — pinned to the reference's golden grids) enables the
multi-resolution approximate alignment; the Go port leaves
ApproxVertexAlignment / Medoid / Consensus as TODOs against the C++
implementation — all three are completed here from the same published
algorithms (FastDTW-style pyramid with square dilation; DBA consensus
of Petitjean, Ketterlin & Gancarski).

Distributed use (SURVEY.md §2.11 extension surface): trajectory
similarity / dedup groups polylines by key and runs these kernels
inside ``groupby().map_groups`` — see ``medoid_polyline`` and
tests/test_alignment.py for the grouped medoid pattern, and
``q_traj_dtw`` (pipelines/queries.py) for the distributed per-pair
integer-lattice DTW query.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

INF = math.inf


class Window:
    """Sparse DTW search window: one contiguous column stride per row
    with monotone non-decreasing starts/ends
    (s2/polyline_alignment.go:111-285)."""

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
        """s2/polyline_alignment.go:241-257 (golden-grid pinned)."""
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

    @classmethod
    def from_warp_path(cls, path: Sequence[Tuple[int, int]],
                       rows: int, cols: int) -> "Window":
        """Tightest valid window containing the warp path (the C++
        WindowFromWarpPath the approximate aligner uses)."""
        starts = [cols] * rows
        ends = [0] * rows
        for r, c in path:
            starts[r] = min(starts[r], c)
            ends[r] = max(ends[r], c + 1)
        for r in range(1, rows):
            starts[r] = max(starts[r], starts[r - 1])
            ends[r] = max(ends[r], ends[r - 1])
        return cls(list(zip(starts, ends)))

    def mask(self) -> np.ndarray:
        m = np.zeros((self.rows, self.cols), dtype=bool)
        for i, (s, e) in enumerate(self.strides):
            m[i, s:e] = True
        return m

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


def _pick(prev: Optional[np.ndarray], prev_i0: int,
          ii: np.ndarray) -> np.ndarray:
    """Values of a stored anti-diagonal at rows ``ii`` (inf outside)."""
    out = np.full(len(ii), INF)
    if prev is not None:
        k = ii - prev_i0
        ok = (k >= 0) & (k < len(prev))
        if ok.any():
            out[ok] = prev[k[ok]]
    return out


def _diag_range(d: int, R: int, C: int):
    i0 = max(0, d - C + 1)
    i1 = min(d, R - 1)
    i = np.arange(i0, i1 + 1)
    return i, d - i, i0


def exact_vertex_alignment_cost(a, b) -> float:
    """Optimal alignment cost only, O(min(R, C)) extra space
    (ExactVertexAlignmentCost, s2/polyline_alignment.go:385-405):
    two rolling anti-diagonals instead of the full table."""
    A, B = _pts(a), _pts(b)
    R, C = len(A), len(B)
    prev2 = prev1 = None
    p2_i0 = p1_i0 = 0
    for d in range(R + C - 1):
        i, j, i0 = _diag_range(d, R, C)
        dist = np.linalg.norm(A[i] - B[j], axis=1)
        if d == 0:
            cur = dist
        else:
            up = _pick(prev1, p1_i0, i - 1)
            left = _pick(prev1, p1_i0, i)
            diag = _pick(prev2, p2_i0, i - 1)
            cur = np.minimum(np.minimum(diag, up), left) + dist
        prev2, p2_i0 = prev1, p1_i0
        prev1, p1_i0 = cur, i0
    return float(prev1[-1])


def _dtw_table(A: np.ndarray, B: np.ndarray,
               w: Optional[Window]) -> np.ndarray:
    """Anti-diagonal table fill; out-of-window cells stay INF (the
    boundsCheckedTableCost convention)."""
    R, C = len(A), len(B)
    T = np.full((R, C), INF)
    W = w.mask() if w is not None else None
    for d in range(R + C - 1):
        i, j, _ = _diag_range(d, R, C)
        if W is not None:
            keep = W[i, j]
            i, j = i[keep], j[keep]
            if not len(i):
                continue
        dist = np.linalg.norm(A[i] - B[j], axis=1)
        diag = np.where((i > 0) & (j > 0), T[np.maximum(i - 1, 0),
                                             np.maximum(j - 1, 0)],
                        np.where((i == 0) & (j == 0), 0.0, INF))
        up = np.where(i > 0, T[np.maximum(i - 1, 0), j], INF)
        left = np.where(j > 0, T[i, np.maximum(j - 1, 0)], INF)
        T[i, j] = np.minimum(np.minimum(diag, up), left) + dist
    return T


def _walk_back(T: np.ndarray) -> List[Tuple[int, int]]:
    """Reference walk-back and tie rule (diag <= up <= left wins,
    s2/polyline_alignment.go:471-497), returned in FORWARD order."""
    R, C = T.shape

    def cell(i, j):
        if i < 0 and j < 0:
            return 0.0
        if i < 0 or j < 0:
            return INF
        return T[i, j]

    path = []
    row, col = R - 1, C - 1
    while row >= 0 and col >= 0:
        path.append((row, col))
        d = cell(row - 1, col - 1)
        u = cell(row - 1, col)
        left = cell(row, col - 1)
        if d <= u and d <= left:
            row -= 1
            col -= 1
        elif u <= left:
            row -= 1
        else:
            col -= 1
    path.reverse()
    return path


def dynamic_timewarp(A, B, w: Window):
    """Windowed DTW (s2/polyline_alignment.go:442-503).  Returns
    (cost, warp_path) with the forward-ordered path:
    path[0] == (0, 0), path[-1] == (R-1, C-1)."""
    A, B = _pts(A), _pts(B)
    T = _dtw_table(A, B, w)
    return float(T[-1, -1]), _walk_back(T)


# alias kept for callers that name the operation rather than the
# algorithm
windowed_vertex_alignment = dynamic_timewarp


def exact_vertex_alignment(a, b):
    """Full DTW with warp-path recovery
    (s2/polyline_alignment.go:408-503)."""
    A, B = _pts(a), _pts(b)
    T = _dtw_table(A, B, None)
    return float(T[-1, -1]), _walk_back(T)


def approx_vertex_alignment(a, b, radius: int = 1):
    """Multi-resolution approximate DTW (the FastDTW scheme the
    reference's window machinery exists for; C++ parity — the Go port
    leaves this as a TODO).  Recursively aligns half-resolution
    polylines, upsamples the found path's window, dilates by
    ``radius`` and refines.  Returns (cost, warp_path); the cost
    upper-bounds (and with a generous radius equals) the exact
    optimum in O((R + C) * radius) table cells."""
    A, B = _pts(a), _pts(b)
    min_size = max(2 * (radius + 1), 16)
    if len(A) <= min_size or len(B) <= min_size:
        return dynamic_timewarp(A, B, Window([(0, len(B))] * len(A)))
    _, path = approx_vertex_alignment(half_resolution(A),
                                      half_resolution(B), radius)
    strides = Window.from_warp_path(path, (len(A) + 1) // 2,
                                    (len(B) + 1) // 2)
    w = strides.upsample(len(A), len(B)).dilate(radius)
    return dynamic_timewarp(A, B, w)


def medoid_polyline(polylines: Sequence, approx: bool = False) -> int:
    """Index of the polyline minimizing the summed alignment cost to
    every other (GetMedoidPolyline; C++ parity).  The O(n^2) pairwise
    costs are the per-group work of the grouped
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


def consensus_polyline(lines: Sequence, n_iters: int = 5) -> np.ndarray:
    """DBA consensus (GetConsensusPolyline; Petitjean, Ketterlin &
    Gancarski's Dynamic Timewarp Barycenter Averaging): start from the
    medoid, then repeatedly align every line to the current consensus
    and move each consensus vertex to the normalized mean of all
    vertices warped onto it."""
    arrs = [_pts(p) for p in lines]
    consensus = arrs[medoid_polyline(arrs)].copy()
    for _ in range(n_iters):
        sums = np.zeros_like(consensus)
        counts = np.zeros(len(consensus))
        for arr in arrs:
            _, path = exact_vertex_alignment(consensus, arr)
            for i, j in path:
                sums[i] += arr[j]
                counts[i] += 1
        nxt = sums / counts[:, None]
        norms = np.linalg.norm(nxt, axis=1)
        nxt = nxt / np.where(norms > 0, norms, 1.0)[:, None]
        if np.allclose(nxt, consensus, atol=1e-15):
            break
        consensus = nxt
    return consensus

"""Polyline vertex alignment (dynamic timewarp).

Semantics of reference s2/polyline_alignment.go:16-508: an alignment
("warp") pairs each vertex of polyline A with at least one vertex of
polyline B; its cost is the summed CHORDAL distance (|a - b|, the
plain Norm — the reference deliberately uses distance, not squared
distance; the right-angle test case below pins the difference) over
the warp path; ExactVertexAlignment finds the least-cost path with
the standard DTW recurrence

    T[i][j] = dist(i, j) + min(T[i-1][j-1], T[i-1][j], T[i][j-1])

The DP here is vectorized over ANTI-DIAGONALS (every cell of
diagonal d depends only on diagonals d-1 and d-2), so cost tables
fill with O(R + C) numpy calls instead of O(R * C) Python steps; the
walk-back reproduces the reference's exact tie rule (diagonal wins
ties, then up).  Windowed DTW, window upsample/dilate and the
approximate coarse-to-fine alignment follow the reference's window
machinery (s2/polyline_alignment.go:110-285; the approx driver
matches the C++ recipe the Go port lists as TODO: half resolution ->
align -> upsample window -> dilate by radius -> windowed DTW).

Also provided: medoid_polyline and the DBA consensus iteration
(Petitjean et al.), the collection-level operations named in the
reference's module docstring.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

INF = float("inf")


class Window:
    """Sparse binary matrix of per-row [start, end) column strides
    (s2/polyline_alignment.go:110-285)."""

    def __init__(self, strides: Sequence[Tuple[int, int]]):
        self.strides = [(int(s), int(e)) for s, e in strides]
        self.rows = len(self.strides)
        self.cols = self.strides[-1][1] if self.strides else 0

    def is_valid(self) -> bool:
        if self.rows <= 0 or self.cols <= 0 or not self.strides \
                or self.strides[0][0] != 0 \
                or self.strides[-1][1] != self.cols:
            return False
        ps, pe = -1, -1
        for s, e in self.strides:
            if e <= s or s < ps or e < pe:
                return False
            ps, pe = s, e
        return True

    def upsample(self, new_rows: int, new_cols: int) -> "Window":
        row_scale = new_rows / self.rows
        col_scale = new_cols / self.cols
        out = []
        for row in range(new_rows):
            s, e = self.strides[int((row + 0.5) / row_scale)]
            out.append((int(col_scale * s + 0.5),
                        int(col_scale * e + 0.5)))
        return Window(out)

    def dilate(self, radius: int) -> "Window":
        out = []
        for row in range(self.rows):
            prev_row = max(0, row - radius)
            next_row = min(row + radius, self.rows - 1)
            out.append((max(0, self.strides[prev_row][0] - radius),
                        min(self.strides[next_row][1] + radius,
                            self.cols)))
        return Window(out)

    @classmethod
    def from_warp_path(cls, path: Sequence[Tuple[int, int]]) -> "Window":
        """Tightest valid window containing the warp path (the C++
        WindowFromWarpPath used by the approximate aligner)."""
        rows = path[-1][0] + 1
        lo = [None] * rows
        hi = [None] * rows
        for i, j in path:
            if lo[i] is None or j < lo[i]:
                lo[i] = j
            if hi[i] is None or j > hi[i]:
                hi[i] = j
        return cls([(lo[i], hi[i] + 1) for i in range(rows)])

    def debug_string(self) -> str:
        out = []
        for s, e in self.strides:
            out.append("".join(" *" if s <= c < e else " ."
                               for c in range(self.cols)) + "\n")
        return "".join(out)

    def mask(self) -> np.ndarray:
        m = np.zeros((self.rows, self.cols), dtype=bool)
        for i, (s, e) in enumerate(self.strides):
            m[i, s:e] = True
        return m


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
    A = np.asarray(a, dtype=np.float64).reshape(-1, 3)
    B = np.asarray(b, dtype=np.float64).reshape(-1, 3)
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


def exact_vertex_alignment(a, b):
    """(cost, warp_path) of the optimal alignment — full DP table +
    walk-back (ExactVertexAlignment, s2/polyline_alignment.go:408-508).
    The warp path is forward-ordered: path[0] == (0, 0),
    path[-1] == (R-1, C-1)."""
    A = np.asarray(a, dtype=np.float64).reshape(-1, 3)
    B = np.asarray(b, dtype=np.float64).reshape(-1, 3)
    T = _dtw_table(A, B, None)
    return float(T[-1, -1]), _walk_back(T)


def windowed_vertex_alignment(a, b, w: Window):
    """DTW restricted to the given search window."""
    A = np.asarray(a, dtype=np.float64).reshape(-1, 3)
    B = np.asarray(b, dtype=np.float64).reshape(-1, 3)
    T = _dtw_table(A, B, w)
    return float(T[-1, -1]), _walk_back(T)


def _half_resolution(p: np.ndarray) -> np.ndarray:
    """Every other vertex, even indices (halfResolution,
    s2/polyline_alignment.go:306-313)."""
    return p[::2]


def approx_vertex_alignment(a, b, radius: int = 3):
    """Coarse-to-fine approximate alignment (the C++
    ApproxVertexAlignment recipe): recursively halve both polylines,
    align the coarse pair, upsample that path's window to full
    resolution, dilate it by ``radius`` and run windowed DTW.  Cost
    is an upper bound on (often equal to) the exact cost in
    O((R + C) * radius) table cells."""
    A = np.asarray(a, dtype=np.float64).reshape(-1, 3)
    B = np.asarray(b, dtype=np.float64).reshape(-1, 3)
    R, C = len(A), len(B)
    if R <= max(4, 2 * radius) or C <= max(4, 2 * radius):
        return exact_vertex_alignment(A, B)
    _, coarse = approx_vertex_alignment(_half_resolution(A),
                                        _half_resolution(B), radius)
    w = Window.from_warp_path(coarse).upsample(R, C).dilate(radius)
    return windowed_vertex_alignment(A, B, w)


def medoid_polyline(lines: Sequence) -> int:
    """Index of the polyline minimizing the summed alignment cost to
    every other polyline in the collection (GetMedoidPolyline)."""
    n = len(lines)
    arrs = [np.asarray(p, dtype=np.float64).reshape(-1, 3)
            for p in lines]
    totals = np.zeros(n)
    for i in range(n):
        for j in range(i + 1, n):
            c = exact_vertex_alignment_cost(arrs[i], arrs[j])
            totals[i] += c
            totals[j] += c
    return int(np.argmin(totals))


def consensus_polyline(lines: Sequence, n_iters: int = 5) -> np.ndarray:
    """DBA consensus (GetConsensusPolyline; Petitjean, Ketterlin &
    Gancarski's Dynamic Timewarp Barycenter Averaging): start from the
    medoid, then repeatedly align every line to the current consensus
    and move each consensus vertex to the normalized mean of all
    vertices warped onto it."""
    arrs = [np.asarray(p, dtype=np.float64).reshape(-1, 3)
            for p in lines]
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

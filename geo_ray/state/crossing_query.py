"""CrossingEdgeQuery: all edges of an indexed geometry that cross a
query edge.

Semantics of reference s2/crossing_edge_query.go:43-390 (Crossings with
CrossingTypeInterior / CrossingTypeAll): returns the edge ids of the
target shape whose edges properly cross (or also touch, for All) the
query edge AB.  The candidate pass is vectorized triage over all edges
(chunked); for repeated queries against a large polygon pass a
``_PolyEdgeIndex`` (stages/join.py) and only the cells whose caps the
edge AB approaches are scanned.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..functions.edges import crossing_sign, edge_or_vertex_crossing
from ..functions.predicates import MAX_DETERMINANT_ERROR


def crossings(a, b, cvs: np.ndarray, dvs: np.ndarray,
              interior_only: bool = True) -> List[int]:
    """Edge ids among (cvs[i], dvs[i]) crossing edge AB.

    interior_only=True: proper crossings (CrossingSign > 0);
    False: also shared-vertex crossings (EdgeOrVertexCrossing).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cvs = np.asarray(cvs, dtype=np.float64).reshape(-1, 3)
    dvs = np.asarray(dvs, dtype=np.float64).reshape(-1, 3)
    axb = np.cross(a, b)
    cxd = np.cross(cvs, dvs)
    det_c = cxd @ a
    det_d = cxd @ b
    det_a = axb @ cvs.T
    det_b = axb @ dvs.T
    eps = MAX_DETERMINANT_ERROR
    ambiguous = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
                 (np.abs(det_a) <= eps) | (np.abs(det_b) <= eps))
    acb = -np.sign(det_a)
    clear_cross = ((np.sign(det_b) == acb) & (-np.sign(det_d) == acb) &
                   (np.sign(det_c) == acb) & ~ambiguous)
    out = set(np.nonzero(clear_cross)[0].tolist())
    ta, tb = tuple(a), tuple(b)
    for e in np.nonzero(ambiguous)[0]:
        c, d = tuple(cvs[e]), tuple(dvs[e])
        if interior_only:
            if crossing_sign(ta, tb, c, d) > 0:
                out.add(int(e))
        else:
            if edge_or_vertex_crossing(ta, tb, c, d):
                out.add(int(e))
    return sorted(out)


def index_cells_for_edge(a, b, edge_index) -> List[int]:
    """Leaf indices (into ``edge_index``'s leaf arrays) of the index
    cells the edge AB passes through — the reference's recursive
    PaddedCell descent (getCellsForEdge / computeCellsIntersected /
    clipVAxis, s2/crossing_edge_query.go:216-390), NOT a
    covering-based approximation: the edge's (u,v) bound is split at
    each cell midpoint with the exact child bounds of splitUBound /
    splitVBound, so a long edge only ever visits the O(path) cells it
    actually crosses."""
    from ..functions import cellid as cid
    from ..functions.edge_clipping import _interpolate_f64, face_segments
    from ..state.paddedcell import PaddedCell

    leaf_ids = edge_index.leaf_ids
    n = len(leaf_ids)
    if n == 0:
        return []
    found: List[int] = []

    def compute(pcell, bound, a_uv, b_uv):
        # seek(RangeMin); done or first leaf beyond RangeMax => disjoint
        pos = int(np.searchsorted(leaf_ids,
                                  np.uint64(cid.range_min(pcell.id))))
        if pos == n or int(leaf_ids[pos]) > cid.range_max(pcell.id):
            return
        if int(leaf_ids[pos]) == pcell.id:
            found.append(pos)
            return
        # split the edge among the four children
        mid = pcell.middle()
        cx, cy = mid[0], mid[2]          # Middle().Lo

        neg_slope = (a_uv[0] > b_uv[0]) != (a_uv[1] > b_uv[1])

        def split_u(bd, u):
            v = min(max(_interpolate_f64(u, a_uv[0], b_uv[0],
                                         a_uv[1], b_uv[1]),
                        bd[2]), bd[3])
            diag = 1 if neg_slope else 0
            return _split_bound(bd, 0, diag, u, v)

        def split_v(bd, v):
            u = min(max(_interpolate_f64(v, a_uv[1], b_uv[1],
                                         a_uv[0], b_uv[0]),
                        bd[0]), bd[1])
            diag = 1 if neg_slope else 0
            return _split_bound(bd, diag, 0, u, v)

        def clip_v_axis(bd, center_v, i):
            if bd[3] < center_v:
                compute(PaddedCell.from_parent_ij(pcell, i, 0), bd,
                        a_uv, b_uv)
            elif bd[2] >= center_v:
                compute(PaddedCell.from_parent_ij(pcell, i, 1), bd,
                        a_uv, b_uv)
            else:
                lo_b, hi_b = split_v(bd, center_v)
                compute(PaddedCell.from_parent_ij(pcell, i, 0), lo_b,
                        a_uv, b_uv)
                compute(PaddedCell.from_parent_ij(pcell, i, 1), hi_b,
                        a_uv, b_uv)

        if bound[1] < cx:
            clip_v_axis(bound, cy, 0)
        elif bound[0] >= cx:
            clip_v_axis(bound, cy, 1)
        else:
            lo_b, hi_b = split_u(bound, cx)
            if bound[3] < cy:
                compute(PaddedCell.from_parent_ij(pcell, 0, 0), lo_b,
                        a_uv, b_uv)
                compute(PaddedCell.from_parent_ij(pcell, 1, 0), hi_b,
                        a_uv, b_uv)
            elif bound[2] >= cy:
                compute(PaddedCell.from_parent_ij(pcell, 0, 1), lo_b,
                        a_uv, b_uv)
                compute(PaddedCell.from_parent_ij(pcell, 1, 1), hi_b,
                        a_uv, b_uv)
            else:
                clip_v_axis(lo_b, cy, 0)
                clip_v_axis(hi_b, cy, 1)

    for seg in face_segments(tuple(a), tuple(b)):
        a_uv, b_uv = seg.a, seg.b
        bound = [min(a_uv[0], b_uv[0]), max(a_uv[0], b_uv[0]),
                 min(a_uv[1], b_uv[1]), max(a_uv[1], b_uv[1])]
        face_cell = (seg.face << 61) | (1 << 60)
        pcell = PaddedCell.from_cell_id(face_cell, 0.0)
        edge_root = pcell.shrink_to_fit(bound)
        # relate edgeRoot to the leaf set — LocateCellID semantics
        # (s2/shapeindex.go iterator): I = lower_bound(RangeMin(T));
        # T inside an index cell => that cell is I or its predecessor
        lo = cid.range_min(edge_root)
        hi = cid.range_max(edge_root)
        pos = int(np.searchsorted(leaf_ids, np.uint64(lo)))
        rel = "disjoint"
        if pos < n:
            i_cell = int(leaf_ids[pos])
            if i_cell >= edge_root and cid.range_min(i_cell) <= edge_root:
                rel = "indexed"
                found.append(pos)
            elif i_cell <= hi:
                rel = "subdivided"
        if rel == "disjoint" and pos > 0 \
                and cid.range_max(int(leaf_ids[pos - 1])) >= edge_root:
            rel = "indexed"
            found.append(pos - 1)
        if rel == "subdivided":
            if not cid.is_face(edge_root):
                pcell = PaddedCell.from_cell_id(edge_root, 0.0)
            compute(pcell, bound, a_uv, b_uv)
    return sorted(set(found))


def _split_bound(bd, u_end: int, v_end: int, u: float, v: float):
    """splitBound (s2/crossing_edge_query.go:389-413): child bounds
    from splitting the edge at (u, v)."""
    lo_b, hi_b = list(bd), list(bd)
    if u_end == 1:
        lo_b[0] = u
        hi_b[1] = u
    else:
        lo_b[1] = u
        hi_b[0] = u
    if v_end == 1:
        lo_b[2] = v
        hi_b[3] = v
    else:
        lo_b[3] = v
        hi_b[2] = v
    return lo_b, hi_b


def crossings_indexed(a, b, edge_index,
                      interior_only: bool = True) -> List[int]:
    """Same as :func:`crossings`, pruned with a
    stages.join._PolyEdgeIndex via the reference's PaddedCell descent
    (:func:`index_cells_for_edge`): only edges clipped into the index
    cells the query edge actually passes through are tested."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cand_edges: set = set()
    for cidx in index_cells_for_edge(a, b, edge_index):
        lo, hi = edge_index.offsets[cidx], edge_index.offsets[cidx + 1]
        cand_edges.update(int(e) for e in edge_index.edge_ids[lo:hi])
    ids = sorted(cand_edges)
    if not ids:
        return []
    sub = crossings(a, b, edge_index.cvs[ids], edge_index.dvs[ids],
                    interior_only)
    return [ids[i] for i in sub]

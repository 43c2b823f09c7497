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


def crossings_indexed(a, b, edge_index,
                      interior_only: bool = True) -> List[int]:
    """Same, pruned with a stages.join._PolyEdgeIndex: only cells whose
    bounding caps come within the query edge's reach are scanned."""
    from ..functions.distance import chord2_point_edge
    from ..functions.latlng import chord2_to_angle, angle_to_chord2

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    # A crossing edge lies in some boundary cell the query edge passes
    # through; prune to cells with dist(cap_center, AB) <= cap radius.
    centers = edge_index.centers
    d = chord2_point_edge(centers, a, b)
    # convert cap radius (chord2) to a comparable chord2 reach with
    # slack: chord distances don't add linearly, so compare via angles.
    d_ang = chord2_to_angle(d)
    r_ang = chord2_to_angle(edge_index.cap_radius_chord2)
    near = d_ang <= r_ang + 1e-9
    cand_edges: set = set()
    for cidx in np.nonzero(near)[0]:
        lo, hi = edge_index.offsets[cidx], edge_index.offsets[cidx + 1]
        cand_edges.update(int(e) for e in edge_index.edge_ids[lo:hi])
    ids = sorted(cand_edges)
    if not ids:
        return []
    sub = crossings(a, b, edge_index.cvs[ids], edge_index.dvs[ids],
                    interior_only)
    return [ids[i] for i in sub]

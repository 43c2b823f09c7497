"""Polygon boolean operations (intersection / union / difference /
symmetric difference / complement) on the sphere.

The Go reference ships the *relation* machinery (Loop.Contains/
Intersects, compareBoundary — s2/loop.go:274-369,917-1005) and the
boolean-op oracle fixtures (aIntersectB / aUnionB / aMinusB / bMinusA,
s2/loop_test.go:85-94) but not a boolean-operation engine (C++ S2's
S2BooleanOperation was never ported to Go).  This module supplies the
missing capability with the classic overlay algorithm:

1. split every boundary edge of A at its interior crossings with the
   boundary of B (and vice versa), using the robust crossing sign
   (s2/edge_crossings.go:88-112) and the exact intersection ladder
   (s2/edge_crossings.go:172-205) so both sides split at bit-identical
   points;
2. keep each sub-edge according to the operation's containment table
   (midpoint strictly inside / outside the other region, with explicit
   handling of exactly-shared directed edges);
3. stitch kept directed edges into loops, taking the leftmost turn at
   multi-degree vertices (keeps the result interior on the left);
4. assemble the loops into the xor-containment polygon model, fixing
   global parity against a reference point and normalizing every loop
   to area <= 2*pi (a lone Loop.full() carries odd parity, mirroring
   the reference's full-loop convention, s2/loop.go:115-121).

Degenerate contacts (boundaries touching along shared vertices or
exactly-shared edges) follow open-regularized semantics: contact sets
of measure zero do not appear in the result.  Under the symbolic
perturbation of RobustSign (s2/predicates.go:350-475) any other
degeneracy is measure-zero and resolves consistently.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..functions.distance import edge_intersection_robust
from ..functions.edges import crossing_sign
from .loop import Loop
from .polygon import Polygon

Vec = Tuple[float, float, float]

_OPS = ("intersection", "union", "difference", "symmetric_difference")


def _region_edges(poly: Polygon, complemented: bool) -> List[Tuple[Vec, Vec]]:
    """Directed boundary edges with the region interior on the left.

    In the xor containment model, loops are stored CCW-normalized
    (area <= 2*pi) regardless of role; a loop at odd nesting depth is a
    hole boundary, so its stored direction is the *reverse* of the
    polygon's interior-left boundary direction and must be flipped
    (s2/polygon.go loop-depth semantics)."""
    out: List[Tuple[Vec, Vec]] = []
    depths = poly._loop_depths()
    for lp, d in zip(poly.loops, depths):
        flip = (d % 2 == 1) != complemented
        for (u, v) in lp.edges():
            out.append((v, u) if flip else (u, v))
    return out


def _region_contains(poly: Polygon, complemented: bool, p) -> bool:
    c = poly.contains_point(p)
    return (not c) if complemented else c


# Below this many A x B edge pairs the dense full-matrix triage is cheaper
# than building a cell index (BLAS matmuls, no Python per pair).
_DENSE_PAIR_LIMIT = 1 << 16


def _edge_arrays(edges):
    cvs = np.asarray([e[0] for e in edges], dtype=np.float64).reshape(-1, 3)
    dvs = np.asarray([e[1] for e in edges], dtype=np.float64).reshape(-1, 3)
    return cvs, dvs


def _triage_pairs(cvs_a, dvs_a, cvs_b, dvs_b, ai, bj):
    """Proper-crossing decision for candidate pairs (ai[k], bj[k]):
    elementwise vectorized sign triage (same determinants as
    CrossingSign's triage, s2/edge_crosser.go) with the robust scalar
    predicate on ambiguous pairs.  Returns the surviving (ai, bj)."""
    from ..functions.predicates import MAX_DETERMINANT_ERROR
    if len(ai) == 0:
        return ai, bj
    A, B = cvs_a[ai], dvs_a[ai]
    C, D = cvs_b[bj], dvs_b[bj]
    axb = np.cross(A, B)
    cxd = np.cross(C, D)
    det_c = np.einsum("ij,ij->i", cxd, A)
    det_d = np.einsum("ij,ij->i", cxd, B)
    det_a = np.einsum("ij,ij->i", axb, C)
    det_b = np.einsum("ij,ij->i", axb, D)
    eps = MAX_DETERMINANT_ERROR
    amb = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
           (np.abs(det_a) <= eps) | (np.abs(det_b) <= eps))
    acb = -np.sign(det_a)
    clear = ((np.sign(det_b) == acb) & (-np.sign(det_d) == acb) &
             (np.sign(det_c) == acb) & ~amb)
    keep = clear.copy()
    for k in np.nonzero(amb)[0]:
        if crossing_sign(tuple(A[k]), tuple(B[k]),
                         tuple(C[k]), tuple(D[k])) > 0:
            keep[k] = True
    return ai[keep], bj[keep]


def _crossing_pairs_dense(cvs_a, dvs_a, cvs_b, dvs_b):
    """All proper-crossing (i, j) pairs via four (E_a, E_b) sign
    matrices — the vectorized form of the brute double loop."""
    from ..functions.predicates import MAX_DETERMINANT_ERROR
    axb = np.cross(cvs_a, dvs_a)
    cxd = np.cross(cvs_b, dvs_b)
    det_a = axb @ cvs_b.T            # (Ea, Eb): axb_i . c_j
    det_b = axb @ dvs_b.T
    det_c = cvs_a @ cxd.T            # cxd_j . a_i
    det_d = dvs_a @ cxd.T
    eps = MAX_DETERMINANT_ERROR
    amb = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
           (np.abs(det_a) <= eps) | (np.abs(det_b) <= eps))
    acb = -np.sign(det_a)
    clear = ((np.sign(det_b) == acb) & (-np.sign(det_d) == acb) &
             (np.sign(det_c) == acb) & ~amb)
    ai, bj = np.nonzero(clear | amb)
    # re-triage only the candidate pairs so ambiguous ones hit the
    # robust scalar predicate exactly once
    mask_amb = amb[ai, bj]
    out_i = [ai[~mask_amb]]
    out_j = [bj[~mask_amb]]
    ri, rj = _triage_pairs(cvs_a, dvs_a, cvs_b, dvs_b,
                           ai[mask_amb], bj[mask_amb])
    out_i.append(ri)
    out_j.append(rj)
    return np.concatenate(out_i), np.concatenate(out_j)


def _boundary_edge_index(poly: Polygon):
    """Clipped-edge cell index over a polygon's boundary (ShapeIndex
    subdivision semantics, s2/shapeindex.go:923-1260) for
    output-sensitive crossing discovery.  Edge ids are positions in the
    loop-order edge enumeration — identical to _region_edges order
    (endpoint swaps from depth flips don't affect crossing tests)."""
    from ..stages.join import _PolyEdgeIndex
    from .coverer import RegionCoverer
    from . import cellunion as cu
    rc = RegionCoverer(max_cells=64, max_level=18)
    cover = rc.cell_union(poly)
    interior = cu.normalize(rc.interior_covering(poly))
    boundary = cu.from_difference(cover, interior)
    if not boundary:
        boundary = list(cover)
    return _PolyEdgeIndex(poly, boundary)


def _crossing_pairs_indexed(cvs_a, dvs_a, index):
    """Candidate (i, j) pairs via the cell index: an A edge can only
    cross B edges stored in leaves whose bounding caps overlap the A
    edge's bounding cap.  Leaf-vs-edge proximity is blocked matmuls
    over ~E_b/maxEdgesPerCell leaf centers instead of E_b edges."""
    from ..functions.latlng import chord2_to_angle
    mids = cvs_a + dvs_a
    nrm = np.linalg.norm(mids, axis=1)
    nrm[nrm == 0.0] = 1.0            # antipodal endpoints: cap = hemisphere
    mids = mids / nrm[:, None]
    cosr = np.clip(np.einsum("ij,ij->i", mids, cvs_a), -1.0, 1.0)
    r_a = np.arccos(cosr)
    r_a[np.linalg.norm(cvs_a + dvs_a, axis=1) == 0.0] = math.pi / 2
    centers = index.centers          # (L, 3)
    r_leaf = chord2_to_angle(index.cap_radius_chord2)  # (L,)
    n_a = len(cvs_a)
    pair_i: List[np.ndarray] = []
    pair_j: List[np.ndarray] = []
    counts = np.diff(index.offsets)
    block = max(1, int(4_000_000 // max(1, len(centers))))
    for lo in range(0, n_a, block):
        hi = min(n_a, lo + block)
        cosd = np.clip(centers @ mids[lo:hi].T, -1.0, 1.0)  # (L, blk)
        ang = np.arccos(cosd)
        near = ang <= (r_leaf[:, None] + r_a[None, lo:hi] + 1e-9)
        li, aoff = np.nonzero(near)
        if len(li) == 0:
            continue
        # expand each (leaf, a-edge) hit into the leaf's B edge ids
        reps = counts[li]
        a_ids = np.repeat(aoff + lo, reps)
        starts = index.offsets[li]
        # vectorized ragged gather: for each hit, a run of edge ids
        idx = np.repeat(starts + reps - reps.cumsum(), reps) + \
            np.arange(int(reps.sum()), dtype=np.int64)
        b_ids = index.edge_ids[idx]
        pair_i.append(a_ids)
        pair_j.append(b_ids)
    if not pair_i:
        return (np.empty(0, dtype=np.int64),) * 2
    ai = np.concatenate(pair_i)
    bj = np.concatenate(pair_j)
    enc = ai * np.int64(len(index.cvs)) + bj
    _, first = np.unique(enc, return_index=True)
    return ai[first], bj[first]


def _split_edges(edges_a, edges_b, poly_a: Polygon = None,
                 poly_b: Polygon = None):
    """Split both edge lists at their pairwise interior crossings.

    Returns (sub_a, sub_b).  Both owners of a crossing split at the
    same float vector, so stitch keys match exactly.  Small inputs use
    the dense vectorized triage; above _DENSE_PAIR_LIMIT pairs the
    larger side gets a clipped-edge cell index so discovery cost is
    O(E_small x nearby-leaves) instead of O(E_a x E_b).
    """
    splits_a: List[List[np.ndarray]] = [[] for _ in edges_a]
    splits_b: List[List[np.ndarray]] = [[] for _ in edges_b]
    if edges_a and edges_b:
        cvs_a, dvs_a = _edge_arrays(edges_a)
        cvs_b, dvs_b = _edge_arrays(edges_b)
        n_pairs = len(edges_a) * len(edges_b)
        if (n_pairs > _DENSE_PAIR_LIMIT
                and (poly_a is not None or poly_b is not None)):
            # index the side with more edges; candidates from the other
            if (poly_b is not None and
                    (poly_a is None or len(edges_b) >= len(edges_a))):
                idx = _boundary_edge_index(poly_b)
                cand_i, cand_j = _crossing_pairs_indexed(cvs_a, dvs_a, idx)
            else:
                idx = _boundary_edge_index(poly_a)
                cand_j2, cand_i2 = _crossing_pairs_indexed(cvs_b, dvs_b, idx)
                cand_i, cand_j = cand_i2, cand_j2
            ai, bj = _triage_pairs(cvs_a, dvs_a, cvs_b, dvs_b,
                                   cand_i, cand_j)
        else:
            ai, bj = _crossing_pairs_dense(cvs_a, dvs_a, cvs_b, dvs_b)
        for i, j in zip(ai.tolist(), bj.tolist()):
            x = edge_intersection_robust(edges_a[i][0], edges_a[i][1],
                                         edges_b[j][0], edges_b[j][1])
            splits_a[i].append(x)
            splits_b[j].append(x)
    return (_apply_splits(edges_a, splits_a),
            _apply_splits(edges_b, splits_b))


def _apply_splits(edges, splits):
    out: List[Tuple[Vec, Vec]] = []
    for (u, v), pts in zip(edges, splits):
        if not pts:
            out.append((u, v))
            continue
        ua = np.asarray(u, dtype=np.float64)
        va = np.asarray(v, dtype=np.float64)
        # parameter along the geodesic: angle from u in the (u, w)
        # frame, w = unit tangent toward v (arc length < pi)
        w = va - ua * float(ua @ va)
        w = w / np.linalg.norm(w)
        def theta(x):
            return math.atan2(float(x @ w), float(x @ ua))
        pts = sorted(pts, key=theta)
        chain = [tuple(float(c) for c in ua)]
        for x in pts:
            t = tuple(float(c) for c in x)
            if t != chain[-1]:
                chain.append(t)
        if tuple(float(c) for c in va) != chain[-1]:
            chain.append(tuple(float(c) for c in va))
        for k in range(len(chain) - 1):
            out.append((chain[k], chain[k + 1]))
    return out


def _select(sub_a, sub_b, poly_a, comp_a, poly_b, comp_b, want_inside_a,
            want_inside_b):
    """Keep sub-edges per the op table.

    want_inside_b: keep an A sub-edge iff its midpoint is inside B's
    (possibly complemented) region — True for intersection-like sides,
    False for union-like.  Exactly-shared directed edges keep one copy
    when both sides would keep them; anti-parallel shared edges are
    open-regularized away (dropped from both).
    """
    b_dir = {e: None for e in sub_b}
    a_dir = {e: None for e in sub_a}
    kept: List[Tuple[Vec, Vec]] = []

    def _probe(edges, shared_fwd, shared_rev, region, comp, want, on_shared):
        """Split edges into shared-contact cases (handled by on_shared)
        and the common case, whose midpoints are tested against the
        other region in ONE vectorized containment call."""
        plain: List[Tuple[Vec, Vec]] = []
        for (u, v) in edges:
            if (u, v) in shared_fwd or (v, u) in shared_rev:
                on_shared((u, v), (u, v) in shared_fwd)
                continue
            plain.append((u, v))
        if not plain:
            return
        uv = np.asarray(plain, dtype=np.float64)       # (n, 2, 3)
        mids = uv[:, 0, :] + uv[:, 1, :]
        mids /= np.linalg.norm(mids, axis=1, keepdims=True)
        inside = region.contains_points_batch(mids)
        if comp:
            inside = ~inside
        for e, ok in zip(plain, inside == want):
            if ok:
                kept.append(e)

    def _a_shared(e, forward):
        # same directed edge on both boundaries: the regions lie on the
        # same side; it bounds the result iff both ops keep it, and then
        # exactly once.  Anti-parallel contact (interiors on opposite
        # sides) is degenerate in the open-regularized result: dropped.
        if forward and want_inside_b == want_inside_a:
            kept.append(e)

    def _b_shared(e, forward):
        pass  # both orientations handled on the A side

    _probe(sub_a, b_dir, b_dir, poly_b, comp_b, want_inside_b, _a_shared)
    _probe(sub_b, a_dir, a_dir, poly_a, comp_a, want_inside_a, _b_shared)
    return kept


def _stitch(edges: Sequence[Tuple[Vec, Vec]]) -> List[List[Vec]]:
    """Stitch directed edges into closed chains, taking the leftmost
    (most counterclockwise) turn at vertices with several outgoing
    edges so the interior stays on the left."""
    from collections import defaultdict

    out_edges = defaultdict(list)
    for (u, v) in edges:
        out_edges[u].append(v)

    def tangent(a, b):
        av = np.asarray(a, dtype=np.float64)
        bv = np.asarray(b, dtype=np.float64)
        t = bv - av * float(av @ bv)
        n = np.linalg.norm(t)
        return t / n if n > 0 else t

    loops: List[List[Vec]] = []
    while any(out_edges.values()):
        # prefer a start with a single outgoing edge: the walk closes
        # unconditionally on returning to start, so starting at a pinch
        # vertex (out-degree >= 2) could pair its wedges arbitrarily
        start = next(
            (u for u, vs in out_edges.items() if len(vs) == 1),
            None) or next(u for u, vs in out_edges.items() if vs)
        chain = [start]
        prev = start
        cur = out_edges[start].pop()
        while cur != start:
            chain.append(cur)
            cands = out_edges[cur]
            if not cands:
                raise ValueError("boolean overlay: open boundary chain "
                                 "(degenerate input geometry)")
            if len(cands) == 1:
                nxt = cands.pop()
            else:
                # leftmost turn: maximize CCW angle from the incoming
                # direction, measured in the tangent plane at cur
                t_in = tangent(cur, prev)  # points back along arrival
                cv = np.asarray(cur, dtype=np.float64)
                best_i, best_ang = 0, -math.inf
                for i, w in enumerate(cands):
                    t_out = tangent(cur, w)
                    ang = math.atan2(
                        float(np.cross(t_in, t_out) @ cv),
                        float(t_in @ t_out))
                    # angle measured from the reversed incoming
                    # direction; leftmost turn = smallest CW rotation
                    # from t_in going clockwise = largest CCW value
                    if ang > best_ang:
                        best_ang, best_i = ang, i
                nxt = cands.pop(best_i)
            prev, cur = cur, nxt
        loops.append(chain)
    return loops


def _assemble(chains: List[List[Vec]], truth_at, ref_point) -> Polygon:
    """Build the xor-model polygon: loops as stitched, parity fixed at
    a reference point, each loop normalized to area <= 2*pi with a
    Loop.full() carrying any leftover parity."""
    loops = [Loop(c) for c in chains]
    full_parity = False
    normalized: List[Loop] = []
    for lp in loops:
        if lp.area() > 2 * math.pi:
            normalized.append(lp.invert())
            full_parity = not full_parity
        else:
            normalized.append(lp)
    parity = full_parity
    for lp in normalized:
        if lp.contains_point(ref_point):
            parity = not parity
    if parity != truth_at:
        full_parity = not full_parity
    if full_parity:
        normalized.append(Loop.full())
    if not normalized:
        return Polygon([Loop.full() if truth_at else Loop.empty()])
    return Polygon(normalized)


def _ref_point(poly_a: Polygon, poly_b: Polygon):
    """A deterministic probe point that is (a.e.) on neither boundary."""
    return (0.0053929367254736218, 0.6692157425382523, 0.7430342216247437)


def polygon_boolean(op: str, a: Polygon, b: Polygon) -> Polygon:
    """Boolean combination of two polygons.  op in {"intersection",
    "union", "difference", "symmetric_difference"}."""
    if op == "symmetric_difference":
        return polygon_boolean(
            "union",
            polygon_boolean("difference", a, b),
            polygon_boolean("difference", b, a))
    if op not in _OPS:
        raise ValueError(f"unknown op {op!r}")
    # containment-table per op: (comp_a, comp_b, want_inside_a, want_inside_b,
    # reverse kept edges at the end)
    if op == "intersection":
        comp_a = comp_b = False
        want_a = want_b = True
        reverse = False
    elif op == "union":
        # comp(comp(A) /\ comp(B)): select against complemented regions,
        # walk complemented edges, and un-complement by reversing the
        # kept boundary.
        comp_a = comp_b = True
        want_a = want_b = True
        reverse = True
    else:  # difference = A /\ comp(B)
        comp_a, comp_b = False, True
        want_a, want_b = True, True
        reverse = False

    edges_a = _region_edges(a, comp_a)
    edges_b = _region_edges(b, comp_b)
    ref = _ref_point(a, b)
    in_a = a.contains_point(ref)
    in_b = b.contains_point(ref)
    truth = {
        "intersection": in_a and in_b,
        "union": in_a or in_b,
        "difference": in_a and not in_b,
    }[op]

    if not edges_a and not edges_b:
        return Polygon([Loop.full() if truth else Loop.empty()])

    sub_a, sub_b = _split_edges(edges_a, edges_b, a, b)
    kept = _select(sub_a, sub_b, a, comp_a, b, comp_b, want_a, want_b)
    if reverse:
        kept = [(v, u) for (u, v) in kept]
    if not kept:
        return Polygon([Loop.full() if truth else Loop.empty()])
    chains = _stitch(kept)
    return _assemble(chains, truth, ref)


def polygon_intersection(a: Polygon, b: Polygon) -> Polygon:
    return polygon_boolean("intersection", a, b)


def polygon_union(a: Polygon, b: Polygon) -> Polygon:
    return polygon_boolean("union", a, b)


def polygon_difference(a: Polygon, b: Polygon) -> Polygon:
    return polygon_boolean("difference", a, b)


def polygon_symmetric_difference(a: Polygon, b: Polygon) -> Polygon:
    return polygon_boolean("symmetric_difference", a, b)


def polygon_complement(p: Polygon) -> Polygon:
    return polygon_boolean("difference", Polygon([Loop.full()]), p)

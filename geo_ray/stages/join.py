"""Spatial join: points (cell_id-keyed rows) vs a broadcast polygon set.

Shape (SURVEY.md §7.1 step 5):

  * Driver: per polygon, compute exterior + interior coverings
    (RegionCoverer) and flatten both into ONE CellIndex — interior
    cells carry an "auto accept" flag, boundary cells an "exact refine"
    flag.  ``ray.put`` the whole ``JoinState`` once.
  * Stage A+B fused in an actor pool (``map_batches(PolygonJoiner,
    concurrency=N)``): candidates via one ``searchsorted`` stab per row
    (CellIndex), then exact point-in-polygon refinement per candidate
    polygon using the vectorized crossing-parity kernel — semantics of
    ContainsPointQuery with the default vertex model over the loop's
    own containment rule (s2/contains_point_query.go:53-136,
    s2/loop.go:590-598).

No shuffle: the join is a broadcast semi-join; every task reads the
polygon state from the local object store (zero-copy numpy).  Skew in
the POINT distribution is irrelevant here (per-row work is O(1) in the
common case); skew handling matters for the groupby stages downstream
(tiles), which salt hot keys explicitly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from ..state.cellindex import CellIndex
from ..state.coverer import RegionCoverer
from ..state.loop import Loop
from ..state.polygon import Polygon


INDEX_EDGE_THRESHOLD = 48  # build a cell-local edge index above this
# (mirrors the spirit of the reference's brute-force cutoffs,
#  s2/loop.go:615 / s2/edge_query.go:473-488)


MAX_EDGES_PER_CELL = 10  # s2/shapeindex.go:636


class _PolyEdgeIndex:
    """ShapeIndex-lite with true clipped-edge subdivision: boundary
    covering cells are recursively split while they hold more than
    MAX_EDGES_PER_CELL edges that have not reached their max level
    (updateEdges/makeIndexCell semantics, s2/shapeindex.go:923-1260;
    maxLevelForEdge, s2/shapeindex.go:1529-1538).  Each leaf stores the
    edges whose UV clip against the leaf's padded rect is non-empty —
    exactly the edges a center-to-point segment inside the (convex)
    cell can cross.  Refinement counts crossings from the LEAF CENTER
    over <= ~MAX_EDGES_PER_CELL edges instead of from the global origin
    over all edges, so per-point refine cost stays O(1) as the
    geometry densifies."""

    def __init__(self, poly: Polygon, boundary_cells: List[int]):
        from ..functions import cellid as cid
        from ..functions.edge_clipping import (FACE_CLIP_ERROR_UV_COORD,
                                               INTERSECTS_RECT_ERROR_UV_DIST,
                                               clip_to_padded_face)
        from ..functions.metric import AVG_EDGE
        from ..state.cell import Cell

        pad = 2.0 * (FACE_CLIP_ERROR_UV_COORD + INTERSECTS_RECT_ERROR_UV_DIST)
        starts, ends = [], []
        for l in poly.loops:
            for a, b in l.edges():
                starts.append(a)
                ends.append(b)
        self.cvs = np.asarray(starts, dtype=np.float64).reshape(-1, 3)
        self.dvs = np.asarray(ends, dtype=np.float64).reshape(-1, 3)
        n_edges = len(self.cvs)
        # maxLevelForEdge: first level where avg edge <= edge length
        chord = np.linalg.norm(self.cvs - self.dvs, axis=1)
        max_lvl = np.array([AVG_EDGE.min_level(float(c)) for c in chord],
                           dtype=np.int64)

        face_segs: Dict[int, Tuple] = {}

        def _face_segments(face: int):
            """(edge ids, au, av, bu, bv) arrays of the edges whose
            face clip is non-empty."""
            segs = face_segs.get(face)
            if segs is None:
                ids, au, av, bu, bv = [], [], [], [], []
                for e in range(n_edges):
                    a_uv, b_uv, ok = clip_to_padded_face(
                        tuple(self.cvs[e]), tuple(self.dvs[e]), face, pad)
                    if ok:
                        ids.append(e)
                        au.append(a_uv[0]); av.append(a_uv[1])
                        bu.append(b_uv[0]); bv.append(b_uv[1])
                segs = (np.asarray(ids, dtype=np.int64),
                        np.asarray(au), np.asarray(av),
                        np.asarray(bu), np.asarray(bv))
                face_segs[face] = segs
            return segs

        leaves: List[Tuple[int, np.ndarray, bool]] = []
        cxd_all = np.cross(self.cvs, self.dvs)

        def _parity_flip(a: np.ndarray, b: np.ndarray,
                         eids: np.ndarray) -> bool:
            """Whether segment AB crosses the given edges an odd number
            of times (vectorized triage + robust scalar fallback) — the
            interior-tracker step (s2/shapeindex.go:1184-1205): a
            child's center containment = parent's XOR this flip, valid
            because the segment stays inside the convex parent cell so
            only the parent's clipped edges can cross it."""
            from ..functions.edges import edge_or_vertex_crossing
            from ..functions.predicates import MAX_DETERMINANT_ERROR
            if len(eids) == 0:
                return False
            cvs = self.cvs[eids]
            dvs = self.dvs[eids]
            cxd = cxd_all[eids]
            axb = np.cross(a, b)
            det_c = cxd @ a
            det_d = cxd @ b
            det_a2 = axb @ cvs.T
            det_b2 = axb @ dvs.T
            eps = MAX_DETERMINANT_ERROR
            amb = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
                   (np.abs(det_a2) <= eps) | (np.abs(det_b2) <= eps))
            acb = -np.sign(det_a2)
            clear = ((np.sign(det_b2) == acb) & (-np.sign(det_d) == acb) &
                     (np.sign(det_c) == acb) & ~amb)
            cnt = int(clear.sum())
            ta, tb = tuple(a), tuple(b)
            for e in np.nonzero(amb)[0]:
                if edge_or_vertex_crossing(ta, tb, tuple(cvs[e]),
                                           tuple(dvs[e])):
                    cnt += 1
            return (cnt & 1) == 1

        def _seg_rect_mask(segs, subset: np.ndarray, rect) -> np.ndarray:
            """Exact vectorized segment-vs-rect intersection (SAT over
            x, y and the segment normal — same decision clip_edge
            makes, without per-edge Python)."""
            _, au, av, bu, bv = segs
            au = au[subset]; av = av[subset]
            bu = bu[subset]; bv = bv[subset]
            u_lo, u_hi, v_lo, v_hi = rect
            bb = ((np.minimum(au, bu) <= u_hi) & (np.maximum(au, bu) >= u_lo)
                  & (np.minimum(av, bv) <= v_hi)
                  & (np.maximum(av, bv) >= v_lo))
            du = bu - au
            dv = bv - av
            s1 = du * (v_lo - av) - dv * (u_lo - au)
            s2 = du * (v_lo - av) - dv * (u_hi - au)
            s3 = du * (v_hi - av) - dv * (u_lo - au)
            s4 = du * (v_hi - av) - dv * (u_hi - au)
            all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
            all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
            return bb & ~(all_pos | all_neg)

        def _subdivide(ci: int, subset: np.ndarray, segs,
                       inside: bool) -> None:
            cell = Cell(ci)
            rect = (cell.u_lo - pad, cell.u_hi + pad,
                    cell.v_lo - pad, cell.v_hi + pad)
            present = subset[_seg_rect_mask(segs, subset, rect)]
            eids = segs[0][present]
            count = int((cell.level < max_lvl[eids]).sum())
            if count <= MAX_EDGES_PER_CELL or cell.level >= 30:
                leaves.append((ci, eids, inside))
                return
            center = np.array(cid.cell_id_to_point(ci), dtype=np.float64)
            for child in cid.children(ci):
                ccenter = np.array(cid.cell_id_to_point(child),
                                   dtype=np.float64)
                cinside = inside ^ _parity_flip(center, ccenter, eids)
                _subdivide(child, present, segs, cinside)

        roots = sorted(boundary_cells)
        if roots:
            root_ids = np.array(roots, dtype=np.uint64)
            rx, ry, rz = cid.cell_id_to_point_v(root_ids)
            root_centers = np.stack([rx, ry, rz], axis=1)
            root_inside = poly.contains_points_batch(root_centers)
        for k, ci in enumerate(roots):
            face = int(ci >> 61)
            segs = _face_segments(face)
            all_ids = np.arange(len(segs[0]), dtype=np.int64)
            _subdivide(ci, all_ids, segs, bool(root_inside[k]))

        self.rmin = np.array([cid.range_min(ci) for ci, _, _ in leaves],
                             dtype=np.uint64)
        offsets = [0]
        edge_ids: List[int] = []
        for _, eids, _ in leaves:
            edge_ids.extend(eids)
            offsets.append(len(edge_ids))
        leaf_ids = np.array([ci for ci, _, _ in leaves], dtype=np.uint64)
        self.leaf_ids = leaf_ids          # sorted (disjoint subdivision)
        cx, cy, cz = cid.cell_id_to_point_v(leaf_ids)
        self.centers = np.stack([cx, cy, cz], axis=1)
        # conservative bounding-cap radius per leaf: half the max cell
        # diagonal at the leaf's level (used by crossings_indexed)
        from ..functions.latlng import angle_to_chord2
        from ..functions.metric import MAX_DIAG
        self.cap_radius_chord2 = np.array(
            [float(angle_to_chord2(MAX_DIAG.value(cid.level(int(ci))) / 2.0))
             for ci in leaf_ids], dtype=np.float64)
        self.center_inside = np.array([ins for _, _, ins in leaves],
                                      dtype=bool)
        self.offsets = np.asarray(offsets, dtype=np.int64)
        self.edge_ids = np.asarray(edge_ids, dtype=np.int64)
        self.poly = poly

    def refine(self, leaf_ids: np.ndarray, pts: np.ndarray) -> np.ndarray:
        """Exact containment for candidate points known to lie in this
        polygon's boundary cells."""
        from ..functions.predicates import MAX_DETERMINANT_ERROR

        cell_idx = np.searchsorted(self.rmin, leaf_ids, side="right") - 1
        out = np.zeros(len(pts), dtype=bool)
        for cidx in np.unique(cell_idx):
            sel = np.nonzero(cell_idx == cidx)[0]
            lo, hi = self.offsets[cidx], self.offsets[cidx + 1]
            eids = self.edge_ids[lo:hi]
            base = bool(self.center_inside[cidx])
            if len(eids) == 0:
                out[sel] = base
                continue
            origin = self.centers[cidx]
            cvs = self.cvs[eids]
            dvs = self.dvs[eids]
            p = pts[sel]
            oxp = np.cross(origin[None, :], p)
            det_c = oxp @ cvs.T
            det_d = oxp @ dvs.T
            cxd = np.cross(cvs, dvs)
            det_b = p @ cxd.T
            det_a = cxd @ origin
            eps = MAX_DETERMINANT_ERROR
            ambiguous = ((np.abs(det_c) <= eps) | (np.abs(det_d) <= eps) |
                         (np.abs(det_b) <= eps) |
                         (np.abs(det_a) <= eps)[None, :]).any(axis=1)
            acb = -np.sign(det_c)
            crossing = ((np.sign(det_d) == acb) & (-np.sign(det_b) == acb) &
                        (np.sign(det_a)[None, :] == acb))
            parity = (crossing.sum(axis=1) & 1) == 1
            res = parity != base
            if ambiguous.any():
                for j in np.nonzero(ambiguous)[0]:
                    res[j] = self.poly.contains_point(tuple(p[j]))
            out[sel] = res
        return out


class JoinState:
    """Broadcastable build side: coverings + polygon vertex arrays."""

    def __init__(self, polygons: Sequence[Tuple[str, Polygon]],
                 max_cells: int = 64, max_level: int = 18):
        self.names: List[str] = [name for name, _ in polygons]
        self.polygons: List[Polygon] = [p for _, p in polygons]
        entries: List[Tuple[int, int]] = []
        # Two labels per polygon k: 2k = interior (auto-accept),
        # 2k+1 = boundary (needs exact refinement).
        rc = RegionCoverer(max_cells=max_cells, max_level=max_level)
        self.coverings: List[List[int]] = []
        self.interiors: List[List[int]] = []
        self.edge_indexes: List[Optional[_PolyEdgeIndex]] = []
        from ..state import cellunion as cu
        for k, poly in enumerate(self.polygons):
            cover = rc.cell_union(poly)
            interior = cu.normalize(rc.interior_covering(poly))
            # boundary = covering minus interior (cells needing refine)
            boundary = cu.from_difference(cover, interior)
            self.coverings.append(cover)
            self.interiors.append(interior)
            for ci in interior:
                entries.append((ci, 2 * k))
            for ci in boundary:
                entries.append((ci, 2 * k + 1))
            if poly.num_edges() >= INDEX_EDGE_THRESHOLD and boundary:
                self.edge_indexes.append(_PolyEdgeIndex(poly, boundary))
            else:
                self.edge_indexes.append(None)
        self.index = CellIndex(entries)


def polygon_join(batch: pa.Table, state, id_col: str = "image_id",
                 keep_cols: Optional[List[str]] = None) -> pa.Table:
    """Stateless task form: ``state`` may be a JoinState or an
    ObjectRef (``ray.get`` of a local object is a zero-copy pointer
    lookup after the first fetch, so per-task resolution is free and
    the stage stays elastic — no actor pool to size or starve)."""
    import ray
    if isinstance(state, ray.ObjectRef):
        state = ray.get(state)
    joiner = PolygonJoiner.__new__(PolygonJoiner)
    joiner.state = state
    joiner.id_col = id_col
    joiner.keep_cols = keep_cols or [id_col, "cell_id"]
    return joiner(batch)


def join_state_from_covering_rows(polygons: Sequence[Tuple[str, Polygon]],
                                  covering_rows) -> "JoinState":
    """Assemble a JoinState from a distributed covering table (the
    output of stages/cover.py): (polygon_id, cell_id, is_interior)
    rows.  The polygon geometry still rides along for refinement; only
    the covering computation was fanned out."""
    name_to_idx = {name: k for k, (name, _) in enumerate(polygons)}
    state = JoinState.__new__(JoinState)
    state.names = [name for name, _ in polygons]
    state.polygons = [p for _, p in polygons]
    state.coverings = [[] for _ in polygons]
    state.interiors = [[] for _ in polygons]
    boundaries: List[List[int]] = [[] for _ in polygons]
    entries: List[Tuple[int, int]] = []
    for row in covering_rows:
        k = name_to_idx[row["polygon_id"]]
        ci = int(row["cell_id"])
        if row["is_interior"]:
            state.interiors[k].append(ci)
            entries.append((ci, 2 * k))
        else:
            boundaries[k].append(ci)
            entries.append((ci, 2 * k + 1))
        state.coverings[k].append(ci)
    state.edge_indexes = []
    for k, (_, poly) in enumerate(polygons):
        if poly.num_edges() >= INDEX_EDGE_THRESHOLD and boundaries[k]:
            state.edge_indexes.append(_PolyEdgeIndex(poly, boundaries[k]))
        else:
            state.edge_indexes.append(None)
    state.index = CellIndex(entries)
    return state


class PolygonJoiner:
    """Actor-pool stage: emits (point columns..., polygon_id) matches.

    Construct with either a JoinState or a ``ray.ObjectRef`` to one
    (resolved once per actor in ``__init__``, never per batch).  Size
    ``concurrency`` strictly below the cluster CPU count, or use the
    stateless :func:`polygon_join` (preferred on shared clusters).
    """

    def __init__(self, state, id_col: str = "image_id",
                 keep_cols: Optional[List[str]] = None):
        import ray
        if isinstance(state, ray.ObjectRef):
            state = ray.get(state)
        self.state: JoinState = state
        self.id_col = id_col
        self.keep_cols = keep_cols or [id_col, "cell_id"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self.state
        leaf = batch.column("cell_id").to_numpy()
        rows, labels = st.index.lookup_batch(leaf)
        out_rows: List[np.ndarray] = []
        out_polys: List[np.ndarray] = []
        if len(rows):
            poly_idx = labels >> 1
            is_boundary = (labels & 1) == 1
            # interior candidates: accepted as-is
            acc = ~is_boundary
            out_rows.append(rows[acc])
            out_polys.append(poly_idx[acc])
            # boundary candidates: exact refinement per polygon
            brows = rows[is_boundary]
            bpoly = poly_idx[is_boundary]
            if len(brows):
                x = batch.column("x").to_numpy()
                y = batch.column("y").to_numpy()
                z = batch.column("z").to_numpy()
                order = np.argsort(bpoly, kind="stable")
                brows = brows[order]
                bpoly = bpoly[order]
                bounds = np.searchsorted(bpoly, np.arange(len(st.polygons) + 1))
                leaf_np = batch.column("cell_id").to_numpy()
                for k in range(len(st.polygons)):
                    lo, hi = bounds[k], bounds[k + 1]
                    if lo == hi:
                        continue
                    rr = brows[lo:hi]
                    pts = np.stack([x[rr], y[rr], z[rr]], axis=1)
                    eidx = st.edge_indexes[k]
                    if eidx is not None:
                        inside = eidx.refine(leaf_np[rr], pts)
                    else:
                        inside = st.polygons[k].contains_points_batch(pts)
                    out_rows.append(rr[inside])
                    out_polys.append(np.full(int(inside.sum()), k,
                                             dtype=np.int64))
        if out_rows:
            rows_all = np.concatenate(out_rows)
            polys_all = np.concatenate(out_polys).astype(np.int64)
        else:
            rows_all = np.array([], dtype=np.int64)
            polys_all = np.array([], dtype=np.int64)
        order = np.lexsort((polys_all, rows_all))  # deterministic (row, poly)
        rows_all = rows_all[order]
        polys_all = polys_all[order]
        cols: Dict[str, pa.Array] = {}
        for name in self.keep_cols:
            cols[name] = batch.column(name).take(pa.array(rows_all))
        names = np.array(st.names, dtype=object)
        cols["polygon_id"] = pa.array(names[polys_all], pa.string())
        return pa.table(cols)


def region_filter(region, batch: pa.Table) -> pa.Table:
    """Stateless filter of points by a Cap/Rect region (vectorized)."""
    from ..state.cap import Cap
    from ..state.rect import Rect
    if isinstance(region, Cap):
        mask = region.contains_points_v(batch.column("x").to_numpy(),
                                        batch.column("y").to_numpy(),
                                        batch.column("z").to_numpy())
    elif isinstance(region, Rect):
        mask = region.contains_latlng_v(batch.column("lat").to_numpy(),
                                        batch.column("lng").to_numpy())
    else:
        raise TypeError(type(region))
    return batch.filter(pa.array(mask))

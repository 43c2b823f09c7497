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


class _PolyEdgeIndex:
    """ShapeIndex-lite: per boundary-covering-cell clipped edge lists +
    a contains-center bit (semantics of clippedShape/ShapeIndexCell,
    s2/shapeindex.go:73-155, built eagerly, conservative selection: an
    edge is kept for a cell iff it comes within the cell's bounding-cap
    radius of the cap center — a superset of the edges any
    center-to-point segment inside the cell can cross, since caps are
    geodesically convex).  Refinement then counts crossings from the
    CELL CENTER over O(edges-per-cell) edges instead of from the global
    origin over all edges."""

    def __init__(self, poly: Polygon, boundary_cells: List[int]):
        from ..functions import cellid as cid
        from ..functions.distance import chord2_point_edge
        from ..functions.latlng import angle_to_chord2, chord2_to_angle
        from ..state.cell import Cell

        starts, ends = [], []
        for l in poly.loops:
            for a, b in l.edges():
                starts.append(a)
                ends.append(b)
        self.cvs = np.asarray(starts, dtype=np.float64).reshape(-1, 3)
        self.dvs = np.asarray(ends, dtype=np.float64).reshape(-1, 3)
        cells = sorted(boundary_cells)
        self.rmin = np.array([cid.range_min(c) for c in cells],
                             dtype=np.uint64)
        centers = []
        inside = []
        radii = []
        offsets = [0]
        edge_ids: List[int] = []
        for ci in cells:
            cell = Cell(ci)
            cap = cell.cap_bound()
            center = np.asarray(cap.center)
            radius = float(chord2_to_angle(cap.radius_chord2))
            radii.append(cap.radius_chord2)
            limit = float(angle_to_chord2(min(np.pi, radius + 1e-9)))
            d = chord2_point_edge(center[None, :].repeat(len(self.cvs), 0),
                                  self.cvs, self.dvs)
            sel = np.nonzero(d <= limit)[0]
            edge_ids.extend(int(e) for e in sel)
            offsets.append(len(edge_ids))
            centers.append(center)
            inside.append(poly.contains_point(tuple(center)))
        self.centers = np.asarray(centers, dtype=np.float64).reshape(-1, 3)
        self.cap_radius_chord2 = np.asarray(radii, dtype=np.float64)
        self.center_inside = np.asarray(inside, dtype=bool)
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

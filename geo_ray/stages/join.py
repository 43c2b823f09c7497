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
                for k in range(len(st.polygons)):
                    lo, hi = bounds[k], bounds[k + 1]
                    if lo == hi:
                        continue
                    rr = brows[lo:hi]
                    pts = np.stack([x[rr], y[rr], z[rr]], axis=1)
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

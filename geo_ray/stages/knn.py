"""kNN over geotagged points: brute-force-per-batch partials + a tiny
top-k merge shuffle.

Semantics of the reference closest-edge query with ``MaxResults(k)``
over point targets (s2/edge_query.go:177-795): results ordered by
(ChordAngle distance, id), ties exactly as EdgeQueryResult.Less
(s2/edge_query.go:149-157).  The distributed shape: every batch scores
its rows against the broadcast probe matrix with one matmul (chord2 =
2 - 2*X.Q for unit vectors), keeps the k best rows per probe
(np.argpartition), and only those P*k partial rows shuffle into the
per-probe merge — an exact algorithm whose shuffle volume is
O(P * k * num_batches), independent of input size.

The cell-ring expansion variant (AllNeighbors seeding,
s2/cellid.go:274-321) is a planned optimization for very large probe
sets; for probe sets that fit in a broadcast matrix the matmul form is
faster per row and exact.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


class KnnPartial:
    """Actor-pool stage: per-batch top-k toward each broadcast probe.

    ``distance_limit`` and ``region`` mirror the reference EdgeQuery
    options (s2/query_options.go:35-103): with ``distance_limit`` set
    (a squared chord), only candidates strictly within it can appear
    in results (DistanceLimit is exclusive, edge_query.go:82-88); with
    ``region`` set, only candidate points the region contains compete
    (the Region option's point-shape specialization)."""

    def __init__(self, probes, k: int, id_col: str = "image_id",
                 distance_limit: float | None = None, region=None):
        """probes: (probe_id list, (P,3) xyz matrix) or ObjectRef."""
        import ray
        if isinstance(probes, ray.ObjectRef):
            probes = ray.get(probes)
        self.probe_ids, self.Q = probes
        self.Q = np.asarray(self.Q, dtype=np.float64)
        self.k = k
        self.id_col = id_col
        self.distance_limit = distance_limit
        self.region = region
        self._probe_arr = pa.array(list(self.probe_ids))

    def _empty(self, id_type) -> pa.Table:
        return pa.table({"probe_id": pa.array([], self._probe_arr.type),
                         "neighbor_id": pa.array([], id_type),
                         "chord2": pa.array([], pa.float64())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(self.id_col).type
        ids = batch.column(self.id_col)
        if len(batch) == 0:
            return self._empty(id_type)
        X = np.stack([batch.column("x").to_numpy(),
                      batch.column("y").to_numpy(),
                      batch.column("z").to_numpy()], axis=1)
        if self.region is not None:
            inside = region_contains_points(self.region, X)
            if not inside.any():
                return self._empty(id_type)
            sel = np.nonzero(inside)[0]
            X = X[sel]
            ids = ids.take(pa.array(sel, pa.int64()))
        chord2 = np.clip(2.0 - 2.0 * (X @ self.Q.T), 0.0, 4.0)  # (n, P)
        rows, probes = tie_complete_smallest(chord2, self.k)
        # Reference-exact distances for the survivors: the DIFFERENCE
        # form |x-y|^2 (ChordAngleBetweenPoints, s1/chordangle.go:107)
        # rather than the matmul's 2-2*dot, so DistanceLimit
        # open/closed boundaries (incl. Successor-based inclusive
        # limits) and the emitted chord2 are bit-identical to the
        # reference and the difference-form SQL oracles.  The matmul
        # stays as the O(n*P) ranking pass; this recompute touches
        # only the candidate-sized survivor set.
        d = X[rows] - self.Q[probes]
        d2 = np.minimum(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
                        + d[:, 2] * d[:, 2], 4.0)
        if self.distance_limit is not None:
            ok = d2 < self.distance_limit
            rows, probes, d2 = rows[ok], probes[ok], d2[ok]
        return pa.table({
            "probe_id": self._probe_arr.take(pa.array(probes, pa.int64())),
            "neighbor_id": ids.take(pa.array(rows, pa.int64())),
            "chord2": pa.array(d2, pa.float64()),
        })


def region_contains_points(region, X: np.ndarray) -> np.ndarray:
    """Vectorized point containment over whichever Region type is
    given (Cap / Rect / Loop / Polygon) — the dispatch EdgeQuery's
    Region option needs inside a batch kernel."""
    if hasattr(region, "contains_points_v"):          # Cap
        return np.asarray(region.contains_points_v(
            X[:, 0], X[:, 1], X[:, 2]), bool)
    if hasattr(region, "contains_points_batch"):      # Loop / Polygon
        return np.asarray(region.contains_points_batch(X), bool)
    if hasattr(region, "contains_latlng_v"):          # Rect (degrees)
        from ..functions.latlng import xyz_to_latlng_deg
        lat, lng = xyz_to_latlng_deg(X[:, 0], X[:, 1], X[:, 2])
        return np.asarray(region.contains_latlng_v(lat, lng), bool)
    raise TypeError(f"unsupported region type {type(region)!r}")


def tie_complete_smallest(scores: np.ndarray, k: int,
                          largest: bool = False) -> Tuple[np.ndarray,
                                                          np.ndarray]:
    """(row, col) indices of every entry within the per-column k-th
    smallest (largest) score, INCLUDING all ties at the k-th value.

    Keeping the full tie set (rather than argpartition's arbitrary k)
    means the downstream per-probe merge — which sorts by (distance,
    neighbor_id) — always sees the id-lexicographic winner of a
    distance tie, matching EdgeQueryResult.Less exactly."""
    n = scores.shape[0]
    kk = min(k, n)
    if kk >= n:
        mask = np.ones(scores.shape, dtype=bool)
    elif largest:
        kth = np.partition(scores, n - kk, axis=0)[n - kk]
        mask = scores >= kth[None, :]
    else:
        kth = np.partition(scores, kk - 1, axis=0)[kk - 1]
        mask = scores <= kth[None, :]
    return np.nonzero(mask)


def furthest(points_ds, probes: Tuple[Sequence, np.ndarray], k: int,
             *, id_col: str = "image_id"):
    """Furthest-point query: same partial/merge machinery as :func:`knn`
    with maxDistance ordering (s2/edge_query.go:276-288 /
    s2/max_distance_targets.go)."""
    import ray
    probes_ref = ray.put(probes)

    def _partial(batch: pa.Table) -> pa.Table:
        kp = KnnPartial(probes_ref, k, id_col)
        # reuse the scorer but keep the k LARGEST per probe
        if len(batch) == 0:
            return kp(batch)
        X = np.stack([batch.column("x").to_numpy(),
                      batch.column("y").to_numpy(),
                      batch.column("z").to_numpy()], axis=1)
        chord2 = np.clip(2.0 - 2.0 * (X @ kp.Q.T), 0.0, 4.0)
        rows, probes = tie_complete_smallest(chord2, k, largest=True)
        d = X[rows] - kp.Q[probes]     # reference-exact difference form
        d2 = np.minimum(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1]
                        + d[:, 2] * d[:, 2], 4.0)
        return pa.table({
            "probe_id": kp._probe_arr.take(pa.array(probes, pa.int64())),
            "neighbor_id": batch.column(id_col)
                                .take(pa.array(rows, pa.int64())),
            "chord2": pa.array(d2, pa.float64())})

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["chord2", "neighbor_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("probe_id").map_groups(_final,
                                                   batch_format="pandas")


def finalize_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-probe merge: exact (distance, id) order, rank 1..k.

    Tie rule of EdgeQueryResult.Less (s2/edge_query.go:149-157).
    """
    g = group.sort_values(["chord2", "neighbor_id"], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


class CellRingKnnPartial:
    """Scale-path kNN: candidate generation by cell-ring membership.

    Semantics equal to the reference best-first EdgeQuery with
    MaxResults(k) (s2/edge_query.go:414-489) realized distributively:
    each probe's candidate region is its level-L cell plus the 8
    surrounding cells (AllNeighbors ring, s2/cellid.go:274-321); points
    outside every probe's ring are never scored.  Correctness guard: a
    probe's result is provably exact iff its k-th distance is at most
    one cell min-width (any point outside the 3x3 block is at least
    MIN_WIDTH(L) away); probes failing the guard are re-run brute-force
    by the caller.  Choose L so the expected 3x3-block population well
    exceeds k.
    """

    def __init__(self, probes, k: int, level: int, id_col: str = "image_id"):
        import ray
        from ..functions import cellid as cid
        from ..state.cellindex import CellIndex

        if isinstance(probes, ray.ObjectRef):
            probes = ray.get(probes)
        self.probe_ids, self.Q = probes
        self.Q = np.asarray(self.Q, dtype=np.float64)
        self.k = k
        self.level = level
        self.id_col = id_col
        leafs = cid.cell_id_from_point_v(self.Q[:, 0], self.Q[:, 1],
                                         self.Q[:, 2])
        centers = cid.parent_v(leafs, level)
        rings = cid.all_neighbors_same_level_v(centers)
        entries = []
        for p in range(len(self.probe_ids)):
            entries.append((int(centers[p]), p))
            for nb in rings[p]:
                entries.append((int(nb), p))
        self.index = CellIndex(sorted(set(entries)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        leaf = batch.column("cell_id").to_numpy()
        rows, probes = self.index.lookup_batch(leaf)
        id_type = batch.schema.field(self.id_col).type
        if len(rows) == 0:
            probe_type = pa.string() if isinstance(self.probe_ids[0], str) \
                else pa.int64()
            return pa.table({"probe_id": pa.array([], probe_type),
                             "neighbor_id": pa.array([], id_type),
                             "chord2": pa.array([], pa.float64())})
        x = batch.column("x").to_numpy()[rows]
        y = batch.column("y").to_numpy()[rows]
        z = batch.column("z").to_numpy()[rows]
        q = self.Q[probes]
        chord2 = np.clip((x - q[:, 0]) ** 2 + (y - q[:, 1]) ** 2 +
                         (z - q[:, 2]) ** 2, 0.0, 4.0)
        ids = batch.column(self.id_col).take(pa.array(rows))
        pid = np.array(self.probe_ids, dtype=object)[probes]
        return pa.table({"probe_id": pa.array(pid.tolist()),
                         "neighbor_id": ids,
                         "chord2": pa.array(chord2, pa.float64())})


def knn_cell_ring(points_ds, probes: Tuple[Sequence, np.ndarray], k: int,
                  level: int, *, id_col: str = "image_id"):
    """Ring-candidate kNN with brute-force fallback for probes whose
    exactness guard fails.  Returns the same schema as :func:`knn`."""
    import pandas as pd
    import ray
    from ..functions.latlng import angle_to_chord2
    from ..functions.metric import MIN_WIDTH

    probes_ref = ray.put(probes)

    def _partial(batch: pa.Table) -> pa.Table:
        return CellRingKnnPartial(probes_ref, k, level, id_col)(batch)

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)
    merged = partials.groupby("probe_id").map_groups(
        lambda g: finalize_topk(g, k), batch_format="pandas").to_pandas()
    guard = float(angle_to_chord2(MIN_WIDTH.value(level)))
    probe_ids, Q = probes
    stats = merged.groupby("probe_id")["chord2"].agg(n="size", kth="max")
    probe_index = pd.Index(probe_ids)
    n_found = stats["n"].reindex(probe_index).fillna(0).to_numpy()
    kth = stats["kth"].reindex(probe_index).fillna(np.inf).to_numpy()
    ok = (n_found >= k) & (kth <= guard)
    bad_probes = list(np.nonzero(~ok)[0])
    frames = [merged[merged["probe_id"].isin(set(probe_index[ok]))]]
    if bad_probes:
        fb = knn(points_ds,
                 ([probe_ids[i] for i in bad_probes],
                  np.asarray(Q, dtype=np.float64)[bad_probes]),
                 k, id_col=id_col).to_pandas()
        frames.append(fb)
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["probe_id", "rank"]).reset_index(drop=True)


class ShapeTarget:
    """Broadcastable kNN target made of edges (polyline / loop /
    polygon boundary) plus an optional interior (distance 0 inside) —
    the ShapeIndexTarget semantics of s2/min_distance_targets.go:254-359
    realized as a vectorized per-batch scorer.

    Scoring uses the closed-form per-edge chord2: if the point's
    projection lies in the edge's lune, 2-2*sqrt(1-sin(d)^2) from the
    edge-plane angle, else the nearer endpoint chord2 — algebraically
    identical to updateMinDistance (s2/edge_distances.go:224-270) and
    written in the exact operation order of the SQL oracle so both
    engines produce bit-identical doubles from bit-identical xyz."""

    def __init__(self, shape_id, geometry):
        from ..state.loop import Loop
        from ..state.polygon import Polygon
        from ..state.polyline import Polyline

        self.shape_id = shape_id
        if isinstance(geometry, Polyline):
            edges = list(zip(geometry.vertices, geometry.vertices[1:]))
            self.polygon = None
        elif isinstance(geometry, (Loop, Polygon)):
            poly = geometry if isinstance(geometry, Polygon) \
                else Polygon.from_loop(geometry)
            edges = []
            for l in poly.loops:
                edges.extend(l.edges())
            self.polygon = poly
        else:
            raise TypeError(type(geometry))
        A = np.asarray([e[0] for e in edges], dtype=np.float64)
        B = np.asarray([e[1] for e in edges], dtype=np.float64)
        acb = np.cross(A, B)
        self.n_hat = acb / np.linalg.norm(acb, axis=1, keepdims=True)
        self.u = np.cross(acb, A)   # x.u > 0: past A toward B
        self.v = np.cross(B, acb)   # x.v > 0: before B
        self.A = A
        self.B = B

    @staticmethod
    def _dot(pts: np.ndarray, c) -> np.ndarray:
        # explicit left-associated component sum — bit-identical to the
        # SQL oracle's `c0*x + c1*y + c2*z` (BLAS matvec may reorder)
        return pts[:, 0] * c[0] + pts[:, 1] * c[1] + pts[:, 2] * c[2]

    def chord2(self, pts: np.ndarray) -> np.ndarray:
        """(n,) min squared-chord distance from each point."""
        best = np.full(len(pts), 4.0)
        for e in range(len(self.A)):
            t1 = self._dot(pts, self.u[e])
            t2 = self._dot(pts, self.v[e])
            s = self._dot(pts, self.n_hat[e])
            in_lune = (t1 > 0) & (t2 > 0)
            plane = 2.0 - 2.0 * np.sqrt(np.maximum(0.0, 1.0 - s * s))
            da = ((pts[:, 0] - self.A[e, 0]) ** 2 +
                  (pts[:, 1] - self.A[e, 1]) ** 2 +
                  (pts[:, 2] - self.A[e, 2]) ** 2)
            db = ((pts[:, 0] - self.B[e, 0]) ** 2 +
                  (pts[:, 1] - self.B[e, 1]) ** 2 +
                  (pts[:, 2] - self.B[e, 2]) ** 2)
            d = np.where(in_lune, plane, np.minimum(da, db))
            best = np.minimum(best, d)
        if self.polygon is not None:
            best[self.polygon.contains_points_batch(pts)] = 0.0
        return best

    def max_chord2(self, pts: np.ndarray) -> np.ndarray:
        """(n,) MAX squared-chord distance to the shape — max over
        boundary edges (s2/edge_distances.go:284-330 semantics), 4.0
        when the antipodal reflection falls in the interior
        (s2/max_distance_targets.go ShapeIndexTarget)."""
        from ..functions.distance import max_chord2_point_edge

        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
        best = np.zeros(len(pts))
        for e in range(len(self.A)):
            best = np.maximum(best, max_chord2_point_edge(
                pts, self.A[e], self.B[e]))
        if self.polygon is not None:
            best[self.polygon.contains_points_batch(-pts)] = 4.0
        return best


class CellUnionTarget:
    """Distance target for a CellUnion: min squared-chord distance =
    min over member cells (0 inside any member) — the
    MinDistanceToCellUnionTarget semantics the Go reference stubs out
    (s2/min_distance_targets.go:208-249, commented TODO) realized
    vectorized.  Per cell: the exact operation order of
    Cell.distance_chord2 (state/cell.py) — uv-rect containment then
    min over the 4 edges via chord2_point_edge — so scalar and batch
    paths are bit-identical.  ``max_chord2`` is the furthest twin
    (s2/max_distance_targets.go CellUnionTarget TODO): max over
    member cells of Cell.max_distance_chord2."""

    def __init__(self, shape_id, cells):
        from ..state.cell import Cell

        self.shape_id = shape_id
        self.cells = [Cell(int(np.uint64(c))) for c in cells]
        self._verts = [[np.asarray(v, np.float64) for v in c.vertices()]
                       for c in self.cells]

    def chord2(self, pts: np.ndarray) -> np.ndarray:
        from ..functions.distance import chord2_point_edge

        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
        best = np.full(len(pts), 4.0)
        for cell, verts in zip(self.cells, self._verts):
            d = np.full(len(pts), 4.0)
            for kk in range(4):
                d = np.minimum(d, chord2_point_edge(
                    pts, verts[kk], verts[(kk + 1) & 3]))
            d[cell.contains_points_mask(pts)] = 0.0
            best = np.minimum(best, d)
        return best

    def max_chord2(self, pts: np.ndarray) -> np.ndarray:
        from ..functions.distance import max_chord2_point_edge

        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 3)
        best = np.zeros(len(pts))
        for cell, verts in zip(self.cells, self._verts):
            d = np.zeros(len(pts))
            for kk in range(4):
                d = np.maximum(d, max_chord2_point_edge(
                    pts, verts[kk], verts[(kk + 1) & 3]))
            d[cell.contains_points_mask(-pts)] = 4.0
            best = np.maximum(best, d)
        return best


class CollectionTarget:
    """Distance target over a COLLECTION of shapes / cell unions —
    "nearest of this set of polygons" — the
    MinDistanceToShapeIndexTarget semantics
    (s2/min_distance_targets.go:254-359: min over every shape in the
    index, interiors included) for broadcastable member lists.
    ``max_chord2`` is the furthest twin (s2/max_distance_targets.go
    ShapeIndexTarget): max over members."""

    def __init__(self, shape_id, members):
        self.shape_id = shape_id
        self.members = list(members)
        if not self.members:
            raise ValueError("CollectionTarget needs >= 1 member")

    def chord2(self, pts: np.ndarray) -> np.ndarray:
        best = np.full(len(np.atleast_2d(pts)), 4.0)
        for m in self.members:
            best = np.minimum(best, m.chord2(pts))
        return best

    def max_chord2(self, pts: np.ndarray) -> np.ndarray:
        best = np.zeros(len(np.atleast_2d(pts)))
        for m in self.members:
            best = np.maximum(best, m.max_chord2(pts))
        return best


def knn_to_shapes(points_ds, targets, k: int, *,
                  id_col: str = "image_id"):
    """k nearest dataset points to each broadcast geometry target:
    per-batch tie-complete partial top-k over the per-target chord2
    scorer, then the same tiny per-target merge as :func:`knn`."""
    import ray
    tref = ray.put(list(targets))

    def _partial(batch: pa.Table) -> pa.Table:
        tgts = ray.get(tref)
        probe_arr = pa.array([t.shape_id for t in tgts])
        id_type = batch.schema.field(id_col).type
        if len(batch) == 0:
            return pa.table({"probe_id": pa.array([], probe_arr.type),
                             "neighbor_id": pa.array([], id_type),
                             "chord2": pa.array([], pa.float64())})
        pts = np.stack([batch.column("x").to_numpy(),
                        batch.column("y").to_numpy(),
                        batch.column("z").to_numpy()], axis=1)
        scores = np.stack([t.chord2(pts) for t in tgts], axis=1)  # (n, T)
        rows, probes = tie_complete_smallest(scores, k)
        return pa.table({
            "probe_id": probe_arr.take(pa.array(probes, pa.int64())),
            "neighbor_id": batch.column(id_col)
                                .take(pa.array(rows, pa.int64())),
            "chord2": pa.array(scores[rows, probes], pa.float64())})

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)
    return partials.groupby("probe_id").map_groups(
        lambda g: finalize_topk(g, k), batch_format="pandas")


def furthest_to_shapes(points_ds, targets, k: int, *,
                       id_col: str = "image_id"):
    """k FURTHEST dataset points from each broadcast geometry /
    cell-union / collection target (targets expose ``max_chord2``) —
    the FurthestEdgeQuery over collection targets
    (s2/edge_query.go:276-288 + s2/max_distance_targets.go).  Same
    mergeable partial shape as :func:`knn_to_shapes`; order
    (chord2 DESC, id ASC)."""
    import ray
    tref = ray.put(list(targets))

    def _partial(batch: pa.Table) -> pa.Table:
        tgts = ray.get(tref)
        probe_arr = pa.array([t.shape_id for t in tgts])
        id_type = batch.schema.field(id_col).type
        if len(batch) == 0:
            return pa.table({"probe_id": pa.array([], probe_arr.type),
                             "neighbor_id": pa.array([], id_type),
                             "chord2": pa.array([], pa.float64())})
        pts = np.stack([batch.column("x").to_numpy(),
                        batch.column("y").to_numpy(),
                        batch.column("z").to_numpy()], axis=1)
        scores = np.stack([t.max_chord2(pts) for t in tgts], axis=1)
        rows, probes = tie_complete_smallest(scores, k, largest=True)
        return pa.table({
            "probe_id": probe_arr.take(pa.array(probes, pa.int64())),
            "neighbor_id": batch.column(id_col)
                                .take(pa.array(rows, pa.int64())),
            "chord2": pa.array(scores[rows, probes], pa.float64())})

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["chord2", "neighbor_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("probe_id").map_groups(
        _final, batch_format="pandas")


def knn(points_ds, probes: Tuple[Sequence[str], np.ndarray], k: int,
        *, id_col: str = "image_id", concurrency=None,
        distance_limit: float | None = None, region=None):
    """points_ds must carry x/y/z and id_col columns.

    ``distance_limit`` (squared chord, exclusive) and ``region``
    mirror the reference EdgeQuery options (s2/query_options.go) —
    both only ever shrink the candidate set, so the partial/merge
    exactness argument is unchanged."""
    import ray
    probes_ref = ray.put(probes)

    def _partial(batch: pa.Table) -> pa.Table:
        return KnnPartial(probes_ref, k, id_col,
                          distance_limit=distance_limit,
                          region=region)(batch)

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)
    return partials.groupby("probe_id").map_groups(
        lambda g: finalize_topk(g, k), batch_format="pandas")


def measure_hot_cells(points_ds, level: int, max_cell_points: int,
                      max_descend: int = 8):
    """Measured skew pass for :func:`all_knn`: count points per
    level-``level`` cell (combiner partials, tiny groupby), keep only
    cells over ``max_cell_points``, and assign each a descend level
    ``level + ceil(log4(count / max_cell_points))`` (clamped) — the
    same measured-hot-set shape as stages/salt.py.  Returns
    ``(cells_sorted uint64, levels int64)``; only the hot rows ever
    reach the driver (bounded by the number of hot cells, not rows)."""
    from ..functions import cellid as cid
    from .agg import bucketed_sum

    def _partial(batch: pa.Table) -> pa.Table:
        cells = cid.parent_v(
            batch.column("cell_id").to_numpy().astype(np.uint64), level)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u.view(np.int64), pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    # distinct level-L cells can reach 10^5+ at all_knn's scales:
    # merge count partials through the vectorized bucketed sum, not
    # Ray's per-group-Python aggregate
    counts = bucketed_sum(
        points_ds.map_batches(_partial, batch_format="pyarrow"),
        ["cell"], ["n"])

    def _hot_only(batch: pa.Table) -> pa.Table:
        m = batch.column("n").to_numpy() > max_cell_points
        return batch.filter(pa.array(m))

    hot = counts.map_batches(_hot_only, batch_format="pyarrow").to_pandas()
    if len(hot) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    cells = hot["cell"].to_numpy().view(np.uint64)
    n = hot["n"].to_numpy().astype(np.float64)
    down = np.ceil(np.log(n / max_cell_points) / np.log(4.0)) \
        .astype(np.int64)
    lvls = np.minimum(level + np.maximum(down, 1),
                      min(level + max_descend, 30))
    order = np.argsort(cells)
    return cells[order], lvls[order]


def all_knn(points_ds, k: int, level: int, *, id_col: str,
            fallback_limit: int = 1 << 20,
            max_cell_points: int | None = None, max_descend: int = 8):
    """All-pairs kNN join: the k nearest OTHER points for EVERY point,
    with BOTH sides sharded — the big-probe-side case the broadcast
    forms (:func:`knn`, :func:`knn_cell_ring`) cannot hold in a probe
    matrix.

    Shape: each point ships once as a probe to its level-``level``
    cell and once as a candidate to that cell plus its AllNeighbors
    ring (s2/cellid.go:274-321) — a 9x replication of narrow
    (id, xyz) rows, never the payload.  One groupby(cell) then scores
    every cell's probes against its 3x3-ring candidates in a single
    matmul.  Exactness guard per probe (same argument as
    :func:`knn_cell_ring`): any point outside the ring is at least
    MIN_WIDTH(level) away, so a probe whose k-th candidate distance is
    below that chord is provably exact; the rest fall back to the
    broadcast brute path (bounded by ``fallback_limit`` — at scale,
    raise ``level`` so rings stay populated instead).

    With ``max_cell_points`` set, a measured pre-pass
    (:func:`measure_hot_cells`) descends hot cells to a finer
    per-region level (salt-stage pattern): probes in a hot base cell
    group at the measured finer level (bounding the per-group matmul),
    and each point ships candidates at every level active in its base
    cell's 3x3 neighborhood — a point adjacent to a probe at level L
    always shares an L0-ring with it (descend-only: L >= L0), so every
    probe's cell+8-ring candidate set stays complete and the MIN_WIDTH
    exactness guard applies per group at that group's own level.

    Returns (probe_id, neighbor_id, chord2, rank) rows, rank 1..k by
    the reference tie order (chord2, neighbor_id), self excluded.
    ``id_col`` must be integer-typed (the fallback descriptor packs
    probe ids and coordinates through one fixed schema)."""
    import ray
    from ..functions import cellid as cid
    from ..functions.latlng import angle_to_chord2
    from ..functions.metric import MIN_WIDTH

    if max_cell_points is not None:
        hot_cells, hot_levels = measure_hot_cells(
            points_ds, level, max_cell_points, max_descend)
    else:
        hot_cells = np.zeros(0, np.uint64)
        hot_levels = np.zeros(0, np.int64)
    active = sorted({level} | set(int(v) for v in hot_levels))
    guards = {lv: float(angle_to_chord2(MIN_WIDTH.value(lv)))
              for lv in active}

    def _lookup_levels(cells_l0: np.ndarray) -> np.ndarray:
        out = np.full(len(cells_l0), level, np.int64)
        if len(hot_cells):
            pos = np.searchsorted(hot_cells, cells_l0)
            pos = np.minimum(pos, len(hot_cells) - 1)
            m = hot_cells[pos] == cells_l0
            out[m] = hot_levels[pos[m]]
        return out

    def _ring_targets(cells: np.ndarray):
        """cells -> (grp, src-index rep) over own cell + deduped ring."""
        neigh = cid.all_neighbors_same_level_v(cells)
        targets = np.concatenate([cells[:, None], neigh], axis=1)
        targets = np.sort(targets, axis=1)
        keep = np.ones(targets.shape, dtype=bool)
        keep[:, 1:] = targets[:, 1:] != targets[:, :-1]  # corner dups
        rep = np.repeat(np.arange(len(cells)), keep.sum(axis=1))
        return targets[keep], rep

    def _tag(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        X = np.stack([batch.column("x").to_numpy(),
                      batch.column("y").to_numpy(),
                      batch.column("z").to_numpy()], axis=1)
        raw = batch.column("cell_id").to_numpy().astype(np.uint64)
        base = cid.parent_v(raw, level)
        if len(hot_cells) == 0:
            tgt, rep = _ring_targets(base)
            grp = np.concatenate([base, tgt])
            src = np.concatenate([np.arange(n), rep])
            role = np.concatenate([np.zeros(n, np.int8),
                                   np.ones(len(rep), np.int8)])
        else:
            ring0 = cid.all_neighbors_same_level_v(base)
            nbr9 = np.concatenate([base[:, None], ring0], axis=1)
            lvl9 = _lookup_levels(nbr9.ravel()).reshape(n, 9)
            probe_lvl = lvl9[:, 0]
            idx = np.arange(n)
            grp_p, src_p, role_p = [], [], []
            for lv in active:
                pm = probe_lvl == lv
                if pm.any():
                    grp_p.append(cid.parent_v(raw[pm], lv))
                    src_p.append(idx[pm])
                    role_p.append(np.zeros(int(pm.sum()), np.int8))
                cm = (lvl9 == lv).any(axis=1)
                if cm.any():
                    tgt, rep = _ring_targets(cid.parent_v(raw[cm], lv))
                    grp_p.append(tgt)
                    src_p.append(idx[cm][rep])
                    role_p.append(np.ones(len(rep), np.int8))
            grp = np.concatenate(grp_p)
            src = np.concatenate(src_p)
            role = np.concatenate(role_p)
        return pa.table({
            # int64 REINTERPRETATION of the uint64 cell id: Ray's
            # groupby shuffles uint64 keys as object-pickled extension
            # arrays (silent cliff on faces 4/5 where the top bit is
            # set); order doesn't matter for hash grouping
            "grp": pa.array(grp.view(np.int64), pa.int64()),
            "role": pa.array(role, pa.int8()),
            "pid": pa.array(ids[src], pa.int64()),
            "px": pa.array(X[src, 0], pa.float64()),
            "py": pa.array(X[src, 1], pa.float64()),
            "pz": pa.array(X[src, 2], pa.float64()),
        })

    def _cell_knn(g: pd.DataFrame) -> pd.DataFrame:
        grp_u64 = np.int64(g["grp"].iloc[0]).view(np.uint64)
        guard = guards[cid.level(int(grp_u64))] \
            if len(active) > 1 else guards[level]
        g = g.drop(columns=["grp"])
        role = g["role"].to_numpy()
        ids = g["pid"].to_numpy()
        X = g[["px", "py", "pz"]].to_numpy()
        pi = np.nonzero(role == 0)[0]
        ci = np.nonzero(role == 1)[0]
        if len(pi) == 0:
            return pd.DataFrame({"probe_id": [], "neighbor_id": [],
                                 "chord2": [], "rank": [],
                                 "px": [], "py": [], "pz": []})
        P, C = X[pi], X[ci]
        scores = np.clip(2.0 - 2.0 * (C @ P.T), 0.0, 4.0)
        scores[ids[ci][:, None] == ids[pi][None, :]] = 4.5  # self
        n_real = len(ci) - 1  # own candidate copy always present
        if n_real >= k:
            kth = np.partition(scores, k - 1, axis=0)[k - 1]
            # STRICT: at kth == guard an outside point could tie and
            # win the (distance, id) order — send those to fallback
            exact = kth < guard
        else:
            exact = np.zeros(len(pi), dtype=bool)
        frames = []
        if exact.any():
            sub = scores[:, exact]
            rows, cols = tie_complete_smallest(sub, k)
            good = sub[rows, cols] < 4.5
            epi = pi[exact]
            df = pd.DataFrame({
                "probe_id": ids[epi[cols[good]]],
                "neighbor_id": ids[ci[rows[good]]],
                "chord2": sub[rows[good], cols[good]],
            })
            df = df.sort_values(["probe_id", "chord2", "neighbor_id"],
                                kind="mergesort")
            df = df.groupby("probe_id", sort=False).head(k) \
                .reset_index(drop=True)
            df["rank"] = df.groupby("probe_id", sort=False).cumcount() \
                .astype(np.int64) + 1
            df["px"] = 0.0
            df["py"] = 0.0
            df["pz"] = 0.0
            frames.append(df)
        if (~exact).any():
            fpi = pi[~exact]
            frames.append(pd.DataFrame({
                "probe_id": ids[fpi],
                "neighbor_id": np.full(len(fpi), -1, np.int64),
                "chord2": np.zeros(len(fpi)),
                "rank": np.zeros(len(fpi), np.int64),  # 0 = descriptor
                "px": X[fpi, 0], "py": X[fpi, 1], "pz": X[fpi, 2],
            }))
        return pd.concat(frames, ignore_index=True)

    tagged = points_ds.map_batches(_tag, batch_format="pyarrow")
    # materialize: both the exact filter and the fallback-descriptor
    # filter consume this; without pinning, the lazy groupby (and its
    # shuffle) would execute once per consumer.  Rows here are k-per-
    # probe results + descriptors — narrow, bounded by k * n_points.
    grouped = tagged.groupby("grp").map_groups(
        _cell_knn,
        batch_format="pandas").materialize()

    def _only_exact(batch: pa.Table) -> pa.Table:
        m = batch.column("rank").to_numpy() >= 1
        return batch.filter(pa.array(m)) \
            .select(["probe_id", "neighbor_id", "chord2", "rank"])

    def _only_fb(batch: pa.Table) -> pa.Table:
        m = batch.column("rank").to_numpy() == 0
        return batch.filter(pa.array(m)) \
            .select(["probe_id", "px", "py", "pz"])

    exact_ds = grouped.map_batches(_only_exact, batch_format="pyarrow")
    fb = grouped.map_batches(_only_fb, batch_format="pyarrow").to_pandas()
    if len(fb) == 0:
        return exact_ds
    if len(fb) > fallback_limit:
        raise ValueError(
            f"{len(fb)} fallback probes exceed fallback_limit "
            f"{fallback_limit}; choose a coarser level")
    fb = fb.drop_duplicates("probe_id")
    fb_out = knn(points_ds,
                 (fb["probe_id"].tolist(),
                  fb[["px", "py", "pz"]].to_numpy()),
                 k + 1, id_col=id_col).to_pandas()
    # drop self (rank recomputed after removal), keep top k
    fb_out = fb_out[fb_out["neighbor_id"] != fb_out["probe_id"]]
    fb_out = fb_out.sort_values(["probe_id", "chord2", "neighbor_id"],
                                kind="mergesort")
    fb_out = fb_out.groupby("probe_id", sort=False).head(k) \
        .reset_index(drop=True)
    fb_out["rank"] = fb_out.groupby("probe_id", sort=False).cumcount() \
        .astype(np.int64) + 1
    import ray.data as rd
    fb_ds = rd.from_arrow(pa.Table.from_pandas(
        fb_out[["probe_id", "neighbor_id", "chord2", "rank"]],
        preserve_index=False))
    return exact_ds.union(fb_ds)

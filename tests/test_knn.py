"""kNN: brute-force partial+merge vs an in-memory oracle, and the
cell-ring scale path vs the brute path (mirrors the
brute-force-verified randomized protocol of s2/edge_query_test.go:
322-380)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz

RNG = np.random.default_rng(21)


def _points_table(n):
    lat = RNG.uniform(-60, 60, n)
    lng = RNG.uniform(-180, 180, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    ids = cid.cell_id_from_point_v(x, y, z)
    return pa.table({
        "pid": pa.array([f"p{i:06d}" for i in range(n)], pa.string()),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        "cell_id": pa.array(ids, pa.uint64()),
    })


def _oracle(tbl, probes_q, k):
    X = np.stack([tbl.column("x").to_numpy(), tbl.column("y").to_numpy(),
                  tbl.column("z").to_numpy()], axis=1)
    ids = np.array(tbl.column("pid").to_pylist())
    out = {}
    for pid, q in probes_q:
        d = ((X - q) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:k]
        out[pid] = [(ids[i], d[i]) for i in order]
    return out


N = 4000
TBL = _points_table(N)
PROBE_LL = [(10.0, 20.0), (45.0, -120.0), (-30.0, 60.0), (0.0, 0.0)]
K = 7


def _probes():
    lat = np.array([p[0] for p in PROBE_LL])
    lng = np.array([p[1] for p in PROBE_LL])
    x, y, z = latlng_deg_to_xyz(lat, lng)
    Q = np.stack([x, y, z], axis=1)
    return [f"probe{i}" for i in range(len(PROBE_LL))], Q


def test_knn_matches_oracle(ray_session):
    import ray.data as rd
    from geo_ray.stages.knn import knn

    pids, Q = _probes()
    ds = rd.from_arrow(TBL)
    got = knn(ds, (pids, Q), K, id_col="pid").to_pandas()
    oracle = _oracle(TBL, list(zip(pids, Q)), K)
    for p in pids:
        sub = got[got["probe_id"] == p].sort_values("rank")
        want = oracle[p]
        assert list(sub["neighbor_id"]) == [w[0] for w in want], p
        assert np.allclose(sub["chord2"].to_numpy(),
                           [w[1] for w in want]), p


@pytest.mark.parametrize("level", [3, 5])
def test_knn_cell_ring_matches_brute(ray_session, level):
    """The ring path must agree with brute force exactly — either via
    the ring guard or via its fallback."""
    import ray.data as rd
    from geo_ray.stages.knn import knn, knn_cell_ring

    pids, Q = _probes()
    ds = rd.from_arrow(TBL)
    brute = knn(ds, (pids, Q), K, id_col="pid").to_pandas()
    ring = knn_cell_ring(ds, (pids, Q), K, level, id_col="pid")
    for p in pids:
        b = brute[brute["probe_id"] == p].sort_values("rank")
        r = ring[ring["probe_id"] == p].sort_values("rank")
        assert list(b["neighbor_id"]) == list(r["neighbor_id"]), (p, level)


def test_knn_tie_order_is_deterministic(ray_session):
    """Duplicate coordinates break ties by neighbor id
    (EdgeQueryResult.Less, s2/edge_query.go:149-157)."""
    import ray.data as rd
    from geo_ray.stages.knn import knn

    x, y, z = latlng_deg_to_xyz(np.array([10.0] * 5), np.array([20.0] * 5))
    dup = pa.table({
        "pid": pa.array([f"d{i}" for i in range(5)]),
        "x": pa.array(np.repeat(x, 1)), "y": pa.array(y), "z": pa.array(z),
        "cell_id": pa.array(cid.cell_id_from_point_v(x, y, z), pa.uint64()),
    })
    pids, Q = _probes()
    got = knn(rd.from_arrow(dup), ([pids[0]], Q[:1]), 3, id_col="pid") \
        .to_pandas().sort_values("rank")
    assert list(got["neighbor_id"]) == ["d0", "d1", "d2"]


def test_knn_distance_limit_is_exclusive(ray_session):
    """DistanceLimit keeps only results strictly within the limit
    (s2/query_options.go:137-148, edge_query.go:82-88)."""
    import ray.data as rd
    from geo_ray.stages.knn import knn

    pids, Q = _probes()
    X = np.stack([TBL.column("x").to_numpy(), TBL.column("y").to_numpy(),
                  TBL.column("z").to_numpy()], axis=1)
    ids = np.array(TBL.column("pid").to_pylist())
    # Same chord2 formula as the stage (2 - 2*dot), so the boundary
    # comparison is bit-identical, not merely allclose.
    D = np.clip(2.0 - 2.0 * (X @ Q.T), 0.0, 4.0)
    # Pick a limit exactly equal to probe0's 4th-nearest distance: the
    # exclusive semantics must drop that result and everything beyond.
    limit = np.sort(D[:, 0])[3]
    got = knn(rd.from_arrow(TBL), (pids, Q), K, id_col="pid",
              distance_limit=limit).to_pandas()
    for j, p in enumerate(pids):
        sub = got[got["probe_id"] == p].sort_values("rank")
        order = np.lexsort((ids, D[:, j]))[:K]
        want = [ids[i] for i in order if D[i, j] < limit]
        assert list(sub["neighbor_id"]) == want, p
        assert (sub["chord2"].to_numpy() < limit).all(), p


def test_knn_region_option_filters_candidates(ray_session):
    """The Region option restricts results to points the region
    contains (s2/query_options.go Region), for each Region kind."""
    import ray.data as rd
    from geo_ray.stages.knn import knn
    from geo_ray.state.cap import Cap
    from geo_ray.state.loop import Loop
    from geo_ray.state.rect import Rect

    pids, Q = _probes()
    X = np.stack([TBL.column("x").to_numpy(), TBL.column("y").to_numpy(),
                  TBL.column("z").to_numpy()], axis=1)
    ids = np.array(TBL.column("pid").to_pylist())

    cap = Cap.from_latlng_deg(10.0, 20.0, np.deg2rad(25.0))
    rect = Rect(-20.0, 35.0, -5.0, 48.0)
    loop = Loop.from_text("0:5, 0:35, 25:35, 25:5")
    for region in (cap, rect, loop):
        from geo_ray.stages.knn import region_contains_points
        inside = region_contains_points(region, X)
        assert 0 < inside.sum() < len(X), type(region)
        got = knn(rd.from_arrow(TBL), (pids[:1], Q[:1]), K, id_col="pid",
                  region=region).to_pandas().sort_values("rank")
        d = ((X[inside] - Q[0]) ** 2).sum(axis=1)
        sub_ids = ids[inside]
        order = np.lexsort((sub_ids, d))[:K]
        assert list(got["neighbor_id"]) == list(sub_ids[order]), type(region)


def test_shape_target_chord2_matches_reference_formula():
    """ShapeTarget's closed-form per-edge chord2 must agree with the
    reference projection formula (updateMinDistance)."""
    from geo_ray.functions.distance import chord2_point_edge
    from geo_ray.state.polyline import Polyline
    from geo_ray.stages.knn import ShapeTarget

    line = Polyline.from_latlngs_deg([(10.0, 20.0), (15.0, 40.0),
                                      (-5.0, 55.0)])
    t = ShapeTarget("l", line)
    tbl = _points_table(2000)
    pts = np.stack([tbl.column("x").to_numpy(), tbl.column("y").to_numpy(),
                    tbl.column("z").to_numpy()], axis=1)
    got = t.chord2(pts)
    want = np.full(len(pts), 4.0)
    for a, b in zip(line.vertices, line.vertices[1:]):
        want = np.minimum(want, chord2_point_edge(
            pts, np.asarray(a), np.asarray(b)))
    assert np.abs(got - want).max() < 1e-12


def test_knn_to_shapes_matches_brute_oracle(ray_session):
    """knn_to_shapes vs a brute per-point min-edge-distance oracle
    (style of s2/edge_query_test.go:283-324), polygon interior = 0."""
    import ray.data as rd
    from geo_ray.state.loop import Loop
    from geo_ray.state.polygon import Polygon
    from geo_ray.state.polyline import Polyline
    from geo_ray.stages.knn import ShapeTarget, knn_to_shapes

    loop = Loop.from_latlngs_deg([(0.0, 0.0), (0.0, 30.0), (25.0, 35.0),
                                  (20.0, -5.0)])
    poly = Polygon.from_loop(loop)
    line = Polyline.from_latlngs_deg([(50.0, -100.0), (40.0, -60.0)])
    targets = [ShapeTarget("poly", poly), ShapeTarget("line", line)]
    tbl = _points_table(5000)
    k = 7
    got = knn_to_shapes(rd.from_arrow(tbl), targets, k,
                        id_col="pid").to_pandas()
    pts = np.stack([tbl.column("x").to_numpy(), tbl.column("y").to_numpy(),
                    tbl.column("z").to_numpy()], axis=1)
    ids = np.array(tbl.column("pid").to_pylist())
    for t in targets:
        d = t.chord2(pts)
        if t.shape_id == "poly":
            d = d.copy()
            d[poly.contains_points_batch(pts)] = 0.0
        order = np.lexsort((ids, d))[:k]
        want = list(ids[order])
        sub = got[got["probe_id"] == t.shape_id].sort_values("rank")
        assert list(sub["neighbor_id"]) == want, t.shape_id
    assert set(got["probe_id"]) == {"poly", "line"}
    assert (got.groupby("probe_id").size() == k).all()


def test_all_knn_matches_brute_reference(ray_session):
    """All-pairs kNN join == brute-force oracle at a healthy level AND
    at a deliberately-too-fine level (guard fails everywhere -> the
    fallback path must reproduce the same exact result)."""
    import ray.data as rd
    from geo_ray.functions import cellid as cid
    from geo_ray.stages.knn import all_knn

    rng = np.random.RandomState(3)
    n, k = 400, 4
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ids = np.arange(n, dtype=np.int64) * 7 + 1
    cells = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    t = pa.table({
        "pid": pa.array(ids, pa.int64()),
        "x": pa.array(v[:, 0]), "y": pa.array(v[:, 1]),
        "z": pa.array(v[:, 2]),
        "cell_id": pa.array(cells, pa.uint64()),
    })
    # brute reference with the same (chord2, id) tie order
    d = np.clip(2.0 - 2.0 * (v @ v.T), 0.0, 4.0)
    np.fill_diagonal(d, 9.0)
    want = []
    for i in range(n):
        order = np.lexsort((ids, d[i]))[:k]
        for r, j in enumerate(order):
            want.append((ids[i], ids[j], r + 1))
    want = pd.DataFrame(want, columns=["probe_id", "neighbor_id", "rank"])
    want = want.sort_values(["probe_id", "rank"]).reset_index(drop=True)

    for level in (1, 9):   # level 9: ~sparse cells, all-fallback path
        ds = rd.from_arrow(t).repartition(6)
        got = all_knn(ds, k, level, id_col="pid").to_pandas()
        got = got[["probe_id", "neighbor_id", "rank"]] \
            .sort_values(["probe_id", "rank"]).reset_index(drop=True)
        assert got.shape == want.shape, level
        assert (got.to_numpy() == want.to_numpy()).all(), level


def test_all_knn_deterministic_across_partitionings(ray_session):
    import ray.data as rd
    from geo_ray.functions import cellid as cid
    from geo_ray.stages.knn import all_knn

    rng = np.random.RandomState(5)
    n = 300
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cells = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    t = pa.table({
        "pid": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "x": pa.array(v[:, 0]), "y": pa.array(v[:, 1]),
        "z": pa.array(v[:, 2]),
        "cell_id": pa.array(cells, pa.uint64()),
    })
    outs = []
    for parts in (1, 16):
        ds = rd.from_arrow(t).repartition(parts)
        df = all_knn(ds, 3, 2, id_col="pid").to_pandas()
        outs.append(df[["probe_id", "neighbor_id", "rank"]]
                    .sort_values(["probe_id", "rank"])
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])


def test_all_knn_adaptive_matches_brute_on_skew(ray_session):
    """max_cell_points triggers the measured descend pass: a dense
    blob (one hot base cell) plus sparse background must yield the
    SAME exact result as the non-adaptive run and the brute oracle,
    while the hot map actually descends the blob's cell."""
    import ray.data as rd
    from geo_ray.functions import cellid as cid
    from geo_ray.stages.knn import all_knn, measure_hot_cells

    rng = np.random.RandomState(11)
    k = 4
    # dense blob around a fixed center (~1 degree spread)
    c = np.array([1.0, 0.3, 0.2])
    c /= np.linalg.norm(c)
    blob = c[None, :] + rng.normal(scale=0.01, size=(600, 3))
    blob /= np.linalg.norm(blob, axis=1, keepdims=True)
    # sparse background
    bg = rng.normal(size=(120, 3))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    v = np.concatenate([blob, bg])
    n = len(v)
    ids = np.arange(n, dtype=np.int64) * 3 + 5
    cells = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    t = pa.table({
        "pid": pa.array(ids, pa.int64()),
        "x": pa.array(v[:, 0]), "y": pa.array(v[:, 1]),
        "z": pa.array(v[:, 2]),
        "cell_id": pa.array(cells, pa.uint64()),
    })
    level = 3
    ds = rd.from_arrow(t).repartition(5)

    hot_c, hot_l = measure_hot_cells(ds, level, max_cell_points=100)
    assert len(hot_c) >= 1                       # the blob cell is hot
    assert (hot_l > level).all() and (hot_l <= 30).all()

    d = np.clip(2.0 - 2.0 * (v @ v.T), 0.0, 4.0)
    np.fill_diagonal(d, 9.0)
    want = []
    for i in range(n):
        order = np.lexsort((ids, d[i]))[:k]
        for r, j in enumerate(order):
            want.append((ids[i], ids[j], r + 1))
    want = pd.DataFrame(want, columns=["probe_id", "neighbor_id",
                                       "rank"])
    want = want.sort_values(["probe_id", "rank"]).reset_index(drop=True)

    for mcp in (None, 100):
        got = all_knn(rd.from_arrow(t).repartition(5), k, level,
                      id_col="pid", max_cell_points=mcp).to_pandas()
        got = got[["probe_id", "neighbor_id", "rank"]] \
            .sort_values(["probe_id", "rank"]).reset_index(drop=True)
        assert got.shape == want.shape, mcp
        assert (got.to_numpy() == want.to_numpy()).all(), mcp


def test_measure_hot_cells_uniform_is_empty(ray_session):
    import ray.data as rd
    from geo_ray.functions import cellid as cid
    from geo_ray.stages.knn import measure_hot_cells

    rng = np.random.RandomState(2)
    v = rng.normal(size=(500, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    cells = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    t = pa.table({
        "pid": pa.array(np.arange(500, dtype=np.int64), pa.int64()),
        "x": pa.array(v[:, 0]), "y": pa.array(v[:, 1]),
        "z": pa.array(v[:, 2]),
        "cell_id": pa.array(cells, pa.uint64()),
    })
    hot_c, hot_l = measure_hot_cells(rd.from_arrow(t), 1,
                                     max_cell_points=10_000)
    assert len(hot_c) == 0 and len(hot_l) == 0

"""Grid DBSCAN (stages/dbscan.py) vs a brute-force all-pairs oracle.

The oracle implements the same deterministic contract directly:
degrees from the full pairwise chord² matrix, components over
core-core eps-edges by min-id flooding, borders take the min cluster
id over in-range cores, everything else -1.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.metric import MIN_WIDTH
from geo_ray.stages.dbscan import dbscan, level_for_eps_chord2


def _brute(ids, X, eps2, min_pts):
    n = len(ids)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    adj = (d2 <= eps2) & ~np.eye(n, dtype=bool)
    deg = adj.sum(axis=1)
    core = (deg + 1) >= min_pts
    # min-id flooding over core-core adjacency
    lab = np.where(core, ids, np.int64(-1))
    while True:
        new = lab.copy()
        for i in range(n):
            if not core[i]:
                continue
            nb = adj[i] & core
            if nb.any():
                m = min(lab[i], lab[nb].min())
                new[i] = m
        if np.array_equal(new, lab):
            break
        lab = new
    cluster = np.full(n, -1, np.int64)
    cluster[core] = lab[core]
    for i in range(n):
        if core[i]:
            continue
        nb = adj[i] & core
        if nb.any():
            cluster[i] = lab[nb].min()
    return pd.DataFrame({"i": ids, "cluster": cluster,
                         "is_core": core.astype(np.int64)})


def _points_ds(ids, lat, lng):
    import ray.data as rd

    x, y, z = latlng_deg_to_xyz(lat, lng)
    cells = cid.cell_id_from_point_v(x, y, z)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.int64()),
        "x": pa.array(x, pa.float64()),
        "y": pa.array(y, pa.float64()),
        "z": pa.array(z, pa.float64()),
        "cell_id": pa.array(cells, pa.uint64()),
    }))


def _run(ids, lat, lng, eps_deg, min_pts, **kw):
    eps2 = 2.0 - 2.0 * math.cos(math.radians(eps_deg))
    out, info = dbscan(_points_ds(ids, lat, lng), eps2, min_pts,
                       id_col="id", **kw)
    got = out.to_pandas().sort_values("i").reset_index(drop=True)
    got["is_core"] = got["is_core"].astype(np.int64)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    want = _brute(ids, np.stack([x, y, z], axis=1), eps2, min_pts) \
        .sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    return got, info


@pytest.mark.parametrize("seed,n,eps_deg,min_pts", [
    (1, 200, 8.0, 4),     # mixed core/border/noise
    (2, 300, 15.0, 6),    # bigger balls, multiple merged clusters
    (3, 120, 2.0, 3),     # sparse: mostly noise, tiny clusters
    (4, 250, 25.0, 2),    # min_pts=2: every paired point is core
])
def test_matches_brute(ray_session, seed, n, eps_deg, min_pts):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    got, _ = _run(np.arange(n, dtype=np.int64), lat, lng,
                  eps_deg, min_pts)
    # the parametrization is only meaningful if it exercises variety
    assert got["cluster"].nunique() >= 1


def test_three_branches_and_chains(ray_session):
    """A hand-built chain: two dense blobs bridged by a border point,
    plus an isolated core pair and pure noise."""
    pts = []
    # blob A around (10, 10): 5 points within ~1 deg
    for k in range(5):
        pts.append((10.0 + 0.2 * k, 10.0))
    # blob B around (12.5, 10): 5 points (outside eps of most of A)
    for k in range(5):
        pts.append((12.5 + 0.2 * k, 10.0))
    # bridge point between blobs: within eps of cores in both, and
    # itself core (4 in-range neighbors) — merges A and B
    pts.append((11.6, 10.0))
    # dangling point past blob B: only 2 in-range neighbors, so it is
    # border (attached to the merged cluster but not core)
    pts.append((14.5, 10.0))
    # far-away noise
    pts.append((60.0, -120.0))
    pts.append((-45.0, 77.0))
    lat = np.array([p[0] for p in pts])
    lng = np.array([p[1] for p in pts])
    ids = np.arange(len(pts), dtype=np.int64)
    got, _ = _run(ids, lat, lng, 1.5, 4)
    assert (got["cluster"] == -1).sum() == 2          # the two noise pts
    assert got.loc[10, "is_core"] == 1                # bridge is core
    assert got.loc[11, "is_core"] == 0                # dangler is border
    assert got.loc[11, "cluster"] == 0
    # the bridge merges both blobs into ONE cluster (min id = 0)
    assert got.loc[:10, "cluster"].nunique() == 1


def test_distributed_plan_matches_fast_path(ray_session):
    """driver_merge_rows=0 forces the full E2-E5 exchange plan; both
    plans must agree with brute force on the same input."""
    rng = np.random.default_rng(5)
    n = 250
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    ids = np.arange(n, dtype=np.int64)
    fast, fi = _run(ids, lat, lng, 12.0, 4)
    dist, di = _run(ids, lat, lng, 12.0, 4, driver_merge_rows=0)
    pd.testing.assert_frame_equal(fast, dist, check_exact=True)
    assert fi.get("driver_merged") and not di.get("driver_merged")


def test_all_noise_and_empty_core_graph(ray_session):
    rng = np.random.default_rng(9)
    n = 40
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    got, info = _run(np.arange(n, dtype=np.int64), lat, lng, 0.5, 5)
    assert (got["cluster"] == -1).all()
    assert (got["is_core"] == 0).all()


def test_isolated_core_cluster(ray_session):
    """min_pts=1 makes every point core — each isolated point must
    become its own 1-point cluster through the nodes_ds path."""
    lat = np.array([0.0, 40.0, -40.0])
    lng = np.array([0.0, 90.0, -90.0])
    ids = np.array([7, 3, 11], dtype=np.int64)
    got, _ = _run(ids, lat, lng, 1.0, 1)
    assert (got["is_core"] == 1).all()
    assert list(got["cluster"]) == list(got["i"])


def test_level_guard():
    eps2 = 2.0 - 2.0 * math.cos(math.radians(3.5))
    lvl = level_for_eps_chord2(eps2)
    eps_angle = 2.0 * math.asin(math.sqrt(eps2) / 2.0)
    assert MIN_WIDTH.value(lvl) >= eps_angle
    assert MIN_WIDTH.value(lvl + 1) < eps_angle


def test_explicit_level_violation_raises(ray_session):
    eps2 = 2.0 - 2.0 * math.cos(math.radians(10.0))
    with pytest.raises(ValueError):
        dbscan(_points_ds(np.array([1], np.int64), np.array([0.0]),
                          np.array([0.0])), eps2, 2, id_col="id",
               level=10)

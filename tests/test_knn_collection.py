"""CellUnion / shape-collection distance targets vs brute oracles —
the style of s2/edge_query_test.go:283-324 (random targets, brute
force distance comparison)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions import cellid as cid
from geo_ray.stages.knn import (CellUnionTarget, CollectionTarget,
                                ShapeTarget, furthest_to_shapes,
                                knn_to_shapes)
from geo_ray.state.cell import Cell
from geo_ray.state.loop import Loop


def _points(n=400, seed=2):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _cells(seed=5, n=6, level=6):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leafs = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    return np.unique(cid.parent_v(leafs, level))


def _loop(lat0, lng0, r=8.0):
    pts = [(lat0 + r * np.cos(t), lng0 + r * np.sin(t))
           for t in np.linspace(0, 2 * np.pi, 8, endpoint=False)]
    return Loop.from_latlngs_deg(pts)


def test_cellunion_target_matches_per_cell_brute():
    cells = _cells()
    tgt = CellUnionTarget("cu", cells)
    pts = _points()
    got = tgt.chord2(pts)
    got_max = tgt.max_chord2(pts)
    cobjs = [Cell(int(c)) for c in cells]
    for i in range(len(pts)):
        want = min(c.distance_chord2(tuple(pts[i])) for c in cobjs)
        want_max = max(c.max_distance_chord2(tuple(pts[i]))
                       for c in cobjs)
        assert got[i] == want, i
        assert got_max[i] == want_max, i


def test_cellunion_target_zero_inside_member():
    cells = _cells(seed=9, n=3, level=4)
    tgt = CellUnionTarget("cu", cells)
    centers = np.array([Cell(int(c)).center() for c in cells])
    assert (tgt.chord2(centers) == 0.0).all()
    # and the antipodes of member centers are at max distance
    assert (tgt.max_chord2(-centers) == 4.0).all()


def test_collection_target_is_member_min_max():
    polys = [_loop(20.0, 30.0), _loop(-35.0, 120.0)]
    members = [ShapeTarget(f"p{i}", l) for i, l in enumerate(polys)]
    members.append(CellUnionTarget("cu", _cells(seed=11, n=4)))
    coll = CollectionTarget("coll", members)
    pts = _points(seed=3)
    mins = np.min(np.stack([m.chord2(pts) for m in members]), axis=0)
    maxs = np.max(np.stack([m.max_chord2(pts) for m in members]),
                  axis=0)
    assert (coll.chord2(pts) == mins).all()
    assert (coll.max_chord2(pts) == maxs).all()


def _points_ds(pts):
    import ray.data as rd
    df = pd.DataFrame({"image_id": np.arange(len(pts), dtype=np.int64),
                       "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    return rd.from_pandas(df).repartition(5)


def test_knn_to_collection_matches_brute(ray_session):
    pts = _points(n=600, seed=7)
    members = [ShapeTarget("p0", _loop(10.0, -40.0)),
               CellUnionTarget("cu", _cells(seed=13, n=5))]
    coll = CollectionTarget("coll", members)
    k = 12
    out = knn_to_shapes(_points_ds(pts), [coll], k,
                        id_col="image_id").to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    scores = coll.chord2(pts)
    order = np.lexsort((np.arange(len(pts)), scores))[:k]
    assert list(out["neighbor_id"]) == list(order)
    assert np.array_equal(out["chord2"].to_numpy(), scores[order])


def test_furthest_to_collection_matches_brute(ray_session):
    pts = _points(n=500, seed=8)
    coll = CollectionTarget("coll", [
        ShapeTarget("p0", _loop(-20.0, 60.0)),
        CellUnionTarget("cu", _cells(seed=17, n=4))])
    k = 9
    out = furthest_to_shapes(_points_ds(pts), [coll], k,
                             id_col="image_id").to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    scores = coll.max_chord2(pts)
    order = np.lexsort((np.arange(len(pts)), -scores))[:k]
    assert list(out["neighbor_id"]) == list(order)
    assert np.array_equal(out["chord2"].to_numpy(), scores[order])

"""Covering join with the cell-local edge index (large polygons) must
agree exactly with the brute refine path."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.stages.join import (INDEX_EDGE_THRESHOLD, JoinState,
                                 PolygonJoiner, _PolyEdgeIndex)
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

RNG = np.random.default_rng(99)


def _pts_table(n, lat_c, lng_c, spread):
    lat = lat_c + RNG.uniform(-spread, spread, n)
    lng = lng_c + RNG.uniform(-spread, spread, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    return pa.table({
        "image_id": pa.array([f"r{i}" for i in range(n)]),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        "cell_id": pa.array(cid.cell_id_from_point_v(x, y, z), pa.uint64()),
    })


def _big_loop(nv=256):
    cx, cy, cz = (float(v) for v in latlng_deg_to_xyz(20.0, 50.0))
    return Loop.regular_loop((cx, cy, cz), math.radians(5.0), nv)


def test_regular_loop_shape():
    loop = _big_loop(64)
    assert len(loop.vertices) == 64
    # center inside, antipode outside
    c = np.array(latlng_deg_to_xyz(20.0, 50.0), dtype=float)
    assert loop.contains_point(tuple(c))
    assert not loop.contains_point(tuple(-c))
    # area ~ cap area 2*pi*(1-cos r)
    want = 2 * math.pi * (1 - math.cos(math.radians(5.0)))
    assert abs(loop.area() - want) / want < 0.02


def test_indexed_join_equals_brute():
    loop = _big_loop(256)
    assert loop.num_edges() >= INDEX_EDGE_THRESHOLD
    poly = Polygon.from_loop(loop)
    state = JoinState([("big", poly)])
    assert state.edge_indexes[0] is not None
    tbl = _pts_table(20000, 20.0, 50.0, 8.0)
    joiner = PolygonJoiner(state)
    got = set(joiner(tbl).column("image_id").to_pylist())
    # brute truth
    pts = np.stack([tbl.column("x").to_numpy(), tbl.column("y").to_numpy(),
                    tbl.column("z").to_numpy()], axis=1)
    want = set(np.array(tbl.column("image_id").to_pylist())[
        poly.contains_points_batch(pts)].tolist())
    assert got == want


def test_edge_index_per_cell_subsets_are_small():
    loop = _big_loop(512)
    poly = Polygon.from_loop(loop)
    state = JoinState([("big", poly)])
    eidx = state.edge_indexes[0]
    counts = np.diff(eidx.offsets)
    # the point of the index: mean per-cell edge count well below total
    assert counts.mean() < loop.num_edges() / 3
    assert counts.max() <= loop.num_edges()


def test_small_polygons_skip_index():
    tri = Polygon.from_loop(Loop.from_text("0:0, 0:5, 5:5"))
    state = JoinState([("tri", tri)])
    assert state.edge_indexes[0] is None

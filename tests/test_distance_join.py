"""Within-distance join vs a brute-force oracle."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.distance import chord2_point_edge
from geo_ray.functions.latlng import angle_to_chord2, latlng_deg_to_xyz
from geo_ray.stages.distance_join import DistanceJoinState, within_distance
from geo_ray.state.loop import Loop
from geo_ray.state.polyline import Polyline

RNG = np.random.default_rng(33)


def _tbl(n, lat0, lat1, lng0, lng1):
    lat = RNG.uniform(lat0, lat1, n)
    lng = RNG.uniform(lng0, lng1, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    return pa.table({
        "pid": pa.array(np.arange(n)),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        "cell_id": pa.array(cid.cell_id_from_point_v(x, y, z), pa.uint64()),
    })


def _brute(tbl, state):
    x = tbl.column("x").to_numpy()
    y = tbl.column("y").to_numpy()
    z = tbl.column("z").to_numpy()
    pts = np.stack([x, y, z], axis=1)
    best = np.full(len(pts), 4.0)
    for a, b in state.edges:
        best = np.minimum(best, chord2_point_edge(pts, a, b))
    mask = best <= state.radius_chord2
    if state.polygon is not None:
        mask |= state.polygon.contains_points_batch(pts)
    return set(tbl.column("pid").to_numpy()[mask].tolist())


def test_polygon_radius_join_matches_brute():
    loop = Loop.from_text("10:10, 10:20, 20:20, 20:10")
    state = DistanceJoinState(loop, math.radians(3.0))
    tbl = _tbl(4000, 0, 30, 0, 30)
    got = within_distance(tbl, state)
    assert set(got.column("pid").to_numpy().tolist()) == _brute(tbl, state)
    # sanity: interior points always match, far points never
    n_in = len(got)
    assert 0 < n_in < len(tbl)


def test_polyline_radius_join_matches_brute():
    pl = Polyline.from_text("0:0, 5:10, 0:20, 5:30")
    state = DistanceJoinState(pl, math.radians(2.0))
    tbl = _tbl(4000, -10, 15, -5, 35)
    got = within_distance(tbl, state)
    assert set(got.column("pid").to_numpy().tolist()) == _brute(tbl, state)


def test_zero_radius_is_containment_for_polygons():
    loop = Loop.from_text("10:10, 10:20, 20:20, 20:10")
    state = DistanceJoinState(loop, 1e-9)
    tbl = _tbl(2000, 5, 25, 5, 25)
    got = set(within_distance(tbl, state).column("pid").to_numpy().tolist())
    pts = np.stack([tbl.column("x").to_numpy(), tbl.column("y").to_numpy(),
                    tbl.column("z").to_numpy()], axis=1)
    inside = set(tbl.column("pid").to_numpy()[
        loop.contains_points_batch(pts)].tolist())
    assert inside <= got
    # anything matched but not inside must be within 1e-9 of the boundary
    extra = got - inside
    if extra:
        sel = np.isin(tbl.column("pid").to_numpy(), list(extra))
        best = np.full(int(sel.sum()), 4.0)
        for a, b in state.edges:
            best = np.minimum(best, chord2_point_edge(pts[sel], a, b))
        assert best.max() <= float(angle_to_chord2(1e-9)) + 1e-30

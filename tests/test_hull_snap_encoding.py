"""Convex hull (vs containment oracle), snap functions, binary codecs."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.encoding import (decode_cell_id, decode_cell_union,
                                        encode_cell_id, encode_cell_union)
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.snap import (cell_id_snap, cell_id_snap_level_for_limit,
                                    int_latlng_snap)
from geo_ray.state.convexhull import convex_hull, hull_of_partials, hull_partial

RNG = np.random.default_rng(13)


def _cap_points(lat, lng, radius_deg, n):
    lats = lat + RNG.uniform(-radius_deg, radius_deg, n)
    lngs = lng + RNG.uniform(-radius_deg, radius_deg, n)
    x, y, z = latlng_deg_to_xyz(lats, lngs)
    return list(zip(x.tolist(), y.tolist(), z.tolist()))


def test_hull_contains_all_points():
    pts = _cap_points(20.0, 50.0, 8.0, 200)
    hull = convex_hull(pts)
    assert len(hull.vertices) >= 3
    arr = np.array(pts)
    inside = hull.contains_points_batch(arr)
    # vertices of the hull lie on the boundary; all other points must
    # be inside or on it.  Test strictly-interior points only.
    hull_set = set(hull.vertices)
    for k, p in enumerate(pts):
        if tuple(p) not in hull_set:
            assert inside[k], k


def test_hull_of_partials_matches_direct():
    pts = _cap_points(-10.0, -120.0, 5.0, 300)
    direct = convex_hull(pts)
    parts = [hull_partial(pts[i::4]) for i in range(4)]
    merged = hull_of_partials(parts)
    assert set(direct.vertices) == set(merged.vertices)


def test_hull_degenerate():
    assert convex_hull([]).is_empty()
    p = tuple(float(v) for v in latlng_deg_to_xyz(10.0, 10.0))
    single = convex_hull([p, p])
    assert len(single.vertices) == 1


def test_cell_id_snap():
    lat = RNG.uniform(-80, 80, 100)
    lng = RNG.uniform(-180, 180, 100)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    for level in (8, 14):
        sx, sy, sz = cell_id_snap(x, y, z, level)
        snapped = cid.cell_id_from_point_v(sx, sy, sz)
        orig_parent = cid.parent_v(cid.cell_id_from_point_v(x, y, z), level)
        # snapped point is the center of the original point's cell
        assert (cid.parent_v(snapped, level) == orig_parent).all()
        # idempotent
        sx2, sy2, sz2 = cell_id_snap(sx, sy, sz, level)
        assert np.abs(sx2 - sx).max() < 1e-15


def test_snap_level_for_radius():
    for level in (5, 10, 20):
        # the width of cells at the returned level bounds the snap radius
        from geo_ray.functions.metric import MIN_WIDTH
        r = MIN_WIDTH.value(level) / 2
        got = cell_id_snap_level_for_limit(r)
        assert got >= level - 1


def test_int_latlng_snap():
    x, y, z = latlng_deg_to_xyz(np.array([12.3456789]), np.array([-98.7654321]))
    sx, sy, sz = int_latlng_snap(x, y, z, 5)  # E5
    from geo_ray.functions.latlng import xyz_to_latlng_deg
    lat, lng = xyz_to_latlng_deg(sx, sy, sz)
    assert abs(float(lat[0]) - 12.34568) < 1e-9
    assert abs(float(lng[0]) - (-98.76543)) < 1e-9
    with pytest.raises(ValueError):
        int_latlng_snap(x, y, z, 11)


def test_encoding_round_trip():
    ids = [cid.cell_id_from_latlng(10.0, 20.0),
           cid.parent(cid.cell_id_from_latlng(-40.0, 100.0), 7)]
    for ci in ids:
        assert decode_cell_id(encode_cell_id(ci)) == ci
    blob = encode_cell_union(ids)
    assert decode_cell_union(blob) == ids
    assert decode_cell_union(encode_cell_union([])) == []
    with pytest.raises(ValueError):
        bad = bytearray(blob)
        bad[0] = 9  # wrong version
        decode_cell_union(bytes(bad))

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


# -- Snapper objects (s2/builder_snapper_test.go:20-130) --------------------

def test_identity_snapper():
    from geo_ray.functions.snap import IdentitySnapper
    s = IdentitySnapper(1.0)
    assert s.min_vertex_separation() == 1.0
    assert s.min_edge_vertex_separation() == 0.5
    x, y, z = latlng_deg_to_xyz(np.array([12.0]), np.array([34.0]))
    gx, gy, gz = s.snap_point(x, y, z)
    assert (gx == x).all() and (gy == y).all() and (gz == z).all()


def test_cellid_snapper_level_to_from_snap_radius():
    # s2/builder_snapper_test.go:46-65
    from geo_ray.functions.snap import CellIDSnapper
    for level in range(31):
        radius = CellIDSnapper.min_snap_radius_for_level(level)
        assert CellIDSnapper.level_for_max_snap_radius(radius) == level
        assert CellIDSnapper.level_for_max_snap_radius(0.999 * radius) == \
            min(level + 1, 30)
    assert CellIDSnapper.level_for_max_snap_radius(5.0) == 0
    assert CellIDSnapper.level_for_max_snap_radius(1e-30) == 30


def test_cellid_snapper_snap_point_idempotent():
    # s2/builder_snapper_test.go:66-78: cell centers are fixed points
    from geo_ray.functions import cellid as cid
    from geo_ray.functions.snap import CellIDSnapper
    rng = np.random.default_rng(17)
    for level in (0, 3, 11, 24, 30):
        s = CellIDSnapper(level)
        p = rng.normal(size=3)
        p /= np.linalg.norm(p)
        leaf = cid.cell_id_from_point_v(*[np.array([c]) for c in p])
        center = cid.cell_id_to_point_v(cid.parent_v(leaf, level))
        sx, sy, sz = s.snap_point(*center)
        assert (sx == center[0]).all() and (sy == center[1]).all() \
            and (sz == center[2]).all()


def test_intlatlng_snapper_exponent_to_from_snap_radius():
    # s2/builder_snapper_test.go:80-99
    from geo_ray.functions.snap import IntLatLngSnapper
    for exp in range(11):
        radius = IntLatLngSnapper.min_snap_radius_for_exponent(exp)
        assert IntLatLngSnapper.exponent_for_max_snap_radius(radius) == exp
        assert IntLatLngSnapper.exponent_for_max_snap_radius(
            0.999 * radius) == min(exp + 1, 10)
    assert IntLatLngSnapper.exponent_for_max_snap_radius(5.0) == 0
    assert IntLatLngSnapper.exponent_for_max_snap_radius(1e-30) == 10


def test_intlatlng_snapper_lattice_fixed_points():
    """E5/E6/E7 lattice points are fixed points of the snapper (the
    conformance check the reference's commented-out test describes,
    s2/builder_snapper_test.go:100-130)."""
    from geo_ray.functions.latlng import xyz_to_latlng_deg
    from geo_ray.functions.snap import IntLatLngSnapper
    rng = np.random.default_rng(23)
    for exp in (5, 6, 7):
        s = IntLatLngSnapper(exp)
        scale = 10.0 ** exp
        lat_e = np.round(rng.uniform(-89, 89, 16) * scale) / scale
        lng_e = np.round(rng.uniform(-179, 179, 16) * scale) / scale
        x, y, z = latlng_deg_to_xyz(lat_e, lng_e)
        sx, sy, sz = s.snap_point(x, y, z)
        glat, glng = xyz_to_latlng_deg(sx, sy, sz)
        assert np.allclose(glat, lat_e, atol=1e-12)
        assert np.allclose(glng, lng_e, atol=1e-12)


def test_snapper_separation_bounds_sane():
    from geo_ray.functions.snap import CellIDSnapper, IntLatLngSnapper
    for level in (4, 12, 20):
        s = CellIDSnapper(level)
        assert 0 < s.min_edge_vertex_separation() <= s.snap_radius
        assert 0.5 * s.snap_radius <= s.min_vertex_separation() \
            <= s.snap_radius + 1e-18
    for exp in (5, 7):
        s = IntLatLngSnapper(exp)
        assert 0 < s.min_edge_vertex_separation() <= s.snap_radius
        assert 0.47 * s.snap_radius <= s.min_vertex_separation() \
            <= s.snap_radius

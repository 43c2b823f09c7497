"""Projection round-trips, tessellation tolerance, s2intersect sweep."""

from __future__ import annotations

import math

import numpy as np

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.projections import (EdgeTessellator,
                                           MercatorProjection,
                                           PlateCarreeProjection)
from geo_ray.state import cellunion as cu
from geo_ray.state.s2intersect import find

RNG = np.random.default_rng(9)


def test_plate_carree_round_trip():
    proj = PlateCarreeProjection(180.0)
    lat = RNG.uniform(-89, 89, 500)
    lng = RNG.uniform(-180, 180, 500)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    px, py = proj.project(x, y, z)
    assert np.abs(px - lng).max() < 1e-9
    assert np.abs(py - lat).max() < 1e-9
    x2, y2, z2 = proj.unproject(px, py)
    assert max(np.abs(x2 - x).max(), np.abs(y2 - y).max(),
               np.abs(z2 - z).max()) < 1e-12


def test_mercator_round_trip():
    proj = MercatorProjection(180.0)
    lat = RNG.uniform(-85, 85, 500)
    lng = RNG.uniform(-180, 180, 500)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    px, py = proj.project(x, y, z)
    x2, y2, z2 = proj.unproject(px, py)
    assert max(np.abs(x2 - x).max(), np.abs(y2 - y).max(),
               np.abs(z2 - z).max()) < 1e-12
    # known value: 45N -> y = ln(tan(pi/4 + pi/8)) * scale
    px1, py1 = proj.project(*latlng_deg_to_xyz(45.0, 0.0))
    assert abs(float(py1) - math.log(math.tan(math.pi / 4 + math.pi / 8))
               * 180.0 / math.pi) < 1e-9


def test_tessellator_projected_within_tolerance():
    """Every geodesic midpoint of the tessellated chain must be within
    tolerance of the projected polyline (s2/edge_tessellator.go:86-107
    guarantee, tested like the reference's distance checks)."""
    proj = MercatorProjection(180.0)
    tol = math.radians(0.05)
    tess = EdgeTessellator(proj, tol)
    a = tuple(float(v) for v in latlng_deg_to_xyz(10.0, -60.0))
    b = tuple(float(v) for v in latlng_deg_to_xyz(65.0, 40.0))
    out = []
    tess.append_projected(a, b, out)
    assert len(out) > 2  # long diagonal edge must subdivide under Mercator
    # piecewise check: unprojected chain stays near the geodesic
    for (p1, p2) in zip(out, out[1:]):
        mid = proj.interpolate(0.5, np.array(p1), np.array(p2))
        m = np.array(proj.unproject(mid[0], mid[1]), dtype=float)
        # distance from m to the geodesic ab
        from geo_ray.functions.distance import chord2_point_edge
        d2 = float(chord2_point_edge(m, np.array(a), np.array(b)))
        assert d2 < (2 * math.sin(tol))**2 * 4


def test_tessellator_unprojected_round_trip():
    proj = PlateCarreeProjection(180.0)
    tess = EdgeTessellator(proj, math.radians(0.01))
    out = []
    tess.append_unprojected((-120.0, 40.0), (60.0, 40.0), out)
    assert len(out) >= 2
    for v in out:
        assert abs(np.linalg.norm(np.array(v)) - 1) < 1e-9


def _cell_of(lat, lng, level):
    return cid.parent(cid.cell_id_from_latlng(lat, lng), level)


def test_s2intersect_find():
    """Mirrors s2/s2intersect semantics: disjoint regions keyed by the
    exact set of unions covering them."""
    a = cu.normalize([_cell_of(10, 10, 6), _cell_of(10, 11, 6),
                      _cell_of(40, 40, 6)])
    b = cu.normalize([_cell_of(10, 10, 6), _cell_of(-20, 50, 6)])
    c = cu.normalize([_cell_of(10, 10, 8), _cell_of(40, 40, 6)])
    res = find([a, b, c])
    key_abc = frozenset({0, 1, 2})
    key_ac = frozenset({0, 2})
    assert key_abc in res
    # the triple intersection equals the (smaller) level-8 cell region
    triple = res[key_abc]
    assert cu.contains_cell_id(a, triple[0])
    assert cu.contains_cell_id(b, triple[0])
    assert cu.contains_cell_id(c, triple[0])
    assert key_ac in res
    # no pair region may also be covered by the third union
    for key, cells in res.items():
        for ci in cells:
            for idx in range(3):
                member = cu.contains_cell_id([a, b, c][idx], ci)
                assert member == (idx in key), (key, idx)


def test_s2intersect_empty():
    a = [_cell_of(10, 10, 8)]
    b = [_cell_of(-40, 100, 8)]
    assert find([a, b]) == {}


def _lng_deg(xyz):
    import math as _m
    return _m.degrees(_m.atan2(xyz[1], xyz[0]))


def test_tessellator_projected_wrapping():
    """s2/edge_tessellator_test.go:64-79: projecting a geodesic that
    crosses the 180-degree meridian yields vertices with no sudden
    jumps (possibly non-canonical longitudes)."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    out = []
    a = latlng_deg_to_xyz(0.0, -170.0)
    b = latlng_deg_to_xyz(0.0, 170.0)
    tess.append_projected(tuple(float(v) for v in a),
                          tuple(float(v) for v in b), out)
    for v in out:
        assert v[0] <= -170.0, out


def test_tessellator_unprojected_wrapping():
    """s2/edge_tessellator_test.go:49-62: a projected edge crossing
    the meridian unprojects the short way around the sphere."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    out = []
    tess.append_unprojected((-170.0, 0.0), (170.0, 80.0), out)
    for v in out:
        assert abs(_lng_deg(v)) >= 170.0, [_lng_deg(x) for x in out]


def test_tessellator_projected_wrapping_multiple_crossings():
    """s2/edge_tessellator_test.go:103-130: a loop crossing the
    meridian four times stays continuous; first == last vertex and
    the longitude range is exactly [160, 640]."""
    pts = [(0.0, 160.0), (0.0, -40.0), (0.0, 120.0), (0.0, -80.0),
           (10.0, 120.0), (10.0, -40.0), (0.0, 160.0)]
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(1e-7))
    out = []
    for (lat0, lng0), (lat1, lng1) in zip(pts, pts[1:]):
        a = tuple(float(v) for v in latlng_deg_to_xyz(lat0, lng0))
        b = tuple(float(v) for v in latlng_deg_to_xyz(lat1, lng1))
        tess.append_projected(a, b, out)
    assert out[0] == out[-1]
    lngs = [v[0] for v in out]
    assert min(lngs) == 160.0
    assert max(lngs) == 640.0


def test_tessellator_unprojected_wrapping_multiple_crossings():
    """s2/edge_tessellator_test.go:81-101: an edge chain zig-zagging
    across the meridian unprojects with every vertex near it."""
    proj = PlateCarreeProjection(180)
    tess = EdgeTessellator(proj, math.radians(0.01))
    out = []
    lat = 1.0
    while lat <= 60.0:
        tess.append_unprojected((180 - 0.03 * lat, lat),
                                (-180 + 0.07 * lat, lat), out)
        tess.append_unprojected((-180 + 0.07 * lat, lat),
                                (180 - 0.03 * (lat + 1), lat + 1), out)
        lat += 1.0
    for v in out:
        assert abs(_lng_deg(v)) >= 175.0

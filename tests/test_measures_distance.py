"""Distance/measure kernels vs brute-force oracles (mirrors
s2/edge_distances_test and s2/point_measures_test strategies)."""

from __future__ import annotations

import math

import numpy as np

from geo_ray.functions.distance import (chord2_edge_edge, chord2_point_edge,
                                        interpolate, project_to_edge)
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.measures import (edge_true_centroid, girard_area,
                                        point_area, signed_area,
                                        true_centroid_triangle, turn_angle)
from geo_ray.state.polyline import Polyline
from geo_ray.functions.earth import km_between_latlng_deg, angle_from_km

RNG = np.random.default_rng(5)


def rand_points(n):
    v = RNG.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def brute_chord2_point_edge(x, a, b, steps=20000):
    """Dense sampling oracle."""
    ts = np.linspace(0, 1, steps)
    pts = np.array([interpolate(a, b, t) for t in ts])
    d = ((pts - x) ** 2).sum(axis=1)
    return d.min()


def test_point_edge_distance_matches_brute():
    for _ in range(30):
        a, b, x = rand_points(3)
        got = float(chord2_point_edge(x, a, b))
        want = brute_chord2_point_edge(x, a, b)
        assert abs(got - want) < 1e-6, (got, want)


def test_projection_is_closest_and_on_edge():
    for _ in range(50):
        a, b, x = rand_points(3)
        p = project_to_edge(x, a, b)
        assert abs(np.linalg.norm(p) - 1) < 1e-12
        # distance through p equals reported min distance
        d1 = float(((x - p) ** 2).sum())
        d2 = float(chord2_point_edge(x, a, b))
        assert abs(d1 - d2) < 1e-12


def test_edge_edge_distance_zero_iff_crossing():
    a = np.array(latlng_deg_to_xyz(0.0, -10.0), dtype=float)
    b = np.array(latlng_deg_to_xyz(0.0, 10.0), dtype=float)
    c = np.array(latlng_deg_to_xyz(-10.0, 0.0), dtype=float)
    d = np.array(latlng_deg_to_xyz(10.0, 0.0), dtype=float)
    assert chord2_edge_edge(a, b, c, d) == 0.0
    e = np.array(latlng_deg_to_xyz(5.0, 20.0), dtype=float)
    f = np.array(latlng_deg_to_xyz(10.0, 30.0), dtype=float)
    assert chord2_edge_edge(a, b, e, f) > 0


def test_triangle_areas():
    # octant triangle = 1/8 of the sphere = pi/2
    a = (1.0, 0.0, 0.0)
    b = (0.0, 1.0, 0.0)
    c = (0.0, 0.0, 1.0)
    assert abs(point_area(a, b, c) - math.pi / 2) < 1e-12
    assert abs(girard_area(a, b, c) - math.pi / 2) < 1e-12
    assert signed_area(a, b, c) > 0
    assert signed_area(a, c, b) < 0
    # tiny triangle ~ planar area
    base = np.array(latlng_deg_to_xyz(10.0, 20.0), dtype=float)
    eps = 1e-4
    t1 = np.array(latlng_deg_to_xyz(10.0 + math.degrees(eps), 20.0), dtype=float)
    t2 = np.array(latlng_deg_to_xyz(10.0, 20.0 + math.degrees(eps)), dtype=float)
    approx = 0.5 * eps * eps * math.cos(math.radians(10.0))
    assert abs(point_area(base, t1, t2) - approx) / approx < 1e-3


def test_turn_angle_straight_and_right():
    a = np.array(latlng_deg_to_xyz(0.0, 0.0), dtype=float)
    b = np.array(latlng_deg_to_xyz(0.0, 10.0), dtype=float)
    c = np.array(latlng_deg_to_xyz(0.0, 20.0), dtype=float)
    assert abs(turn_angle(a, b, c)) < 1e-9
    d = np.array(latlng_deg_to_xyz(10.0, 10.0), dtype=float)
    assert abs(abs(turn_angle(a, b, d)) - math.pi / 2) < 1e-6


def test_centroids():
    # symmetric triangle about the z axis -> centroid on the z axis
    pts = [latlng_deg_to_xyz(60.0, lng) for lng in (0.0, 120.0, -120.0)]
    cen = true_centroid_triangle(*[np.array(p, dtype=float) for p in pts])
    assert abs(cen[0]) < 1e-12 and abs(cen[1]) < 1e-12 and cen[2] > 0
    # edge centroid of a symmetric equator edge points along x
    a = np.array(latlng_deg_to_xyz(0.0, -30.0), dtype=float)
    b = np.array(latlng_deg_to_xyz(0.0, 30.0), dtype=float)
    ec = edge_true_centroid(a, b)
    assert abs(ec[1]) < 1e-12 and abs(ec[2]) < 1e-12 and ec[0] > 0


def test_polyline_measures():
    pl = Polyline.from_text("0:0, 0:90, 0:180")
    assert abs(pl.length() - math.pi) < 1e-12
    p, nxt = pl.interpolate(0.5)
    lat = math.degrees(math.asin(p[2]))
    lng = math.degrees(math.atan2(p[1], p[0]))
    assert abs(lat) < 1e-9 and abs(lng - 90.0) < 1e-9
    # project a point onto the line
    x = np.array(latlng_deg_to_xyz(10.0, 45.0), dtype=float)
    q, nxt = pl.project(tuple(x))
    assert abs(q[2]) < 1e-9  # on the equator
    assert pl.uninterpolate(q, nxt) > 0
    # intersects
    cross = Polyline.from_text("-10:45, 10:45")
    assert pl.intersects(cross)
    far = Polyline.from_text("50:0, 60:10")
    assert not pl.intersects(far)


def test_polyline_subsample():
    # nearly-collinear chain collapses to endpoints at coarse tolerance
    pl = Polyline.from_text("0:0, 0.01:10, -0.01:20, 0:30")
    idx = pl.subsample_vertices(math.radians(1.0))
    assert idx[0] == 0 and idx[-1] == 3
    assert len(idx) == 2
    # zero tolerance keeps everything
    idx_all = pl.subsample_vertices(0.0)
    assert idx_all == [0, 1, 2, 3]


def test_earth_conversions():
    km = km_between_latlng_deg(0.0, 0.0, 0.0, 90.0)
    assert abs(km - math.pi / 2 * 6371.01) < 1e-6
    assert abs(float(angle_from_km(6371.01)) - 1.0) < 1e-12

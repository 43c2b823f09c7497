"""Exact RectBounder vs dense-sampling oracle (strategy of
s2/rect_bounder_test.go: the bound must contain the latitudes and
longitudes of all points along each edge, within the documented
error)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.distance import interpolate
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.rect_bounder import RectBounder, rect_bound_of_chain

from tests.corpus import LOOP_TEXTS, make_loop

RNG = np.random.default_rng(88)


def _edge_bound(a, b):
    rb = RectBounder()
    rb.add_point(a)
    rb.add_point(b)
    return rb.rect_bound()


def _in_bound(bound, lat, lng, tol=1e-9):
    lat_lo, lat_hi, lng_lo, lng_hi = bound
    if not (lat_lo - tol <= lat <= lat_hi + tol):
        return False
    if lng == -math.pi:  # s1 normalization: -pi == +pi
        lng = math.pi
    if lng_lo <= lng_hi:
        return lng_lo - tol <= lng <= lng_hi + tol
    return lng >= lng_lo - tol or lng <= lng_hi + tol


def test_edge_bounds_contain_dense_samples():
    for _ in range(200):
        a = RNG.normal(size=3)
        a /= np.linalg.norm(a)
        b = RNG.normal(size=3)
        b /= np.linalg.norm(b)
        bound = _edge_bound(tuple(a), tuple(b))
        for t in np.linspace(0, 1, 64):
            p = interpolate(a, b, float(t))
            lat = math.asin(max(-1, min(1, float(p[2]))))
            lng = math.atan2(float(p[1]), float(p[0]))
            assert _in_bound(bound, lat, lng), (a, b, t)


def test_high_latitude_edge_bulge():
    """An east-west edge at high latitude bulges poleward between its
    endpoints; the bound must include the bulge."""
    a = tuple(float(v) for v in latlng_deg_to_xyz(80.0, -90.0))
    b = tuple(float(v) for v in latlng_deg_to_xyz(80.0, 90.0))
    bound = _edge_bound(a, b)
    # this edge passes exactly over the pole region: max latitude 90
    assert bound[1] >= math.radians(89.9)


def test_nearly_identical_and_antipodal():
    a = tuple(float(v) for v in latlng_deg_to_xyz(10.0, 10.0))
    a2 = tuple(np.asarray(a) + 1e-18)
    bound = _edge_bound(a, a2)
    assert _in_bound(bound, math.radians(10.0), math.radians(10.0))
    anti = tuple(-v for v in a)
    bound2 = _edge_bound(a, anti)
    assert bound2[0] == -math.pi / 2 and bound2[1] == math.pi / 2  # full


def test_loop_bounds_contain_edge_samples():
    for name in sorted(LOOP_TEXTS):
        if name == "skinnyChevron":
            continue  # denormal vertices
        loop = make_loop(name)
        bound = loop.rect_bound()
        n = len(loop.vertices)
        for i in range(n):
            a = np.asarray(loop.vertices[i])
            b = np.asarray(loop.vertices[(i + 1) % n])
            for t in np.linspace(0, 1, 16):
                p = interpolate(a, b, float(t))
                lat = math.asin(max(-1, min(1, float(p[2]))))
                lng = math.atan2(float(p[1]), float(p[0]))
                assert _in_bound(bound, lat, lng), (name, i, t)


def test_loop_bound_tighter_or_equal_for_small_loops():
    """The exact bounder should produce tight bounds: a small diamond's
    bound should not exceed its vertex extent by more than the edge
    bulge (here ~1e-5 rad for 1-degree edges at low latitude)."""
    loop = make_loop("loopA")  # diamond at the equator near lng 180
    lat_lo, lat_hi, lng_lo, lng_hi = loop.rect_bound()
    assert abs(lat_hi - math.radians(1.0)) < 1e-4
    assert abs(lat_lo + math.radians(1.0)) < 1e-4
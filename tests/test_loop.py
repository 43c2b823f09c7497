"""Loop containment semantics, mirroring s2/loop_test.go
(TestLoopContainsPoint :395, area/turning consistency :1586-1750) over
the ported corpus.  No Ray.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.loop import Loop

from tests.corpus import LOOP_TEXTS, make_loop

RNG = np.random.default_rng(11)


def pt(lat, lng):
    x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
    return (float(x), float(y), float(z))


NORTH_POLE = (0.0, 0.0, 1.0)
SOUTH_POLE = (0.0, 0.0, -1.0)


def test_empty_full():
    e, f = make_loop("empty"), make_loop("full")
    assert e.is_empty() and not e.is_full()
    assert f.is_full() and not f.is_empty()
    for p in (NORTH_POLE, SOUTH_POLE, pt(42, 42)):
        assert not e.contains_point(p)
        assert f.contains_point(p)
    assert e.invert().is_full()
    assert f.invert().is_empty()


def test_hemispheres():
    north = make_loop("northHemi")
    south = make_loop("southHemi")
    west = make_loop("westHemi")
    east = make_loop("eastHemi")
    assert north.contains_point(NORTH_POLE)
    assert not north.contains_point(SOUTH_POLE)
    assert south.contains_point(SOUTH_POLE)
    assert not south.contains_point(NORTH_POLE)
    assert west.contains_point(pt(0, -90))
    assert not west.contains_point(pt(0, 90))
    assert east.contains_point(pt(0, 90))
    assert not east.contains_point(pt(0, -90))
    # north/south partition the sphere (away from the shared boundary)
    for _ in range(200):
        p = pt(RNG.uniform(-80, 80), RNG.uniform(-180, 180))
        assert north.contains_point(p) != south.contains_point(p)


def test_pole_loops():
    arctic = make_loop("arctic80")
    antarctic = make_loop("antarctic80")
    assert arctic.contains_point(NORTH_POLE)
    assert not arctic.contains_point(SOUTH_POLE)
    assert antarctic.contains_point(SOUTH_POLE)
    assert not antarctic.contains_point(NORTH_POLE)
    assert arctic.contains_point(pt(85, 20))
    assert not arctic.contains_point(pt(75, 20))


def test_clockwise_loop_is_inverted():
    """smallNECW is clockwise: it contains everything EXCEPT its
    small interior (s2/loop_test.go semantics)."""
    sne = make_loop("smallNECW")
    assert sne.contains_point(pt(0, 0))
    assert sne.contains_point(SOUTH_POLE)
    assert not sne.contains_point(pt(40, 22))
    assert sne.area() > 2 * math.pi


def test_diamond_family():
    a = make_loop("loopA")
    b = make_loop("loopB")
    a_and_b = make_loop("aIntersectB")
    a_or_b = make_loop("aUnionB")
    a_minus_b = make_loop("aMinusB")
    probes = [pt(la, ln) for la in np.linspace(-0.9, 0.9, 7)
              for ln in list(np.linspace(178.2, 180, 4)) +
              list(np.linspace(-180, -178.2, 4))]
    for p in probes:
        ia, ib = a.contains_point(p), b.contains_point(p)
        assert a_and_b.contains_point(p) == (ia and ib)
        assert a_or_b.contains_point(p) == (ia or ib)
        assert a_minus_b.contains_point(p) == (ia and not ib)


def test_batch_matches_scalar_everywhere():
    lats = RNG.uniform(-89.9, 89.9, 400)
    lngs = RNG.uniform(-180, 180, 400)
    x, y, z = latlng_deg_to_xyz(lats, lngs)
    pts = np.stack([x, y, z], axis=1)
    for name in LOOP_TEXTS:
        if name == "skinnyChevron":
            continue  # denormal vertices; exercised separately below
        loop = make_loop(name)
        vb = loop.contains_points_batch(pts)
        vs = np.array([loop.contains_point(tuple(p)) for p in pts])
        assert (vb == vs).all(), name


def test_degenerate_loops():
    line = make_loop("lineTriangle")
    chevron = make_loop("skinnyChevron")
    # Degenerate loops have (near-)zero area and contain (almost)
    # nothing off their boundary.
    assert line.area() < 1e-10
    assert chevron.area() < 1e-10
    assert not line.contains_point(pt(10, 2))
    assert not chevron.contains_point(pt(10, 40))


def test_area_consistency():
    """area == 2*pi - turning_angle within tolerance, and hemisphere
    areas are 2*pi (s2/loop_test.go:1586-1650)."""
    for name in ("northHemi", "southHemi", "westHemi", "eastHemi"):
        assert abs(make_loop(name).area() - 2 * math.pi) < 1e-9, name
    arctic = make_loop("arctic80")
    # spherical cap at 80N has area 2*pi*(1-sin(80)); the triangle loop
    # inscribed in it is smaller
    cap_area = 2 * math.pi * (1 - math.sin(math.radians(80)))
    assert 0 < arctic.area() < cap_area


def test_origin_inside_consistency():
    """For every corpus loop, vertex 1's immediate-interior test must
    agree with containment (the initOriginAndBound construction,
    s2/loop.go:132-166)."""
    for name in LOOP_TEXTS:
        loop = make_loop(name)
        inv = loop.invert()
        for p in (NORTH_POLE, pt(12.3, 45.6), pt(-55, 170)):
            assert loop.contains_point(p) != inv.contains_point(p), name


def test_rect_bound_contains_loop_points():
    for name in ("loopA", "arctic80", "candyCane", "loopE"):
        loop = make_loop(name)
        lat_lo, lat_hi, lng_lo, lng_hi = loop.rect_bound()
        # all vertices within bound
        for v in loop.vertices:
            lat = math.asin(max(-1, min(1, v[2])))
            lng = math.atan2(v[1], v[0])
            assert lat_lo - 1e-9 <= lat <= lat_hi + 1e-9, name
            if lng_lo <= lng_hi:
                assert lng_lo - 1e-9 <= lng <= lng_hi + 1e-9, name
        # random interior points within bound
        cap = loop.cap_bound()
        for _ in range(100):
            p = pt(RNG.uniform(-89, 89), RNG.uniform(-180, 180))
            if loop.contains_point(p):
                assert cap.contains_point(p), name

"""Rect.Union / Intersection / Contains / Intersects — the ported
TestRectIntervalOps table (s2/rect_test.go:416-545) plus the
degree-domain s1.Interval algebra it rides on."""

from __future__ import annotations

import pytest

from geo_ray.state.rect import (Rect, s1_interval_from_endpoints,
                                _s1_intersection, _s1_union)


def rfd(lat_lo, lng_lo, lat_hi, lng_hi) -> Rect:
    """rectFromDegrees (s2/rect_test.go:89-102): the lng pair goes
    through IntervalFromEndpoints normalization (-180 -> +180)."""
    lo, hi = s1_interval_from_endpoints(float(lng_lo), float(lng_hi))
    return Rect(float(lat_lo), float(lat_hi), lo, hi)


def _tup(r: Rect):
    return (r.lat_lo, r.lat_hi, r.lng_lo, r.lng_hi)


RECT = rfd(0, -180, 90, 0)       # one quarter of the sphere
RECT_MID = rfd(45, -90, 45, -90)
RECT_180 = rfd(0, -180, 0, -180)
NORTH_POLE = rfd(90, 0, 90, 0)

CASES = [
    # rect, other, contains, intersects, union, intersection
    (RECT, RECT_MID, True, True, RECT, RECT_MID),
    (RECT, RECT_180, True, True, RECT, RECT_180),
    (RECT, NORTH_POLE, True, True, RECT, NORTH_POLE),
    (RECT, rfd(-10, -1, 1, 20), False, True,
     rfd(-10, 180, 90, 20), rfd(0, -1, 1, 0)),
    (RECT, rfd(-10, -1, 0, 20), False, True,
     rfd(-10, 180, 90, 20), rfd(0, -1, 0, 0)),
    (RECT, rfd(-10, 0, 1, 20), False, True,
     rfd(-10, 180, 90, 20), rfd(0, 0, 1, 0)),
    (rfd(-15, -160, -15, -150), rfd(20, 145, 25, 155), False, False,
     rfd(-15, 145, 25, -150), Rect.empty()),
    (rfd(70, -10, 90, -140), rfd(60, 175, 80, 5), False, True,
     rfd(60, -180, 90, 180), rfd(70, 175, 80, 5)),
    # overlap in latitude but not longitude, and vice versa
    (rfd(12, 30, 60, 60), rfd(0, 0, 30, 18), False, False,
     rfd(0, 0, 60, 60), Rect.empty()),
    (rfd(0, 0, 18, 42), rfd(30, 12, 42, 60), False, False,
     rfd(0, 0, 42, 60), Rect.empty()),
]


@pytest.mark.parametrize("rect,other,contains,intersects,union,inter",
                         CASES)
def test_rect_interval_ops(rect, other, contains, intersects, union, inter):
    assert rect.contains_rect(other) == contains
    assert rect.intersects_rect(other) == intersects
    got_u = rect.union(other)
    assert _tup(got_u) == _tup(union), f"union {_tup(got_u)}"
    got_i = rect.intersection(other)
    if inter.is_empty():
        assert got_i.is_empty()
    else:
        assert _tup(got_i) == _tup(inter), f"intersection {_tup(got_i)}"
    # the reference's consistency checks (rect_test.go:526-534)
    assert ((_tup(got_u) == _tup(rect)) == contains)
    assert (got_i.is_empty() != intersects)


def test_union_with_empty_identity():
    r = rfd(10, 20, 30, 40)
    assert _tup(r.union(Rect.empty())) == _tup(r)
    assert _tup(Rect.empty().union(r)) == _tup(r)
    assert Rect.empty().intersection(r).is_empty()
    assert r.intersection(Rect.empty()).is_empty()


def test_s1_union_disjoint_picks_closer_bridge():
    # disjoint intervals: the union bridges the closer endpoint pair
    a = s1_interval_from_endpoints(10.0, 20.0)
    b = s1_interval_from_endpoints(170.0, -170.0)  # wraps
    got = _s1_union(a, b)
    # closer gap is 20 -> 170 (150 deg) vs -170 -> 10 (180 deg)
    assert got == (10.0, -170.0)
    assert _s1_intersection(a, b) == (180.0, -180.0)


def test_rect_union_intersection_properties():
    """Randomized containment properties of the ported algebra:
    union contains both operands, intersection is contained in both,
    and point membership respects both (the s1.Interval invariants,
    sampled over lat/lng points incl. antimeridian wraps)."""
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(300):
        def rand_rect():
            lat = np.sort(rng.uniform(-90, 90, 2))
            lo, hi = rng.uniform(-180, 180, 2)
            if rng.random() < 0.3:
                lo, hi = hi, lo  # force a wrap sometimes
            return rfd(lat[0], lo, lat[1], hi)

        a, b = rand_rect(), rand_rect()
        u = a.union(b)
        it = a.intersection(b)
        assert u.contains_rect(a) and u.contains_rect(b), \
            (_tup(a), _tup(b), _tup(u))
        # NOTE: intersection is the smallest rect CONTAINING the
        # intersection region — when the lng intersection has two
        # disjoint pieces the result spans both and need not be
        # contained in either operand (s2/rect.go:206-210), so only
        # the point-membership direction is asserted:
        # in-both => in-intersection; in-either => in-union
        lats = rng.uniform(-90, 90, 24)
        lngs = rng.uniform(-180, 180, 24)
        for lat, lng in zip(lats, lngs):
            ina = a.contains_latlng(lat, lng)
            inb = b.contains_latlng(lat, lng)
            if ina and inb:
                assert it.contains_latlng(lat, lng)
            if ina or inb:
                assert u.contains_latlng(lat, lng)


def test_s1_interval_operations_reference_table():
    """The Union/Intersection columns of the reference's
    TestIntervalOperations table (s1/interval_test.go:231-395),
    ported to the degree domain (pi == 180; the mid* intervals use
    1- and 2-degree offsets, preserving the 'center slightly CCW of
    the midpoint' structure the disjoint-union cases rely on)."""
    from geo_ray.state.rect import (_s1_intersection, _s1_union,
                                    s1_interval_from_endpoints as fe)

    empty = (180.0, -180.0)
    full = (-180.0, 180.0)
    zero = fe(0, 0)
    pi2 = fe(90, 90)
    pi = fe(180, 180)
    mipi = fe(-180, -180)           # normalizes to (180, 180)
    mipi2 = fe(-90, -90)
    quad1 = fe(0, 90)
    quad2 = fe(90, -180)
    quad3 = fe(180, -90)
    quad4 = fe(-90, 0)
    quad12 = fe(0, -180)
    quad23 = fe(90, -90)
    quad34 = fe(-180, 0)
    quad123 = fe(0, -90)
    quad234 = fe(90, 0)
    mid12 = fe(90 - 1, 90 + 2)
    mid23 = fe(180 - 1, -180 + 2)
    mid34 = fe(-90 - 1, -90 + 2)
    mid41 = fe(-1, 2)

    quad12eps = fe(quad12[0], mid23[1])
    quad2hi = fe(mid23[0], quad12[1])
    quad412eps = fe(mid34[0], quad12[1])
    quadeps12 = fe(mid41[0], quad12[1])
    quad1lo = fe(quad12[0], mid41[1])
    quad2lo = fe(quad23[0], mid12[1])
    quad3hi = fe(mid34[0], quad23[1])
    quadeps23 = fe(mid12[0], quad23[1])
    quad23eps = fe(quad23[0], mid34[1])
    quadeps123 = fe(mid41[0], quad23[1])

    cases = [
        (empty, empty, empty, empty),
        (empty, full, full, empty),
        (empty, zero, zero, empty),
        (empty, pi, pi, empty),
        (empty, mipi, mipi, empty),
        (full, empty, full, empty),
        (full, full, full, full),
        (full, zero, full, zero),
        (full, pi, full, pi),
        (full, mipi, full, mipi),
        (full, quad12, full, quad12),
        (full, quad23, full, quad23),
        (zero, empty, zero, empty),
        (zero, full, full, zero),
        (zero, zero, zero, zero),
        (zero, pi, fe(0, 180), empty),
        (zero, pi2, quad1, empty),
        (zero, mipi, quad12, empty),
        (zero, mipi2, quad4, empty),
        (zero, quad12, quad12, zero),
        (zero, quad23, quad123, empty),
        (pi2, empty, pi2, empty),
        (pi2, full, full, pi2),
        (pi2, zero, quad1, empty),
        (pi2, pi, fe(90, 180), empty),
        (pi2, pi2, pi2, pi2),
        (pi2, mipi, quad2, empty),
        (pi2, mipi2, quad23, empty),
        (pi2, quad12, quad12, pi2),
        (pi2, quad23, quad23, pi2),
        (pi, empty, pi, empty),
        (pi, full, full, pi),
        (pi, zero, fe(180, 0), empty),
        (pi, pi, pi, pi),
        (pi, pi2, fe(90, 180), empty),
        (pi, mipi, pi, pi),
        (pi, mipi2, quad3, empty),
        (pi, quad12, fe(0, 180), pi),
        (pi, quad23, quad23, pi),
        (mipi, empty, mipi, empty),
        (mipi, full, full, mipi),
        (mipi, zero, quad34, empty),
        (mipi, pi, mipi, mipi),
        (mipi, pi2, quad2, empty),
        (mipi, mipi, mipi, mipi),
        (mipi, mipi2, fe(-180, -90), empty),
        (mipi, quad12, quad12, mipi),
        (mipi, quad23, quad23, mipi),
        (quad12, empty, quad12, empty),
        (quad12, full, full, quad12),
        (quad12, zero, quad12, zero),
        (quad12, pi, quad12, pi),
        (quad12, mipi, quad12, mipi),
        (quad12, quad12, quad12, quad12),
        (quad12, quad23, quad123, quad2),
        (quad12, quad34, full, quad12),
        (quad23, empty, quad23, empty),
        (quad23, full, full, quad23),
        (quad23, zero, quad234, empty),
        (quad23, pi, quad23, pi),
        (quad23, mipi, quad23, mipi),
        (quad23, quad12, quad123, quad2),
        (quad23, quad23, quad23, quad23),
        (quad23, quad34, quad234, fe(-180, -90)),
        (quad1, quad23, quad123, fe(90, 90)),
        (quad2, quad3, quad23, mipi),
        (quad3, quad2, quad23, pi),
        (quad2, pi, quad2, pi),
        (quad2, mipi, quad2, mipi),
        (quad3, pi, quad3, pi),
        (quad3, mipi, quad3, mipi),
        (quad12, mid12, quad12, mid12),
        (mid12, quad12, quad12, mid12),
        (quad12, mid23, quad12eps, quad2hi),
        (mid23, quad12, quad12eps, quad2hi),
        (quad12, mid34, quad412eps, empty),
        (mid34, quad12, quad412eps, empty),
        (quad12, mid41, quadeps12, quad1lo),
        (mid41, quad12, quadeps12, quad1lo),
        (quad23, mid12, quadeps23, quad2lo),
        (mid12, quad23, quadeps23, quad2lo),
        (quad23, mid23, quad23, mid23),
        (mid23, quad23, quad23, mid23),
        (quad23, mid34, quad23eps, quad3hi),
        (mid34, quad23, quad23eps, quad3hi),
        (quad23, mid41, quadeps123, empty),
        (mid41, quad23, quadeps123, empty),
    ]
    for i, (x, y, want_u, want_i) in enumerate(cases):
        assert _s1_union(x, y) == want_u, (i, x, y, _s1_union(x, y))
        assert _s1_intersection(x, y) == want_i, \
            (i, x, y, _s1_intersection(x, y))

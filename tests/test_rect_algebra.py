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

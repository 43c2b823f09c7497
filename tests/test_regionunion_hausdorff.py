"""RegionUnion coverings and Hausdorff distances."""

from __future__ import annotations

import math

import numpy as np

from geo_ray.functions.distance import (directed_hausdorff_chord2,
                                        hausdorff_chord2)
from geo_ray.functions.latlng import (angle_to_chord2, chord2_to_angle,
                                      latlng_deg_to_xyz)
from geo_ray.state.cap import Cap
from geo_ray.state.coverer import RegionCoverer
from geo_ray.state.regionunion import RegionUnion

from tests.test_covering import check_covering


def test_region_union_covering():
    caps = [Cap.from_latlng_deg(10.0, 10.0, math.radians(1.0)),
            Cap.from_latlng_deg(-20.0, 120.0, math.radians(2.0))]
    union = RegionUnion(caps)
    rc = RegionCoverer(max_cells=16, max_level=12)
    covering = rc.covering(union)
    check_covering(rc, union, covering, False)
    # both member centers are covered
    from geo_ray.state import cellunion as cu
    from geo_ray.functions import cellid as cid
    norm = cu.normalize(covering)
    for cap in caps:
        leaf = cid.cell_id_from_point(*cap.center)
        assert cu.contains_cell_id(norm, leaf)


def test_region_union_predicates():
    caps = [Cap.from_latlng_deg(0.0, 0.0, math.radians(5.0)),
            Cap.from_latlng_deg(0.0, 90.0, math.radians(5.0))]
    union = RegionUnion(caps)
    p1 = tuple(float(v) for v in latlng_deg_to_xyz(0.0, 2.0))
    p2 = tuple(float(v) for v in latlng_deg_to_xyz(0.0, 88.0))
    p3 = tuple(float(v) for v in latlng_deg_to_xyz(45.0, 45.0))
    assert union.contains_point(p1)
    assert union.contains_point(p2)
    assert not union.contains_point(p3)
    assert union.cap_bound().contains_point(p1)
    assert union.cap_bound().contains_point(p2)


def test_directed_hausdorff():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-10, 10, 200)
    lng = rng.uniform(-10, 10, 200)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    A = np.stack([x, y, z], axis=1)
    # B = A shifted by 5 degrees in longitude
    x2, y2, z2 = latlng_deg_to_xyz(lat, lng + 5.0)
    B = np.stack([x2, y2, z2], axis=1)
    d_ab = directed_hausdorff_chord2(A, B)
    # every point has a neighbor within ~5 degrees (its own shifted copy)
    assert d_ab <= float(angle_to_chord2(math.radians(5.01)))
    # a far singleton dominates the symmetric distance
    far = np.asarray([latlng_deg_to_xyz(60.0, 100.0)], dtype=float).reshape(1, 3)
    d_sym = hausdorff_chord2(A, np.vstack([B, far]))
    assert float(chord2_to_angle(d_sym)) > math.radians(30)
    # identity (2-2*dot rounds at ~1e-15 for unit vectors)
    assert hausdorff_chord2(A, A) < 1e-14


# -- closed-form Rect Hausdorff (s2/rect.go:469-653) ------------------------

import math as _math

from geo_ray.state.rect import Rect as _Rect


def _rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    """reference rectFromDegrees argument order, lngs normalized to
    [-180, 180] (same point set; our Rect stores normalized degrees)."""
    def norm(x):
        while x > 180.0:
            x -= 360.0
        while x < -180.0:
            x += 360.0
        return x
    return _Rect(lat_lo, lat_hi, norm(lng_lo), norm(lng_hi))


def _verify_directed_hausdorff(a: _Rect, b: _Rect):
    """Port of verifyDirectedHausdorffDistance (s2/rect_test.go:956-994):
    grid-sample a, take max of b.DistanceToLatLng, require
    sample_max - 1e-10 <= closed_form <= sample_max + resolution."""
    res = 0.1
    lat_len = _math.radians(a.lat_hi - a.lat_lo)
    if a.lng_lo <= a.lng_hi:
        lng_len = _math.radians(a.lng_hi - a.lng_lo)
    else:
        lng_len = _math.radians(a.lng_hi + 360.0 - a.lng_lo)
    n_lat = int(lat_len / res) + 1
    n_lng = int(lng_len / res) + 1
    d_lat = _math.degrees(lat_len) / n_lat
    d_lng = _math.degrees(lng_len) / n_lng
    max_d = 0.0
    for i in range(n_lng + 1):
        lng = a.lng_lo + i * d_lng
        if lng > 180.0:
            lng -= 360.0
        for j in range(n_lat + 1):
            lat = min(90.0, a.lat_lo + j * d_lat)
            max_d = max(max_d, b.distance_to_latlng(lat, lng))
    got = a.directed_hausdorff_distance(b)
    assert got >= max_d - 1e-10, (got, max_d)
    assert got <= max_d + res, (got, max_d)


def test_hausdorff_contained():
    a = _rect_deg(-10, 20, -5, 90)
    for t in (_rect_deg(-10, 20, -5, 90), _rect_deg(-10, 19, -5, 91),
              _rect_deg(-11, 20, -4, 90), _rect_deg(-11, 19, -4, 91)):
        assert a.directed_hausdorff_distance(t) == 0.0


def test_hausdorff_point_to_rect():
    # distance from a point-rect equals DistanceToLatLng
    for (lat, lng) in ((5, 8), (90, 10)):
        a = _Rect(lat, lat, lng, lng)
        for b in (_rect_deg(-85, -50, -80, 10), _rect_deg(4, -10, 80, 10),
                  _rect_deg(70, 170, 80, -170)):
            got = a.directed_hausdorff_distance(b)
            want = b.distance_to_latlng(lat, lng)
            assert abs(got - want) < 1e-12, (got, want)


def test_hausdorff_near_pole():
    a = _rect_deg(-87, 0, -85, 3)
    for b in (_rect_deg(-89, 1, -88, 2), _rect_deg(-84, 1, -83, 2),
              _rect_deg(-88, 90, -86, 91), _rect_deg(-84, -91, -83, -90),
              _rect_deg(-90, 181, -89, 182), _rect_deg(-84, 181, -83, 182)):
        _verify_directed_hausdorff(a, b)


def test_hausdorff_degenerate_cases():
    pairs = [
        (_rect_deg(0, 10, 90, 20), _rect_deg(-4, -10, 4, 0)),
        (_rect_deg(-4, -10, 4, 0), _rect_deg(0, 10, 90, 20)),
        (_rect_deg(-50, -10, 50, 10), _rect_deg(30, -10, 60, 10)),
        # complement lng of a vs b
        (_Rect(-50, 50, 10, -10), _rect_deg(30, -10, 60, 10)),
        (_rect_deg(10, 170, 30, 180), _rect_deg(-50, -10, 50, 10)),
        (_rect_deg(10, -180, 30, -170), _rect_deg(-50, -10, 50, 10)),
        (_rect_deg(-30, 170, 30, 180), _rect_deg(-10, -90, 10, 90)),
        (_rect_deg(-30, -180, 30, -170), _rect_deg(-10, -90, 10, 90)),
    ]
    for a, b in pairs:
        _verify_directed_hausdorff(a, b)


def test_hausdorff_random_pairs():
    rng = np.random.default_rng(11)

    def rand_rect():
        p = rng.normal(size=(2, 3))
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        lats = np.degrees(np.arcsin(np.clip(p[:, 2], -1, 1)))
        lngs = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
        lat_lo, lat_hi = sorted(lats)
        # minimal lng interval containing both points
        lo, hi = lngs
        span = (hi - lo) % 360.0
        if span <= 180.0:
            return _Rect(lat_lo, lat_hi, lo, hi if span else lo)
        return _Rect(lat_lo, lat_hi, hi, lo)

    for _ in range(60):
        a, b = rand_rect(), rand_rect()
        a2 = _Rect(a.lat_lo, a.lat_hi, a.lng_hi, a.lng_lo)  # lng complement
        b2 = _Rect(b.lat_lo, b.lat_hi, b.lng_hi, b.lng_lo)
        _verify_directed_hausdorff(a, b)
        _verify_directed_hausdorff(a2, b)
        _verify_directed_hausdorff(a, b2)
        _verify_directed_hausdorff(a2, b2)


def test_hausdorff_symmetric_upper_bounds():
    a = _rect_deg(-20, -20, 20, 20)
    b = _rect_deg(30, 100, 40, 140)
    h_ab = a.directed_hausdorff_distance(b)
    h_ba = b.directed_hausdorff_distance(a)
    assert a.hausdorff_distance(b) == max(h_ab, h_ba)
    assert b.hausdorff_distance(a) == a.hausdorff_distance(b)

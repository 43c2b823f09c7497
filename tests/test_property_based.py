"""Hypothesis property tests over the kernel layer: encode/decode
round trips, hierarchy algebra, normalization idempotence, token
codecs, chord distance identities."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import (angle_to_chord2, chord2,
                                      chord2_to_angle, latlng_deg_to_xyz)
from geo_ray.state import cellunion as cu

lat_st = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
level_st = st.integers(min_value=0, max_value=30)


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st)
def test_latlng_cell_roundtrip(lat, lng):
    ci = cid.cell_id_from_latlng(lat, lng)
    assert cid.is_valid(ci)
    assert cid.is_leaf(ci)
    f, i, j, _ = cid.face_ij_orientation(ci)
    assert cid.cell_id_from_face_ij(f, i, j) == ci
    # center maps back into the same leaf
    x, y, z = cid.cell_id_to_point(ci)
    assert cid.cell_id_from_point(x, y, z) == ci


@settings(max_examples=200, deadline=None)
@given(lat_st, lng_st, level_st)
def test_parent_token_roundtrip(lat, lng, level):
    ci = cid.parent(cid.cell_id_from_latlng(lat, lng), level)
    assert cid.level(ci) == level
    assert cid.from_token(cid.token(ci)) == ci
    assert cid.from_string(cid.to_string(ci)) == ci
    assert cid.range_min(ci) <= ci <= cid.range_max(ci)
    if level > 0:
        p = cid.immediate_parent(ci)
        assert cid.level(p) == level - 1
        assert cid.contains(p, ci)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(lat_st, lng_st, level_st), min_size=1, max_size=12))
def test_normalize_idempotent_and_covering(cells):
    ids = [cid.parent(cid.cell_id_from_latlng(la, ln), lv)
           for la, ln, lv in cells]
    norm = cu.normalize(ids)
    assert cu.normalize(norm) == norm
    # normalization preserves the leaf set
    for ci in ids:
        assert cu.contains_cell_id(norm, cid.range_min(ci))
        assert cu.contains_cell_id(norm, cid.range_max(ci))
    # sorted and disjoint
    for a, b in zip(norm, norm[1:]):
        assert cid.range_max(a) < cid.range_min(b)


@settings(max_examples=100, deadline=None)
@given(lat_st, lng_st, lat_st, lng_st)
def test_chord_distance_identities(lat1, lng1, lat2, lng2):
    x1, y1, z1 = latlng_deg_to_xyz(np.float64(lat1), np.float64(lng1))
    x2, y2, z2 = latlng_deg_to_xyz(np.float64(lat2), np.float64(lng2))
    c2 = float(chord2(x1, y1, z1, x2, y2, z2))
    assert 0.0 <= c2 <= 4.0 + 1e-12
    ang = float(chord2_to_angle(c2))
    assert 0.0 <= ang <= math.pi + 1e-12
    # round trip angle -> chord2 -> angle
    back = float(angle_to_chord2(ang))
    assert abs(back - min(c2, 4.0)) < 1e-12
    # symmetry
    assert c2 == float(chord2(x2, y2, z2, x1, y1, z1))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**61 - 1))
def test_token_parse_never_crashes(v):
    # arbitrary ids: token/from_token total functions
    tok = cid.token(v)
    assert isinstance(tok, str)
    got = cid.from_token(tok)
    assert got == v or v == 0

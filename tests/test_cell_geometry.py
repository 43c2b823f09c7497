"""Cell bounds/distances, Advance/AdvanceWrap, expandedByDistanceUV,
frames/rotation, polygon centroid/relations."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.frames import (from_frame, get_frame, rotate,
                                      rotate_batch, to_frame)
from geo_ray.functions.latlng import chord2_to_angle, latlng_deg_to_xyz
from geo_ray.state.cell import Cell
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

RNG = np.random.default_rng(55)


def rand_cells(n, level):
    lat = RNG.uniform(-85, 85, n)
    lng = RNG.uniform(-180, 180, n)
    return [Cell(cid.parent(cid.cell_id_from_latlng(la, ln), level))
            for la, ln in zip(lat, lng)]


def test_cell_rect_bound_contains_samples():
    for cell in rand_cells(20, 6) + rand_cells(10, 12) + \
            [Cell(cid.parent(cid.cell_id_from_face_ij(f, 0, 0), 0))
             for f in range(6)]:
        lat_lo, lat_hi, lng_lo, lng_hi = cell.rect_bound()
        # sample interior points: vertices and center
        pts = cell.vertices() + [cell.center()]
        for p in pts:
            lat = math.asin(max(-1, min(1, p[2])))
            lng = math.atan2(p[1], p[0])
            assert lat_lo - 1e-12 <= lat <= lat_hi + 1e-12
            if lng_lo <= lng_hi:
                assert lng_lo - 1e-9 <= lng <= lng_hi + 1e-9
            else:
                assert lng >= lng_lo - 1e-9 or lng <= lng_hi + 1e-9


def test_cell_cap_bound_contains_cell():
    for cell in rand_cells(30, 8):
        cap = cell.cap_bound()
        for p in cell.vertices() + [cell.center()]:
            assert cap.contains_point(p)


def test_cell_distance_vs_brute():
    from geo_ray.functions.distance import chord2_point_edge
    for cell in rand_cells(10, 7):
        for _ in range(10):
            p = RNG.normal(size=3)
            p /= np.linalg.norm(p)
            got = cell.distance_chord2(tuple(p))
            if cell.contains_point(tuple(p)):
                assert got == 0.0
                continue
            verts = cell.vertices()
            want = min(float(chord2_point_edge(p, np.asarray(verts[k]),
                                               np.asarray(verts[(k + 1) & 3])))
                       for k in range(4))
            assert abs(got - want) < 1e-14
            # max distance >= min distance, antipode containment -> 4
            assert cell.max_distance_chord2(tuple(p)) >= got


def test_cell_to_cell_distance():
    a = Cell(cid.parent(cid.cell_id_from_latlng(10.0, 10.0), 8))
    b = Cell(cid.parent(cid.cell_id_from_latlng(10.0, 10.001), 8))
    far = Cell(cid.parent(cid.cell_id_from_latlng(-40.0, 150.0), 8))
    assert a.distance_to_cell_chord2(a) == 0.0
    d_near = a.distance_to_cell_chord2(b)
    d_far = a.distance_to_cell_chord2(far)
    assert d_near < d_far
    assert 0.0 <= d_near
    # distance roughly matches the angular gap between the cells
    assert float(chord2_to_angle(d_far)) > 1.0


def test_advance():
    ci = cid.parent(cid.cell_id_from_latlng(0.0, 0.0), 10)
    assert cid.advance(ci, 0) == ci
    nxt = cid.advance(ci, 1)
    assert nxt == cid.next_cell(ci)
    assert cid.advance(nxt, -1) == ci
    # clamping at the end of the curve
    last_face = cid.parent(cid.cell_id_from_face_ij(5, (1 << 30) - 1,
                                                    (1 << 30) - 1), 10)
    assert cid.advance(last_face, 10 ** 18) >= last_face
    # wrap variant returns a valid cell of the same level
    w = cid.advance_wrap(ci, 6 * 4 ** 10 + 3)  # full loop + 3
    assert cid.level(w) == 10
    assert cid.advance_wrap(w, -3) == ci


def test_expanded_by_distance_uv():
    from geo_ray.functions.cellid import expanded_by_distance_uv
    u_lo, u_hi, v_lo, v_hi = -0.2, 0.3, -0.1, 0.4
    e = expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, 0.01)
    assert e[0] < u_lo and e[1] > u_hi and e[2] < v_lo and e[3] > v_hi
    # zero distance is identity-ish
    z = expanded_by_distance_uv(u_lo, u_hi, v_lo, v_hi, 0.0)
    assert np.allclose(z, (u_lo, u_hi, v_lo, v_hi))


def test_frames():
    for _ in range(20):
        z = RNG.normal(size=3)
        z /= np.linalg.norm(z)
        m = get_frame(z)
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(m) > 0.99
        p = RNG.normal(size=3)
        p /= np.linalg.norm(p)
        assert np.allclose(from_frame(m, to_frame(m, p)), p, atol=1e-12)
        # z maps to the frame's z axis
        assert np.allclose(to_frame(m, z), [0, 0, 1], atol=1e-12)


def test_rotate():
    p = np.array(latlng_deg_to_xyz(0.0, 0.0), dtype=float)
    z = np.array([0.0, 0.0, 1.0])
    q = rotate(p, z, math.pi / 2)
    want = np.array(latlng_deg_to_xyz(0.0, 90.0), dtype=float)
    assert np.allclose(q, want, atol=1e-12)
    pts = RNG.normal(size=(50, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    got = rotate_batch(pts, z, 0.3)
    for i in range(50):
        assert np.allclose(got[i], rotate(pts[i], z, 0.3), atol=1e-12)


def test_polygon_centroid_and_relations():
    shell = Loop.from_text("0:0, 0:10, 10:10, 10:0")
    hole = Loop.from_text("2:2, 2:8, 8:8, 8:2")
    donut = Polygon([shell, hole])
    solid = Polygon([shell])
    small = Polygon([hole])
    # centroid of the symmetric shell points toward its middle
    c = np.asarray(solid.centroid())
    c = c / np.linalg.norm(c)
    lat = math.degrees(math.asin(c[2]))
    lng = math.degrees(math.atan2(c[1], c[0]))
    assert 3 < lat < 7 and 3 < lng < 7
    # area subtraction
    assert donut.area() < solid.area()
    assert abs(donut.area() - (solid.area() - small.area())) < 1e-9
    # polygon relations
    assert solid.contains_polygon(small)
    assert not small.contains_polygon(solid)
    assert solid.intersects_polygon(small)
    assert not donut.contains_polygon(small)
    far = Polygon([Loop.from_text("40:40, 40:50, 50:50, 50:40")])
    assert not solid.intersects_polygon(far)


def test_cell_areas():
    """s2/cell_test.go:340-370: children's exact areas sum to the
    parent's; approx area within a few percent; level-1 exact area is
    1/24 of the sphere; total face areas cover the sphere."""
    # level-1 cell: exactly 1/24 of the sphere by symmetry
    lvl1 = Cell(cid.child_begin(cid.parent(cid.cell_id_from_face_ij(0, 0, 0), 0)))
    assert abs(lvl1.exact_area() - 4 * math.pi / 24) < 1e-9
    for cell in rand_cells(10, 5) + rand_cells(5, 12):
        kids = cell.children()
        exact_sum = sum(k.exact_area() for k in kids)
        approx_sum = sum(k.approx_area() for k in kids)
        assert abs(exact_sum - cell.exact_area()) < 1e-12 * max(
            1.0, cell.exact_area() / 1e-9)
        assert abs(cell.exact_area() - exact_sum) / cell.exact_area() < 1e-6
        assert abs(approx_sum - cell.exact_area()) / cell.exact_area() < 0.04
        assert abs(cell.average_area() - kids[0].average_area() * 4) < 1e-18
    # six faces cover the sphere exactly
    faces = [Cell(cid.parent(cid.cell_id_from_face_ij(f, 0, 0), 0)).exact_area()
             for f in range(6)]
    assert abs(sum(faces) - 4 * math.pi) < 1e-9

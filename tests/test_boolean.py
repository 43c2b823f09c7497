"""Polygon boolean operations vs the reference's own boolean-op corpus
(aIntersectB / aUnionB / aMinusB / bMinusA, s2/loop_test.go:85-94) and
sampled containment equivalence."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.boolean import (polygon_boolean, polygon_complement,
                                   polygon_difference, polygon_intersection,
                                   polygon_symmetric_difference,
                                   polygon_union)
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

from tests.corpus import make_loop

RNG = np.random.default_rng(20260817)


def _rand_pts(n):
    v = RNG.standard_normal((n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _poly(name):
    return Polygon.from_loop(make_loop(name))


def _circle(lat, lng, radius_deg, nv=16):
    c = np.asarray(latlng_deg_to_xyz(lat, lng))
    return Polygon.from_loop(Loop.regular_loop(c, math.radians(radius_deg),
                                               nv))


OP_FNS = {
    "intersection": lambda x, y: x and y,
    "union": lambda x, y: x or y,
    "difference": lambda x, y: x and not y,
    "symmetric_difference": lambda x, y: x != y,
}


def _check_sampled(a, b, n=300):
    pts = _rand_pts(n)
    for op, fn in OP_FNS.items():
        r = polygon_boolean(op, a, b)
        for p in pts:
            t = tuple(p)
            assert r.contains_point(t) == fn(a.contains_point(t),
                                             b.contains_point(t)), (op, t)


# -- reference corpus oracles ----------------------------------------------

def test_corpus_boolean_oracles():
    a = _poly("loopA")
    b = _poly("loopB")
    for op, oracle in [("intersection", "aIntersectB"),
                       ("union", "aUnionB"),
                       ("difference", "aMinusB")]:
        r = polygon_boolean(op, a, b)
        assert len(r.loops) == 1
        assert r.loops[0].boundary_equal(make_loop(oracle)), op
    r = polygon_boolean("difference", b, a)
    assert len(r.loops) == 1
    assert r.loops[0].boundary_equal(make_loop("bMinusA"))


def test_corpus_sampled_equivalence():
    _check_sampled(_poly("loopA"), _poly("loopB"))
    _check_sampled(_poly("westHemi"), _poly("northHemi"))


# -- structural cases -------------------------------------------------------

def test_nested_and_disjoint():
    north = _poly("northHemi")
    arctic = _poly("arctic80")
    antarctic = _poly("antarctic80")
    # nested: intersection == inner, union == outer
    assert abs(polygon_intersection(north, arctic).area()
               - arctic.area()) < 1e-12
    assert abs(polygon_union(north, arctic).area() - north.area()) < 1e-12
    # nested difference has a hole
    d = polygon_difference(north, arctic)
    assert len(d.loops) == 2
    assert abs(d.area() - (north.area() - arctic.area())) < 1e-12
    # disjoint
    assert polygon_intersection(arctic, antarctic).is_empty()
    u = polygon_union(arctic, antarctic)
    assert abs(u.area() - (arctic.area() + antarctic.area())) < 1e-12
    _check_sampled(north, arctic, 150)
    _check_sampled(arctic, antarctic, 150)


def test_self_and_empty_full():
    a = _circle(20.0, 30.0, 10.0)
    full = Polygon([Loop.full()])
    empty = Polygon([Loop.empty()])
    assert abs(polygon_intersection(a, a).area() - a.area()) < 1e-12
    assert abs(polygon_union(a, a).area() - a.area()) < 1e-12
    assert polygon_difference(a, a).is_empty()
    assert polygon_symmetric_difference(a, a).is_empty()
    assert abs(polygon_intersection(a, full).area() - a.area()) < 1e-12
    assert polygon_union(a, full).is_full()
    assert polygon_intersection(a, empty).is_empty()
    assert abs(polygon_union(a, empty).area() - a.area()) < 1e-12
    assert polygon_difference(empty, a).is_empty()


def test_hole_operand():
    big = _circle(20.0, 30.0, 20.0, 16)
    small = _circle(20.0, 30.0, 8.0, 12)
    annulus = polygon_difference(big, small)
    assert len(annulus.loops) == 2
    # a circle crossing both rings of the annulus
    probe = _circle(20.0, 38.0, 9.0, 20)
    _check_sampled(annulus, probe, 250)
    # and one crossing only the outer ring
    probe2 = _circle(20.0, 48.0, 12.0, 20)
    _check_sampled(annulus, probe2, 250)


def test_area_inclusion_exclusion():
    a = _circle(20.0, 30.0, 20.0, 24)
    b = _circle(28.0, 42.0, 15.0, 24)
    u = polygon_union(a, b)
    i = polygon_intersection(a, b)
    assert abs((a.area() + b.area()) - (u.area() + i.area())) < 1e-9
    d = polygon_difference(a, b)
    assert abs(d.area() - (a.area() - i.area())) < 1e-9
    s = polygon_symmetric_difference(a, b)
    assert abs(s.area() - (u.area() - i.area())) < 1e-9


def test_complement():
    north = _poly("northHemi")
    c = polygon_complement(north)
    for p in _rand_pts(200):
        t = tuple(p)
        assert c.contains_point(t) == (not north.contains_point(t))
    assert polygon_complement(Polygon([Loop.full()])).is_empty()
    assert polygon_complement(Polygon([Loop.empty()])).is_full()
    # double complement restores containment
    cc = polygon_complement(c)
    for p in _rand_pts(100):
        t = tuple(p)
        assert cc.contains_point(t) == north.contains_point(t)


def test_random_circle_pairs():
    for trial in range(8):
        la = float(RNG.uniform(-55, 55))
        ln = float(RNG.uniform(-170, 170))
        r1 = float(RNG.uniform(4, 18))
        r2 = float(RNG.uniform(4, 18))
        sep = (r1 + r2) * float(RNG.uniform(0.2, 1.3))
        a = _circle(la, ln, r1, 14)
        b = _circle(la + sep * 0.3, ln + sep * 0.8, r2, 17)
        _check_sampled(a, b, 120)


# -- text round-trip + distributed stage ------------------------------------

def test_polygon_text_roundtrip():
    from geo_ray.stages.overlay import polygon_from_text, polygon_to_text
    big = _circle(20.0, 30.0, 20.0, 16)
    small = _circle(20.0, 30.0, 8.0, 12)
    annulus = polygon_difference(big, small)
    rt = polygon_from_text(polygon_to_text(annulus))
    assert len(rt.loops) == len(annulus.loops)
    for p in _rand_pts(100):
        t = tuple(p)
        assert rt.contains_point(t) == annulus.contains_point(t)
    full = Polygon([Loop.full()])
    assert polygon_from_text(polygon_to_text(full)).is_full()


def test_overlay_stage(ray_session):
    import ray.data as rd

    from geo_ray.stages.overlay import overlay_pairs, polygon_to_text

    rows = []
    for i, (la, ln, sep) in enumerate([(10.0, 40.0, 9.0), (-25.0, 100.0, 4.0),
                                       (35.0, -60.0, 14.0)]):
        a = _circle(la, ln, 8.0, 14)
        b = _circle(la, ln + sep, 7.0, 16)
        rows.append({"pair_id": i, "a": polygon_to_text(a),
                     "b": polygon_to_text(b)})
    out = overlay_pairs(rd.from_items(rows)).to_pandas()
    assert len(out) == 12  # 3 pairs x 4 ops
    for i, (la, ln, sep) in enumerate([(10.0, 40.0, 9.0), (-25.0, 100.0, 4.0),
                                       (35.0, -60.0, 14.0)]):
        a = _circle(la, ln, 8.0, 14)
        b = _circle(la, ln + sep, 7.0, 16)
        sub = out[out["pair_id"] == i].set_index("op")
        i_area = float(sub.loc["intersection", "area"])
        u_area = float(sub.loc["union", "area"])
        assert abs((a.area() + b.area()) - (u_area + i_area)) < 1e-9
        assert abs(float(sub.loc["difference", "area"])
                   - (a.area() - i_area)) < 1e-9


def test_indexed_crossing_discovery_matches_dense():
    """Above _DENSE_PAIR_LIMIT pairs, _split_edges switches to the
    clipped-edge cell index; the candidate set it feeds to the robust
    triage must yield the same crossing pairs as the dense matrices."""
    from geo_ray.state import boolean as bo

    a = _circle(20.0, 30.0, 12.0, 300)
    b = _circle(20.0, 39.0, 11.0, 300)
    edges_a = bo._region_edges(a, False)
    edges_b = bo._region_edges(b, False)
    assert len(edges_a) * len(edges_b) > bo._DENSE_PAIR_LIMIT

    cvs_a, dvs_a = bo._edge_arrays(edges_a)
    cvs_b, dvs_b = bo._edge_arrays(edges_b)
    di, dj = bo._crossing_pairs_dense(cvs_a, dvs_a, cvs_b, dvs_b)
    idx = bo._boundary_edge_index(b)
    ci, cj = bo._crossing_pairs_indexed(cvs_a, dvs_a, idx)
    ii, jj = bo._triage_pairs(cvs_a, dvs_a, cvs_b, dvs_b, ci, cj)
    assert set(zip(di.tolist(), dj.tolist())) == set(zip(ii.tolist(),
                                                         jj.tolist()))
    assert len(di) == 2  # two proper boundary crossings for circle pair

    # and the full op through the indexed path stays correct
    inter = polygon_intersection(a, b)
    assert abs((a.area() + b.area())
               - (polygon_union(a, b).area() + inter.area())) < 1e-9
    for p in _rand_pts(200):
        t = tuple(p)
        assert inter.contains_point(t) == (a.contains_point(t)
                                           and b.contains_point(t))

"""Polygon assembly from unoriented loops, exact distance comparisons,
edge intersection points."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.distance import edge_intersection, chord2_point_edge
from geo_ray.functions.edges import crossing_sign
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.predicates import compare_distance, compare_distances
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon


def pt(lat, lng):
    x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
    return (float(x), float(y), float(z))


def test_from_unoriented_loops_normalizes_holes():
    shell = Loop.from_text("0:0, 0:10, 10:10, 10:0")
    hole_cw = Loop.from_text("2:2, 2:8, 8:8, 8:2").invert()  # clockwise
    poly = Polygon.from_unoriented_loops([shell, hole_cw])
    # hole got re-normalized to CCW and acts as a hole via depth
    assert poly.contains_point(pt(1, 1))
    assert not poly.contains_point(pt(5, 5))
    assert poly.area() < shell.area()


def test_from_unoriented_loops_rejects_crossing():
    a = Loop.from_text("0:0, 0:10, 10:10, 10:0")
    b = Loop.from_text("5:5, 5:15, 15:15, 15:5")
    with pytest.raises(ValueError):
        Polygon.from_unoriented_loops([a, b])


def test_compare_distances_exact():
    x = pt(10, 10)
    a = pt(10, 11)
    b = pt(10, 12)
    assert compare_distances(x, a, b) == -1
    assert compare_distances(x, b, a) == 1
    assert compare_distances(x, a, a) == 0
    # exact tie between symmetric points
    p = pt(0, 0)
    q1 = pt(0, 5)
    q2 = pt(0, -5)
    assert compare_distances(p, q1, q2) == 0
    # compare_distance against a radius; the equality case needs an
    # exactly-representable distance (the comparator is exact, so a
    # float-rounded d2 correctly compares unequal)
    d2 = sum((p[i] - q1[i]) ** 2 for i in range(3))
    assert compare_distance(p, q1, d2 * 1.0000001) == -1
    assert compare_distance(p, q1, d2 * 0.9999999) == 1
    ex, ey = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)
    assert compare_distance(ex, ey, 2.0) == 0


def test_edge_intersection():
    a, b = pt(0, -10), pt(0, 10)     # equator segment
    c, d = pt(-10, 0), pt(10, 0)     # meridian segment
    assert crossing_sign(a, b, c, d) > 0
    x = edge_intersection(a, b, c, d)
    want = np.array(pt(0, 0))
    assert np.allclose(x, want, atol=1e-14)
    # generic crossing: the intersection lies on both edges
    a2, b2 = pt(5, 20), pt(-7, 45)
    c2, d2 = pt(-10, 30), pt(12, 33)
    assert crossing_sign(a2, b2, c2, d2) > 0
    x2 = edge_intersection(a2, b2, c2, d2)
    assert float(chord2_point_edge(x2, np.array(a2), np.array(b2))) < 1e-24
    assert float(chord2_point_edge(x2, np.array(c2), np.array(d2))) < 1e-24

"""ContainsVertexQuery / ContainsPointQuery vs the reference's own
test cases (s2/contains_vertex_query_test.go:23-68,
s2/contains_point_query_test.go:24-140)."""

import numpy as np

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.contains_query import (CLOSED, OPEN, SEMI_OPEN,
                                          ContainsPointQuery,
                                          ContainsVertexQuery)
from geo_ray.state.loop import Loop
from geo_ray.state.polyline import Polyline


def _pt(text):
    lat, lng = (float(t) for t in text.split(":"))
    x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
    return (float(x), float(y), float(z))


def test_vertex_query_undetermined():
    q = ContainsVertexQuery(_pt("1:2"))
    q.add_edge(_pt("3:4"), 1)
    q.add_edge(_pt("3:4"), -1)
    assert q.contains_vertex() == 0


def test_vertex_query_contained_with_duplicates():
    q = ContainsVertexQuery(_pt("0:0"))
    q.add_edge(_pt("3:-3"), -1)
    q.add_edge(_pt("1:-5"), 1)
    q.add_edge(_pt("2:-4"), 1)
    q.add_edge(_pt("1:-5"), -1)
    assert q.contains_vertex() == 1


def test_vertex_query_not_contained_with_duplicates():
    q = ContainsVertexQuery(_pt("1:1"))
    q.add_edge(_pt("1:-5"), 1)
    q.add_edge(_pt("2:-4"), -1)
    q.add_edge(_pt("3:-3"), 1)
    q.add_edge(_pt("1:-5"), -1)
    assert q.contains_vertex() == -1


def test_vertex_query_matches_loop_containment():
    # s2/contains_vertex_query_test.go:58-68
    center = _pt("89:-179")
    loop = Loop.regular_loop(center, np.radians(10.0), 1000)
    n = len(loop.vertices)
    for i in range(1, n + 1):
        q = ContainsVertexQuery(loop.vertices[i % n])
        q.add_edge(loop.vertices[(i - 1) % n], -1)
        q.add_edge(loop.vertices[(i + 1) % n], 1)
        got = q.contains_vertex() > 0
        want = loop.contains_point(loop.vertices[i % n])
        assert got == want, i


def _fixture_shapes():
    """makeShapeIndex('0:0 # -1:1, 1:1 # 0:5, 0:7, 2:6')."""
    point = _pt("0:0")
    line = Polyline([_pt("-1:1"), _pt("1:1")])
    tri = Loop([_pt("0:5"), _pt("0:7"), _pt("2:6")])
    return point, line, tri


CASES = {
    OPEN: [("0:0", False), ("-1:1", False), ("1:1", False), ("0:2", False),
           ("0:3", False), ("0:5", False), ("0:7", False), ("2:6", False),
           ("1:6", True), ("10:10", False)],
    SEMI_OPEN: [("0:0", False), ("-1:1", False), ("1:1", False),
                ("0:2", False), ("0:5", False), ("0:7", True),
                ("2:6", False), ("1:6", True), ("10:10", False)],
    CLOSED: [("0:0", True), ("-1:1", True), ("1:1", True), ("0:2", False),
             ("0:5", True), ("0:7", True), ("2:6", True), ("1:6", True),
             ("10:10", False)],
}


def test_contains_point_query_vertex_models():
    point, line, tri = _fixture_shapes()
    for model, cases in CASES.items():
        q = ContainsPointQuery([point, line, tri], model)
        for text, want in cases:
            assert q.contains(_pt(text)) == want, (model, text)


def test_contains_point_query_shape_contains():
    point, line, tri = _fixture_shapes()
    for model in (OPEN, SEMI_OPEN):
        q = ContainsPointQuery([point, line, tri], model)
        assert not q.shape_contains(line, _pt("1:6"))
        assert q.shape_contains(tri, _pt("1:6"))
        assert not q.shape_contains(tri, _pt("0:5"))
        assert q.shape_contains(tri, _pt("0:7")) == (model == SEMI_OPEN)


def test_containing_shapes():
    point, line, tri = _fixture_shapes()
    q = ContainsPointQuery([point, line, tri], CLOSED)
    assert q.containing_shapes(_pt("0:0")) == [point]
    assert q.containing_shapes(_pt("1:1")) == [line]
    assert q.containing_shapes(_pt("1:6")) == [tri]
    assert q.containing_shapes(_pt("10:10")) == []


def test_contains_point_query_polygon_with_hole():
    # shell 10x10 degrees, hole 4x4 in the middle; closed model counts
    # the hole boundary as contained, open model rejects the shell
    # boundary — the composition the naive per-loop xor gets wrong.
    from geo_ray.state.polygon import Polygon
    shell = Loop([_pt("-5:-5"), _pt("-5:5"), _pt("5:5"), _pt("5:-5")])
    hole = Loop([_pt("-2:-2"), _pt("-2:2"), _pt("2:2"), _pt("2:-2")])
    poly = Polygon([shell, hole])
    q_open = ContainsPointQuery([poly], OPEN)
    q_semi = ContainsPointQuery([poly], SEMI_OPEN)
    q_closed = ContainsPointQuery([poly], CLOSED)
    ring_pt = _pt("0:3")        # between hole and shell
    hole_pt = _pt("0:0")        # inside the hole
    shell_v = _pt("-5:-5")      # shell vertex
    hole_v = _pt("-2:-2")       # hole vertex
    for q in (q_open, q_semi, q_closed):
        assert q.contains(ring_pt)
        assert not q.contains(hole_pt)
    assert not q_open.contains(shell_v)
    assert not q_open.contains(hole_v)
    assert q_closed.contains(shell_v)
    assert q_closed.contains(hole_v)

"""CrossingEdgeQuery vs brute scalar crossing scan
(s2/crossing_edge_query.go semantics)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.edges import crossing_sign, edge_or_vertex_crossing
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.stages.join import JoinState
from geo_ray.state.crossing_query import crossings, crossings_indexed
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

RNG = np.random.default_rng(17)


def _loop_arrays(loop):
    cvs = np.asarray(loop.vertices)
    dvs = np.roll(cvs, -1, axis=0)
    return cvs, dvs


def _brute(a, b, cvs, dvs, interior_only):
    out = []
    for i in range(len(cvs)):
        c, d = tuple(cvs[i]), tuple(dvs[i])
        if interior_only:
            if crossing_sign(a, b, c, d) > 0:
                out.append(i)
        else:
            if edge_or_vertex_crossing(a, b, c, d):
                out.append(i)
    return out


@pytest.mark.parametrize("interior_only", [True, False])
def test_crossings_match_brute(interior_only):
    loop = Loop.from_text("10:10, 10:30, 30:30, 30:10")
    cvs, dvs = _loop_arrays(loop)
    for _ in range(50):
        a = tuple(float(v) for v in latlng_deg_to_xyz(
            RNG.uniform(0, 40), RNG.uniform(0, 40)))
        b = tuple(float(v) for v in latlng_deg_to_xyz(
            RNG.uniform(0, 40), RNG.uniform(0, 40)))
        if a == b:
            continue
        got = crossings(a, b, cvs, dvs, interior_only)
        want = _brute(a, b, cvs, dvs, interior_only)
        assert got == want, (a, b)


def test_crossing_edge_cases():
    loop = Loop.from_text("0:0, 0:10, 10:10, 10:0")
    cvs, dvs = _loop_arrays(loop)
    # an edge through the interior crosses exactly two boundary edges
    a = tuple(float(v) for v in latlng_deg_to_xyz(5.0, -5.0))
    b = tuple(float(v) for v in latlng_deg_to_xyz(5.0, 15.0))
    assert len(crossings(a, b, cvs, dvs, True)) == 2
    # an edge fully outside crosses nothing
    a2 = tuple(float(v) for v in latlng_deg_to_xyz(40.0, 0.0))
    b2 = tuple(float(v) for v in latlng_deg_to_xyz(50.0, 10.0))
    assert crossings(a2, b2, cvs, dvs, True) == []
    # sharing a vertex: interior-only no, all yes/no per wedge rule
    v = loop.vertices[0]
    out = tuple(float(x) for x in latlng_deg_to_xyz(-10.0, -10.0))
    assert crossings(out, v, cvs, dvs, True) == []


def test_indexed_crossings_match_full_scan():
    cx = tuple(float(v) for v in latlng_deg_to_xyz(20.0, 50.0))
    loop = Loop.regular_loop(cx, math.radians(5.0), 128)
    poly = Polygon.from_loop(loop)
    state = JoinState([("big", poly)])
    eidx = state.edge_indexes[0]
    assert eidx is not None
    cvs, dvs = _loop_arrays(loop)
    hits = 0
    for _ in range(40):
        a = tuple(float(v) for v in latlng_deg_to_xyz(
            RNG.uniform(10, 30), RNG.uniform(40, 60)))
        b = tuple(float(v) for v in latlng_deg_to_xyz(
            RNG.uniform(10, 30), RNG.uniform(40, 60)))
        if a == b:
            continue
        want = crossings(a, b, cvs, dvs, True)
        got = crossings_indexed(a, b, eidx, True)
        assert got == want
        hits += len(want)
    assert hits > 0

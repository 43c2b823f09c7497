"""ChordAngle Successor/Predecessor/Expanded + the EdgeQuery
open/closed distance-limit semantics.

Ports the reference cases from s1/chordangle_test.go:110-147
(TestChordAngleSuccessor / Predecessor) and
s2/edge_query_closest_test.go:68-137
(TestClosestEdgeQueryDistanceEqualToLimit and
TestClosestEdgeQueryTrueDistanceLessThanChordAngleDistance) onto the
repo's functions/chordangle.py helpers and the distributed kNN stage.
"""

import math

import numpy as np
import pyarrow as pa

from geo_ray.functions import chordangle as ca
from geo_ray.functions.latlng import chord2, latlng_deg_to_xyz
from geo_ray.functions.predicates import compare_distance


def test_successor_special_cases():
    assert ca.successor(ca.NEGATIVE) == 0.0
    assert ca.successor(ca.STRAIGHT) == ca.INF
    assert ca.successor(ca.INF) == ca.INF
    x = ca.NEGATIVE
    for _ in range(10):
        nxt = ca.successor(x)
        assert x < nxt
        x = nxt


def test_predecessor_special_cases():
    assert ca.predecessor(ca.INF) == ca.STRAIGHT
    assert ca.predecessor(0.0) == ca.NEGATIVE
    assert ca.predecessor(ca.NEGATIVE) == ca.NEGATIVE
    x = ca.INF
    for _ in range(10):
        prv = ca.predecessor(x)
        assert prv < x
        x = prv


def test_successor_predecessor_are_adjacent():
    for v in [1e-30, 0.125, 1.0, 2.0, 3.999]:
        assert ca.predecessor(ca.successor(v)) == v
        assert ca.successor(ca.predecessor(v)) == v
    # vectorized form agrees with scalar
    vs = np.array([0.0, 1.0, 4.0, -1.0, np.inf])
    got = ca.successor(vs)
    assert got[0] > 0.0 and got[1] > 1.0
    assert got[2] == np.inf and got[3] == 0.0 and got[4] == np.inf


def test_expanded_clamps_and_passes_specials():
    assert ca.expanded(1.0, 0.5) == 1.5
    assert ca.expanded(3.9, 0.5) == 4.0
    assert ca.expanded(0.1, -0.5) == 0.0
    assert ca.expanded(ca.NEGATIVE, 0.5) == ca.NEGATIVE
    assert ca.expanded(ca.INF, -0.5) == ca.INF


def _knn_hits(ray_session, pts_xyz, pids, probe_xyz, limit):
    """Distributed kNN with an exclusive distance limit; returns the
    neighbor ids found for the single probe."""
    import ray.data as rd

    from geo_ray.stages.knn import knn

    t = pa.table({
        "image_id": pa.array(pids, pa.int64()),
        "x": pa.array(pts_xyz[:, 0]), "y": pa.array(pts_xyz[:, 1]),
        "z": pa.array(pts_xyz[:, 2])})
    out = knn(rd.from_arrow(t), ([0], probe_xyz[None, :]), k=10,
              distance_limit=limit)
    df = out.to_pandas()
    if len(df) == 0:        # empty groupby loses the schema
        return []
    return sorted(df["neighbor_id"].tolist())


def test_distance_equal_to_limit(ray_session):
    """s2/edge_query_closest_test.go:68-104: a result at distance
    exactly equal to the limit is excluded by DistanceLimit, included
    by the inclusive limit (Successor) and the conservative limit."""
    p0 = np.array(latlng_deg_to_xyz(np.array([23.0]), np.array([12.0])))[:, 0]
    p1 = np.array(latlng_deg_to_xyz(np.array([47.0]), np.array([11.0])))[:, 0]
    pts = p0[None, :]

    # identical points: distance 0
    assert _knn_hits(ray_session, pts, [7], p0, 0.0) == []
    assert _knn_hits(ray_session, pts, [7], p0,
                     ca.closest_inclusive_limit(0.0)) == [7]
    assert _knn_hits(ray_session, pts, [7], p0,
                     ca.closest_conservative_limit(0.0)) == [7]

    # non-zero distance, limit exactly equal
    d1 = float(chord2(*p0, *p1))
    assert _knn_hits(ray_session, pts, [7], p1, d1) == []
    assert _knn_hits(ray_session, pts, [7], p1,
                     ca.closest_inclusive_limit(d1)) == [7]
    assert _knn_hits(ray_session, pts, [7], p1,
                     ca.closest_conservative_limit(d1)) == [7]


def test_true_distance_less_than_chord_angle_distance(ray_session):
    """s2/edge_query_closest_test.go:106-137: the float chord2 is ~4
    ulps above the TRUE distance for this worst-case pair; the
    conservative limit must still admit the point while the plain and
    inclusive limits reject it."""
    p0 = np.array([0.78516762584829192, -0.50200400690845970,
                   -0.36263449417782678])
    p1 = np.array([0.78563011732429433, -0.50187655940493503,
                   -0.36180828883938054])
    dist = float(chord2(*p0, *p1))
    limit = dist
    for _ in range(4):
        limit = ca.predecessor(limit)
    # true (exact rational) distance is below the limit...
    assert compare_distance(p0, p1, limit) < 0
    # ...but the float computation lands above it
    pts = p0[None, :]
    assert _knn_hits(ray_session, pts, [7], p1, limit) == []
    assert _knn_hits(ray_session, pts, [7], p1,
                     ca.successor(limit)) == []
    assert _knn_hits(ray_session, pts, [7], p1,
                     ca.closest_conservative_limit(limit)) == [7]


def test_furthest_limit_helpers():
    """Furthest queries compare with > limit: the inclusive form is
    predecessor, the conservative form widens downward."""
    d = 1.5
    assert ca.furthest_inclusive_limit(d) == ca.predecessor(d)
    assert ca.furthest_conservative_limit(d) < d
    assert ca.furthest_conservative_limit(d) > d - 1e-10


def test_error_bounds_positive_in_range():
    c2 = np.linspace(0.0, 4.0, 33)
    err = ca.min_update_distance_max_error(c2)
    assert (err > 0).all()
    assert ca.min_update_interior_distance_max_error(2.0) == 0.0
    assert ca.min_update_interior_distance_max_error(1.9) > 0.0
    # MaxPointError formula spot value (s1/chordangle.go:231-239)
    eps = np.finfo(np.float64).eps / 2
    assert math.isclose(ca.max_point_error(1.0), 4.5 * eps + 16 * eps * eps)

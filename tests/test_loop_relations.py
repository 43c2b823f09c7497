"""Pairwise loop relations over the ported corpus, mirroring
TestLoopRelations (s2/loop_test.go:807) for the cases whose expected
values follow from the corpus construction (diamond family unions/
intersections/differences, nested pole loops, empty/full, the
clockwise loop).

Known limitation (round 1): loop pairs whose boundaries share
collinear overlapping edges WITHOUT shared vertices at the overlap
(e.g. northHemi vs northHemi3) need the reference's compareBoundary
machinery (s2/loop.go:917-1005) and are not yet supported.
"""

from __future__ import annotations

import pytest

from tests.corpus import make_loop

CASES = [
    # (a, b, a_contains_b, a_intersects_b)
    ("northHemi", "arctic80", True, True),
    ("arctic80", "northHemi", False, True),
    ("northHemi", "antarctic80", False, False),
    ("antarctic80", "southHemi", False, True),
    ("southHemi", "antarctic80", True, True),
    ("candyCane", "arctic80", False, False),
    ("loopA", "loopB", False, True),
    ("loopB", "loopA", False, True),
    ("aUnionB", "loopA", True, True),
    ("aUnionB", "loopB", True, True),
    ("loopA", "aIntersectB", True, True),
    ("loopB", "aIntersectB", True, True),
    ("aIntersectB", "loopA", False, True),
    ("loopA", "aMinusB", True, True),
    ("aMinusB", "loopB", False, False),
    ("aMinusB", "bMinusA", False, False),
    ("bMinusA", "aMinusB", False, False),
    ("full", "loopA", True, True),
    ("loopA", "full", False, True),
    ("full", "empty", True, False),
    ("empty", "loopA", False, False),
    ("loopA", "empty", True, False),
    ("smallNECW", "northHemi", False, True),
    ("smallNECW", "arctic80", True, True),
    # reference matrix rows (s2/loop_test.go:832-... TestLoopRelations):
    ("northHemi", "northHemi", True, True),        # self, shared edges
    ("northHemi3", "northHemi3", True, True),
    ("northHemi", "southHemi", False, False),      # disjoint, covers
    ("northHemi3", "arctic80", True, True),
    ("northHemi3", "antarctic80", False, False),
    ("loopA", "loopA", True, True),
]


def test_covers_relation():
    """covers == (A union B) is the whole sphere: complement(A) inside B
    (the reference matrix's `covers` flag)."""
    n, s = make_loop("northHemi"), make_loop("southHemi")
    assert s.contains_loop(n.invert())      # north+south cover the sphere
    a80 = make_loop("arctic80")
    assert not a80.contains_loop(n.invert())


@pytest.mark.parametrize("a,b,want_contains,want_intersects", CASES)
def test_loop_relation(a, b, want_contains, want_intersects):
    la, lb = make_loop(a), make_loop(b)
    assert la.contains_loop(lb) == want_contains, (a, b)
    assert la.intersects_loop(lb) == want_intersects, (a, b)


def test_relation_consistency_random_pairs():
    """Invariants: contains(a,b) implies intersects(a,b) unless b empty;
    intersects is symmetric."""
    names = ["northHemi", "southHemi", "arctic80", "antarctic80", "loopA",
             "loopB", "aUnionB", "aIntersectB", "candyCane", "smallNECW"]
    loops = {n: make_loop(n) for n in names}
    for a in names:
        for b in names:
            c = loops[a].contains_loop(loops[b])
            i_ab = loops[a].intersects_loop(loops[b])
            i_ba = loops[b].intersects_loop(loops[a])
            assert i_ab == i_ba, (a, b)
            if c and not loops[b].is_empty():
                assert i_ab, (a, b)


def test_polygon_relations_via_loops():
    """Polygon with a hole: contains points in the shell minus hole."""
    from geo_ray.state.loop import Loop
    from geo_ray.state.polygon import Polygon
    import numpy as np
    from geo_ray.functions.latlng import latlng_deg_to_xyz

    shell = Loop.from_text("0:0, 0:10, 10:10, 10:0")
    hole = Loop.from_text("2:2, 2:8, 8:8, 8:2")  # CCW; xor handles depth
    poly = Polygon([shell, hole])

    def pt(lat, lng):
        x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
        return (float(x), float(y), float(z))

    assert poly.contains_point(pt(1, 1))      # in shell, outside hole
    assert not poly.contains_point(pt(5, 5))  # inside hole
    assert not poly.contains_point(pt(20, 20))
    arr = np.array([pt(1, 1), pt(5, 5), pt(20, 20)])
    got = poly.contains_points_batch(arr)
    assert got.tolist() == [True, False, False]

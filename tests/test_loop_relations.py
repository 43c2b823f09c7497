"""Pairwise loop relations over the ported corpus: full port of
TestLoopRelations (s2/loop_test.go:807-1380) including the shared-edge
and coincident-boundary pairs (northHemi vs southHemi, the loopA
family, loopC..loopI "pieces sticking out and in"), driven through the
reference's four identity checkers (nested / disjoint / covering /
overlapping pairs).

As in the reference, northHemi3 vs northHemi/southHemi is excluded
because the result depends on simulation-of-simplicity implementation
details (s2/loop_test.go:930-932).
"""

from __future__ import annotations

import pytest

from tests.corpus import make_loop

# (a, b, contains, contained, disjoint, covers) — sharedEdge flag from
# the reference matrix is implicit in the loop geometry.
MATRIX = [
    ("full", "full", True, True, False, True),
    ("full", "northHemi", True, False, False, True),
    ("full", "empty", True, False, True, True),
    ("northHemi", "full", False, True, False, True),
    ("northHemi", "empty", True, False, True, False),
    ("empty", "full", False, True, True, True),
    ("empty", "northHemi", False, True, True, False),
    ("empty", "empty", True, True, True, False),
    ("northHemi", "northHemi", True, True, False, False),
    ("northHemi", "southHemi", False, False, True, True),
    ("northHemi", "eastHemi", False, False, False, False),
    ("northHemi", "arctic80", True, False, False, False),
    ("northHemi", "antarctic80", False, False, True, False),
    ("northHemi", "candyCane", False, False, False, False),
    ("northHemi3", "northHemi3", True, True, False, False),
    ("northHemi3", "eastHemi", False, False, False, False),
    ("northHemi3", "arctic80", True, False, False, False),
    ("northHemi3", "antarctic80", False, False, True, False),
    ("northHemi3", "candyCane", False, False, False, False),
    ("southHemi", "northHemi", False, False, True, True),
    ("southHemi", "southHemi", True, True, False, False),
    ("southHemi", "farHemi", False, False, False, False),
    ("southHemi", "arctic80", False, False, True, False),
    ("southHemi", "antarctic80", True, False, False, False),
    ("southHemi", "candyCane", False, False, False, False),
    ("candyCane", "northHemi", False, False, False, False),
    ("candyCane", "southHemi", False, False, False, False),
    ("candyCane", "arctic80", False, False, True, False),
    ("candyCane", "antarctic80", False, False, True, False),
    ("candyCane", "candyCane", True, True, False, False),
    ("nearHemi", "westHemi", False, False, False, False),
    ("smallNECW", "southHemi", True, False, False, False),
    ("smallNECW", "westHemi", True, False, False, False),
    ("smallNECW", "northHemi", False, False, False, True),
    ("smallNECW", "eastHemi", False, False, False, True),
    ("loopA", "loopA", True, True, False, False),
    ("loopA", "loopB", False, False, False, False),
    ("loopA", "aIntersectB", True, False, False, False),
    ("loopA", "aUnionB", False, True, False, False),
    ("loopA", "aMinusB", True, False, False, False),
    ("loopA", "bMinusA", False, False, True, False),
    ("loopB", "loopA", False, False, False, False),
    ("loopB", "loopB", True, True, False, False),
    ("loopB", "aIntersectB", True, False, False, False),
    ("loopB", "aUnionB", False, True, False, False),
    ("loopB", "aMinusB", False, False, True, False),
    ("loopB", "bMinusA", True, False, False, False),
    ("aIntersectB", "loopA", False, True, False, False),
    ("aIntersectB", "loopB", False, True, False, False),
    ("aIntersectB", "aIntersectB", True, True, False, False),
    ("aIntersectB", "aUnionB", False, True, False, False),
    ("aIntersectB", "aMinusB", False, False, True, False),
    ("aIntersectB", "bMinusA", False, False, True, False),
    ("aUnionB", "loopA", True, False, False, False),
    ("aUnionB", "loopB", True, False, False, False),
    ("aUnionB", "aIntersectB", True, False, False, False),
    ("aUnionB", "aUnionB", True, True, False, False),
    ("aUnionB", "aMinusB", True, False, False, False),
    ("aUnionB", "bMinusA", True, False, False, False),
    ("aMinusB", "loopA", False, True, False, False),
    ("aMinusB", "loopB", False, False, True, False),
    ("aMinusB", "aIntersectB", False, False, True, False),
    ("aMinusB", "aUnionB", False, True, False, False),
    ("aMinusB", "aMinusB", True, True, False, False),
    ("aMinusB", "bMinusA", False, False, True, False),
    ("bMinusA", "loopA", False, False, True, False),
    ("bMinusA", "loopB", False, True, False, False),
    ("bMinusA", "aIntersectB", False, False, True, False),
    ("bMinusA", "aUnionB", False, True, False, False),
    ("bMinusA", "aMinusB", False, False, True, False),
    ("bMinusA", "bMinusA", True, True, False, False),
    # crossing on two ends of a shared boundary segment
    ("loopA", "loopC", False, False, False, False),
    ("loopC", "loopA", False, False, False, False),
    ("loopA", "loopD", False, True, False, False),
    ("loopD", "loopA", True, False, False, False),
    ("loopE", "loopF", False, False, True, False),
    ("loopE", "loopG", True, False, False, False),
    ("loopE", "loopH", False, False, False, False),
    ("loopE", "loopI", False, False, False, False),
    ("loopF", "loopG", False, False, True, False),
    ("loopF", "loopH", False, False, False, False),
    ("loopF", "loopI", False, False, False, False),
    ("loopG", "loopH", False, True, False, False),
    ("loopH", "loopG", True, False, False, False),
    ("loopG", "loopI", False, False, True, False),
    ("loopH", "loopI", True, False, False, False),
]


def _check_one_nested_pair(a, b):
    """A contains B (s2/loop_test.go testLoopOneNestedPair)."""
    assert a.contains_loop(b)
    assert b.contains_loop(a) == a.boundary_equal(b)
    assert a.intersects_loop(b) == (not b.is_empty())
    assert b.intersects_loop(a) == (not b.is_empty())


def _check_one_disjoint_pair(a, b):
    assert not a.intersects_loop(b)
    assert not b.intersects_loop(a)
    assert a.contains_loop(b) == b.is_empty()
    assert b.contains_loop(a) == a.is_empty()


def _check_one_covering_pair(a, b):
    assert a.contains_loop(b) == a.is_full()
    assert b.contains_loop(a) == b.is_full()
    complementary = a.invert().boundary_equal(b)
    assert a.intersects_loop(b) == (not complementary)
    assert b.intersects_loop(a) == (not complementary)


def _check_one_overlapping_pair(a, b):
    assert not a.contains_loop(b)
    assert not b.contains_loop(a)
    assert a.intersects_loop(b)
    assert b.intersects_loop(a)


def _check_nested_pair(a, b):
    """testLoopNestedPair: 4 derived identities of A ⊇ B."""
    _check_one_nested_pair(a, b)
    _check_one_nested_pair(b.invert(), a.invert())
    _check_one_disjoint_pair(a.invert(), b)
    _check_one_covering_pair(a, b.invert())


@pytest.mark.parametrize("a_name,b_name,contains,contained,disjoint,covers",
                         MATRIX)
def test_loop_relation_matrix(a_name, b_name, contains, contained,
                              disjoint, covers):
    a, b = make_loop(a_name), make_loop(b_name)
    if contains:
        _check_nested_pair(a, b)
    if contained:
        _check_nested_pair(b, a)
    if covers:
        _check_nested_pair(a, b.invert())
    if disjoint:
        _check_nested_pair(a.invert(), b)
    elif not contains and not contained and not covers:
        _check_one_overlapping_pair(a, b)
        _check_one_overlapping_pair(a.invert(), b.invert())
        _check_one_overlapping_pair(a.invert(), b)
        _check_one_overlapping_pair(a, b.invert())


def test_compare_boundary():
    """compareBoundary basics: +1 contains, -1 excludes, 0 crosses;
    shared-edge rule via the reverse flag (s2/loop.go:917-962)."""
    north = make_loop("northHemi")
    arctic = make_loop("arctic80")
    antarctic = make_loop("antarctic80")
    a, b = make_loop("loopA"), make_loop("loopB")
    assert north.compare_boundary(arctic) == 1
    assert north.compare_boundary(antarctic) == -1
    assert a.compare_boundary(b) == 0
    # shared-edge pairs: aMinusB's boundary includes edges of loopA
    assert make_loop("loopA").compare_boundary(make_loop("aMinusB")) == 1
    # northHemi/southHemi share the equator: northHemi contains the
    # boundary of southHemi treated as a hole, excludes it as a shell
    south = make_loop("southHemi")
    assert north.compare_boundary(south, other_is_hole=True) == 1
    assert north.compare_boundary(south, other_is_hole=False) == -1


def test_contains_nested():
    north = make_loop("northHemi")
    arctic = make_loop("arctic80")
    assert north.contains_nested(arctic)
    assert not arctic.contains_nested(north)
    assert north.contains_nested(north)          # shared vertices
    assert make_loop("full").contains_nested(north)
    assert north.contains_nested(make_loop("empty"))


def test_contains_non_crossing_boundary():
    north = make_loop("northHemi")
    arctic = make_loop("arctic80")
    antarctic = make_loop("antarctic80")
    assert north.contains_non_crossing_boundary(arctic, False)
    assert not north.contains_non_crossing_boundary(antarctic, False)
    south = make_loop("southHemi")
    # shared-edge rule matches compareBoundary
    assert north.contains_non_crossing_boundary(south, True)
    assert not north.contains_non_crossing_boundary(south, False)


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


def test_covers_relation():
    """covers == (A union B) is the whole sphere: complement(A) inside
    B (the reference matrix's `covers` flag)."""
    n, s = make_loop("northHemi"), make_loop("southHemi")
    assert s.contains_loop(n.invert())      # north+south cover the sphere
    a80 = make_loop("arctic80")
    assert not a80.contains_loop(n.invert())


def test_wedge_relation_reference_table():
    """The full 11-case table from s2/wedge_relations_test.go:23-200:
    contains, intersects and the five-way WedgeRelation."""
    from geo_ray.functions.edges import (WEDGE_EQUALS, WEDGE_IS_DISJOINT,
                                         WEDGE_IS_PROPERLY_CONTAINED,
                                         WEDGE_PROPERLY_CONTAINS,
                                         WEDGE_PROPERLY_OVERLAPS,
                                         wedge_contains, wedge_intersects,
                                         wedge_relation)

    import numpy as np

    def pt(x, y, z):
        v = np.array([x, y, z], dtype=np.float64)
        v = v / np.linalg.norm(v)
        return (float(v[0]), float(v[1]), float(v[2]))

    ab1 = pt(0, 0, 1)
    cases = [
        # a0, a1, b0, b1, contains, intersects, relation
        ((-1, 0, 10), (1, 2, 10), (0, 1, 10), (1, -2, 10),
         False, True, WEDGE_PROPERLY_OVERLAPS),
        ((-1, -1, 10), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
         False, True, WEDGE_PROPERLY_OVERLAPS),
        ((-1, -1, 10), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
         True, True, WEDGE_PROPERLY_CONTAINS),
        ((2, 1, 10), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
         True, True, WEDGE_PROPERLY_CONTAINS),
        ((2, 1, 10), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
         True, True, WEDGE_PROPERLY_CONTAINS),
        ((-2, 3, 10), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
         True, True, WEDGE_EQUALS),
        ((-2, 3, 10), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
         False, False, WEDGE_IS_DISJOINT),
        ((-2, 3, 10), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
         False, False, WEDGE_IS_DISJOINT),
        ((-2, 3, 10), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
         False, False, WEDGE_IS_DISJOINT),
        ((2, 1, 10), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
         False, True, WEDGE_IS_PROPERLY_CONTAINED),
        ((2, 1, 10), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
         False, True, WEDGE_IS_PROPERLY_CONTAINED),
    ]
    for a0, a1, b0, b1, want_c, want_i, want_r in cases:
        a0, a1, b0, b1 = pt(*a0), pt(*a1), pt(*b0), pt(*b1)
        assert wedge_contains(a0, ab1, a1, b0, b1) == want_c, (a0, b0)
        assert wedge_intersects(a0, ab1, a1, b0, b1) == want_i, (a0, b0)
        assert wedge_relation(a0, ab1, a1, b0, b1) == want_r, (a0, b0)

"""CellUnion algebra properties, mirroring s2/cellunion_test.go
(normalization :45-141, union/intersection/difference cross-checks
:380-1063, expand :907).  No Ray.
"""

from __future__ import annotations

import numpy as np

from geo_ray.functions import cellid as cid
from geo_ray.state import cellunion as cu

RNG = np.random.default_rng(42)


def random_cell_id(level=None) -> int:
    if level is None:
        level = int(RNG.integers(0, 31))
    face = int(RNG.integers(0, 6))
    i = int(RNG.integers(0, 1 << 30))
    j = int(RNG.integers(0, 1 << 30))
    return cid.parent(cid.cell_id_from_face_ij(face, i, j), level)


def random_union(n: int):
    return cu.normalize([random_cell_id() for _ in range(n)])


def test_normalize_drops_contained():
    ci = random_cell_id(10)
    kids = cid.children(ci)
    out = cu.normalize([ci, kids[0], kids[2]])
    assert out == [ci]


def test_normalize_collapses_siblings():
    ci = random_cell_id(12)
    out = cu.normalize(cid.children(ci))
    assert out == [ci]
    # also recursively
    kids = cid.children(ci)
    grandkids = [g for k in kids for g in cid.children(k)]
    assert cu.normalize(grandkids) == [ci]


def test_normalize_sorted_disjoint():
    for _ in range(20):
        u = random_union(30)
        assert u == sorted(u)
        for a, b in zip(u, u[1:]):
            assert cid.range_max(a) < cid.range_min(b)


def test_union_contains_both():
    for _ in range(10):
        x, y = random_union(10), random_union(10)
        u = cu.from_union(x, y)
        assert cu.contains_union(u, x)
        assert cu.contains_union(u, y)


def test_intersection_properties():
    """Every cell of the intersection is in both inputs; every leaf in
    both inputs is in the intersection (s2/cellunion_test.go:380-470)."""
    for _ in range(10):
        x, y = random_union(12), random_union(12)
        inter = cu.from_intersection(x, y)
        for ci in inter:
            assert cu.contains_cell_id(x, ci)
            assert cu.contains_cell_id(y, ci)
        # sample leaves
        for _ in range(100):
            leaf = random_cell_id(30)
            in_both = cu.contains_cell_id(x, leaf) and cu.contains_cell_id(y, leaf)
            assert cu.contains_cell_id(inter, leaf) == in_both


def test_difference_properties():
    for _ in range(5):
        x, y = random_union(8), random_union(8)
        diff = cu.from_difference(x, y)
        for ci in diff:
            assert cu.contains_cell_id(x, ci)
            assert not cu.intersects_cell_id(y, ci)
        for _ in range(100):
            leaf = random_cell_id(30)
            expect = cu.contains_cell_id(x, leaf) and not cu.contains_cell_id(y, leaf)
            assert cu.contains_cell_id(diff, leaf) == expect


def test_denormalize_levels():
    u = random_union(8)
    for min_level, level_mod in ((4, 1), (2, 2), (3, 3)):
        d = cu.denormalize(u, min_level, level_mod)
        for ci in d:
            lvl = cid.level(ci)
            assert lvl >= min_level
            assert (lvl - min_level) % level_mod == 0


def test_from_range_roundtrip():
    for _ in range(10):
        a = random_cell_id(30)
        b = random_cell_id(30)
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        tiling = cu.from_range(lo, hi)
        assert tiling == cu.normalize(tiling)
        total = cu.leaf_cells_covered(tiling)
        assert total == (hi - lo) // 2


def test_expand_at_level_contains_original():
    for _ in range(5):
        u = random_union(5)
        level = min(cid.level(ci) for ci in u)
        e = cu.expand_at_level(list(u), level)
        assert cu.contains_union(e, u)


def test_vectorized_membership_matches_scalar():
    u = random_union(20)
    rmin, rmax = cu.to_ranges(u)
    leaves = np.array([random_cell_id(30) for _ in range(2000)],
                      dtype=np.uint64)
    vec = cu.contains_leaf_v(rmin, rmax, leaves)
    for k in range(0, 2000, 37):
        assert bool(vec[k]) == cu.contains_cell_id(u, int(leaves[k]))

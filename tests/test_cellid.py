"""CellID invariants, mirroring the strategy of s2/cellid_test.go
(parent/child bits :47, containment :99, tokens :340-426, neighbors vs
brute force :206-339, Hilbert continuity :807, MaxTile :933).  No Ray.
"""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.functions import cellid as C
from geo_ray.functions import stuv

RNG = np.random.default_rng(42)
LATS = RNG.uniform(-89.9, 89.9, 2000)
LNGS = RNG.uniform(-180.0, 180.0, 2000)
IDS = C.cell_id_from_latlng_v(LATS, LNGS)


def test_leaf_properties():
    assert ((IDS & np.uint64(1)) == 1).all()
    assert (C.level_v(IDS) == 30).all()
    for k in range(100):
        assert C.is_valid(int(IDS[k]))
        assert C.is_leaf(int(IDS[k]))


def test_encode_decode_roundtrip():
    f, i, j, _ = C.face_ij_orientation_v(IDS)
    assert (C.cell_id_from_face_ij_v(f, i, j) == IDS).all()
    assert (f >= 0).all() and (f <= 5).all()
    assert (i >= 0).all() and (i < stuv.MAX_SIZE).all()


def test_scalar_matches_vectorized():
    for k in range(200):
        s = C.cell_id_from_latlng(float(LATS[k]), float(LNGS[k]))
        assert s == int(IDS[k])
        f, i, j, o = C.face_ij_orientation(s)
        fv, iv, jv, ov = C.face_ij_orientation_v(IDS[k:k + 1])
        assert (f, i, j, o) == (int(fv[0]), int(iv[0]), int(jv[0]), int(ov[0]))


def test_parent_child_invariants():
    """s2/cellid_test.go:47-99."""
    for lvl in (0, 3, 7, 15, 29):
        p = C.parent_v(IDS, lvl)
        assert (C.level_v(p) == lvl).all()
        assert C.contains_v(p, IDS).all()
        for k in range(50):
            ci = int(p[k])
            kids = C.children(ci)
            assert all(C.level(ch) == lvl + 1 for ch in kids)
            assert all(C.immediate_parent(ch) == ci for ch in kids)
            assert all(C.contains(ci, ch) for ch in kids)
            # children tile the parent's leaf range exactly
            assert C.range_min(kids[0]) == C.range_min(ci)
            assert C.range_max(kids[3]) == C.range_max(ci)
            for a, b in zip(kids, kids[1:]):
                # leaf ids are odd and step by 2
                assert C.range_max(a) + 2 == C.range_min(b)


def test_center_round_trip():
    x, y, z = C.cell_id_to_point_v(IDS[:500])
    assert (C.cell_id_from_point_v(x, y, z) == IDS[:500]).all()
    # non-leaf centers too
    for lvl in (5, 12, 20):
        p = C.parent_v(IDS[:200], lvl)
        x, y, z = C.cell_id_to_point_v(p)
        leaf = C.cell_id_from_point_v(x, y, z)
        assert C.contains_v(p, leaf).all()


def test_tokens():
    """s2/cellid_test.go:340-426."""
    for k in range(300):
        ci = int(IDS[k])
        t = C.token(ci)
        assert len(t) <= 16
        assert C.from_token(t) == ci
    for lvl in (0, 4, 11):
        ci = C.parent(int(IDS[0]), lvl)
        assert C.from_token(C.token(ci)) == ci
    assert C.token(0) == "X"
    assert C.from_token("X") == 0
    assert C.from_token("876b e99") == 0  # garbage rejected
    assert C.from_token("x" * 17) == 0


def test_edge_neighbors_symmetry():
    p = C.parent_v(IDS[:100], 10)
    for k in range(100):
        ci = int(p[k])
        for nb in C.edge_neighbors(ci):
            assert C.level(nb) == 10
            assert ci in C.edge_neighbors(nb)


def test_vertex_neighbors():
    """s2/cellid_test.go:230-263 semantics: 4 distinct cells away from
    face corners; they all share the vertex."""
    ci = C.cell_id_from_latlng(45.0, 45.0)
    vn = C.vertex_neighbors(ci, 10)
    assert len(vn) == 4
    assert len(set(vn)) == 4
    assert C.parent(ci, 10) in vn


def test_all_neighbors_contains_edge_neighbors():
    p = C.parent_v(IDS[:50], 8)
    for k in range(50):
        ci = int(p[k])
        an = set(C.all_neighbors(ci, 8))
        for nb in C.edge_neighbors(ci):
            assert nb in an
        assert ci not in an


def test_all_neighbors_vectorized_matches_scalar():
    p = C.parent_v(IDS[:100], 12)
    vec = C.all_neighbors_same_level_v(p)
    for k in range(100):
        assert set(int(x) for x in vec[k]) == set(C.all_neighbors(int(p[k]), 12))


def test_hilbert_continuity():
    """Successive cells at a level are adjacent (s2/cellid_test.go:807)."""
    p = C.parent_v(IDS[:100], 6)
    for k in range(100):
        ci = int(p[k])
        nxt = C.next_cell(ci)
        if not C.is_valid(nxt):
            continue
        assert nxt in set(C.all_neighbors(ci, 6))


def test_common_ancestor_level():
    for k in range(50):
        ci = int(IDS[k])
        p5 = C.parent(ci, 5)
        p9 = C.parent(ci, 9)
        assert C.common_ancestor_level(p5, p9) == 5
        assert C.common_ancestor_level(ci, ci) == 30
    a = C.cell_id_from_latlng(10.0, 10.0)
    b = C.cell_id_from_latlng(-40.0, 170.0)
    if (a >> 61) != (b >> 61):
        assert C.common_ancestor_level(a, b) is None


def test_max_tile_tiles_range_exactly():
    """s2/cellid_test.go:933 semantics via the CellUnionFromRange idiom
    (s2/cellunion.go:41-49): MaxTile + RangeMax().Next() walks a leaf
    range with a minimal cell tiling."""
    leaf = C.cell_id_from_latlng(10.0, 10.0)
    start = C.range_min(leaf)
    limit = C.range_min(C.next_cell(C.parent(leaf, 5)))
    cur, total, n = start, 0, 0
    while cur < limit:
        t = C.max_tile(cur, limit)
        total += 4 ** (30 - C.level(t))
        cur = C.next_cell(C.range_max(t))
        n += 1
    assert total == (limit - start) // 2
    assert n < 200


def test_range_relationships():
    for k in range(100):
        ci = C.parent(int(IDS[k]), 12)
        assert C.range_min(ci) <= ci <= C.range_max(ci)
        assert C.is_leaf(C.range_min(ci))
        assert C.is_leaf(C.range_max(ci))
        nxt = C.next_cell(ci)
        if C.is_valid(nxt):
            assert C.range_max(ci) < C.range_min(nxt)


def test_st_uv_inverse():
    s = RNG.uniform(0, 1, 10000)
    assert np.abs(stuv.uv_to_st(stuv.st_to_uv(s)) - s).max() < 1e-15
    u = RNG.uniform(-1, 1, 10000)
    assert np.abs(stuv.st_to_uv(stuv.uv_to_st(u)) - u).max() < 1e-15


def test_face_uv_round_trip():
    f = RNG.integers(0, 6, 1000)
    u = RNG.uniform(-1, 1, 1000)
    v = RNG.uniform(-1, 1, 1000)
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    f2, u2, v2 = stuv.xyz_to_face_uv(x, y, z)
    assert (f2 == f).all()
    assert np.abs(u2 - u).max() < 1e-14
    assert np.abs(v2 - v).max() < 1e-14

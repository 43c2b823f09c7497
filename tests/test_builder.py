"""Snap-rounding builder (S2Builder-style assembly): round-trips,
sibling-pair cancellation, lattice/radius vertex merging, edge
rerouting, crossing splits, and the distributed edge-soup stage."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.snap import (CellIDSnapper, IdentitySnapper,
                                    IntLatLngSnapper)
from geo_ray.state.boolean import polygon_difference, polygon_union
from geo_ray.state.builder import Builder
from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

RNG = np.random.default_rng(20260818)


def _rand_pts(n):
    v = RNG.standard_normal((n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _circle(lat, lng, radius_deg, nv=16):
    c = np.asarray(latlng_deg_to_xyz(lat, lng))
    return Polygon.from_loop(Loop.regular_loop(c, math.radians(radius_deg),
                                               nv))


def _quad(lat0, lat1, lng0, lng1):
    return Loop.from_latlngs_deg([(lat0, lng0), (lat0, lng1),
                                  (lat1, lng1), (lat1, lng0)])


def _sampled_equal(a: Polygon, b: Polygon, n=250):
    for p in _rand_pts(n):
        t = tuple(p)
        assert a.contains_point(t) == b.contains_point(t), t


def test_roundtrip_shuffled_edges():
    poly = _circle(25.0, 40.0, 12.0, 20)
    edges = [e for lp in poly.loops for e in lp.edges()]
    order = RNG.permutation(len(edges))
    b = Builder()
    for i in order:
        b.add_edge(*edges[i])
    out = b.build_polygon()
    assert len(out.loops) == 1
    assert out.loops[0].boundary_equal(poly.loops[0])


def test_sibling_pair_cancellation_union_of_tiles():
    q1 = Polygon.from_loop(_quad(0.0, 10.0, 0.0, 10.0))
    q2 = Polygon.from_loop(_quad(0.0, 10.0, 10.0, 20.0))
    b = Builder()
    b.add_polygon(q1)
    b.add_polygon(q2)
    out = b.build_polygon()
    # shared border (lng=10) cancels; one merged loop remains
    assert len(out.loops) == 1
    _sampled_equal(out, polygon_union(q1, q2))


def test_hole_roundtrip():
    big = _circle(20.0, 30.0, 20.0, 16)
    small = _circle(20.0, 30.0, 8.0, 12)
    annulus = polygon_difference(big, small)
    assert len(annulus.loops) == 2
    b = Builder()
    b.add_polygon(annulus)
    out = b.build_polygon()
    assert len(out.loops) == 2
    _sampled_equal(out, annulus)
    assert abs(out.area() - annulus.area()) < 1e-12


def test_lattice_snap_merges_jitter_and_duplicates():
    poly = _circle(10.0, -60.0, 9.0, 14)
    snapper = IntLatLngSnapper(7)  # 1e-7-degree lattice
    ref = Builder(snapper)
    ref.add_polygon(poly)
    want = ref.build_polygon()

    b = Builder(snapper)
    for (u, v) in poly.loops[0].edges():
        for rep in range(2):  # duplicates must merge
            ju = np.asarray(u) + RNG.uniform(-1e-12, 1e-12, 3)
            jv = np.asarray(v) + RNG.uniform(-1e-12, 1e-12, 3)
            b.add_edge(tuple(ju / np.linalg.norm(ju)),
                       tuple(jv / np.linalg.norm(jv)))
    out = b.build_polygon()
    assert len(out.loops) == 1
    assert out.loops[0].boundary_equal(want.loops[0])


def test_identity_radius_merges_vertices():
    # a quad whose duplicate corner vertices are jittered by much less
    # than the snap radius collapses back to 4 sites
    base = _quad(0.0, 10.0, 0.0, 10.0)
    b = Builder(IdentitySnapper(snap_radius=1e-4))
    for (u, v) in base.edges():
        ju = np.asarray(u) + RNG.uniform(-1e-7, 1e-7, 3)
        jv = np.asarray(v) + RNG.uniform(-1e-7, 1e-7, 3)
        b.add_edge(tuple(ju / np.linalg.norm(ju)),
                   tuple(jv / np.linalg.norm(jv)))
    out = b.build_polygon()
    assert len(out.loops) == 1
    assert len(out.loops[0].vertices) == 4


def test_degenerate_collapse_to_empty():
    # all three vertices within the snap radius -> everything merges to
    # one site, all edges degenerate, empty polygon
    c = np.asarray(latlng_deg_to_xyz(5.0, 5.0))
    tri = Loop.regular_loop(c, 1e-6, 3)
    b = Builder(IdentitySnapper(snap_radius=1e-4))
    b.add_loop(tri)
    assert b.build_polygon().is_empty()


def test_edge_rerouted_through_nearby_site():
    # edge A-B passes within snap_radius of vertex C (a site from
    # another edge): snap rounding must route A-B through C's site
    A = tuple(np.asarray(latlng_deg_to_xyz(0.0, 0.0)))
    B = tuple(np.asarray(latlng_deg_to_xyz(0.0, 10.0)))
    C = tuple(np.asarray(latlng_deg_to_xyz(0.2, 5.0)))
    D = tuple(np.asarray(latlng_deg_to_xyz(30.0, 5.0)))
    b = Builder(IdentitySnapper(snap_radius=0.01))  # 0.01 rad ~ 0.57 deg
    b.add_edge(A, B)
    b.add_edge(C, D)
    chains = b.build_polylines()
    ab = next(ch for ch in chains if ch[0] == A)
    assert C in ab and ab.index(C) == 1 and ab[-1] == B


def test_split_crossing_polylines():
    a0 = tuple(np.asarray(latlng_deg_to_xyz(-5.0, 0.0)))
    a1 = tuple(np.asarray(latlng_deg_to_xyz(5.0, 0.0)))
    b0 = tuple(np.asarray(latlng_deg_to_xyz(0.0, -5.0)))
    b1 = tuple(np.asarray(latlng_deg_to_xyz(0.0, 5.0)))
    b = Builder(split_crossing_edges=True)
    b.add_edge(a0, a1)
    b.add_edge(b0, b1)
    chains = b.build_polylines()
    assert len(chains) == 2
    mids = [ch[1] for ch in chains if len(ch) == 3]
    assert len(mids) == 2 and mids[0] == mids[1]  # bit-identical split


def test_cellid_snapper_separation_guarantee():
    snapper = CellIDSnapper(level=10)
    pts = _rand_pts(60)
    b = Builder(snapper)
    for i in range(0, 58, 2):
        b.add_edge(tuple(pts[i]), tuple(pts[i + 1]))
    chains = b.build_polylines()
    sites = {v for ch in chains for v in ch}
    arr = np.asarray(sorted(sites))
    min_sep = snapper.min_vertex_separation()
    thr = (2 * math.sin(min_sep / 2)) ** 2
    for i in range(len(arr)):
        d2 = np.sum((arr - arr[i]) ** 2, axis=1)
        d2[i] = np.inf
        assert float(d2.min()) >= thr * (1 - 1e-9)


def test_assemble_polygons_stage(ray_session):
    import ray.data as rd

    from geo_ray.stages.build import assemble_polygons

    shapes = {0: _circle(25.0, 40.0, 12.0, 20),
              1: polygon_difference(_circle(20.0, 30.0, 20.0, 16),
                                    _circle(20.0, 30.0, 8.0, 12)),
              2: _circle(-35.0, 100.0, 6.0, 10)}
    rows = []
    for sid, poly in shapes.items():
        depths = poly._loop_depths()
        for lp, d in zip(poly.loops, depths):
            for (u, v) in lp.edges():
                if d % 2 == 1:
                    u, v = v, u
                from geo_ray.functions.latlng import xyz_to_latlng_deg
                (alat, alng) = [float(c) for c in xyz_to_latlng_deg(
                    np.float64(u[0]), np.float64(u[1]), np.float64(u[2]))]
                (blat, blng) = [float(c) for c in xyz_to_latlng_deg(
                    np.float64(v[0]), np.float64(v[1]), np.float64(v[2]))]
                rows.append({"shape_id": sid, "edge_id": len(rows),
                             "a_lat": alat, "a_lng": alng,
                             "b_lat": blat, "b_lng": blng})
    RNG.shuffle(rows)
    out = assemble_polygons(rd.from_items(rows)).to_pandas() \
        .set_index("shape_id").sort_index()
    assert len(out) == 3
    assert int(out.loc[0, "num_loops"]) == 1
    assert int(out.loc[1, "num_loops"]) == 2
    assert int(out.loc[2, "num_loops"]) == 1
    for sid, poly in shapes.items():
        assert abs(float(out.loc[sid, "area"]) - poly.area()) < 1e-9

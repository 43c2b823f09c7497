"""Raster -> vector tile tracing (stages/vectorize.py): lattice ring
properties, the spherical round-trip oracle (parity containment of the
traced polygon reproduces the mask at every pixel center, via the
engine's own Loop/Polygon machinery) across all 6 faces, and the
lattice QA == spherical QA equivalence the query relies on."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.stages.tiles import tile_pixel_centers_latlng
from geo_ray.stages.vectorize import (mask_from_rings, trace_mask,
                                      vectorize_tile)

PX = 16


def _cases():
    rng = np.random.RandomState(1)
    out = {}
    m = np.zeros((PX, PX), bool); m[5, 7] = True
    out["single"] = m
    out["full"] = np.ones((PX, PX), bool)
    m = np.zeros((PX, PX), bool); m[2:10, 3:12] = True; m[4:7, 5:9] = False
    out["donut"] = m
    m = np.zeros((PX, PX), bool)
    m[2:13, 2:13] = True; m[4:11, 4:11] = False; m[6:9, 6:9] = True
    out["island"] = m
    m = np.zeros((PX, PX), bool); m[3:6, 3:6] = True; m[6:9, 6:9] = True
    out["diag_pinch"] = m
    m = np.zeros((PX, PX), bool); m[::2, ::2] = True; m[1::2, 1::2] = True
    out["double_checker"] = m
    for t in range(6):
        out[f"rand{t}"] = rng.rand(PX, PX) < 0.5
    return out


def test_trace_rings_are_edge_simple_and_closed():
    """Every traced ring is an edge-simple rectilinear cycle with
    axis-aligned segments.  Vertices may repeat only at pinch corners
    where one component touches ITSELF diagonally — the curve touches
    but never crosses there (the sharp-turn pairing guarantees it), so
    crossing parity at the off-lattice pixel centers is unaffected;
    two DISTINCT components always trace separate rings."""
    for name, mask in _cases().items():
        all_edges = set()
        for ring in trace_mask(mask):
            assert len(ring) >= 4, name
            for i in range(len(ring)):
                a, b = ring[i], ring[(i + 1) % len(ring)]
                assert (a[0] == b[0]) != (a[1] == b[1]), (name, a, b)
                assert (a, b) not in all_edges, (name, "repeated edge")
                all_edges.add((a, b))
            # repeated vertices only at touch points: each appears at
            # most twice, and the two visits' in/out direction pairs
            # must not interleave (touch, not cross)
            from collections import Counter
            for v, cnt in Counter(ring).items():
                assert cnt <= 2, (name, v)


def test_lattice_parity_reproduces_mask():
    for name, mask in _cases().items():
        rings = trace_mask(mask)
        assert (mask_from_rings(rings, PX) == mask).all(), name


def _face_tiles(level=7):
    out = []
    for face in range(6):
        base = np.uint64((face << 61) | (1 << 60))
        out.append(int(cid.parent_v(np.array([base], np.uint64), level)[0]))
    return out


def test_spherical_roundtrip_all_faces():
    """The traced spherical polygon's parity containment reproduces
    the mask at every pixel center — the raster->vector half of the
    round-trip QA, on every cube face (the ij->xyz handedness flips
    by face; disk normalization must absorb it)."""
    cases = _cases()
    for tile in _face_tiles():
        for name, mask in cases.items():
            poly = vectorize_tile(tile, mask, PX)
            lat, lng, _ = tile_pixel_centers_latlng(tile, PX)
            x, y, z = latlng_deg_to_xyz(lat, lng)
            inside = poly.contains_points_batch(np.stack([x, y, z], 1))
            assert (inside == mask.reshape(-1)).all(), \
                (cid.token(tile), name)


def test_lattice_qa_equals_spherical_qa():
    """The query's fast lattice QA and the spherical containment QA
    agree ring-for-ring (gnomonic projection maps geodesics to
    straight uv lines; st->uv keeps lattice lines axis-aligned)."""
    rng = np.random.RandomState(7)
    tile = _face_tiles()[2]
    for _ in range(4):
        mask = rng.rand(PX, PX) < 0.35
        rings = trace_mask(mask)
        lat_qa = mask_from_rings(rings, PX)
        poly = vectorize_tile(tile, mask, PX)
        lat, lng, _ = tile_pixel_centers_latlng(tile, PX)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        sph = poly.contains_points_batch(np.stack([x, y, z], 1)) \
            if poly is not None else np.zeros(PX * PX, bool)
        assert (lat_qa.reshape(-1) == sph).all()


def test_tile_vectorize_query(ray_session):
    from geo_ray.pipelines.queries import q_tile_vectorize

    df = q_tile_vectorize("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert df["qa_ok"].all()
    assert (df["n_rings"] >= 1).all()
    assert (df["n_filled"] >= 1).all()


def _batch_rings_per_tile(stack):
    from geo_ray.stages.vectorize import trace_masks_batch

    rt, rl, vx, vy = trace_masks_batch(stack)
    per = {i: [] for i in range(len(stack))}
    pos = 0
    for r in range(len(rt)):
        n = int(rl[r])
        per[int(rt[r])].append(
            list(zip(vx[pos:pos + n].tolist(), vy[pos:pos + n].tolist())))
        pos += n
    return per


def _canon(rings):
    out = set()
    for ring in rings:
        ring = [tuple(map(int, v)) for v in ring]
        i = ring.index(min(ring))
        out.add(tuple(ring[i:] + ring[:i]))
    return out


def test_batch_tracer_matches_scalar():
    """trace_masks_batch yields the exact same ring set per tile as
    the scalar tracer (up to ring rotation), across the named corpus
    plus 100 random fills at varied density."""
    rng = np.random.RandomState(3)
    cases = list(_cases().values())
    for _ in range(100):
        cases.append(rng.rand(PX, PX) < rng.rand())
    cases.append(np.zeros((PX, PX), bool))
    stack = np.stack(cases)
    per = _batch_rings_per_tile(stack)
    for i, mask in enumerate(cases):
        assert _canon(trace_mask(mask)) == _canon(per[i]), i


def test_batch_parity_qa_matches_masks():
    from geo_ray.stages.vectorize import (masks_from_rings_batch,
                                          trace_masks_batch)

    rng = np.random.RandomState(5)
    cases = list(_cases().values())
    for _ in range(40):
        cases.append(rng.rand(PX, PX) < rng.rand())
    stack = np.stack(cases)
    rt, rl, vx, vy = trace_masks_batch(stack)
    back = masks_from_rings_batch(rt, rl, vx, vy, len(stack), PX)
    assert (back == stack).all()


def test_batch_tracer_non_square():
    """h != w masks: corner-lattice pitch and tile offsets stay
    consistent."""
    rng = np.random.RandomState(11)
    stack = rng.rand(16, 5, 9) < 0.4
    per = _batch_rings_per_tile(stack)
    for i in range(len(stack)):
        assert _canon(trace_mask(stack[i])) == _canon(per[i]), i


def test_tile_vectorize_oracle_sf0001(ray_session):
    """The SQL oracle (boundary edges + sharp-turn successor +
    recursive cycle count) reproduces the engine's n_rings/n_filled
    per tile token exactly."""
    import duckdb

    from geo_ray.pipelines.queries import (q_tile_vectorize,
                                           sql_tile_vectorize)

    got = q_tile_vectorize("/root/testdata/sf0.001").to_pandas()
    want = duckdb.connect().execute(
        sql_tile_vectorize(num_images=2000)).df()
    cols = list(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(g) == len(w) > 0
    assert g.astype(str).equals(w.astype(str))

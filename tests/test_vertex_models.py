"""Vertex-model boundary semantics and the furthest-point query."""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.loop import Loop


def pt(lat, lng):
    x, y, z = latlng_deg_to_xyz(np.float64(lat), np.float64(lng))
    return (float(x), float(y), float(z))


QUAD = Loop.from_text("0:0, 0:10, 10:10, 10:0")


def test_boundary_detection():
    # a vertex
    assert QUAD.boundary_contains_point(QUAD.vertices[0])
    # a point on the equator edge between 0:0 and 0:10 — the equator
    # edge is the z=0 plane, so (0, 5deg) lies exactly on it
    assert QUAD.boundary_contains_point(pt(0.0, 5.0))
    # clear interior / exterior points are not boundary
    assert not QUAD.boundary_contains_point(pt(5.0, 5.0))
    assert not QUAD.boundary_contains_point(pt(20.0, 20.0))


def test_vertex_models():
    on_edge = pt(0.0, 5.0)
    vertex = QUAD.vertices[2]
    interior = pt(5.0, 5.0)
    exterior = pt(20.0, 20.0)
    for p in (on_edge, vertex):
        assert not QUAD.contains_point_with_model(p, "open")
        assert QUAD.contains_point_with_model(p, "closed")
    for model in ("open", "semi_open", "closed"):
        assert QUAD.contains_point_with_model(interior, model)
        assert not QUAD.contains_point_with_model(exterior, model)
    # semi-open: each boundary point belongs to exactly one of the two
    # adjacent regions (loop vs complement)
    inv = QUAD.invert()
    for p in (on_edge, vertex):
        a = QUAD.contains_point_with_model(p, "semi_open")
        b = inv.contains_point_with_model(p, "semi_open")
        assert a != b
    with pytest.raises(ValueError):
        QUAD.contains_point_with_model(interior, "bogus")


def test_furthest_matches_oracle(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from geo_ray.functions import cellid as cid
    from geo_ray.stages.knn import furthest

    rng = np.random.default_rng(7)
    lat = rng.uniform(-60, 60, 2000)
    lng = rng.uniform(-180, 180, 2000)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    tbl = pa.table({
        "pid": pa.array([f"p{i:05d}" for i in range(2000)]),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        "cell_id": pa.array(cid.cell_id_from_point_v(x, y, z), pa.uint64()),
    })
    qx, qy, qz = latlng_deg_to_xyz(np.array([10.0]), np.array([20.0]))
    Q = np.stack([qx, qy, qz], axis=1)
    got = furthest(rd.from_arrow(tbl), (["q0"], Q), 5, id_col="pid") \
        .to_pandas().sort_values("rank")
    X = np.stack([x, y, z], axis=1)
    d = np.clip(2.0 - 2.0 * (X @ Q.T).ravel(), 0, 4)
    ids = np.array(tbl.column("pid").to_pylist())
    order = np.lexsort((ids, -d))[:5]
    assert list(got["neighbor_id"]) == ids[order].tolist()

"""Cap.AddPoint / AddCap folds + CellUnion.CapBound + the distributed
bounding-cap aggregate.

Ported cases: s2/cap_test.go TestCapAddPoint (:367-419) and
TestCapAddCap (:421-452); containment loop of
s2/cellunion_test.go:407-411.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions import chordangle as ca
from geo_ray.state import cellunion as cu
from geo_ray.state.cap import Cap
from geo_ray.state.cell import Cell


def _norm(x, y, z):
    n = math.sqrt(x * x + y * y + z * z)
    return (x / n, y / n, z / n)


X_AXIS = Cap.from_point((1.0, 0.0, 0.0))
Y_AXIS = Cap.from_point((0.0, 1.0, 0.0))
HEMI = Cap(_norm(1, 0, 1), 2.0)  # CapFromCenterHeight(.., 1): chord2 = 2h


def test_chordangle_add_reference():
    # s1/chordangle_test.go arithmetic: add is exact at the anchors.
    deg = lambda d: float(2.0 * np.sin(np.radians(d) / 2)) ** 2
    assert ca.add(0.0, 0.0) == 0.0
    assert ca.add(deg(60), 0.0) == deg(60)
    assert ca.add(deg(90), deg(90)) == ca.STRAIGHT
    assert abs(ca.add(deg(60), deg(30)) - deg(90)) < 1e-15
    assert abs(ca.add(deg(120), deg(120)) - ca.STRAIGHT) < 1e-15


@pytest.mark.parametrize("have,p,want", [
    # cap plus its center equals itself
    (X_AXIS, (1, 0, 0), X_AXIS),
    (Y_AXIS, (0, 1, 0), Y_AXIS),
    # cap plus opposite point equals full
    (X_AXIS, (-1, 0, 0), Cap.full()),
    (Y_AXIS, (0, -1, 0), Cap.full()),
    # cap plus orthogonal axis equals half cap
    (X_AXIS, (0, 0, 1), Cap.from_center_angle((1, 0, 0), math.pi / 2)),
    (X_AXIS, (0, 0, -1), Cap.from_center_angle((1, 0, 0), math.pi / 2)),
    # the 45-degree hemisphere plus some points
    (HEMI, _norm(0, 1, -1),
     Cap.from_center_angle(_norm(1, 0, 1), math.radians(120.0))),
    (HEMI, _norm(0, -1, -1),
     Cap.from_center_angle(_norm(1, 0, 1), math.radians(120.0))),
    (HEMI, _norm(-1, -1, -1),
     Cap.from_center_angle(_norm(1, 0, 1), math.acos(-math.sqrt(2.0 / 3.0)))),
    (HEMI, _norm(0, 1, 1), HEMI),
    (HEMI, (1, 0, 0), HEMI),
])
def test_cap_add_point(have, p, want):
    got = have.add_point(p)
    assert got.approx_equal(want, 1e-14)
    assert got.contains_point(p)


def test_cap_add_point_empty():
    got = Cap.empty().add_point((0, 1, 0))
    assert got.center == (0.0, 1.0, 0.0) and got.radius_chord2 == 0.0


@pytest.mark.parametrize("have,other,want", [
    (Cap.empty(), Cap.empty(), Cap.empty()),
    (Cap.full(), Cap.full(), Cap.full()),
    (Cap.full(), Cap.empty(), Cap.full()),
    (Cap.empty(), Cap.full(), Cap.full()),
    (X_AXIS, Cap.empty(), X_AXIS),
    (Cap.empty(), X_AXIS, X_AXIS),
    (Y_AXIS, Cap.empty(), Y_AXIS),
    (Cap.empty(), Y_AXIS, Y_AXIS),
    # two halves make a whole
    (X_AXIS, X_AXIS.complement(), Cap.full()),
    # two zero-height orthogonal axis caps make a half-cap
    (X_AXIS, Y_AXIS, Cap.from_center_angle((1, 0, 0), math.pi / 2)),
])
def test_cap_add_cap(have, other, want):
    assert have.add_cap(other).approx_equal(want, 1e-14)


def test_cellunion_cap_bound_contains_cells():
    # s2/cellunion_test.go:407-411 containment loop over random unions.
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 12))
        ids = []
        for _ in range(n):
            face = int(rng.integers(0, 6))
            lvl = int(rng.integers(0, 12))
            i = int(rng.integers(0, 1 << 30))
            j = int(rng.integers(0, 1 << 30))
            ids.append(cid.parent(cid.cell_id_from_face_ij(face, i, j), lvl))
        union = cu.normalize(ids)
        cb = cu.cap_bound(union)
        for ci in union:
            cell = Cell(ci)
            assert cb.add_cap(cell.cap_bound()).approx_equal(cb, 1e-10), \
                "cap bound must contain every cell's own bound"
            for v in cell.vertices():
                assert cb.contains_point(v)


def test_cellunion_cap_bound_empty_and_single():
    assert cu.cap_bound([]).is_empty()
    ci = cid.cell_id_from_latlng(42.0, 7.0)
    one = cu.cap_bound([ci])
    assert one.add_cap(Cell(ci).cap_bound()).approx_equal(one, 1e-12)


def test_bounding_cap_aggregate(ray_session):
    import ray

    from geo_ray.stages.capfold import bounding_cap

    rng = np.random.default_rng(11)
    v = rng.normal(size=(5000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # cluster the stream so the cap is not near-full
    v[:, 0] = np.abs(v[:, 0]) + 1.5
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({"x": v[:, 0], "y": v[:, 1], "z": v[:, 2]})
    ds = ray.data.from_arrow(tbl).repartition(8)
    cap = bounding_cap(ds)
    # contract: the merged cap contains every input point
    assert bool(cap.contains_points_v(v[:, 0], v[:, 1], v[:, 2]).all())
    # the single-partition fold equals the sequential reference fold
    seq = Cap.empty()
    for p in v[:200]:
        seq = seq.add_point((float(p[0]), float(p[1]), float(p[2])))
    one = bounding_cap(ray.data.from_arrow(
        pa.table({"x": v[:200, 0], "y": v[:200, 1], "z": v[:200, 2]})
    ).repartition(1))
    assert one.center == seq.center
    assert one.radius_chord2 == seq.radius_chord2


def test_bounding_cap_empty_blocks(ray_session):
    import ray

    from geo_ray.stages.capfold import bounding_cap

    tbl = pa.table({"x": pa.array([1.0]), "y": pa.array([0.0]),
                    "z": pa.array([0.0])})
    ds = ray.data.from_arrow(tbl).repartition(4)  # 3 empty blocks
    cap = bounding_cap(ds)
    assert cap.contains_point((1.0, 0.0, 0.0))
    assert cap.radius_chord2 <= 1e-12


def test_add_cap_containment_property():
    """a.add_cap(b) must contain every point of both caps (the
    reference's documented AddCap contract), over random cap pairs
    incl. near-antipodal centers."""
    rng = np.random.default_rng(23)
    for _ in range(300):
        def rand_cap():
            v = rng.normal(size=3)
            v /= np.linalg.norm(v)
            return Cap(tuple(v), float(rng.uniform(0, 4)))

        a, b = rand_cap(), rand_cap()
        u = a.add_cap(b)
        for cap in (a, b):
            # sample points inside `cap`: rotate center towards
            # random directions by angles <= cap radius
            ang = cap.radius_rad()
            for _ in range(8):
                d = rng.normal(size=3)
                c = np.asarray(cap.center)
                d -= d.dot(c) * c
                n = np.linalg.norm(d)
                if n < 1e-12:
                    continue
                t = rng.uniform(0, ang)
                p = np.cos(t) * c + np.sin(t) * (d / n)
                p /= np.linalg.norm(p)
                assert u.contains_point(tuple(p)), \
                    (cap.center, cap.radius_chord2, u.radius_chord2)

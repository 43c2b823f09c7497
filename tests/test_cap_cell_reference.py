"""Cap<->Cell relation conformance ported from
s2/cap_test.go:454-585 (TestCapContainsCell / TestCapIntersectsCell):
face-covering caps, edge-bulging caps, singleton caps, and
Hilbert-adjacent leaf bounding caps."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions import stuv
from geo_ray.state.cap import Cap
from geo_ray.state.cell import Cell

EPS = 1e-15  # s2/s2_test.go:47
FACE_RADIUS = math.atan(math.sqrt(2.0))


def unit_norm(face: int):
    """Outward normal of a face (s2/stuv.go:448)."""
    x, y, z = stuv.face_uv_to_xyz(face, 0.0, 0.0)
    return (float(x), float(y), float(z))


def _cell_from_uv(face: int, u: float, v: float) -> Cell:
    x, y, z = stuv.face_uv_to_xyz(face, u, v)
    n = math.sqrt(float(x * x + y * y + z * z))
    return Cell(cid.cell_id_from_point(float(x) / n, float(y) / n,
                                       float(z) / n))


@pytest.mark.parametrize("face", range(6))
def test_cap_contains_cell(face):
    root_cell = Cell(cid.parent(cid.cell_id_from_face_ij(face, 0, 0), 0))
    edge_cell = _cell_from_uv(face, 0.0, 1 - EPS)
    corner_cell = _cell_from_uv(face, 1 - EPS, 1 - EPS)

    assert Cap.full().contains_cell(root_cell)

    # bounding caps of Hilbert-adjacent leaves contain cornerCell only
    # for its own id
    first = cid.advance(corner_cell.id, -3)
    ci = first
    for _ in range(7):
        c = Cell(ci).cap_bound()
        want = (ci == corner_cell.id)
        assert c.contains_cell(corner_cell) == want, hex(ci)
        ci = cid.next_cell(ci)

    for cap_face in range(6):
        center = unit_norm(cap_face)
        covering = Cap.from_center_angle(center, FACE_RADIUS + EPS)
        assert covering.contains_cell(root_cell) == (cap_face == face)
        edge_center = cid.cell_id_to_point(edge_cell.id)
        dot = sum(center[i] * edge_center[i] for i in range(3))
        assert covering.contains_cell(edge_cell) == (dot > 0.1)
        assert covering.contains_cell(edge_cell) == \
            covering.intersects_cell(edge_cell)
        assert covering.contains_cell(corner_cell) == (cap_face == face)

        bulging = Cap.from_center_angle(center, math.pi / 4 + EPS)
        assert not bulging.contains_cell(root_cell)
        assert bulging.contains_cell(edge_cell) == (cap_face == face)
        assert not bulging.contains_cell(corner_cell)


@pytest.mark.parametrize("face", range(6))
def test_cap_intersects_cell(face):
    root_cell = Cell(cid.parent(cid.cell_id_from_face_ij(face, 0, 0), 0))
    edge_cell = _cell_from_uv(face, 0.0, 1 - EPS)
    corner_cell = _cell_from_uv(face, 1 - EPS, 1 - EPS)

    assert not Cap.empty().intersects_cell(root_cell)

    first = cid.advance(corner_cell.id, -3)
    ci = first
    for _ in range(7):
        c = Cell(ci).cap_bound()
        want = cid.contains(cid.immediate_parent(ci), corner_cell.id)
        assert c.intersects_cell(corner_cell) == want, hex(ci)
        ci = cid.next_cell(ci)

    anti_face = (face + 3) % 6
    for cap_face in range(6):
        center = unit_norm(cap_face)
        covering = Cap.from_center_angle(center, FACE_RADIUS + EPS)
        assert covering.intersects_cell(root_cell) == (cap_face != anti_face)
        assert covering.intersects_cell(edge_cell) == \
            covering.contains_cell(edge_cell)
        corner_center = cid.cell_id_to_point(corner_cell.id)
        dot = sum(center[i] * corner_center[i] for i in range(3))
        assert covering.intersects_cell(corner_cell) == (dot > 0)

        bulging = Cap.from_center_angle(center, math.pi / 4 + EPS)
        assert bulging.intersects_cell(root_cell) == (cap_face != anti_face)
        edge_center = cid.cell_id_to_point(edge_cell.id)
        dot_e = sum(center[i] * edge_center[i] for i in range(3))
        assert bulging.intersects_cell(edge_cell) == (dot_e > 0.1)
        assert not bulging.intersects_cell(corner_cell)

        singleton = Cap.from_center_angle(center, 0.0)
        assert singleton.intersects_cell(root_cell) == (cap_face == face)
        assert not singleton.intersects_cell(edge_cell)
        assert not singleton.intersects_cell(corner_cell)

"""Exact Rect<->Cell relations vs a dense sampling oracle, and Rect
coverings through the RegionCoverer."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.state.cell import Cell
from geo_ray.state.coverer import RegionCoverer
from geo_ray.state.rect import Rect

from tests.test_covering import check_covering

RNG = np.random.default_rng(202)


def _sample_cell_points(cell: Cell, n=200):
    """Points inside the cell via st-space sampling."""
    from geo_ray.functions import stuv

    u = RNG.uniform(cell.u_lo, cell.u_hi, n)
    v = RNG.uniform(cell.v_lo, cell.v_hi, n)
    x, y, z = stuv.face_uv_to_xyz(np.full(n, cell.face), u, v)
    norm = np.sqrt(x * x + y * y + z * z)
    return np.stack([x / norm, y / norm, z / norm], axis=1)


def _sample_rect_points(rect: Rect, n=200):
    lat = RNG.uniform(rect.lat_lo, rect.lat_hi, n)
    if rect.lng_lo <= rect.lng_hi:
        lng = RNG.uniform(rect.lng_lo, rect.lng_hi, n)
    else:
        span = rect.lng_hi + 360 - rect.lng_lo
        lng = rect.lng_lo + RNG.uniform(0, span, n)
        lng = np.where(lng > 180, lng - 360, lng)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def _rand_rect():
    lat_lo = RNG.uniform(-70, 50)
    lat_hi = lat_lo + RNG.uniform(5, 30)
    lng_lo = RNG.uniform(-180, 180)
    lng_hi = lng_lo + RNG.uniform(5, 60)
    if lng_hi > 180:
        lng_hi -= 360
    return Rect(lat_lo, lat_hi, lng_lo, lng_hi)


def _rand_cell(level):
    return Cell(cid.parent(cid.cell_id_from_latlng(
        float(RNG.uniform(-75, 75)), float(RNG.uniform(-180, 180))), level))


def test_intersects_cell_no_false_negatives():
    """If sampling finds a shared point, the exact test must agree."""
    for _ in range(150):
        rect = _rand_rect()
        cell = _rand_cell(int(RNG.integers(2, 8)))
        cell_pts = _sample_cell_points(cell, 150)
        lat = np.degrees(np.arcsin(np.clip(cell_pts[:, 2], -1, 1)))
        lng = np.degrees(np.arctan2(cell_pts[:, 1], cell_pts[:, 0]))
        shared = rect.contains_latlng_v(lat, lng).any()
        if not shared:
            rect_pts = _sample_rect_points(rect, 150)
            shared = any(cell.contains_point(tuple(p)) for p in rect_pts)
        if shared:
            assert rect.intersects_cell(cell), (rect.lat_lo, rect.lng_lo,
                                                cid.token(cell.id))


def test_intersects_cell_no_false_positives_when_far():
    """Disjoint bounding boxes with margin must not intersect."""
    rect = Rect(10.0, 20.0, 10.0, 20.0)
    far = Cell(cid.parent(cid.cell_id_from_latlng(-50.0, -120.0), 6))
    assert not rect.intersects_cell(far)
    assert not rect.contains_cell(far)


def test_contains_cell_exact():
    cell = Cell(cid.parent(cid.cell_id_from_latlng(15.0, 15.0), 8))
    lat_lo, lat_hi, lng_lo, lng_hi = cell.rect_bound()
    big = Rect(math.degrees(lat_lo) - 1, math.degrees(lat_hi) + 1,
               math.degrees(lng_lo) - 1, math.degrees(lng_hi) + 1)
    assert big.contains_cell(cell)
    assert big.intersects_cell(cell)
    small = Rect(15.0, 15.5, 15.0, 15.5)
    assert not small.contains_cell(cell)
    # containment implies every sampled cell point is inside
    pts = _sample_cell_points(cell, 300)
    lat = np.degrees(np.arcsin(np.clip(pts[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    assert big.contains_latlng_v(lat, lng).all()


def test_rect_covering():
    rect = Rect(10.0, 25.0, 30.0, 60.0)
    rc = RegionCoverer(max_cells=16, max_level=10)
    covering = rc.covering(rect)
    check_covering(rc, rect, covering, False)
    interior = rc.interior_covering(rect)
    for ci in interior:
        assert rect.contains_cell(Cell(ci))


def test_rect_covering_antimeridian():
    rect = Rect(-10.0, 10.0, 170.0, -170.0)  # wraps
    rc = RegionCoverer(max_cells=16, max_level=8)
    covering = rc.covering(rect)
    check_covering(rc, rect, covering, False)
    # a point on each side of the antimeridian is covered
    from geo_ray.state import cellunion as cu
    norm = cu.normalize(covering)
    for lng in (175.0, -175.0):
        leaf = cid.cell_id_from_latlng(0.0, lng)
        assert cu.contains_cell_id(norm, leaf)

"""Rect<->Cell relation table ported verbatim from
s2/rect_test.go:547-688 (TestRectCellOps), including the bug-report
case and the tiny-rect-at-a-60/120-degree-corner case that requires
the exact lat-edge intersection math."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.state.cell import Cell
from geo_ray.state.rect import Rect


def from_face_pos_level(face: int, pos: int, level: int) -> int:
    raw = (face << 61) | pos | 1
    return cid.parent(raw, level)


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi) -> Rect:
    """Matches rectFromDegrees argument order (latLo, lngLo, latHi, lngHi)."""
    return Rect(lat_lo, lat_hi, lng_lo, lng_hi)


EMPTY = Rect(1.0, -1.0, 1.0, -1.0)
FULL = Rect(-90.0, 90.0, -180.0, 180.0)

# cell0: leaf at the corner direction (1+1e-12, 1, 1)
_c0 = np.array([1 + 1e-12, 1.0, 1.0])
_c0 = _c0 / np.linalg.norm(_c0)
CELL0 = Cell(cid.cell_id_from_point(*(float(v) for v in _c0)))
_v0 = CELL0.vertices()[0]
V0_LAT = math.degrees(math.asin(max(-1, min(1, _v0[2]))))
V0_LNG = math.degrees(math.atan2(_v0[1], _v0[0]))

CELL202 = Cell(from_face_pos_level(2, 0, 2))
_b202 = CELL202.rect_bound()
B202_LAT_LO = math.degrees(_b202[0])
B202_LAT_HI = math.degrees(_b202[1])
B202_LNG_LO = math.degrees(_b202[2])
B202_LNG_HI = math.degrees(_b202[3])

CASES = [
    (EMPTY, Cell(from_face_pos_level(3, 0, 0)), False, False),
    (FULL, Cell(from_face_pos_level(2, 0, 0)), True, True),
    (FULL, Cell(from_face_pos_level(5, 0, 25)), True, True),
    # first quadrant of face 0, slightly expanded
    (rect_deg(-45.1, -45.1, 0.1, 0.1), Cell(from_face_pos_level(0, 0, 0)),
     False, True),
    (rect_deg(-45.1, -45.1, 0.1, 0.1), Cell(from_face_pos_level(0, 0, 1)),
     True, True),
    (rect_deg(-45.1, -45.1, 0.1, 0.1), Cell(from_face_pos_level(1, 0, 1)),
     False, False),
    # rect intersecting the first quadrant of face 0
    (rect_deg(-10, -45, 10, 0), Cell(from_face_pos_level(0, 0, 0)),
     False, True),
    (rect_deg(-10, -45, 10, 0), Cell(from_face_pos_level(0, 0, 1)),
     False, True),
    (rect_deg(-10, -45, 10, 0), Cell(from_face_pos_level(1, 0, 1)),
     False, False),
    # single point
    (rect_deg(4, 4, 4, 4), Cell(from_face_pos_level(0, 0, 0)), False, True),
    # rects that intersect a face's BOUNDING rect but not the face
    (rect_deg(41, -87, 42, -79), Cell(from_face_pos_level(2, 0, 0)),
     False, False),
    (rect_deg(-41, 160, -40, -160), Cell(from_face_pos_level(5, 0, 0)),
     False, False),
    # tiny rect near the 60/120-degree corner leaf (exact lat-edge math)
    (rect_deg(V0_LAT - 1e-8, V0_LNG - 1e-8, V0_LAT - 2e-10, V0_LNG + 1e-10),
     CELL0, False, False),
    # crossing rect through a face-cell corner: no vertex containment
    (rect_deg(-37, -70, -36, -20), Cell(from_face_pos_level(5, 0, 0)),
     False, True),
    # diamond-vs-square intersection
    (rect_deg(B202_LAT_LO + 3, B202_LNG_LO + 3, B202_LAT_HI - 3,
              B202_LNG_HI - 3), CELL202, False, True),
    # from a bug report
    (rect_deg(34.2572864, 135.2673642, 34.2707907, 135.2995742),
     Cell(0x6007500000000000), False, True),
]


@pytest.mark.parametrize("rect,cell,want_contains,want_intersects",
                         CASES, ids=range(len(CASES)))
def test_rect_cell_ops(rect, cell, want_contains, want_intersects):
    assert rect.contains_cell(cell) == want_contains
    assert rect.intersects_cell(cell) == want_intersects

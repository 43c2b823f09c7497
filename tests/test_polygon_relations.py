"""Multi-loop polygon relations: full port of TestPolygonRelations
(s2/polygon_test.go:603-1010) over the reference's near/far/south loop
nests, shell+hole crosses and shared-vertex overlaps — exercising
compareBoundary / containsNonCrossingBoundary / the complement-shell
exclusion logic."""

from __future__ import annotations

import pytest

from geo_ray.state.loop import Loop
from geo_ray.state.polygon import Polygon

# reference corpus (s2/polygon_test.go:26-95); ';'-separated loops
NEAR0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
NEAR2 = "-1:-2, -2:5, 5:-2;"
NEAR3 = "-2:-2, -3:6, 6:-3;"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0;"
FAR0 = "0:179, 1:180, 0:-179, 2:-180;"
FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178;"
FAR2 = "3:-178, 3:178, -1:179, -1:-179;"
FAR3 = "-3:-178, 4:-177, 4:177, -3:178, -2:179;"
FAR_HEMI = "0:-90, 60:90, -60:90;"
SOUTH0A = "-90:0, -89.99:0.01, -89.99:0;"
SOUTH0B = "-90:0, -89.99:0.03, -89.99:0.02;"
SOUTH0C = "-90:0, -89.99:0.05, -89.99:0.04;"
SOUTH1 = "-90:0, -89.9:0.1, -89.9:-0.1;"
SOUTH2 = "-90:0, -89.8:0.2, -89.8:-0.2;"
SOUTH_HEMI = "0:-180, 0:60, 0:-60;"
NEARFAR1 = ("-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, "
            "1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175;")
NEARFAR2 = "-2:15, -2:170, -8:-175, 8:-175, 2:170, 2:15, 8:-4, -8:-4;"
CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;"
CROSS1_SIDE_HOLE = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5;"
CROSS_CENTER_HOLE = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5;"
CROSS2_SIDE_HOLE = "0.5:-1.5, 0.5:-1.2, -0.5:-1.2, -0.5:-1.5;"
CROSS2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2;"
OVERLAP1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0;"
OVERLAP1_SIDE_HOLE = "0.2:0.8, 0.8:0.8, 0.8:0.2, 0.2:0.2;"
OVERLAP_CENTER_HOLE = "1.2:0.8, 1.8:0.8, 1.8:0.2, 1.2:0.2;"
OVERLAP2_SIDE_HOLE = "2.2:0.8, 2.8:0.8, 2.8:0.2, 2.2:0.2;"
OVERLAP2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0;"

import math


def make_polygon(s: str) -> Polygon:
    loops = []
    for part in s.split(";"):
        part = part.strip()
        if not part:
            continue
        loop = Loop.from_text(part)
        if not loop.is_full() and loop.area() > 2 * math.pi:
            loop = loop.invert()  # Normalize(): enclosed area <= 2*pi
        loops.append(loop)
    return Polygon(loops)


POLYGONS = {
    "empty": Polygon([]),
    "full": Polygon([Loop.full()]),
    "near01": NEAR0 + NEAR1,
    "near30": NEAR3 + NEAR0,
    "near23": NEAR2 + NEAR3,
    "near0231": NEAR0 + NEAR2 + NEAR3 + NEAR1,
    "near023H1": NEAR0 + NEAR2 + NEAR3 + NEAR_HEMI + NEAR1,
    "far01": FAR0 + FAR1,
    "far21": FAR2 + FAR1,
    "far231": FAR2 + FAR3 + FAR1,
    "far2H0": FAR2 + FAR_HEMI + FAR0,
    "far2H013": FAR2 + FAR_HEMI + FAR0 + FAR1 + FAR3,
    "south0ab": SOUTH0A + SOUTH0B,
    "south2": SOUTH2,
    "south20b1": SOUTH2 + SOUTH0B + SOUTH1,
    "south2H1": SOUTH2 + SOUTH_HEMI + SOUTH1,
    "south20bH0ac": SOUTH2 + SOUTH0B + SOUTH_HEMI + SOUTH0A + SOUTH0C,
    "nf1": SOUTH0C + FAR2 + NEAR1 + NEARFAR1 + NEAR0 + SOUTH1 + SOUTH0B +
           SOUTH0A,
    "nf2": FAR2 + SOUTH0A + FAR1 + SOUTH1 + FAR0 + SOUTH0B + NEARFAR2 +
           SOUTH2 + NEAR2,
    "f32n0": FAR2 + NEAR0 + FAR3,
    "n32s0b": NEAR3 + SOUTH0B + NEAR2,
    "cross1": CROSS1,
    "cross1SideHole": CROSS1 + CROSS1_SIDE_HOLE,
    "cross1CenterHole": CROSS1 + CROSS_CENTER_HOLE,
    "cross2": CROSS2,
    "cross2SideHole": CROSS2 + CROSS2_SIDE_HOLE,
    "cross2CenterHole": CROSS2 + CROSS_CENTER_HOLE,
    "overlap1": OVERLAP1,
    "overlap1SideHole": OVERLAP1 + OVERLAP1_SIDE_HOLE,
    "overlap1CenterHole": OVERLAP1 + OVERLAP_CENTER_HOLE,
    "overlap2": OVERLAP2,
    "overlap2SideHole": OVERLAP2 + OVERLAP2_SIDE_HOLE,
    "overlap2CenterHole": OVERLAP2 + OVERLAP_CENTER_HOLE,
}


def _get(name: str) -> Polygon:
    p = POLYGONS[name]
    if isinstance(p, Polygon):
        return p
    return make_polygon(p)


# (a, b, contains, contained, intersects) — s2/polygon_test.go:603-1010
MATRIX = [
    ("near01", "empty", True, False, False),
    ("near01", "near01", True, True, True),
    ("full", "near01", True, False, True),
    ("near01", "near30", False, True, True),
    ("near01", "near23", False, False, False),
    ("near01", "near0231", False, True, True),
    ("near01", "near023H1", False, False, False),
    ("near30", "near23", True, False, True),
    ("near30", "near0231", True, False, True),
    ("near30", "near023H1", False, False, True),
    ("near23", "near0231", False, True, True),
    ("near23", "near023H1", False, False, False),
    ("near0231", "near023H1", False, False, False),
    ("far01", "far21", False, False, False),
    ("far01", "far231", False, True, True),
    ("far01", "far2H0", False, False, False),
    ("far01", "far2H013", False, False, False),
    ("far21", "far231", False, False, False),
    ("far21", "far2H0", False, False, False),
    ("far21", "far2H013", False, True, True),
    ("far231", "far2H0", False, False, True),
    ("far231", "far2H013", False, False, True),
    ("far2H0", "far2H013", False, False, True),
    ("south0ab", "south2", False, True, True),
    ("south0ab", "south20b1", False, False, True),
    ("south0ab", "south2H1", False, True, True),
    ("south0ab", "south20bH0ac", False, True, True),
    ("south2", "south20b1", True, False, True),
    ("south2", "south2H1", False, False, True),
    ("south2", "south20bH0ac", False, False, True),
    ("south20b1", "south2H1", False, False, True),
    ("south20b1", "south20bH0ac", False, False, True),
    ("south2H1", "south20bH0ac", True, False, True),
    ("nf1", "nf2", False, False, True),
    ("nf1", "near23", True, False, True),
    ("nf1", "far21", False, False, False),
    ("nf1", "south0ab", False, False, False),
    ("nf1", "f32n0", True, False, True),
    ("nf2", "near01", False, False, False),
    ("nf2", "far01", True, False, True),
    ("nf2", "south20b1", True, False, True),
    ("nf2", "south0ab", True, False, True),
    ("nf2", "n32s0b", True, False, True),
    ("cross1", "cross2", False, False, True),
    ("cross1SideHole", "cross2", False, False, True),
    ("cross1CenterHole", "cross2", False, False, True),
    ("cross1", "cross2SideHole", False, False, True),
    ("cross1", "cross2CenterHole", False, False, True),
    ("cross1SideHole", "cross2SideHole", False, False, True),
    ("cross1CenterHole", "cross2SideHole", False, False, True),
    ("cross1SideHole", "cross2CenterHole", False, False, True),
    ("cross1CenterHole", "cross2CenterHole", False, False, True),
    ("overlap1", "overlap2", False, False, True),
    ("overlap1SideHole", "overlap2", False, False, True),
    ("overlap1CenterHole", "overlap2", False, False, True),
    ("overlap1", "overlap2SideHole", False, False, True),
    ("overlap1", "overlap2CenterHole", False, False, True),
    ("overlap1SideHole", "overlap2SideHole", False, False, True),
    ("overlap1CenterHole", "overlap2SideHole", False, False, True),
    ("overlap1SideHole", "overlap2CenterHole", False, False, True),
    ("overlap1CenterHole", "overlap2CenterHole", False, False, True),
]


@pytest.mark.parametrize("a_name,b_name,contains,contained,intersects",
                         MATRIX)
def test_polygon_relation_matrix(a_name, b_name, contains, contained,
                                 intersects):
    a, b = _get(a_name), _get(b_name)
    assert a.contains_polygon(b) == contains, "contains"
    assert b.contains_polygon(a) == contained, "contained"
    assert a.intersects_polygon(b) == intersects, "a intersects b"
    assert b.intersects_polygon(a) == intersects, "b intersects a"
    if contains:
        # nested-pair identities (testPolygonOneNestedPair)
        assert a.intersects_polygon(b) == (not b.is_empty())
    if not intersects:
        # disjoint-pair identities
        assert a.contains_polygon(b) == b.is_empty()
        assert b.contains_polygon(a) == a.is_empty()


def test_polygon_compare_boundary_annulus():
    """Shell+hole vs loops placed inside the hole / in the ring /
    crossing the hole boundary."""
    annulus = make_polygon(CROSS1 + CROSS_CENTER_HOLE)
    inner = Loop.from_text("-0.2:0.2, 0.2:0.2, 0.2:-0.2, -0.2:-0.2")
    ring = Loop.from_text("-1.9:0.9, -0.7:0.9, -0.7:-0.9, -1.9:-0.9")
    crossing = Loop.from_text("-0.8:0.3, 0.0:0.3, 0.0:-0.3, -0.8:-0.3")
    assert annulus.compare_boundary_loop(inner) == -1   # excluded (in hole)
    assert annulus.compare_boundary_loop(ring) == 1     # contained
    assert annulus.compare_boundary_loop(crossing) == 0  # crosses hole edge
    # region checks
    assert not annulus.contains_polygon(Polygon([inner]))
    assert not annulus.intersects_polygon(Polygon([inner]))
    assert annulus.contains_polygon(Polygon([ring]))
    assert annulus.intersects_polygon(Polygon([crossing]))
    assert not annulus.contains_polygon(Polygon([crossing]))

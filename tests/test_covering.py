"""Covering correctness, mirroring s2/regioncoverer_test.go:
``checkCovering`` (level bounds / LevelMod / no-mergeable-quads,
:44-81) and ``checkCoveringTight`` (full coverage + tightness proved
recursively from the 6 face cells, :86-114), plus determinism (:136-140)
and randomized caps.  No Ray.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.state import cellunion as cu
from geo_ray.state.cap import Cap
from geo_ray.state.cell import Cell
from geo_ray.state.coverer import FACE_IDS, RegionCoverer
from geo_ray.state.loop import Loop

from tests.corpus import make_loop

RNG = np.random.default_rng(42)


def random_cap(min_area: float, max_area: float) -> Cap:
    """Semantics of randomCap (s2/s2_test.go:231-238)."""
    area = min_area * (max_area / min_area) ** RNG.uniform()
    v = RNG.normal(size=3)
    v /= np.linalg.norm(v)
    # cap area = 2*pi*(1-cos r) -> chord2 = area/pi
    return Cap(tuple(v), area / math.pi)


def check_covering(rc: RegionCoverer, region, covering, interior: bool):
    """s2/regioncoverer_test.go:44-81."""
    min_level_cells = {}
    for ci in covering:
        level = cid.level(ci)
        assert level >= rc.min_level
        assert level <= rc.max_level
        assert (level - rc.min_level) % rc.level_mod == 0
        min_level_cells[cid.parent(ci, rc.min_level)] = \
            min_level_cells.get(cid.parent(ci, rc.min_level), 0) + 1
    if len(covering) > rc.max_cells:
        # If the covering has more than maxCells, every cell at
        # minLevel must appear at most once (it could not be merged).
        for count in min_level_cells.values():
            assert count == 1
    if interior:
        for ci in covering:
            assert region.contains_cell(Cell(ci))
    else:
        check_covering_tight(region, covering, True, 0)


def check_covering_tight(region, covering, check_tight: bool, ci: int):
    """s2/regioncoverer_test.go:86-114: recursively verify that every
    region-intersecting cell is covered, and (tight) that every covering
    cell intersects the region."""
    if ci == 0:
        for face_id in FACE_IDS:
            check_covering_tight(region, covering, check_tight, face_id)
        return
    cell = Cell(ci)
    if not region.intersects_cell(cell):
        if check_tight:
            assert not cu.intersects_cell_id(covering, ci)
    elif not cu.contains_cell_id(covering, ci):
        # The region intersects this cell but the covering does not
        # contain it fully, so it must intersect and we must recurse.
        assert not region.contains_cell(cell)
        assert not cid.is_leaf(ci)
        for child in cid.children(ci):
            check_covering_tight(region, covering, check_tight, child)


@pytest.mark.parametrize("seed", range(24))
def test_random_caps(seed):
    """s2/regioncoverer_test.go:116-149 (scaled down: 24 random caps
    with random level/level_mod/max_cells configs instead of 1000;
    same cap-area constraint relative to min_level)."""
    from geo_ray.functions import metric

    min_level = int(RNG.integers(0, 6))
    max_level = int(min_level + RNG.integers(2, 9))
    max_cells = int(RNG.integers(1, 13))
    rc = RegionCoverer(min_level=min_level, max_level=max_level,
                       level_mod=int(RNG.integers(1, 4)),
                       max_cells=max_cells)
    max_area = min(4 * math.pi,
                   (3 * max_cells + 1) * metric.AVG_AREA.value(min_level))
    cap = random_cap(0.1 * metric.AVG_AREA.value(30), max_area)
    covering = rc.covering(cap)
    check_covering(rc, cap, covering, False)
    interior = rc.interior_covering(cap)
    check_covering(rc, cap, interior, True)
    # determinism
    assert covering == rc.covering(cap)


def test_simple_cap():
    cap = Cap.from_latlng_deg(40.0, -122.0, math.radians(0.5))
    rc = RegionCoverer(max_cells=8)
    covering = rc.covering(cap)
    assert 1 <= len(covering) <= 8
    check_covering(rc, cap, covering, False)


def test_cap_level_mod():
    cap = Cap.from_latlng_deg(10.0, 20.0, math.radians(1.0))
    for level_mod in (2, 3):
        rc = RegionCoverer(min_level=4, max_level=16, level_mod=level_mod,
                           max_cells=10)
        covering = rc.covering(cap)
        check_covering(rc, cap, covering, False)


@pytest.mark.parametrize("name", ["arctic80", "loopA", "loopE", "smallNECW"])
def test_loop_coverings(name):
    loop = make_loop(name)
    rc = RegionCoverer(max_cells=16, max_level=12)
    covering = rc.covering(loop)
    assert covering
    check_covering(rc, loop, covering, False)
    interior = rc.interior_covering(loop)
    for ci in interior:
        assert loop.contains_cell(Cell(ci))
    # every interior cell must be inside the covering
    assert cu.contains_union(cu.normalize(covering), cu.normalize(interior))


def test_covering_contains_sample_points():
    """Any point inside the region must fall in the covering."""
    loop = make_loop("loopA")
    rc = RegionCoverer(max_cells=12, max_level=14)
    covering = rc.covering(loop)
    rmin, rmax = cu.to_ranges(cu.normalize(covering))
    lats = RNG.uniform(-3, 3, 2000)
    lngs = np.where(RNG.uniform(size=2000) < 0.5,
                    RNG.uniform(176, 180, 2000),
                    RNG.uniform(-180, -176, 2000))
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    x, y, z = latlng_deg_to_xyz(lats, lngs)
    pts = np.stack([x, y, z], axis=1)
    inside = loop.contains_points_batch(pts)
    ids = cid.cell_id_from_point_v(x, y, z)
    covered = cu.contains_leaf_v(rmin, rmax, ids)
    assert (covered[inside]).all()


def test_fast_covering_covers():
    cap = Cap.from_latlng_deg(-30.0, 55.0, math.radians(2.0))
    rc = RegionCoverer(max_cells=8)
    fc = rc.fast_covering(cap)
    check_covering_tight(cap, cu.normalize(fc), False, 0)

"""RegionUnion coverings and Hausdorff distances."""

from __future__ import annotations

import math

import numpy as np

from geo_ray.functions.distance import (directed_hausdorff_chord2,
                                        hausdorff_chord2)
from geo_ray.functions.latlng import (angle_to_chord2, chord2_to_angle,
                                      latlng_deg_to_xyz)
from geo_ray.state.cap import Cap
from geo_ray.state.coverer import RegionCoverer
from geo_ray.state.regionunion import RegionUnion

from tests.test_covering import check_covering


def test_region_union_covering():
    caps = [Cap.from_latlng_deg(10.0, 10.0, math.radians(1.0)),
            Cap.from_latlng_deg(-20.0, 120.0, math.radians(2.0))]
    union = RegionUnion(caps)
    rc = RegionCoverer(max_cells=16, max_level=12)
    covering = rc.covering(union)
    check_covering(rc, union, covering, False)
    # both member centers are covered
    from geo_ray.state import cellunion as cu
    from geo_ray.functions import cellid as cid
    norm = cu.normalize(covering)
    for cap in caps:
        leaf = cid.cell_id_from_point(*cap.center)
        assert cu.contains_cell_id(norm, leaf)


def test_region_union_predicates():
    caps = [Cap.from_latlng_deg(0.0, 0.0, math.radians(5.0)),
            Cap.from_latlng_deg(0.0, 90.0, math.radians(5.0))]
    union = RegionUnion(caps)
    p1 = tuple(float(v) for v in latlng_deg_to_xyz(0.0, 2.0))
    p2 = tuple(float(v) for v in latlng_deg_to_xyz(0.0, 88.0))
    p3 = tuple(float(v) for v in latlng_deg_to_xyz(45.0, 45.0))
    assert union.contains_point(p1)
    assert union.contains_point(p2)
    assert not union.contains_point(p3)
    assert union.cap_bound().contains_point(p1)
    assert union.cap_bound().contains_point(p2)


def test_directed_hausdorff():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-10, 10, 200)
    lng = rng.uniform(-10, 10, 200)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    A = np.stack([x, y, z], axis=1)
    # B = A shifted by 5 degrees in longitude
    x2, y2, z2 = latlng_deg_to_xyz(lat, lng + 5.0)
    B = np.stack([x2, y2, z2], axis=1)
    d_ab = directed_hausdorff_chord2(A, B)
    # every point has a neighbor within ~5 degrees (its own shifted copy)
    assert d_ab <= float(angle_to_chord2(math.radians(5.01)))
    # a far singleton dominates the symmetric distance
    far = np.asarray([latlng_deg_to_xyz(60.0, 100.0)], dtype=float).reshape(1, 3)
    d_sym = hausdorff_chord2(A, np.vstack([B, far]))
    assert float(chord2_to_angle(d_sym)) > math.radians(30)
    # identity (2-2*dot rounds at ~1e-15 for unit vectors)
    assert hausdorff_chord2(A, A) < 1e-14

"""IsCanonical test table ported verbatim from
s2/regioncoverer_test.go:196-292 (debug-string cell notation), plus
FromString parsing checks."""

from __future__ import annotations

import pytest

from geo_ray.functions import cellid as cid
from geo_ray.state.coverer import RegionCoverer


def make_union(*strs):
    return [cid.from_string(s) for s in strs]


DEFAULT = dict(min_level=0, max_level=30, level_mod=1, max_cells=8)

CASES = [
    # (cells, coverer kwargs, want)
    (["1/"], DEFAULT, True),
    (["invalid"], DEFAULT, False),
    (["1/1", "1/3"], DEFAULT, True),
    (["1/3", "1/1"], DEFAULT, False),
    (["1/2", "1/33"], DEFAULT, True),
    (["1/3", "1/33"], DEFAULT, False),
    (["1/31"], dict(min_level=2, max_level=30, level_mod=1, max_cells=8), True),
    (["1/3"], dict(min_level=2, max_level=30, level_mod=1, max_cells=8), False),
    (["1/31"], dict(min_level=0, max_level=2, level_mod=1, max_cells=8), True),
    (["1/312"], dict(min_level=0, max_level=2, level_mod=1, max_cells=8), False),
    (["1/31"], dict(min_level=0, max_level=30, level_mod=2, max_cells=8), True),
    (["1/312"], dict(min_level=0, max_level=30, level_mod=2, max_cells=8), False),
    (["1/1", "1/3"], dict(min_level=0, max_level=30, level_mod=1, max_cells=2), True),
    (["1/1", "1/3", "2/"], dict(min_level=0, max_level=30, level_mod=1, max_cells=2), False),
    (["1/123", "2/1", "3/0122"], dict(min_level=0, max_level=30, level_mod=1, max_cells=2), True),
    (["1/01", "1/02", "1/03", "1/10", "1/11"], DEFAULT, True),
    (["1/00", "1/01", "1/02", "1/03", "1/10"], DEFAULT, False),
    (["0/22", "1/01", "1/02", "1/03", "1/10"], DEFAULT, True),
    (["0/22", "1/00", "1/01", "1/02", "1/03"], DEFAULT, False),
    (["1/1101", "1/1102", "1/1103", "1/1110", "1/1111", "1/1112",
      "1/1113", "1/1120", "1/1121", "1/1122", "1/1123", "1/1130",
      "1/1131", "1/1132", "1/1133", "1/1200"],
     dict(min_level=0, max_level=30, level_mod=2, max_cells=20), True),
    (["1/1100", "1/1101", "1/1102", "1/1103", "1/1110", "1/1111",
      "1/1112", "1/1113", "1/1120", "1/1121", "1/1122", "1/1123",
      "1/1130", "1/1131", "1/1132", "1/1133"],
     dict(min_level=0, max_level=30, level_mod=2, max_cells=20), False),
]


@pytest.mark.parametrize("cells,kwargs,want", CASES)
def test_is_canonical(cells, kwargs, want):
    rc = RegionCoverer(**kwargs)
    assert rc.is_canonical(make_union(*cells)) == want, cells


def test_from_string_round_trip():
    for s in ("1/", "1/123", "3/0122", "0/22", "5/3210"):
        ci = cid.from_string(s)
        assert ci != 0
        assert cid.to_string(ci) == s
    assert cid.from_string("invalid") == 0
    assert cid.from_string("6/1") == 0
    assert cid.from_string("1/4") == 0


def test_coverer_output_is_canonical():
    import math
    from geo_ray.state.cap import Cap

    cap = Cap.from_latlng_deg(33.0, -111.0, math.radians(2.0))
    for kwargs in (DEFAULT,
                   dict(min_level=3, max_level=12, level_mod=2, max_cells=6)):
        rc = RegionCoverer(**kwargs)
        assert rc.is_canonical(rc.covering(cap))

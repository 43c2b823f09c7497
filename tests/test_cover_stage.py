"""Distributed covering fan-out == driver-side JoinState coverings,
and a join through the table-built state matches the direct state."""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.pipelines.flagship import city_polygons
from geo_ray.stages.cover import cover_polygons, polygons_to_table
from geo_ray.stages.join import (JoinState, PolygonJoiner,
                                 join_state_from_covering_rows)
from geo_ray.sources.images import images_table
from geo_ray.stages.assign import geotag_and_cell


def test_distributed_coverings_match_driver(ray_session):
    import ray.data as rd

    polys = city_polygons()[:4]
    tbl = polygons_to_table(polys)
    rows = cover_polygons(rd.from_arrow(tbl)).to_pandas().to_dict("records")
    direct = JoinState(polys)
    from collections import defaultdict
    got = defaultdict(set)
    for r in rows:
        got[r["polygon_id"]].add((int(r["cell_id"]), bool(r["is_interior"])))
    for k, (name, _) in enumerate(polys):
        want = set()
        interiors = set(direct.interiors[k])
        from geo_ray.state import cellunion as cu
        boundary = cu.from_difference(direct.coverings[k],
                                      direct.interiors[k])
        for ci in direct.interiors[k]:
            want.add((ci, True))
        for ci in boundary:
            want.add((ci, False))
        assert got[name] == want, name


def test_join_via_covering_table_matches_direct(ray_session):
    polys = city_polygons()[:4]
    import ray.data as rd

    tbl = polygons_to_table(polys)
    rows = cover_polygons(rd.from_arrow(tbl)).to_pandas().to_dict("records")
    state_tbl = join_state_from_covering_rows(polys, rows)
    state_direct = JoinState(polys)
    pts = geotag_and_cell(images_table(4000))
    a = PolygonJoiner(state_tbl)(pts)
    b = PolygonJoiner(state_direct)(pts)
    pa_a = sorted(zip(a.column("image_id").to_pylist(),
                      a.column("polygon_id").to_pylist()))
    pa_b = sorted(zip(b.column("image_id").to_pylist(),
                      b.column("polygon_id").to_pylist()))
    assert pa_a == pa_b
    assert len(pa_a) > 0

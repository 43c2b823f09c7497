"""Shuffle (sort-merge interval) spatial join vs the broadcast join:
identical match sets on the same inputs, including under total skew
and with partition bounds that slice through city hot spots."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _match_df(ds):
    df = ds.to_pandas()[["image_id", "polygon_id"]]
    return df.sort_values(["image_id", "polygon_id"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def joined_pair(ray_session):
    import ray

    from geo_ray.pipelines.flagship import (build_points, city_polygons,
                                            _default_join_state)
    from geo_ray.stages.cover import polygons_to_table
    from geo_ray.stages.join import polygon_join
    from geo_ray.stages.shuffle_join import shuffle_polygon_join
    import ray.data as rd

    n = 4000
    points = build_points(n).materialize()
    state_ref = ray.put(_default_join_state())
    broadcast = points.map_batches(
        lambda b: polygon_join(b, state_ref), batch_format="pyarrow")

    ptable = rd.from_arrow(polygons_to_table(city_polygons()))
    shuffled = shuffle_polygon_join(points, ptable, num_parts=8,
                                    refine_parts=4)
    return _match_df(broadcast), _match_df(shuffled), points, ptable


def test_shuffle_equals_broadcast(joined_pair):
    bc, sh, _, _ = joined_pair
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, sh)


def test_shuffle_single_partition(joined_pair):
    """num_parts=1 (empty bounds) must also agree — exercises the
    no-replication degenerate path."""
    from geo_ray.stages.shuffle_join import shuffle_polygon_join

    bc, _, points, ptable = joined_pair
    sh = _match_df(shuffle_polygon_join(points, ptable, num_parts=1))
    pd.testing.assert_frame_equal(bc, sh)


def test_shuffle_adversarial_bounds(joined_pair):
    """Bounds chosen to split every city's leaf range across two
    partitions: covering rows must replicate across the cut and no
    match may be lost or duplicated."""
    from geo_ray.functions import cellid as cid
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.sources.images import CITIES
    from geo_ray.stages.shuffle_join import shuffle_polygon_join

    bc, _, points, ptable = joined_pair
    cuts = []
    for (lat, lng) in CITIES:
        x, y, z = latlng_deg_to_xyz(np.array([lat]), np.array([lng]))
        cuts.append(int(cid.cell_id_from_point_v(x, y, z)[0]))
    bounds = np.sort(np.array(cuts, dtype=np.uint64))
    sh = _match_df(shuffle_polygon_join(points, ptable,
                                        bounds=bounds, refine_parts=3))
    pd.testing.assert_frame_equal(bc, sh)


def test_shuffle_no_polygons(ray_session):
    import ray.data as rd

    from geo_ray.pipelines.flagship import build_points
    from geo_ray.stages.cover import polygons_to_table
    from geo_ray.stages.shuffle_join import shuffle_polygon_join

    points = build_points(300)
    ptable = rd.from_arrow(polygons_to_table([]))
    out = shuffle_polygon_join(points, ptable, num_parts=2)
    assert out.count() == 0

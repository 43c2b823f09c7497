"""Skew stress: every point in ONE hot tile.  The tiling shuffle moves
pixel partials (bounded by px^2 per tile per batch), so a 100%-hot-key
distribution must not blow up the shuffle or the render group — the
combiner plays the role explicit salting would (SURVEY §4 skew row)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.stages.tiles import TILE_PX, render_tiles, tile_pixel_partials

RNG = np.random.default_rng(44)


def _hot_batch(n, lat0=40.71, lng0=-74.00, spread=0.02):
    lat = lat0 + RNG.uniform(-spread, spread, n)
    lng = lng0 + RNG.uniform(-spread, spread, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    return pa.table({
        "cell_id": pa.array(cid.cell_id_from_point_v(x, y, z), pa.uint64()),
        "mean_r": pa.array(RNG.uniform(0, 255, n)),
        "mean_g": pa.array(RNG.uniform(0, 255, n)),
        "mean_b": pa.array(RNG.uniform(0, 255, n)),
    })


def test_partials_bounded_under_total_skew():
    """50k rows landing in very few level-7 tiles emit at most
    tiles * px^2 partial rows per batch — independent of row count."""
    batch = _hot_batch(50_000)
    partials = tile_pixel_partials(batch, 7)
    n_tiles = len(np.unique(partials.column("tile_id").to_numpy()))
    assert n_tiles <= 4
    assert len(partials) <= n_tiles * TILE_PX * TILE_PX
    # counts conserve rows
    assert partials.column("count").to_numpy().sum() == 50_000


def test_hot_tile_render_completes(ray_session):
    import ray.data as rd

    batches = [_hot_batch(20_000) for _ in range(4)]
    ds = rd.from_arrow(pa.concat_tables(batches))
    partials = ds.map_batches(lambda b: tile_pixel_partials(b, 7),
                              batch_format="pyarrow",
                              batch_size=16384).materialize()
    # shuffle volume stays tiny even though all 80k rows hit few tiles
    assert partials.count() <= 8 * TILE_PX * TILE_PX
    tiles = render_tiles(partials).to_pandas()
    assert 1 <= len(tiles) <= 4
    assert tiles["n_images"].sum() == 80_000


def test_bucketed_sessions_equal_simple(ray_session):
    """The skew-proof two-phase sessionization must equal the simple
    per-user groupby on real data."""
    import ray.data as rd

    from geo_ray.stages.windows import (session_windows,
                                        session_windows_bucketed)

    ds = rd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    cols = ["user_id", "session_no", "n", "first_ts", "last_ts"]
    simple = session_windows(ds, 1800).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    bucketed = session_windows_bucketed(ds, 1800).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(simple, bucketed, check_dtype=False)


def test_bucketed_sessions_mega_user(ray_session):
    """Adversarial single-key skew: one user with sessions that span
    multiple buckets, sit entirely inside one bucket, and straddle
    boundaries with long empty stretches between."""
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.stages.windows import (session_windows,
                                        session_windows_bucketed)

    ts = []
    # session A: 10h of continuous activity every 900 s (crosses
    # several 2h buckets without a gap)
    ts.extend(range(0, 36000, 900))
    # gap of 2 days, then session B fully inside one bucket
    b0 = 36000 + 2 * 86400
    ts.extend(range(b0, b0 + 1200, 300))
    # gap just over the threshold, then session C straddling a boundary
    c0 = b0 + 1200 + 1801
    ts.extend(range(c0, c0 + 7200, 1700))
    tbl = pa.table({
        "user_id": pa.array([7] * len(ts), pa.int64()),
        "event_id": pa.array(range(len(ts)), pa.int64()),
        "ts": pa.array(np.array(ts, dtype="datetime64[s]")),
    })
    ds = rd.from_arrow(tbl)
    cols = ["user_id", "session_no", "n", "first_ts", "last_ts"]
    simple = session_windows(ds, 1800).to_pandas()[cols] \
        .sort_values(cols).reset_index(drop=True)
    bucketed = session_windows_bucketed(ds, 1800, bucket_sec=7200) \
        .to_pandas()[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(simple, bucketed, check_dtype=False)
    assert len(simple) == 3

"""Tile pyramid pooling: the 2x2 integer pooling step must equal
recomputing pixels from leaf (i, j) at the parent level, for every
face and at every chained level."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.stages.tiles import (TILE_PX, decode_tile_key,
                                  pool_tile_pixels,
                                  tile_pixel_count_partials)


def _leaf_batch(n=5000, seed=3):
    rng = np.random.RandomState(seed)
    lat = rng.uniform(-89, 89, n)
    lng = rng.uniform(-180, 180, n)   # all 6 faces
    x, y, z = latlng_deg_to_xyz(lat, lng)
    ids = cid.cell_id_from_point_v(x, y, z)
    return pa.table({"cell_id": pa.array(ids, pa.uint64())})


def _agg(t: pa.Table) -> dict:
    key = t.column("key").to_numpy()
    cnt = t.column("count").to_numpy()
    out: dict = {}
    for k, c in zip(key, cnt):
        out[int(k)] = out.get(int(k), 0) + int(c)
    return out


def test_pool_equals_direct_recompute():
    batch = _leaf_batch()
    for top in (7, 10):
        fine = _agg(tile_pixel_count_partials(batch, top))
        for lv in range(top - 1, top - 3, -1):
            direct = _agg(tile_pixel_count_partials(batch, lv))
            fine_t = pa.table({
                "key": pa.array(list(fine.keys()), pa.int64()),
                "count": pa.array(list(fine.values()), pa.int64())})
            pooled = _agg(pool_tile_pixels(fine_t, lv + 1))
            assert pooled == direct, (top, lv)
            fine = pooled


def test_pool_linear_in_partials():
    """Pooling commutes with aggregation: pooling un-merged partials
    then merging equals merging then pooling."""
    batch = _leaf_batch(2000, seed=4)
    t = tile_pixel_count_partials(batch, 8)
    half = t.num_rows // 2
    a, b = t.slice(0, half), t.slice(half)
    merged_then_pooled = _agg(pool_tile_pixels(
        pa.table({"key": t.column("key"), "count": t.column("count")}),
        8))
    pooled_parts = _agg(pool_tile_pixels(a, 8))
    for k, v in _agg(pool_tile_pixels(b, 8)).items():
        pooled_parts[k] = pooled_parts.get(k, 0) + v
    assert pooled_parts == merged_then_pooled


def test_decode_round_trip():
    batch = _leaf_batch(1000, seed=5)
    t = tile_pixel_count_partials(batch, 9)
    key = t.column("key").to_numpy()
    tile, pixel = decode_tile_key(key, 9)
    assert (cid.level_v(tile) == 9).all()
    assert (pixel >= 0).all() and (pixel < TILE_PX * TILE_PX).all()
    shift = np.uint64(2 * (30 - 9))
    rek = (tile >> shift) * np.uint64(TILE_PX * TILE_PX) \
        + pixel.astype(np.uint64)
    assert np.array_equal(rek.astype(np.int64), key)

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


def test_color_mipmap_pool_equals_direct_render(ray_session):
    """Rendering the parent level from POOLED child color partials
    equals rendering it directly from the points: counts exact, means
    within float addition-order rounding."""
    import ray.data as rd
    from geo_ray.pipelines.flagship import build_points
    from geo_ray.stages.tiles import (pool_tile_color_partials,
                                      render_tiles, tile_pixel_partials)

    pts = build_points(4000).materialize()
    p7 = pts.map_batches(lambda b: tile_pixel_partials(b, 7),
                         batch_format="pyarrow")
    pooled6 = p7.map_batches(
        lambda b: pool_tile_color_partials(b, 7),
        batch_format="pyarrow")
    direct6 = pts.map_batches(lambda b: tile_pixel_partials(b, 6),
                              batch_format="pyarrow")
    a = render_tiles(pooled6).to_pandas().sort_values("token") \
        .reset_index(drop=True)
    b = render_tiles(direct6).to_pandas().sort_values("token") \
        .reset_index(drop=True)
    assert list(a["token"]) == list(b["token"]) and len(a) > 10
    assert (a["n_images"].to_numpy() == b["n_images"].to_numpy()).all()
    assert (a["n_pixels"].to_numpy() == b["n_pixels"].to_numpy()).all()
    from geo_ray.sources.codecs import png_decode
    for pa_, pb_ in zip(a["tile_png"], b["tile_png"]):
        ia, ib = png_decode(pa_), png_decode(pb_)
        assert np.abs(ia.astype(np.int32) - ib.astype(np.int32)).max() <= 1

"""Raster tiling: range-partition points by Hilbert order, rasterize
one image per S2 cell at the tile level.

Scale design (SURVEY.md §7.1 step 6, §7.2): the naive shape —
``groupby(tile_id)`` over full image rows — would shuffle every pixel
byte and melt on hot tiles (cities).  Instead we pre-aggregate INSIDE
map_batches: each batch contributes (tile_id, pixel, sum_rgb, count)
partials (at most px*px rows per tile per batch, independent of how
many images hit the tile), and only those partials shuffle into the
per-tile render.  Hot tiles therefore cost O(px^2) per input batch —
skew-proof without explicit salting; the combiner plays the role the
salt would.

Pixel geometry is integer-exact: a tile at level L covers a
2^(30-L)-wide square of leaf (i,j) coordinates on its face
(s2/cellid.go:656-671); pixels subdivide that square in ST space
(equivalently PlateCarree-in-cell, s2/projections.go:74-145 applied to
the cell's own (u,v) rectangle).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cellid as cid
from ..sources import codecs

TILE_PX = 16  # pixels per tile side (power of two)


def image_stats(batch: pa.Table) -> pa.Table:
    """Decode stage: binary image column -> per-image mean RGB
    (+ decode health), dropping the wide ``bytes`` column so nothing
    downstream ships pixels.  Stateless (elastic tasks): the codecs are
    module-level, so there is no per-actor setup to amortize, and
    task-based stages cannot starve their upstream producer (an actor
    pool sized to the whole CPU count deadlocks the streaming executor
    against its own ReadRange — observed, not hypothetical)."""
    arr = batch.column("bytes").combine_chunks()
    vo = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    fmts = np.array(batch.column("fmt").to_pylist())
    w = batch.column("w").to_numpy()
    h = batch.column("h").to_numpy()
    n = len(batch)
    means = np.empty((n, 3), dtype=np.float64)
    ok = np.ones(n, dtype=bool)
    # Group same-shape/format rows and decode each group in one batched
    # numpy pass (amortizes the DCT einsum / reshape overhead).  Lossy
    # rows decode straight from the Arrow value buffer — no per-row
    # bytes objects at all (lossy_decode_buffer's ragged gather).
    shape_key = (w.astype(np.int64) << 16) | (h.astype(np.int64) << 2) | \
        np.where(fmts == "png", 0, 1)
    for key in np.unique(shape_key):
        sel = np.nonzero(shape_key == key)[0]
        try:
            if key & 1:
                imgs = codecs.lossy_decode_buffer(data, vo[sel],
                                                  vo[sel + 1])
            else:
                group = [data[vo[i]:vo[i + 1]].tobytes() for i in sel]
                imgs = codecs.png_decode_many(group)
            # Channel sums via one BLAS sgemm (ones-vector x pixels):
            # a strided axis-1 reduce can't SIMD over the 3-byte channel
            # stride and was the hottest line of the decode stage (~5x
            # slower).  All partial sums are integers < 2^24, so float32
            # accumulation is exact and the result is bit-identical to
            # .mean(axis=1).
            npx = imgs.shape[1] * imgs.shape[2]
            f32 = imgs.reshape(len(sel), npx, 3).astype(np.float32)
            sums = np.matmul(np.ones((1, npx), np.float32), f32)[:, 0, :]
            means[sel] = sums.astype(np.float64) / float(npx)
        except Exception:
            for i in sel:
                try:
                    img = codecs.decode(
                        data[vo[i]:vo[i + 1]].tobytes(), str(fmts[i]))
                    means[i] = img.reshape(-1, 3).mean(axis=0)
                except Exception:
                    ok[i] = False
                    means[i] = 0.0
    out = batch.drop_columns(["bytes"])
    out = out.append_column("mean_r", pa.array(means[:, 0]))
    out = out.append_column("mean_g", pa.array(means[:, 1]))
    out = out.append_column("mean_b", pa.array(means[:, 2]))
    return out.append_column("decode_ok", pa.array(ok))


class ImageStats:
    """Actor-pool form of :func:`image_stats` for callers that need a
    bounded pool (e.g. when a real codec library with expensive init is
    plugged in).  Size ``concurrency`` strictly below the cluster CPU
    count or the producer starves."""

    def __init__(self):
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        return image_stats(batch)


def tile_pixel_partials(batch: pa.Table, level: int,
                        px: int = TILE_PX) -> pa.Table:
    """Per-batch combiner: (tile_id, pixel, partial sums).  The only
    columns that shuffle."""
    ids = batch.column("cell_id").to_numpy()
    f, i, j, _ = cid.face_ij_orientation_v(ids)
    size = np.int64(1) << np.int64(30 - level)
    px_x = ((i & -size) ^ i) * px // size          # 0..px-1, integer exact
    px_y = ((j & -size) ^ j) * px // size
    pixel = (px_y * px + px_x).astype(np.int64)
    tile = cid.parent_v(ids, level)
    mr = batch.column("mean_r").to_numpy()
    mg = batch.column("mean_g").to_numpy()
    mb = batch.column("mean_b").to_numpy()
    # Composite (tile, pixel) key in uint64: tiles at a fixed level have
    # their lsb at bit 2*(30-level), so the shifted id is unique and
    # small; requires level <= 24 (px <= 2^6).
    assert level <= 24
    shift = np.uint64(2 * (30 - level))
    key = (tile >> shift) * np.uint64(px * px) + pixel.astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv)
    sr = np.bincount(inv, weights=mr)
    sg = np.bincount(inv, weights=mg)
    sb = np.bincount(inv, weights=mb)
    out_tile = (uniq // np.uint64(px * px)) << shift
    out_pixel = (uniq % np.uint64(px * px)).astype(np.int32)
    return pa.table({
        "tile_id": pa.array(out_tile, pa.uint64()),
        "pixel": pa.array(out_pixel, pa.int32()),
        "sum_r": pa.array(sr, pa.float64()),
        "sum_g": pa.array(sg, pa.float64()),
        "sum_b": pa.array(sb, pa.float64()),
        "count": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def _render_one(tile_id: int, pix: np.ndarray, sums: np.ndarray,
                cnts_in: np.ndarray, px: int):
    sums_acc = np.zeros((px * px, 3))
    cnts = np.zeros(px * px)
    np.add.at(sums_acc, pix, sums)
    np.add.at(cnts, pix, cnts_in)
    filled = cnts > 0
    canvas = np.full((px * px, 3), 32.0)  # background
    canvas[filled] = sums_acc[filled] / cnts[filled][:, None]
    img = np.clip(np.round(canvas.reshape(px, px, 3)), 0, 255).astype(np.uint8)
    return {
        "tile_id": np.uint64(tile_id),
        "level": cid.level(tile_id),
        "token": cid.token(tile_id),
        "n_images": int(cnts.sum()),
        "n_pixels": int(filled.sum()),
        "tile_png": codecs.png_encode(img),
    }


def render_bucket_group(group: pd.DataFrame, px: int = TILE_PX) -> pd.DataFrame:
    """map_groups finalizer over a BUCKET of tiles: renders every tile
    whose partials landed in this bucket.  Buckets are parent cells a
    few levels above the tile level, so each map_groups call amortizes
    its per-group overhead over dozens of tiles (pure-numpy per-tile
    work is microseconds; the per-call overhead was the bottleneck)."""
    tiles = group["tile_id"].to_numpy().astype(np.uint64)
    pix = group["pixel"].to_numpy()
    sums = group[["sum_r", "sum_g", "sum_b"]].to_numpy()
    cnts = group["count"].to_numpy()
    order = np.argsort(tiles, kind="stable")
    tiles, pix, sums, cnts = tiles[order], pix[order], sums[order], cnts[order]
    uniq, starts = np.unique(tiles, return_index=True)
    bounds = np.append(starts, len(tiles))
    rows = []
    for t in range(len(uniq)):
        lo, hi = bounds[t], bounds[t + 1]
        rows.append(_render_one(int(uniq[t]), pix[lo:hi], sums[lo:hi],
                                cnts[lo:hi], px))
    return pd.DataFrame(rows)


BUCKET_LEVELS_UP = 4  # 4^4 = up to 256 tiles per render bucket


def render_tiles(partials_ds, px: int = TILE_PX):
    """bucketed groupby -> one rendered raster row per tile."""
    def _bucket(batch: pa.Table) -> pa.Table:
        tile = batch.column("tile_id").to_numpy()
        level = int(cid.level_v(tile[:1])[0]) if len(tile) else 0
        bucket = cid.parent_v(tile, max(0, level - BUCKET_LEVELS_UP))
        return batch.append_column("bucket", pa.array(bucket, pa.uint64()))

    bucketed = partials_ds.map_batches(_bucket, batch_format="pyarrow")
    out = bucketed.groupby("bucket").map_groups(
        lambda g: render_bucket_group(g.drop(columns=["bucket"]), px),
        batch_format="pandas")
    return out


def tile_pixel_centers_latlng(tile_id: int, px: int = TILE_PX):
    """Unproject the px*px pixel centers back to lat/lng — the
    raster->vector direction of the round-trip QA.  Returns
    (lat_deg, lng_deg, leaf_cell_ids) arrays."""
    f, i, j, _ = cid.face_ij_orientation(tile_id)
    level = cid.level(tile_id)
    size = 1 << (30 - level)
    i_lo, j_lo = i & -size, j & -size
    step = size // px
    ii = i_lo + (np.arange(px, dtype=np.int64) * step + step // 2)
    jj = j_lo + (np.arange(px, dtype=np.int64) * step + step // 2)
    gi, gj = np.meshgrid(ii, jj, indexing="xy")
    leaf = cid.cell_id_from_face_ij_v(np.full(gi.size, f), gi.ravel(), gj.ravel())
    lat, lng = cid.cell_id_to_latlng_v(leaf)
    return lat, lng, leaf


def write_tiles_partitioned(tiles_ds, out_dir: str,
                            shard_level: int = 3) -> str:
    """Resumable tile sink: one parquet directory per level-
    ``shard_level`` ancestor cell (a contiguous Hilbert key range), so
    a re-run can skip finished key ranges and consumers can prune
    directories by spatial range — never one giant file.  Tile tokens
    (not raw uint64) name the directories so they survive hive-style
    path encoding."""
    def _shard(batch: pa.Table) -> pa.Table:
        tile = batch.column("tile_id").to_numpy().astype(np.uint64)
        anc = cid.parent_v(tile, shard_level)
        toks = cid.token_v(anc).tolist()
        return batch.append_column("shard", pa.array(toks, pa.string()))

    (tiles_ds.map_batches(_shard, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["shard"]))
    return out_dir


def tile_pixel_count_partials(batch: pa.Table, level: int,
                              px: int = TILE_PX) -> pa.Table:
    """Count-only per-batch combiner for density rasters: (key, count)
    partials with the same integer-exact (i, j) pixel bit math as
    tile_pixel_partials but no color sums — geo-only sources feed it
    without ever synthesizing pixel bytes.  The composite key
    (tile >> shift) * px^2 + pixel stays far below 2^63 (level <= 24),
    so Ray's hash aggregate shuffles a plain int64 — uint64 cell ids
    on faces 4/5 overflow int64 and break arrow key encoding."""
    ids = batch.column("cell_id").to_numpy()
    f, i, j, _ = cid.face_ij_orientation_v(ids)
    size = np.int64(1) << np.int64(30 - level)
    px_x = ((i & -size) ^ i) * px // size
    px_y = ((j & -size) ^ j) * px // size
    pixel = (px_y * px + px_x).astype(np.int64)
    tile = cid.parent_v(ids, level)
    assert level <= 24
    shift = np.uint64(2 * (30 - level))
    key = (tile >> shift) * np.uint64(px * px) + pixel.astype(np.uint64)
    uniq, cnt = np.unique(key, return_counts=True)
    return pa.table({
        "key": pa.array(uniq.astype(np.int64), pa.int64()),
        "count": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def decode_tile_key(key: np.ndarray, level: int,
                    px: int = TILE_PX):
    """(key at level) -> (tile_id uint64, pixel int64)."""
    k = key.astype(np.uint64)
    shift = np.uint64(2 * (30 - level))
    # the tile's lsb sentinel bit sits at position `shift`, i.e. bit 0
    # of the packed prefix — shifting back restores the full cell id
    tile = (k // np.uint64(px * px)) << shift
    pixel = (k % np.uint64(px * px)).astype(np.int64)
    return tile, pixel


def pool_tile_pixels(batch: pa.Table, level_from: int,
                     px: int = TILE_PX) -> pa.Table:
    """One pyramid step: (key, count) rows at ``level_from`` ->
    partials at ``level_from - 1`` by EXACT integer 2x2 pooling.

    A child tile occupies the (qx, qy) quadrant of its parent, where
    q bits are bit (30 - level_from) of the child's (i, j); the parent
    pixel is then (px*q + child_pixel) // 2 per axis — identical to
    recomputing the pixel from leaf (i, j) at the parent level (the
    floor-division identity ((b*size + r_px)*size' scaling; proven by
    the SQL oracle, which derives every level directly from leaves).
    This is how a tiling engine builds zoom-out levels WITHOUT
    re-reading leaf data: counts pool linearly, so partials at any
    aggregation state can pool."""
    key = batch.column("key").to_numpy()
    tile, pixel = decode_tile_key(key, level_from, px)
    f, i, j, _ = cid.face_ij_orientation_v(tile)
    kbit = np.int64(30 - level_from)
    qx = ((i >> kbit) & 1).astype(np.int64)
    qy = ((j >> kbit) & 1).astype(np.int64)
    cx = pixel % px
    cy = pixel // px
    nx = (px * qx + cx) // 2
    ny = (px * qy + cy) // 2
    parent = cid.parent_v(tile, level_from - 1)
    npx = (ny * px + nx).astype(np.int64)
    cnt = batch.column("count").to_numpy().astype(np.int64)
    shift = np.uint64(2 * (30 - (level_from - 1)))
    nkey = (parent >> shift) * np.uint64(px * px) + npx.astype(np.uint64)
    uniq, inv = np.unique(nkey, return_inverse=True)
    csum = np.bincount(inv, weights=cnt).astype(np.int64)
    return pa.table({
        "key": pa.array(uniq.astype(np.int64), pa.int64()),
        "count": pa.array(csum, pa.int64()),
    })


def tile_level_stats(agg, level: int, px: int = TILE_PX):
    """Aggregated (key, count) rows -> per-tile stats
    (level, token, n_images, n_pixels, pix_sum), all exact ints."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        tile, pixel = decode_tile_key(key, level, px)
        cnt = batch.column("count").to_numpy()
        uniq, inv = np.unique(tile, return_inverse=True)
        n_img = np.bincount(inv, weights=cnt).astype(np.int64)
        n_px = np.bincount(inv).astype(np.int64)
        psum = np.bincount(inv, weights=pixel * cnt).astype(np.int64)
        return pa.table({
            "level": pa.array(np.full(len(uniq), level, np.int64)),
            "token": pa.array(cid.token_v(uniq), pa.string()),
            "n_images": pa.array(n_img),
            "n_pixels": pa.array(n_px),
            "pix_sum": pa.array(psum),
        })

    return (agg.map_batches(_partial, batch_format="pyarrow")
            .groupby(["level", "token"])
            .aggregate(Sum("n_images", alias_name="n_images"),
                       Sum("n_pixels", alias_name="n_pixels"),
                       Sum("pix_sum", alias_name="pix_sum")))


def pool_tile_color_partials(batch: pa.Table, level_from: int,
                             px: int = TILE_PX) -> pa.Table:
    """Mipmap step for COLOR rasters: (tile_id, pixel, sum_r/g/b,
    count) partials at ``level_from`` -> the parent level, the same
    quadrant-bit pixel mapping as pool_tile_pixels.  (sum, count)
    pairs pool linearly, so zoom-out imagery derives from the finer
    level's partials without re-decoding a single image; the parent
    pixel's mean is total_sum / total_count — identical to rendering
    the parent level from scratch (counts exactly; float sums to
    addition-order rounding)."""
    ids = batch.column("tile_id").to_numpy()
    f, i, j, _ = cid.face_ij_orientation_v(ids)
    kbit = np.int64(30 - level_from)
    qx = ((i >> kbit) & 1).astype(np.int64)
    qy = ((j >> kbit) & 1).astype(np.int64)
    pixel = batch.column("pixel").to_numpy().astype(np.int64)
    nx = (px * qx + pixel % px) // 2
    ny = (px * qy + pixel // px) // 2
    parent = cid.parent_v(ids, level_from - 1)
    npx = (ny * px + nx).astype(np.int64)
    shift = np.uint64(2 * (30 - (level_from - 1)))
    key = (parent >> shift) * np.uint64(px * px) + npx.astype(np.uint64)
    uniq, inv = np.unique(key, return_inverse=True)
    out = {
        "tile_id": pa.array((uniq // np.uint64(px * px)) << shift,
                            pa.uint64()),
        "pixel": pa.array((uniq % np.uint64(px * px)).astype(np.int32),
                          pa.int32()),
    }
    for c in ("sum_r", "sum_g", "sum_b"):
        out[c] = pa.array(np.bincount(
            inv, weights=batch.column(c).to_numpy()), pa.float64())
    out["count"] = pa.array(np.bincount(
        inv, weights=batch.column("count").to_numpy())
        .astype(np.int64), pa.int64())
    return pa.table(out)

"""Per-row invariants mandated by BASELINE.json: decoded-pixel
fidelity (exact for PNG, PSNR >= 40 dB for the lossy format) and
caption equality, plus the raster tile round-trip QA (pixel centers
unproject into the tile's own cell)."""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.sources import codecs
from geo_ray.sources.images import (images_table, latlng_from_phash,
                                    phash_for_index, _pixels_for_rows)
from geo_ray.stages.tiles import TILE_PX, tile_pixel_centers_latlng

N = 512
TBL = images_table(N)


def test_decoded_pixels_match_reference_content():
    """PNG rows decode exactly; lossy rows decode within 40 dB of the
    deterministic reference pixels."""
    worst = np.inf
    for i in range(N):
        w = TBL.column("w")[i].as_py()
        h = TBL.column("h")[i].as_py()
        fmt = TBL.column("fmt")[i].as_py()
        ph = np.array([TBL.column("phash")[i].as_py()], dtype=np.int64)
        ref = _pixels_for_rows(ph, w, h)[0]
        dec = codecs.decode(TBL.column("bytes")[i].as_py(), fmt)
        assert dec.shape == ref.shape
        if fmt == "png":
            assert (dec == ref).all(), i
        else:
            p = codecs.psnr(ref, dec)
            worst = min(worst, p)
            assert p >= 40.0, (i, p)
    assert worst >= 40.0


def test_caption_equality():
    ph = phash_for_index(np.arange(N, dtype=np.int64))
    lat, lng = latlng_from_phash(ph)
    for i in range(N):
        want = f"caption {i} at {lat[i]:.4f},{lng[i]:.4f}"
        assert TBL.column("caption")[i].as_py() == want


def test_phash_matches_splitmix_spec():
    """phash = splitmix64(i ^ GOLDEN) reinterpreted as int64
    (FIXTURES.md §1)."""
    def splitmix_scalar(x: int) -> int:
        M = (1 << 64) - 1
        z = (x + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    for i in (0, 1, 7, 255, 511):
        want = splitmix_scalar(i ^ 0x9E3779B97F4A7C15)
        got = np.uint64(np.int64(TBL.column("phash")[i].as_py())).item()
        assert got == want, i


def test_hot_fraction_is_about_20_percent():
    ph = phash_for_index(np.arange(20000, dtype=np.int64))
    u = ph.view(np.uint64)
    hot = (u % np.uint64(5)) == 0
    assert 0.18 < hot.mean() < 0.22


def test_tile_pixel_round_trip():
    """Raster->vector: every pixel center of a tile must unproject to a
    leaf cell contained in that tile (MaxTile/parent semantics), and
    re-projecting the pixel center must land in the same pixel."""
    ids = cid.cell_id_from_latlng_v(np.array([40.7, -33.8, 51.5]),
                                    np.array([-74.0, 151.2, -0.1]))
    for level in (5, 7, 10):
        tiles = cid.parent_v(ids, level)
        for t in tiles:
            t = int(t)
            lat, lng, leaf = tile_pixel_centers_latlng(t)
            assert len(leaf) == TILE_PX * TILE_PX
            parents = cid.parent_v(leaf, level)
            assert (parents == np.uint64(t)).all()
            # forward again: pixel index of each center is the identity
            f, i, j, _ = cid.face_ij_orientation_v(leaf)
            size = np.int64(1) << np.int64(30 - level)
            px_x = ((i & -size) ^ i) * TILE_PX // size
            px_y = ((j & -size) ^ j) * TILE_PX // size
            got = (px_y * TILE_PX + px_x).astype(np.int64)
            assert (got == np.arange(TILE_PX * TILE_PX)).all()


def test_tile_render_determinism(ray_session):
    """Rendering the same partials twice gives byte-identical tiles."""
    import ray.data as rd
    from geo_ray.stages.assign import geotag_and_cell
    from geo_ray.stages.tiles import (render_tiles, tile_pixel_partials,
                                      image_stats)

    ds = rd.from_arrow(TBL)
    pts = ds.map_batches(geotag_and_cell, batch_format="pyarrow") \
            .map_batches(image_stats, batch_format="pyarrow")
    partials = pts.map_batches(lambda b: tile_pixel_partials(b, 6),
                               batch_format="pyarrow").materialize()
    t1 = render_tiles(partials).to_pandas().sort_values("token")
    t2 = render_tiles(partials).to_pandas().sort_values("token")
    assert list(t1["token"]) == list(t2["token"])
    assert all(a == b for a, b in zip(t1["tile_png"], t2["tile_png"]))
    # every tile png decodes to the tile raster shape
    img = codecs.png_decode(t1["tile_png"].iloc[0])
    assert img.shape == (TILE_PX, TILE_PX, 3)


def test_write_tiles_partitioned(ray_session, tmp_path):
    """Partitioned tile sink: one hive directory per level-3 ancestor
    (contiguous Hilbert key range); read-back equals the input and
    directory pruning by shard token works."""
    import os

    import ray.data as rd

    from geo_ray.functions import cellid as cid
    from geo_ray.pipelines.flagship import build_points
    from geo_ray.stages.tiles import (render_tiles, tile_pixel_partials,
                                      write_tiles_partitioned)

    points = build_points(1500)
    partials = points.map_batches(lambda b: tile_pixel_partials(b, 7),
                                  batch_format="pyarrow")
    tiles = render_tiles(partials).materialize()
    out = str(tmp_path / "tiles_out")
    write_tiles_partitioned(tiles, out)
    shards = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shards) > 1
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == tiles.count()
    # every row landed in the directory of its level-3 ancestor token
    for d in shards:
        tok = d.split("=", 1)[1]
        sub = rd.read_parquet(os.path.join(out, d)).to_pandas()
        anc = cid.parent_v(sub["tile_id"].to_numpy().astype("uint64"), 3)
        assert all(cid.token(int(a)) == tok for a in anc)

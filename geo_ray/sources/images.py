"""Deterministic synthetic image+caption table (the driver input_hint
shape) and the canonical geotag derivation.

Schema (exactly the hinted shape):
    image_id: string, bytes: binary, w: int32, h: int32,
    fmt: string, caption: string, phash: int64

Everything is a pure function of the row index (seedless, restartable):
``phash = splitmix64(i ^ GOLDEN)``; pixels are a solid color plus a
gradient derived from phash bits; lat/lng are derived from phash with
~20% of rows remapped into 8 fixed city caps to create realistic skew
(FIXTURES.md §1).  Generation runs distributed via ray.data.range ->
map_batches, writing one parquet directory per shard for resumability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codecs

GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_U = np.uint64

# 8 fixed "city" hot spots (lat_deg, lng_deg); FIXTURES.md §1
CITIES = np.array([
    (40.71, -74.00),   # New York
    (51.51, -0.13),    # London
    (35.68, 139.69),   # Tokyo
    (-23.55, -46.63),  # Sao Paulo
    (19.08, 72.88),    # Mumbai
    (30.04, 31.24),    # Cairo
    (48.85, 2.35),     # Paris
    (-33.87, 151.21),  # Sydney
], dtype=np.float64)
CITY_RADIUS_DEG = 0.5


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Public-domain splitmix64 mix function, vectorized."""
    z = (np.asarray(x, dtype=np.uint64) + GOLDEN)
    z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
    return z ^ (z >> _U(31))


def phash_for_index(i: np.ndarray) -> np.ndarray:
    """phash = splitmix64(i ^ GOLDEN), reinterpreted as int64."""
    u = splitmix64(np.asarray(i, dtype=np.uint64) ^ GOLDEN)
    return u.view(np.int64)


def latlng_from_phash(phash: np.ndarray):
    """The canonical geotag derivation (FIXTURES.md §1): uniform sphere
    rectangle from the phash bits, with rows where u%5==0 remapped into
    one of 8 city caps.  Same function in pipeline and tests."""
    u = np.asarray(phash).view(np.uint64) if np.asarray(phash).dtype != np.uint64 \
        else np.asarray(phash)
    hi = (u >> _U(32)).astype(np.float64)
    lo = (u & _U(0xFFFFFFFF)).astype(np.float64)
    lat = hi / 2.0 ** 32 * 180.0 - 90.0
    lng = lo / 2.0 ** 32 * 360.0 - 180.0
    hot = (u % _U(5)) == _U(0)
    city = ((u >> _U(3)) % _U(8)).astype(np.int64)
    dlat = (((u >> _U(13)) & _U(0xFFFF)).astype(np.float64) / 65536.0 * 2.0
            - 1.0) * CITY_RADIUS_DEG
    dlng = (((u >> _U(29)) & _U(0xFFFF)).astype(np.float64) / 65536.0 * 2.0
            - 1.0) * CITY_RADIUS_DEG
    lat = np.where(hot, CITIES[city, 0] + dlat, lat)
    lng = np.where(hot, CITIES[city, 1] + dlng, lng)
    # clamp away from the poles (city offsets can't reach them)
    lat = np.clip(lat, -89.999, 89.999)
    return lat, lng


def _pixels_for_row(i: int, phash: int, w: int, h: int) -> np.ndarray:
    """Solid RGB + per-row gradient derived from phash bits."""
    return _pixels_for_rows(np.array([phash], dtype=np.int64), w, h)[0]


_GRID_CACHE: dict = {}


def _grid(w: int, h: int):
    key = (w, h)
    g = _GRID_CACHE.get(key)
    if g is None:
        yy, xx = np.mgrid[0:h, 0:w]
        xn = (xx / max(1, w - 1)).astype(np.float32) * np.float32(96.0)
        yn = (yy / max(1, h - 1)).astype(np.float32) * np.float32(96.0)
        g = _GRID_CACHE[key] = (xn, yn)
    return g


def _pixels_for_rows(phashes: np.ndarray, w: int, h: int) -> np.ndarray:
    """Vectorized content synthesis for same-shaped rows -> (n,h,w,3).

    The gradient is rounded once as a shared int16 plane and the three
    channel offsets are added in integer math: ~3x less memory traffic
    than broadcasting a float32 (n,h,w,3) intermediate (this stage runs
    on every synthesized row, so its bandwidth footprint sets the
    many-core scaling ceiling)."""
    return _pixels_for_rows_i16(phashes, w, h).astype(np.uint8)


def _pixels_for_rows_i16(phashes: np.ndarray, w: int, h: int) -> np.ndarray:
    """Clipped int16 pixels (values in [0, 255]) without the uint8
    conversion pass — input for the fused lossy encoder
    (``codecs.lossy_encode_many_i16``), which produces bit-identical
    bytes while skipping one full write+read of the pixel volume."""
    u = np.asarray(phashes).view(np.uint64)
    base = np.stack([(u >> _U(16)) & _U(0xFF), (u >> _U(24)) & _U(0xFF),
                     (u >> _U(40)) & _U(0xFF)], axis=1).astype(np.int16)
    gx = ((u >> _U(48)) & _U(0xFF)).astype(np.float32) / np.float32(255.0) \
        - np.float32(0.5)
    gy = ((u >> _U(56)) & _U(0xFF)).astype(np.float32) / np.float32(255.0) \
        - np.float32(0.5)
    xn, yn = _grid(w, h)
    grad = gx[:, None, None] * xn[None]
    grad += gy[:, None, None] * yn[None]
    gradi = np.rint(grad).astype(np.int16)
    img = gradi[..., None] + base[:, None, None, :]
    np.clip(img, 0, 255, out=img)
    return img


def generate_batch(indices: np.ndarray) -> pa.Table:
    """Rows for a batch of global indices — the map_batches body."""
    idx = np.asarray(indices, dtype=np.int64)
    ph = phash_for_index(idx)
    w = (16 + (idx % 4) * 16).astype(np.int32)
    h = (16 + ((idx // 4) % 4) * 16).astype(np.int32)
    fmt = np.where(idx % 2 == 0, "png", "jpeg")
    lat, lng = latlng_from_phash(ph)
    image_ids = [f"img{i:012d}" for i in idx]
    captions = [f"caption {i} at {la:.4f},{ln:.4f}"
                for i, la, ln in zip(idx, lat, lng)]
    # Group rows by (w, h, fmt) and encode each group with ONE batched
    # numpy pass (per-image calls were the per-row hot cost).
    blobs: list = [None] * len(idx)
    shape_key = (w.astype(np.int64) << 8) | h.astype(np.int64)
    for key in np.unique(shape_key):
        sel = np.nonzero(shape_key == key)[0]
        gw, gh = int(key >> 8), int(key & 0xFF)
        for is_png in (True, False):
            sub = sel[(fmt[sel] == "png") == is_png]
            if not len(sub):
                continue
            if is_png:
                encoded = codecs.png_encode_many(
                    _pixels_for_rows(ph[sub], gw, gh))
            else:
                # fused: int16 pixels straight into the DCT (identical
                # bytes, one less full pass over the pixel volume)
                encoded = codecs.lossy_encode_many_i16(
                    _pixels_for_rows_i16(ph[sub], gw, gh))
            for pos, blob in zip(sub, encoded):
                blobs[pos] = blob
    return pa.table({
        "image_id": pa.array(image_ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(w, pa.int32()),
        "h": pa.array(h, pa.int32()),
        "fmt": pa.array(fmt, pa.string()),
        "caption": pa.array(captions, pa.string()),
        "phash": pa.array(ph, pa.int64()),
    })


def images_dataset(num_rows: int, *, parallelism: int = -1,
                   start: int = 0):
    """Distributed synthesis as a Ray Dataset (lazy) over global row
    indices [start, start + num_rows) — the offset makes a shard of the
    logical table addressable on its own (per-partition checkpoints)."""
    import ray.data as rd

    if parallelism <= 0:
        # ~6k rows per block (~2 blocks per core at the 400k bench):
        # after the LJ93 sparse container + Arrow-buffer decode cut
        # per-row CPU ~2x, per-TASK fixed overhead dominates at fine
        # granularity — re-measured A/B at 400k rows: 2048-row blocks
        # 5.6s, 4096 5.0s, 6144 4.0s (tight attempts), 16384 4.2s
        # (under-utilizes at 24 tasks).  map_batches below still
        # bounds the per-call pixel working set via batch_size.
        parallelism = max(16, num_rows // 6144)
    ds = rd.range(num_rows, override_num_blocks=parallelism)
    off = int(start)

    def _gen(batch: pa.Table) -> pa.Table:
        return generate_batch(batch.column("id").to_numpy() + off)

    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=2048)


def images_table(num_rows: int) -> pa.Table:
    """In-process synthesis (tests, small fixtures)."""
    return generate_batch(np.arange(num_rows, dtype=np.int64))

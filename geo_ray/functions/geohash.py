"""Geohash encoding (public base-32 Z-order cell system; Niemeyer
2008, public domain algorithm): 20 quantized bits per axis,
longitude-first MSB interleave, 5-bit base-32 digits.

Exactness contract: the quantization x = floor((lng+180)/360 * 2^20)
is the same IEEE expression in numpy and SQL (identical doubles in,
identical floor out), and everything after is integer bit math — so
geohashes are engine-reproducible, like the Hilbert cell ids
(functions/cellid.py) and unlike typical float-bisection geohash
implementations.
"""

from __future__ import annotations

import numpy as np

BASE32 = np.array(list("0123456789bcdefghjkmnpqrstuvwxyz"))
BITS_PER_AXIS = 20                      # 40 bits -> 8 characters


def geohash_bits(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    """40-bit interleaved geohash integers (lng bits at odd positions
    counting from bit 0 at the bottom — bit 39 is lng's MSB)."""
    scale = float(1 << BITS_PER_AXIS)
    x = np.floor((lng + 180.0) / 360.0 * scale).astype(np.int64)
    y = np.floor((lat + 90.0) / 180.0 * scale).astype(np.int64)
    lim = (1 << BITS_PER_AXIS) - 1
    x = np.clip(x, 0, lim)
    y = np.clip(y, 0, lim)
    gh = np.zeros(len(x), dtype=np.int64)
    for i in range(BITS_PER_AXIS):
        gh |= ((x >> i) & 1) << (2 * i + 1)
        gh |= ((y >> i) & 1) << (2 * i)
    return gh


def geohash_encode(lat: np.ndarray, lng: np.ndarray,
                   precision: int = 8) -> np.ndarray:
    """Vectorized geohash strings (precision <= 8 characters)."""
    gh = geohash_bits(lat, lng)
    out = None
    for j in range(precision):
        digit = (gh >> (40 - 5 * (j + 1))) & 31
        chars = BASE32[digit]
        out = chars if out is None else np.char.add(out, chars)
    return out

"""Compressed point codec round-trips (semantics of
s2/pointcompression_test.go: cell centers at the coding level encode
compactly and decode exactly; off-center points round-trip as raw
floats)."""

from __future__ import annotations

import numpy as np
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.pointcompression import (NthDerivativeCoder,
                                                decode_points_compressed,
                                                encode_points_compressed,
                                                interleave_uint32,
                                                deinterleave_uint64,
                                                xyz_to_face_siti,
                                                zigzag_decode, zigzag_encode)

RNG = np.random.default_rng(31)


def _cell_center_points(n, level):
    lat = RNG.uniform(-80, 80, n)
    lng = RNG.uniform(-180, 180, n)
    ids = cid.parent_v(cid.cell_id_from_latlng_v(lat, lng), level)
    x, y, z = cid.cell_id_to_point_v(ids)
    return [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]


def test_zigzag_and_interleave():
    for v in (0, 1, -1, 123456, -123456, 2**31 - 1, -(2**31)):
        assert zigzag_decode(zigzag_encode(v)) == v
    for a, b in ((0, 0), (1, 2), (0xFFFFFFFF, 0x12345678)):
        assert deinterleave_uint64(interleave_uint32(a, b)) == (a, b)


def test_nth_derivative_coder_roundtrip():
    enc = NthDerivativeCoder()
    dec = NthDerivativeCoder()
    vals = [0, 0, 1, 4, 9, 16, 25, 1000000, -5, 2**31 - 1]
    for v in vals:
        from geo_ray.functions.pointcompression import _wrap32
        coded = enc.encode(_wrap32(v))
        assert dec.decode(coded) == _wrap32(v)


@pytest.mark.parametrize("level", [8, 17, 30])
def test_cell_center_round_trip(level):
    pts = _cell_center_points(200, level)
    # every point must be recognized as a level-`level` center
    for p in pts[:20]:
        _, _, _, lvl = xyz_to_face_siti(p)
        assert lvl == level
    blob = encode_points_compressed(pts, level)
    got = decode_points_compressed(blob, level, len(pts))
    assert got == pts
    # compactness: much better than raw 24 bytes/point for sorted cells
    assert len(blob) < 24 * len(pts)


def test_mixed_off_center_round_trip():
    level = 12
    pts = _cell_center_points(50, level)
    # replace some with arbitrary (non-center) points
    for idx in (0, 7, 49):
        x, y, z = latlng_deg_to_xyz(np.float64(RNG.uniform(-80, 80)),
                                    np.float64(RNG.uniform(-180, 180)))
        pts[idx] = (float(x), float(y), float(z))
        assert xyz_to_face_siti(pts[idx])[3] != level
    blob = encode_points_compressed(pts, level)
    got = decode_points_compressed(blob, level, len(pts))
    assert got == pts


def test_hilbert_sorted_centers_compress_well():
    """Points in Hilbert order have smooth (pi,qi) trends — the 2nd
    derivative coder should put leaf sequences near the reference's
    ~4 bytes/vertex figure (s2/pointcompression.go:137-139)."""
    lat = RNG.uniform(10, 11, 500)
    lng = RNG.uniform(10, 11, 500)
    ids = np.sort(cid.cell_id_from_latlng_v(lat, lng))
    x, y, z = cid.cell_id_to_point_v(ids)
    pts = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    blob = encode_points_compressed(pts, 30)
    per_vertex = (len(blob) - 8) / (len(pts) - 1)
    assert per_vertex < 10.0


def test_decode_rejects_hostile_counts():
    with pytest.raises(ValueError):
        decode_points_compressed(b"\x00", 10, 10 ** 9)

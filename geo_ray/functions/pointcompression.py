"""Compressed point encoding for sequences of cell-center points.

Format semantics of reference s2/pointcompression.go:49-260 (+
s2/nthderivative.go, s2/interleave.go): decompose points into
(face, si, ti); run-length encode faces as varints (6*count+face);
right-shift si/ti into (pi, qi) space at the encoding level;
2nd-derivative (linear-prediction) code the pi/qi streams with int32
wraparound; zig-zag all but the first value; bit-interleave the pi/qi
codes; first value fixed-length little-endian, rest varint64.  Points
that are NOT centers of level-k cells are appended verbatim as three
float64s with their index ("off-center" exceptions).

Decode defends against hostile counts (maxEncodedVertices,
s2/pointcompression.go:26).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from . import stuv
from .cellid import MASK64

MAX_ENCODED_VERTICES = 50_000_000
MAX_LEVEL = 30
MAX_SITI = 1 << 31
_DERIV_ORDER = 2
_I32 = 1 << 32


# -- int32 wraparound helpers ----------------------------------------------

def _wrap32(x: int) -> int:
    return ((x + (1 << 31)) % _I32) - (1 << 31)


class NthDerivativeCoder:
    """s2/nthderivative.go: code the n-th discrete derivative with
    lossless int32 overflow."""

    def __init__(self, n: int = _DERIV_ORDER):
        self.n = n
        self.m = 0  # derivative order warms up by one per call
        self.memory = [0] * n

    def encode(self, k: int) -> int:
        # s2/nthderivative.go:71-82: the i-th call encodes at most the
        # i-th derivative, so early values never difference against the
        # zero-initialized memory.
        for i in range(self.m):
            delta = _wrap32(k - self.memory[i])
            self.memory[i] = k
            k = delta
        if self.m < self.n:
            self.memory[self.m] = k
            self.m += 1
        return k

    def decode(self, k: int) -> int:
        if self.m < self.n:
            self.m += 1
        for i in range(self.m - 1, -1, -1):
            self.memory[i] = _wrap32(self.memory[i] + k)
            k = self.memory[i]
        return k


def zigzag_encode(n: int) -> int:
    return ((n << 1) ^ (n >> 31)) & 0xFFFFFFFF


def zigzag_decode(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def interleave_uint32(a: int, b: int) -> int:
    """Bit-interleave two uint32 (a gets even bits) -> uint64."""
    out = 0
    for i in range(32):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def deinterleave_uint64(x: int) -> Tuple[int, int]:
    a = b = 0
    for i in range(32):
        a |= ((x >> (2 * i)) & 1) << i
        b |= ((x >> (2 * i + 1)) & 1) << i
    return a, b


# -- varint ----------------------------------------------------------------

def _write_uvarint(buf: bytearray, v: int) -> None:
    while v >= 0x80:
        buf.append((v & 0x7F) | 0x80)
        v >>= 7
    buf.append(v)


def _read_uvarint(data: bytes, pos: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


# -- (face, si, ti) decomposition ------------------------------------------

def st_to_siti(s: float) -> int:
    """Rounded discrete coordinate in [0, 2^31], s2/stuv.go:173-180."""
    if s < 0:
        return int(s * MAX_SITI - 0.5)
    return int(s * MAX_SITI + 0.5)


def xyz_to_face_siti(p) -> Tuple[int, int, int, int]:
    """(face, si, ti, level) — level is -1 unless p is exactly the
    center of a cell at that level (s2/stuv.go:383-420)."""
    x, y, z = p
    f = int(stuv.face(np.float64(x), np.float64(y), np.float64(z)))
    u, v = (float(c) for c in stuv.valid_face_xyz_to_uv(
        np.int64(f), np.float64(x), np.float64(y), np.float64(z)))
    si = st_to_siti(float(stuv.uv_to_st(u)))
    ti = st_to_siti(float(stuv.uv_to_st(v)))
    if si == 0 or ti == 0 or si >= 2 * MAX_SITI or ti >= 2 * MAX_SITI:
        return f, si, ti, -1
    tz_si = (si & -si).bit_length() - 1
    tz_ti = (ti & -ti).bit_length() - 1
    level = MAX_LEVEL - min(tz_si, 30)
    if level < 0 or level != MAX_LEVEL - min(tz_ti, 30):
        return f, si, ti, -1
    cx, cy, cz = _face_siti_to_xyz(f, si, ti)
    if (cx, cy, cz) == (float(x), float(y), float(z)):
        return f, si, ti, level
    return f, si, ti, -1


def _face_siti_to_xyz(f: int, si: int, ti: int) -> Tuple[float, float, float]:
    u = float(stuv.st_to_uv(si / (2.0 ** 31)))
    v = float(stuv.st_to_uv(ti / (2.0 ** 31)))
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    n = float(np.sqrt(x * x + y * y + z * z))
    return float(x) / n, float(y) / n, float(z) / n


def _siti_to_piqi(si: int, level: int) -> int:
    if si >= 2 * MAX_SITI:
        si = 2 * MAX_SITI - 1
    return si >> (MAX_LEVEL + 1 - level)


def _piqi_to_siti(pi: int, level: int) -> int:
    return (pi << (MAX_LEVEL + 1 - level)) + (1 << (MAX_LEVEL - level))


# -- public API -------------------------------------------------------------

def encode_points_compressed(points: List[Tuple[float, float, float]],
                             level: int) -> bytes:
    """Encode a point sequence assumed to be mostly level-``level``
    cell centers.  s2/pointcompression.go:50-92."""
    decomp = [xyz_to_face_siti(p) for p in points]
    buf = bytearray()
    # face runs: varint(6*count + face)
    runs: List[Tuple[int, int]] = []
    for f, _, _, _ in decomp:
        if runs and runs[-1][0] == f:
            runs[-1] = (f, runs[-1][1] + 1)
        else:
            runs.append((f, 1))
    for f, count in runs:
        _write_uvarint(buf, 6 * count + f)
    pi_coder = NthDerivativeCoder()
    qi_coder = NthDerivativeCoder()
    for i, (f, si, ti, _) in enumerate(decomp):
        pi = _siti_to_piqi(si, level)
        qi = _siti_to_piqi(ti, level)
        if i == 0:
            coded_pi = pi_coder.encode(_wrap32(pi)) & 0xFFFFFFFF
            coded_qi = qi_coder.encode(_wrap32(qi)) & 0xFFFFFFFF
            interleaved = interleave_uint32(coded_pi, coded_qi)
            nbytes = (level + 7) // 8 * 2
            for _b in range(nbytes):
                buf.append(interleaved & 0xFF)
                interleaved >>= 8
        else:
            zz_pi = zigzag_encode(pi_coder.encode(_wrap32(pi)))
            zz_qi = zigzag_encode(qi_coder.encode(_wrap32(qi)))
            _write_uvarint(buf, interleave_uint32(zz_pi, zz_qi))
    off_center = [i for i, (_, _, _, lvl) in enumerate(decomp)
                  if lvl != level]
    _write_uvarint(buf, len(off_center))
    for idx in off_center:
        _write_uvarint(buf, idx)
        buf += struct.pack("<ddd", *points[idx])
    return bytes(buf)


def decode_points_compressed(data: bytes, level: int,
                             num_points: int) -> List[Tuple[float, float, float]]:
    """Inverse of :func:`encode_points_compressed`.
    s2/pointcompression.go:218-260."""
    return decode_points_compressed_at(data, 0, level, num_points)[0]


def decode_points_compressed_at(data: bytes, pos: int, level: int,
                                num_points: int):
    """Like :func:`decode_points_compressed` but starts at ``pos`` in a
    larger stream and returns ``(points, end_pos)`` so region decoders
    (loop/polyline/polygon compressed formats) can continue reading."""
    if num_points > MAX_ENCODED_VERTICES:
        raise ValueError("too many vertices")
    faces: List[int] = []
    while len(faces) < num_points:
        coded, pos = _read_uvarint(data, pos)
        face, count = coded % 6, coded // 6
        if count <= 0:
            raise ValueError("non-positive face run")
        faces.extend([face] * count)
    pi_coder = NthDerivativeCoder()
    qi_coder = NthDerivativeCoder()
    out: List[Tuple[float, float, float]] = []
    for i in range(num_points):
        if i == 0:
            nbytes = (level + 7) // 8 * 2
            interleaved = 0
            for b in range(nbytes):
                interleaved |= data[pos] << (8 * b)
                pos += 1
            coded_pi, coded_qi = deinterleave_uint64(interleaved)
            pi = pi_coder.decode(_wrap32(coded_pi)) & 0xFFFFFFFF
            qi = qi_coder.decode(_wrap32(coded_qi)) & 0xFFFFFFFF
        else:
            interleaved, pos = _read_uvarint(data, pos)
            zz_pi, zz_qi = deinterleave_uint64(interleaved)
            pi = pi_coder.decode(_wrap32(zigzag_decode(zz_pi))) & 0xFFFFFFFF
            qi = qi_coder.decode(_wrap32(zigzag_decode(zz_qi))) & 0xFFFFFFFF
        out.append(_face_siti_to_xyz(faces[i], _piqi_to_siti(pi, level),
                                     _piqi_to_siti(qi, level)))
    num_off, pos = _read_uvarint(data, pos)
    if num_off > num_points:
        raise ValueError("implausible off-center count")
    for _ in range(num_off):
        idx, pos = _read_uvarint(data, pos)
        if idx >= num_points:
            raise ValueError("off-center index out of range")
        x, y, z = struct.unpack_from("<ddd", data, pos)
        pos += 24
        out[idx] = (x, y, z)
    return out, pos

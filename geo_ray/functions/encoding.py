"""Binary little-endian serialization of S2 regions.

Wire formats match reference s2/encode.go:27-35 (version constants),
CellID.Encode (s2/cellid.go:484-499: raw little-endian uint64),
CellUnion (s2/cellunion.go:569-601), Cap (s2/cap.go Encode: center xyz
+ chord-angle^2, no version byte), Rect (s2/rect.go:432-463), Point
(version + 3 float64), Loop lossless + compressed
(s2/loop.go:1255-1412), Polyline lossless + compressed
(s2/polyline.go:356-450), and Polygon lossless + compressed with the
snap-level histogram format choice (s2/polygon.go:1035-1215).
Golden byte vectors from s2/encode_test.go:39-135 are asserted in
tests/test_region_encoding.py.
"""

from __future__ import annotations

import math
import struct
from typing import List, Tuple

from . import s1interval
from .pointcompression import (MAX_LEVEL, decode_points_compressed_at,
                               encode_points_compressed, xyz_to_face_siti,
                               _read_uvarint, _write_uvarint)

ENCODING_VERSION = 1
POLYGON_COMPRESSED_VERSION = 4   # s2/encode.go:31
POLYLINE_COMPRESSED_VERSION = 2  # s2/encode.go:35
MAX_CELLS_DECODE = 1_000_000     # s2/cellunion.go:598-601
MAX_ENCODED_LOOPS = 10_000_000   # s2/polygon.go:1148
MAX_ENCODED_VERTICES = 50_000_000

# Loop compressed-property bits, s2/loop.go:1322-1325
_ORIGIN_INSIDE = 1
_BOUND_ENCODED = 2
_MIN_VERTICES_FOR_BOUND = 64  # s2/loop.go:1370


# -- primitives -------------------------------------------------------------

def encode_cell_id(ci: int) -> bytes:
    return struct.pack("<Q", ci)


def decode_cell_id(data: bytes) -> int:
    return struct.unpack("<Q", data[:8])[0]


def encode_cell_union(ids: List[int]) -> bytes:
    out = struct.pack("<bq", ENCODING_VERSION, len(ids))
    out += struct.pack(f"<{len(ids)}Q", *ids) if ids else b""
    return out


def decode_cell_union(data: bytes) -> List[int]:
    version, n = struct.unpack_from("<bq", data, 0)
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported version {version}")
    if n < 0 or n > MAX_CELLS_DECODE:
        raise ValueError(f"implausible cell count {n}")
    return list(struct.unpack_from(f"<{n}Q", data, 9))


def encode_point(p) -> bytes:
    """Version byte + raw xyz float64s (s2/point.go Encode)."""
    return struct.pack("<b3d", ENCODING_VERSION, *p)


def decode_point(data: bytes) -> Tuple[float, float, float]:
    version, x, y, z = struct.unpack_from("<b3d", data, 0)
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported version {version}")
    return (x, y, z)


def encode_cap(cap) -> bytes:
    """center xyz + chord-angle^2; no version byte (s2/cap.go Encode)."""
    return struct.pack("<4d", *cap.center, cap.radius_chord2)


def decode_cap(data: bytes):
    from ..state.cap import Cap
    x, y, z, r2 = struct.unpack_from("<4d", data, 0)
    return Cap((x, y, z), r2)


# -- Rect -------------------------------------------------------------------
# The wire format carries radians with the reference's interval
# conventions: empty lat = (1, 0), empty lng = (pi, -pi).

_EMPTY_BOUND = (1.0, 0.0, math.pi, -math.pi)


def _encode_rect_radians(b: Tuple[float, float, float, float]) -> bytes:
    lat_lo, lat_hi, lng_lo, lng_hi = b
    return struct.pack("<b4d", ENCODING_VERSION, lat_lo, lat_hi,
                       lng_lo, lng_hi)


def _decode_rect_radians(data: bytes, pos: int):
    version = struct.unpack_from("<b", data, pos)[0]
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported rect version {version}")
    vals = struct.unpack_from("<4d", data, pos + 1)
    return vals, pos + 33


def encode_rect(rect) -> bytes:
    """state.Rect (degrees) -> reference wire bytes (radians)."""
    if rect.lat_lo > rect.lat_hi:
        return _encode_rect_radians(_EMPTY_BOUND)
    return _encode_rect_radians((math.radians(rect.lat_lo),
                                 math.radians(rect.lat_hi),
                                 math.radians(rect.lng_lo),
                                 math.radians(rect.lng_hi)))


def decode_rect(data: bytes):
    from ..state.rect import Rect
    (lat_lo, lat_hi, lng_lo, lng_hi), _ = _decode_rect_radians(data, 0)
    return Rect(math.degrees(lat_lo), math.degrees(lat_hi),
                math.degrees(lng_lo), math.degrees(lng_hi))


def _loop_bound_radians(loop) -> Tuple[float, float, float, float]:
    """Loop.rect_bound in the reference's wire conventions."""
    if loop.is_empty():
        return _EMPTY_BOUND
    return loop.rect_bound()


# -- Loop -------------------------------------------------------------------

def encode_loop(loop, depth: int = None) -> bytes:
    """Lossless format (s2/loop.go:1261-1275): version, vertex count,
    raw xyz float64s, originInside, depth, bound."""
    buf = bytearray()
    verts = loop.vertices
    buf += struct.pack("<bI", ENCODING_VERSION, len(verts))
    for v in verts:
        buf += struct.pack("<3d", *v)
    if depth is None:
        depth = getattr(loop, "depth", 0)
    buf += struct.pack("<?i", bool(loop.origin_inside), depth)
    buf += _encode_rect_radians(_loop_bound_radians(loop))
    return bytes(buf)


def decode_loop(data: bytes):
    loop, pos = _decode_loop_at(data, 0)
    return loop


def _decode_loop_at(data: bytes, pos: int):
    from ..state.loop import Loop
    version, n = struct.unpack_from("<bI", data, pos)
    if version != ENCODING_VERSION:
        raise ValueError(f"unsupported loop version {version}")
    if n > MAX_ENCODED_VERTICES:
        raise ValueError(f"too many vertices ({n})")
    pos += 5
    verts = [struct.unpack_from("<3d", data, pos + 24 * i) for i in range(n)]
    pos += 24 * n
    origin_inside, depth = struct.unpack_from("<?i", data, pos)
    pos += 5
    _bound, pos = _decode_rect_radians(data, pos)
    loop = Loop(verts)
    loop.origin_inside = bool(origin_inside)  # trust bytes, as reference does
    loop.depth = int(depth)
    return loop, pos


def encode_loop_compressed(loop, snap_level: int = MAX_LEVEL,
                           depth: int = None) -> bytes:
    """s2/loop.go:1335-1355 (no leading version byte; the container
    supplies framing): uvarint(nverts), compressed points, uvarint
    props, uvarint depth, optional bound."""
    buf = bytearray()
    verts = loop.vertices
    if len(verts) > MAX_ENCODED_VERTICES:
        raise ValueError("too many vertices")
    _write_uvarint(buf, len(verts))
    buf += encode_points_compressed(list(verts), snap_level)
    props = 0
    if loop.origin_inside:
        props |= _ORIGIN_INSIDE
    if len(verts) >= _MIN_VERTICES_FOR_BOUND:
        props |= _BOUND_ENCODED
    _write_uvarint(buf, props)
    if depth is None:
        depth = getattr(loop, "depth", 0)
    _write_uvarint(buf, depth)
    if props & _BOUND_ENCODED:
        buf += _encode_rect_radians(_loop_bound_radians(loop))
    return bytes(buf)


def decode_loop_compressed(data: bytes, snap_level: int = MAX_LEVEL):
    loop, _ = _decode_loop_compressed_at(data, 0, snap_level)
    return loop


def _decode_loop_compressed_at(data: bytes, pos: int, snap_level: int):
    from ..state.loop import Loop
    n, pos = _read_uvarint(data, pos)
    if n > MAX_ENCODED_VERTICES:
        raise ValueError(f"too many vertices ({n})")
    verts, pos = decode_points_compressed_at(data, pos, snap_level, n)
    props, pos = _read_uvarint(data, pos)
    depth, pos = _read_uvarint(data, pos)
    if props & _BOUND_ENCODED:
        _bound, pos = _decode_rect_radians(data, pos)
    loop = Loop(verts)
    loop.origin_inside = bool(props & _ORIGIN_INSIDE)
    loop.depth = int(depth)
    return loop, pos


# -- Polyline ---------------------------------------------------------------

def encode_polyline(pl) -> bytes:
    """Lossless (s2/polyline.go:362-370)."""
    verts = pl.vertices
    buf = bytearray(struct.pack("<bI", ENCODING_VERSION, len(verts)))
    for v in verts:
        buf += struct.pack("<3d", *v)
    return bytes(buf)


def encode_polyline_compressed(pl, snap_level: int = MAX_LEVEL) -> bytes:
    """s2/polyline.go:372-393."""
    verts = pl.vertices
    if len(verts) > MAX_ENCODED_VERTICES:
        raise ValueError("too many vertices")
    buf = bytearray(struct.pack("<BB", POLYLINE_COMPRESSED_VERSION,
                                snap_level))
    _write_uvarint(buf, len(verts))
    buf += encode_points_compressed(list(verts), snap_level)
    return bytes(buf)


def decode_polyline(data: bytes):
    from ..state.polyline import Polyline
    version = struct.unpack_from("<B", data, 0)[0]
    if version == ENCODING_VERSION:
        n = struct.unpack_from("<I", data, 1)[0]
        if n > MAX_ENCODED_VERTICES:
            raise ValueError(f"too many vertices ({n})")
        verts = [struct.unpack_from("<3d", data, 5 + 24 * i)
                 for i in range(n)]
        return Polyline(verts)
    if version == POLYLINE_COMPRESSED_VERSION:
        snap_level = struct.unpack_from("<B", data, 1)[0]
        if snap_level > MAX_LEVEL:
            raise ValueError(f"snap level {snap_level} > {MAX_LEVEL}")
        n, pos = _read_uvarint(data, 2)
        if n > MAX_ENCODED_VERTICES:
            raise ValueError(f"too many vertices ({n})")
        verts, _ = decode_points_compressed_at(data, pos, snap_level, n)
        return Polyline(verts)
    raise ValueError(f"unsupported polyline version {version}")


# -- Polygon ----------------------------------------------------------------

def _polygon_bound_radians(poly, depths) -> Tuple[float, float, float, float]:
    """Union of non-hole loop bounds (s2/polygon.go initLoopProperties)."""
    lat_lo, lat_hi = 1.0, 0.0           # empty r1 interval
    lng = s1interval.empty()
    any_loop = False
    for loop, d in zip(poly.loops, depths):
        if d % 2:
            continue
        b = _loop_bound_radians(loop)
        if b[0] > b[1]:
            continue
        any_loop = True
        if lat_lo > lat_hi:
            lat_lo, lat_hi = b[0], b[1]
        else:
            lat_lo, lat_hi = min(lat_lo, b[0]), max(lat_hi, b[1])
        lng = s1interval.union(lng, (b[2], b[3]))
    if not any_loop:
        return _EMPTY_BOUND
    return (lat_lo, lat_hi, lng[0], lng[1])


def encode_polygon(poly) -> bytes:
    """Format choice per s2/polygon.go:1042-1087: snap-level histogram
    over xyzFaceSiTi vertices, then compressed when the size estimate
    wins, else lossless."""
    num_vertices = sum(len(l.vertices) for l in poly.loops)
    if num_vertices == 0:
        return _encode_polygon_compressed(poly, MAX_LEVEL, [])
    levels = []
    for loop in poly.loops:
        for v in loop.vertices:
            levels.append(xyz_to_face_siti(v)[3])
    histogram = [0] * (MAX_LEVEL + 2)
    for lvl in levels:
        histogram[lvl + 1] += 1
    snap_level, num_snapped = 0, 0
    for level, h in enumerate(histogram[1:]):
        if h > num_snapped:
            snap_level, num_snapped = level, h
    num_unsnapped = num_vertices - num_snapped
    point_size = 3 * 8
    compressed_size = 4 * num_vertices + (point_size + 2) * num_unsnapped
    lossless_size = point_size * num_vertices
    if compressed_size < lossless_size:
        return _encode_polygon_compressed(poly, snap_level, levels)
    return _encode_polygon_lossless(poly)


def _polygon_depths(poly):
    return getattr(poly, "_decoded_depths", None) or poly._loop_depths()


def _encode_polygon_lossless(poly) -> bytes:
    depths = _polygon_depths(poly)
    has_holes = any(d % 2 for d in depths)
    buf = bytearray(struct.pack("<b??I", ENCODING_VERSION, True, has_holes,
                                len(poly.loops)))
    if len(poly.loops) > MAX_ENCODED_LOOPS:
        raise ValueError("too many loops")
    for loop, d in zip(poly.loops, depths):
        buf += encode_loop(loop, depth=d)
    buf += _encode_rect_radians(_polygon_bound_radians(poly, depths))
    return bytes(buf)


def _encode_polygon_compressed(poly, snap_level: int, levels) -> bytes:
    depths = _polygon_depths(poly)
    buf = bytearray(struct.pack("<BB", POLYGON_COMPRESSED_VERSION,
                                snap_level))
    _write_uvarint(buf, len(poly.loops))
    if len(poly.loops) > MAX_ENCODED_LOOPS:
        raise ValueError("too many loops")
    for loop, d in zip(poly.loops, depths):
        buf += encode_loop_compressed(loop, snap_level, depth=d)
    return bytes(buf)


def decode_polygon(data: bytes):
    from ..state.polygon import Polygon
    version = struct.unpack_from("<B", data, 0)[0]
    if version == ENCODING_VERSION:
        _legacy, has_holes, nloops = struct.unpack_from("<??I", data, 1)
        if nloops > MAX_ENCODED_LOOPS:
            raise ValueError(f"too many loops ({nloops})")
        pos = 7
        loops = []
        for _ in range(nloops):
            loop, pos = _decode_loop_at(data, pos)
            loops.append(loop)
        _bound, pos = _decode_rect_radians(data, pos)
    elif version == POLYGON_COMPRESSED_VERSION:
        snap_level = struct.unpack_from("<B", data, 1)[0]
        if snap_level > MAX_LEVEL:
            raise ValueError(f"snap level too big: {snap_level}")
        nloops, pos = _read_uvarint(data, 2)
        if nloops > MAX_ENCODED_LOOPS:
            raise ValueError(f"too many loops ({nloops})")
        loops = []
        for _ in range(nloops):
            loop, pos = _decode_loop_compressed_at(data, pos, snap_level)
            loops.append(loop)
    else:
        raise ValueError(f"unsupported polygon version {version}")
    poly = Polygon(loops)
    poly._decoded_depths = [getattr(l, "depth", 0) for l in loops]
    return poly

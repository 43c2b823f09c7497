"""S2 CellID kernels: Hilbert encode/decode, hierarchy, ranges, tokens,
neighbors.

Semantics of reference s2/cellid.go.  A cell ID is a uint64: 3 face
bits then a 61-bit Hilbert position; the level is encoded by the lowest
set bit (s2/cellid.go:43-48,156-158).  Natural uint64 order == Hilbert
space-filling order, which is why ``cell_id`` doubles as our
range-partition key.

Two implementations live here and are cross-checked by tests:
  * vectorized (``*_v`` suffix or array in/out): numpy uint64 columns,
    8 table-gather steps per encode/decode — the map_batches hot path;
  * scalar: plain Python ints (arbitrary precision; numpy scalar
    promotion rules in numpy<2 make np.uint64 scalars hazardous) —
    used by driver-side covering/tiling code.
"""

from __future__ import annotations

import numpy as np

from .hilbert import (INVERT_MASK, LOOKUP_BITS, LOOKUP_IJ, LOOKUP_IJ_PY,
                      LOOKUP_POS, LOOKUP_POS_PY, SWAP_MASK)
from . import stuv

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL
MASK64 = (1 << 64) - 1

_U = np.uint64


# ---------------------------------------------------------------------------
# vectorized primaries (uint64 ndarrays)
# ---------------------------------------------------------------------------

def cell_id_from_face_ij_v(face: np.ndarray, i: np.ndarray,
                           j: np.ndarray) -> np.ndarray:
    """Hilbert encode (face,i,j) leaf coords -> leaf cell IDs.

    s2/cellid.go:576-598 — 8 iterations of 4-bit table lookups.
    """
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << _U(POS_BITS - 1)
    bits = face & _U(SWAP_MASK)
    mask = _U((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        bits = bits + (((i >> _U(k * LOOKUP_BITS)) & mask) << _U(LOOKUP_BITS + 2))
        bits = bits + (((j >> _U(k * LOOKUP_BITS)) & mask) << _U(2))
        bits = LOOKUP_POS[bits]
        n |= (bits >> _U(2)) << _U(k * 2 * LOOKUP_BITS)
        bits &= _U(SWAP_MASK | INVERT_MASK)
    return n * _U(2) + _U(1)


def face_ij_orientation_v(ids: np.ndarray):
    """Decode cell IDs -> (face, i, j, orientation).  s2/cellid.go:539-573.

    i/j are the leaf coordinates of the cell's min corner.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    f = (ids >> _U(POS_BITS)).astype(np.int64)
    orientation = (f.astype(np.uint64)) & _U(SWAP_MASK)
    i = np.zeros(ids.shape, dtype=np.uint64)
    j = np.zeros(ids.shape, dtype=np.uint64)
    nbits = MAX_LEVEL - 7 * LOOKUP_BITS  # 2 on the first iteration
    for k in range(7, -1, -1):
        extract_mask = _U((1 << (2 * nbits)) - 1)
        orientation = orientation + (
            ((ids >> _U(k * 2 * LOOKUP_BITS + 1)) & extract_mask) << _U(2))
        orientation = LOOKUP_IJ[orientation]
        i += (orientation >> _U(LOOKUP_BITS + 2)) << _U(k * LOOKUP_BITS)
        j += ((orientation >> _U(2)) & _U((1 << LOOKUP_BITS) - 1)) << _U(k * LOOKUP_BITS)
        orientation &= _U(SWAP_MASK | INVERT_MASK)
        nbits = LOOKUP_BITS
    # s2/cellid.go:568-571: adjust orientation for non-leaf cells whose
    # lsb lies at an odd bit position pair.
    lsb = ids & (~ids + _U(1))
    adjust = (lsb & _U(0x1111111111111110)) != _U(0)
    orientation = np.where(adjust, orientation ^ _U(SWAP_MASK), orientation)
    return f, i.astype(np.int64), j.astype(np.int64), orientation.astype(np.int64)


def lsb_v(ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.uint64)
    return ids & (~ids + _U(1))


def level_v(ids: np.ndarray) -> np.ndarray:
    """Cell level from lowest set bit.  s2/cellid.go:156-158."""
    lsb = lsb_v(ids)
    # lsb is an exact power of two <= 2^61 -> float64 log2 is exact.
    tz = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def lsb_for_level_v(level) -> np.ndarray:
    level = np.asarray(level, dtype=np.int64)
    return _U(1) << (_U(2) * (np.uint64(MAX_LEVEL) - level.astype(np.uint64)))


def parent_v(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at ``level``.  s2/cellid.go:186-190."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = _U(1 << (2 * (MAX_LEVEL - level)))
    return (ids & (~lsb + _U(1))) | lsb


def range_min_v(ids: np.ndarray) -> np.ndarray:
    """First leaf descendant.  s2/cellid.go:323-326."""
    ids = np.asarray(ids, dtype=np.uint64)
    return ids - (lsb_v(ids) - _U(1))


def range_max_v(ids: np.ndarray) -> np.ndarray:
    """Last leaf descendant.  s2/cellid.go:329-332."""
    ids = np.asarray(ids, dtype=np.uint64)
    return ids + (lsb_v(ids) - _U(1))


def cell_id_from_point_v(x, y, z) -> np.ndarray:
    """Unit xyz -> leaf cell ID.  s2/cellid.go:638-652."""
    f, u, v = stuv.xyz_to_face_uv(x, y, z)
    i = stuv.st_to_ij(stuv.uv_to_st(u))
    j = stuv.st_to_ij(stuv.uv_to_st(v))
    return cell_id_from_face_ij_v(f, i, j)


def cell_id_from_latlng_v(lat_deg, lng_deg) -> np.ndarray:
    """Degrees lat/lng -> leaf cell ID.  s2/cellid.go:114, s2/latlng.go:85."""
    from .latlng import latlng_deg_to_xyz
    x, y, z = latlng_deg_to_xyz(lat_deg, lng_deg)
    return cell_id_from_point_v(x, y, z)


def center_siti_v(ids: np.ndarray):
    """(face, si, ti) of the cell center.  s2/cellid.go:524-536."""
    ids = np.asarray(ids, dtype=np.uint64)
    f, i, j, _ = face_ij_orientation_v(ids)
    is_leaf = (ids & _U(1)) == _U(1)
    odd = ((i ^ (ids >> _U(2)).astype(np.int64)) & 1) == 1
    delta = np.where(is_leaf, 1, np.where(odd, 2, 0)).astype(np.int64)
    return f, 2 * i + delta, 2 * j + delta


def cell_id_to_point_v(ids: np.ndarray):
    """Cell center as unit xyz.  s2/cellid.go:379-382."""
    f, si, ti = center_siti_v(ids)
    u = stuv.st_to_uv(stuv.siti_to_st(si))
    v = stuv.st_to_uv(stuv.siti_to_st(ti))
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def cell_id_to_latlng_v(ids: np.ndarray):
    """Cell center as degrees lat/lng."""
    from .latlng import xyz_to_latlng_deg
    x, y, z = cell_id_to_point_v(ids)
    return xyz_to_latlng_deg(x, y, z)


def contains_v(parents: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """parents[k] contains ids[k] (leaf-range compare), s2/cellid.go:333-337."""
    return (range_min_v(parents) <= np.asarray(ids, dtype=np.uint64)) & (
        np.asarray(ids, dtype=np.uint64) <= range_max_v(parents))


def from_face_ij_wrap_v(f: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf cell from possibly-out-of-range (i,j), wrapping across faces.

    s2/cellid.go:600-636: clamp i/j one beyond the face, convert to a
    point just off the face in (u,v) (linear scale, NOT the quadratic
    projection — matches the reference), reproject, re-encode.
    """
    f = np.asarray(f, dtype=np.int64)
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.clip(scale * ((i << 1) + 1 - MAX_SIZE), -limit, limit)
    v = np.clip(scale * ((j << 1) + 1 - MAX_SIZE), -limit, limit)
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    f2, u2, v2 = stuv.xyz_to_face_uv(x, y, z)
    return cell_id_from_face_ij_v(
        f2, stuv.st_to_ij(0.5 * (u2 + 1.0)), stuv.st_to_ij(0.5 * (v2 + 1.0)))


def from_face_ij_same_v(f, i, j, same_face: np.ndarray) -> np.ndarray:
    """s2/cellid.go:205-213: same-face fast path else wrap."""
    same = np.asarray(same_face, dtype=bool)
    out = np.empty(np.broadcast(f, i, j).shape, dtype=np.uint64)
    fb = np.broadcast_to(np.asarray(f, dtype=np.int64), out.shape)
    ib = np.broadcast_to(np.asarray(i, dtype=np.int64), out.shape)
    jb = np.broadcast_to(np.asarray(j, dtype=np.int64), out.shape)
    if same.any():
        out[same] = cell_id_from_face_ij_v(fb[same], ib[same], jb[same])
    if (~same).any():
        out[~same] = from_face_ij_wrap_v(fb[~same], ib[~same], jb[~same])
    return out


def edge_neighbors_v(ids: np.ndarray) -> np.ndarray:
    """The 4 edge-adjacent cells at the same level, shape (n, 4).

    s2/cellid.go:215-225.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    lvl = level_v(ids)
    size = (np.int64(1) << (MAX_LEVEL - lvl)).astype(np.int64)
    f, i, j, _ = face_ij_orientation_v(ids)
    out = np.empty(ids.shape + (4,), dtype=np.uint64)
    for k, (di, dj) in enumerate(((0, -1), (1, 0), (0, 1), (-1, 0))):
        nid = from_face_ij_wrap_v(f, i + di * size, j + dj * size)
        out[..., k] = parent_any_v(nid, lvl)
    return out


def parent_any_v(ids: np.ndarray, levels: np.ndarray) -> np.ndarray:
    """Parent at per-row levels."""
    ids = np.asarray(ids, dtype=np.uint64)
    lsb = lsb_for_level_v(levels)
    return (ids & (~lsb + _U(1))) | lsb


def all_neighbors_same_level_v(ids: np.ndarray) -> np.ndarray:
    """The 8 surrounding cells at the cell's own level, shape (n, 8).

    Ring-expansion primitive for kNN (semantics of AllNeighbors at the
    cell's level, s2/cellid.go:274-321; like the reference, output may
    contain duplicates near face corners).
    """
    ids = np.asarray(ids, dtype=np.uint64)
    lvl = level_v(ids)
    size = (np.int64(1) << (MAX_LEVEL - lvl)).astype(np.int64)
    f, i, j, _ = face_ij_orientation_v(ids)
    offs = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))
    out = np.empty(ids.shape + (8,), dtype=np.uint64)
    for k, (di, dj) in enumerate(offs):
        nid = from_face_ij_wrap_v(f, i + di * size, j + dj * size)
        out[..., k] = parent_any_v(nid, lvl)
    return out


def token_v(ids: np.ndarray) -> np.ndarray:
    """Hex tokens with trailing zeros stripped ("X" for 0).

    s2/cellid.go:119-133.
    """
    ids = np.asarray(ids, dtype=np.uint64)
    return np.array([token(int(x)) for x in ids], dtype=object)


# ---------------------------------------------------------------------------
# scalar twins (plain Python ints)
# ---------------------------------------------------------------------------

def cell_id_from_face_ij(face: int, i: int, j: int) -> int:
    n = (face << (POS_BITS - 1)) & MASK64
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = LOOKUP_POS_PY[bits]
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return (n * 2 + 1) & MASK64


def face_ij_orientation(ci: int):
    f = ci >> POS_BITS
    orientation = f & SWAP_MASK
    i = j = 0
    nbits = MAX_LEVEL - 7 * LOOKUP_BITS
    for k in range(7, -1, -1):
        orientation += ((ci >> (k * 2 * LOOKUP_BITS + 1)) & ((1 << (2 * nbits)) - 1)) << 2
        orientation = LOOKUP_IJ_PY[orientation]
        i += (orientation >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS)
        j += ((orientation >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS)
        orientation &= SWAP_MASK | INVERT_MASK
        nbits = LOOKUP_BITS
    if lsb(ci) & 0x1111111111111110:
        orientation ^= SWAP_MASK
    return f, i, j, orientation


def lsb(ci: int) -> int:
    return ci & (-ci & MASK64)


def lsb_for_level(level: int) -> int:
    return 1 << (2 * (MAX_LEVEL - level))


def level(ci: int) -> int:
    return MAX_LEVEL - (lsb(ci).bit_length() - 1) // 2


def is_leaf(ci: int) -> bool:
    return bool(ci & 1)


def is_face(ci: int) -> bool:
    return (ci & (lsb_for_level(0) - 1)) == 0


def is_valid(ci: int) -> bool:
    return (ci >> POS_BITS) < 6 and bool(lsb(ci) & 0x1555555555555555)


def parent(ci: int, lvl: int) -> int:
    l = lsb_for_level(lvl)
    return ((ci & (-l & MASK64)) | l) & MASK64


def immediate_parent(ci: int) -> int:
    nlsb = lsb(ci) << 2
    return ((ci & (-nlsb & MASK64)) | nlsb) & MASK64


def child_begin_at_level(ci: int, lvl: int) -> int:
    return (ci - lsb(ci) + lsb_for_level(lvl)) & MASK64


def child_end_at_level(ci: int, lvl: int) -> int:
    return (ci + lsb(ci) + lsb_for_level(lvl)) & MASK64


def child_begin(ci: int) -> int:
    return (ci - lsb(ci) + (lsb(ci) >> 2)) & MASK64


def child_end(ci: int) -> int:
    return (ci + lsb(ci) + (lsb(ci) >> 2)) & MASK64


def next_cell(ci: int) -> int:
    return (ci + (lsb(ci) << 1)) & MASK64


def prev_cell(ci: int) -> int:
    return (ci - (lsb(ci) << 1)) & MASK64


def children(ci: int):
    out = []
    c = child_begin(ci)
    for _ in range(4):
        out.append(c)
        c = next_cell(c)
    return out


def range_min(ci: int) -> int:
    return ci - (lsb(ci) - 1)


def range_max(ci: int) -> int:
    return ci + (lsb(ci) - 1)


def contains(a: int, b: int) -> bool:
    return range_min(a) <= b <= range_max(a)


def intersects(a: int, b: int) -> bool:
    return range_min(b) <= range_max(a) and range_max(b) >= range_min(a)


def common_ancestor_level(a: int, b: int):
    """XOR-msb trick, s2/cellid.go:741-748.  None if different faces."""
    bits = a ^ b
    bits = max(bits, lsb(a), lsb(b))
    msb_pos = bits.bit_length() - 1
    if msb_pos > 60:
        return None
    return (60 - msb_pos) >> 1


def token(ci: int) -> str:
    """s2/cellid.go:119-133."""
    if ci == 0:
        return "X"
    h = f"{ci:016x}"
    return h.rstrip("0")


def from_token(t: str) -> int:
    """s2/cellid.go:135-142."""
    if t == "X":
        return 0
    if len(t) > 16:
        return 0
    try:
        return int(t.ljust(16, "0"), 16)
    except ValueError:
        return 0


def to_string(ci: int) -> str:
    """Debug string "face/0123..", s2/cellid.go:340-352."""
    if not is_valid(ci):
        return "Invalid: " + format(ci, "016x")
    out = f"{ci >> POS_BITS}/"
    for lvl_ in range(1, level(ci) + 1):
        out += str(child_position(ci, lvl_))
    return out


def from_string(s: str) -> int:
    """Parse the debug string "face/012..." -> cell id (0 if invalid).

    s2/cellid.go:355-373.
    """
    if len(s) < 2 or len(s) > 32 or s[1] != "/":
        return 0
    if s[0] not in "012345":
        return 0
    face = int(s[0])
    ci = parent(cell_id_from_face_ij(face, 0, 0), 0)
    for ch in s[2:]:
        if ch not in "0123":
            return 0
        if is_leaf(ci):
            return 0
        kids = children(ci)
        ci = kids[int(ch)]
    return ci


def child_position(ci: int, lvl: int) -> int:
    """2-bit child position at a level, s2/cellid.go:176-180."""
    return (ci >> (2 * (MAX_LEVEL - lvl) + 1)) & 3


def cell_id_from_point(x: float, y: float, z: float) -> int:
    """Scalar point->cell routed through the numpy kernel so scalar and
    vectorized paths round bit-identically."""
    return int(cell_id_from_point_v(np.float64(x), np.float64(y), np.float64(z)))


def cell_id_from_latlng(lat_deg: float, lng_deg: float) -> int:
    return int(cell_id_from_latlng_v(np.float64(lat_deg), np.float64(lng_deg)))


def cell_id_to_point(ci: int):
    x, y, z = cell_id_to_point_v(np.array([ci], dtype=np.uint64))
    return float(x[0]), float(y[0]), float(z[0])


def edge_neighbors(ci: int):
    return [int(v) for v in edge_neighbors_v(np.array([ci], dtype=np.uint64))[0]]


def vertex_neighbors(ci: int, lvl: int):
    """3-4 cells at ``lvl`` touching the vertex closest to the center.

    s2/cellid.go:230-263.
    """
    f, i, j, _ = face_ij_orientation(ci)
    halfsize = 1 << (MAX_LEVEL - lvl - 1)
    size = halfsize << 1
    if i & halfsize:
        ioffset, isame = size, (i + size) < MAX_SIZE
    else:
        ioffset, isame = -size, (i - size) >= 0
    if j & halfsize:
        joffset, jsame = size, (j + size) < MAX_SIZE
    else:
        joffset, jsame = -size, (j - size) >= 0
    results = [parent(ci, lvl)]
    results.append(_from_face_ij_same(f, i + ioffset, j, isame, lvl))
    results.append(_from_face_ij_same(f, i, j + joffset, jsame, lvl))
    if isame or jsame:
        results.append(_from_face_ij_same(f, i + ioffset, j + joffset,
                                          isame and jsame, lvl))
    return results


def _from_face_ij_same(f: int, i: int, j: int, same: bool, lvl: int) -> int:
    if same:
        return parent(cell_id_from_face_ij(f, i, j), lvl)
    return parent(_from_face_ij_wrap(f, i, j), lvl)


def _from_face_ij_wrap(f: int, i: int, j: int) -> int:
    return int(from_face_ij_wrap_v(np.array([f]), np.array([i]), np.array([j]))[0])


def all_neighbors(ci: int, lvl: int):
    """All neighbors at ``lvl`` (>= cell's level); may contain duplicates.

    s2/cellid.go:274-321.
    """
    f, i, j, _ = face_ij_orientation(ci)
    size = 1 << (MAX_LEVEL - level(ci))
    i &= -size
    j &= -size
    nbr_size = 1 << (MAX_LEVEL - lvl)
    results = []
    k = -nbr_size
    while True:
        if k < 0:
            same_face = (j + k >= 0)
        elif k >= size:
            same_face = (j + k < MAX_SIZE)
        else:
            same_face = True
            results.append(_from_face_ij_same(f, i + k, j - nbr_size,
                                              j - size >= 0, lvl))
            results.append(_from_face_ij_same(f, i + k, j + size,
                                              j + size < MAX_SIZE, lvl))
        results.append(_from_face_ij_same(f, i - nbr_size, j + k,
                                          same_face and i - size >= 0, lvl))
        results.append(_from_face_ij_same(f, i + size, j + k,
                                          same_face and i + size < MAX_SIZE, lvl))
        if k >= size:
            break
        k += nbr_size
    return results


def advance(ci: int, steps: int) -> int:
    """Advance along the Hilbert curve at this cell's level, clamping
    at the ends.  s2/cellid.go:753-774."""
    if steps == 0:
        return ci
    step_shift = 2 * (MAX_LEVEL - level(ci)) + 1
    wrap_offset = 6 << POS_BITS
    if steps < 0:
        min_steps = -(ci >> step_shift)
        if steps < min_steps:
            steps = min_steps
    else:
        max_steps = (wrap_offset + lsb(ci) - ci) >> step_shift
        if steps > max_steps:
            steps = max_steps
    return (ci + (steps << step_shift)) & MASK64


def advance_wrap(ci: int, steps: int) -> int:
    """Advance with wraparound across face 5 -> face 0.

    s2/cellid.go:787-813.
    """
    if steps == 0:
        return ci
    step_shift = 2 * (MAX_LEVEL - level(ci)) + 1
    wrap_offset = 6 << POS_BITS
    step_wrap = wrap_offset >> step_shift

    def _trunc_mod(a: int, b: int) -> int:
        # Go's % truncates toward zero; Python's floors.  Integer ops
        # only: float division is inexact above 2**53.
        q = abs(a) // b
        return a - b * (-q if a < 0 else q)

    if steps < 0:
        min_steps = -(ci >> step_shift)
        if steps < min_steps:
            steps = _trunc_mod(steps, step_wrap)
            if steps < min_steps:
                steps += step_wrap
    else:
        max_steps = (wrap_offset - ci) >> step_shift
        if steps > max_steps:
            steps = _trunc_mod(steps, step_wrap)
            if steps > max_steps:
                steps -= step_wrap
    return (ci + (steps << step_shift)) & MASK64


def expanded_by_distance_uv(u_lo: float, u_hi: float, v_lo: float,
                            v_hi: float, distance_rad: float):
    """Expand a face-UV rect by an on-sphere distance.

    Semantics of s2/cellid.go:811-857 (expandedByDistanceUV /
    expandEndpoint): each UV boundary coordinate moves outward by an
    amount that depends on the max |v| of the opposite axis.
    """
    import math

    max_u = max(abs(u_lo), abs(u_hi))
    max_v = max(abs(v_lo), abs(v_hi))
    sin_dist = math.sin(distance_rad)
    return (_expand_endpoint(u_lo, max_v, -sin_dist),
            _expand_endpoint(u_hi, max_v, sin_dist),
            _expand_endpoint(v_lo, max_u, -sin_dist),
            _expand_endpoint(v_hi, max_u, sin_dist))


def _expand_endpoint(u: float, max_v: float, sin_dist: float) -> float:
    """s2/cellid.go:840-857: push the boundary u outward by the angle
    sin_dist measured on the sphere."""
    import math

    # sin(angle between the boundary plane u=const and the point)
    sin_u_shift = sin_dist * math.sqrt((1 + u * u + max_v * max_v) /
                                       (1 + u * u))
    cos_u_shift = math.sqrt(1 - sin_u_shift * sin_u_shift)
    # the derivation of tan(u + u_shift)
    return (cos_u_shift * u + sin_u_shift) / (cos_u_shift - sin_u_shift * u)


def max_tile(ci: int, limit: int) -> int:
    """Largest cell with RangeMin==ci.RangeMin not beyond ``limit``.

    The tiling operator, s2/cellid.go:870-900.
    """
    start = range_min(ci)
    if start >= range_min(limit):
        return limit
    if range_max(ci) >= limit:
        # The cell is too large, shrink it.
        while True:
            ci = children(ci)[0]
            if range_max(ci) < limit:
                break
        return ci
    # The cell may be too small.  Grow it if necessary.
    while not is_face(ci):
        p = immediate_parent(ci)
        if range_min(p) != start or range_max(p) >= limit:
            break
        ci = p
    return ci

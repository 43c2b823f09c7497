"""Edge clipping: spherical edges clipped to cube faces in (u,v) space.

Semantics of reference s2/edge_clipping.go:84-687 — ClipToPaddedFace
(exact-enough interpolation with documented error constants),
2D ClipEdge against a UV rect, and FaceSegments (subdivide an edge at
every cube-face boundary, guaranteed continuous from A to B).  These
are the geometric primitives for ShapeIndex-style subdivision and the
raster<->vector bridge.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from . import stuv

EPS64 = 2.220446049250313e-16  # machineEpsilon64 (2^-52)
FACE_CLIP_ERROR_RADIANS = 3 * EPS64
FACE_CLIP_ERROR_UV_DIST = 9 * EPS64
FACE_CLIP_ERROR_UV_COORD = 9.0 / math.sqrt(2.0) * EPS64
EDGE_CLIP_ERROR_UV_COORD = 2.25 * EPS64
INTERSECTS_RECT_ERROR_UV_DIST = 3 * math.sqrt(2.0) * EPS64

# faceUVWFaces: neighbors of each face along (u,v,w) axes, s2/stuv.go:417
UVW_FACES = (
    ((4, 1), (5, 2), (3, 0)),
    ((0, 3), (5, 2), (4, 1)),
    ((0, 3), (1, 4), (5, 2)),
    ((2, 5), (1, 4), (0, 3)),
    ((2, 5), (3, 0), (1, 4)),
    ((4, 1), (3, 0), (2, 5)),
)

AXIS_U, AXIS_V = 0, 1


def uvw_face(face: int, axis: int, direction: int) -> int:
    return UVW_FACES[face][axis][direction]


def point_cross(a, b):
    """Robust cross product (a+b) x (b-a): never zero for distinct
    points (s2/point.go PointCross)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return np.cross(a + b, b - a)


def face_xyz_to_uvw(face: int, p) -> Tuple[float, float, float]:
    """xyz -> the (u,v,w) frame of a face, s2/stuv.go:393-410."""
    x, y, z = (float(v) for v in p)
    return ((y, z, x), (-x, z, y), (-x, -y, z),
            (-z, -y, -x), (-z, x, -y), (y, x, -z))[face]


def _sum_equal(u: float, v: float, w: float) -> bool:
    """u + v == w exactly, s2/edge_clipping.go:186-189."""
    return (u + v == w) and (u == w - v) and (v == w - u)


def _intersects_face(n) -> bool:
    """|Nu|+|Nv| >= |Nw| evaluated exactly, s2/edge_clipping.go:195-209."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    return (v >= w - u) and (u >= w - v)


def _intersects_opposite_edges(n) -> bool:
    """||Nu|-|Nv|| >= |Nw| evaluated exactly, s2/edge_clipping.go:211-235."""
    u, v, w = abs(n[0]), abs(n[1]), abs(n[2])
    if abs(u - v) != w:
        return abs(u - v) >= w
    if u >= v:
        return u - w >= v
    return v - w >= u


def _exit_axis(n) -> int:
    """s2/edge_clipping.go:245-280."""
    if _intersects_opposite_edges(n):
        return AXIS_V if abs(n[0]) >= abs(n[1]) else AXIS_U
    x = 1 if math.copysign(1.0, n[0]) < 0 else 0
    y = 1 if math.copysign(1.0, n[1]) < 0 else 0
    z = 1 if math.copysign(1.0, n[2]) < 0 else 0
    return AXIS_V if (x ^ y ^ z) == 0 else AXIS_U


def _exit_point(n, axis: int) -> Tuple[float, float]:
    """s2/edge_clipping.go:282-299."""
    if axis == AXIS_U:
        u = 1.0 if n[1] > 0 else -1.0
        return (u, (-u * n[0] - n[2]) / n[1])
    v = 1.0 if n[0] < 0 else -1.0
    return ((-v * n[1] - n[2]) / n[0], v)


def _clip_destination(a, b, scaled_n, a_tan, b_tan, scale_uv: float):
    """s2/edge_clipping.go:301-364: clip endpoint B on the implicit
    face; returns (uv, score)."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if b[2] > 0:
        uv = (b[0] / b[2], b[1] / b[2])
        if max(abs(uv[0]), abs(uv[1])) <= max_safe:
            return uv, 0
    ep = _exit_point(scaled_n, _exit_axis(scaled_n))
    uv = (ep[0] * scale_uv, ep[1] * scale_uv)
    p = (uv[0], uv[1], 1.0)
    score = 0
    if sum((p[i] - a[i]) * a_tan[i] for i in range(3)) < 0:
        score = 2  # B' on the wrong side of A
    elif sum((p[i] - b[i]) * b_tan[i] for i in range(3)) < 0:
        score = 1  # B' on the wrong side of B
    if score > 0:
        if b[2] <= 0:
            score = 3
        else:
            uv = (b[0] / b[2], b[1] / b[2])
    return uv, score


def clip_to_padded_face(a, b, face: int, padding: float = 0.0):
    """Clip edge AB to face (padded by ``padding`` in UV).  Returns
    (a_uv, b_uv, intersects).  s2/edge_clipping.go:92-141."""
    fa = int(stuv.face(*(np.float64(v) for v in a)))
    fb = int(stuv.face(*(np.float64(v) for v in b)))
    if fa == face and fb == face:
        au, av = (float(v) for v in stuv.valid_face_xyz_to_uv(
            np.int64(face), *(np.float64(v) for v in a)))
        bu, bv = (float(v) for v in stuv.valid_face_xyz_to_uv(
            np.int64(face), *(np.float64(v) for v in b)))
        return (au, av), (bu, bv), True
    norm_uvw = face_xyz_to_uvw(face, point_cross(a, b))
    a_uvw = face_xyz_to_uvw(face, a)
    b_uvw = face_xyz_to_uvw(face, b)
    scale_uv = 1 + padding
    scaled_n = (scale_uv * norm_uvw[0], scale_uv * norm_uvw[1], norm_uvw[2])
    if not _intersects_face(scaled_n):
        return None, None, False
    if max(abs(norm_uvw[0]), abs(norm_uvw[1]), abs(norm_uvw[2])) < \
            math.ldexp(1, -511):
        norm_uvw = tuple(v * math.ldexp(1, 563) for v in norm_uvw)
    nn = math.sqrt(sum(v * v for v in norm_uvw))
    norm_uvw = tuple(v / nn for v in norm_uvw)
    a_tan = np.cross(norm_uvw, a_uvw)
    b_tan = np.cross(b_uvw, norm_uvw)
    neg_n = tuple(-v for v in scaled_n)
    a_uv, a_score = _clip_destination(b_uvw, a_uvw, neg_n, b_tan, a_tan,
                                      scale_uv)
    b_uv, b_score = _clip_destination(a_uvw, b_uvw, scaled_n, a_tan, b_tan,
                                      scale_uv)
    return a_uv, b_uv, (a_score + b_score) < 3


def clip_to_face(a, b, face: int):
    return clip_to_padded_face(a, b, face, 0.0)


def _interpolate_f64(x, a, b, a1, b1) -> float:
    """s2/edge_clipping.go:500-511."""
    if a == b:
        return a1
    if abs(a - x) <= abs(b - x):
        return a1 + (b1 - a1) * (x - a) / (b - a)
    return b1 + (a1 - b1) * (x - b) / (a - b)


def _update_endpoint(lo, hi, high_endpoint, value):
    """s2/edge_clipping.go:368-387.  Returns (lo, hi, ok)."""
    if not high_endpoint:
        if hi < value:
            return lo, hi, False
        if lo < value:
            lo = value
        return lo, hi, True
    if lo > value:
        return lo, hi, False
    if hi > value:
        hi = value
    return lo, hi, True


def _clip_bound_axis(a0, b0, lo0, hi0, a1, b1, lo1, hi1, neg_slope,
                     clip_lo, clip_hi):
    """s2/edge_clipping.go:389-430.  Returns (lo0,hi0,lo1,hi1,ok)."""
    if lo0 < clip_lo:
        if hi0 < clip_lo:
            return lo0, hi0, lo1, hi1, False
        lo0 = clip_lo
        lo1, hi1, ok = _update_endpoint(lo1, hi1, neg_slope,
                                        _interpolate_f64(clip_lo, a0, b0,
                                                         a1, b1))
        if not ok:
            return lo0, hi0, lo1, hi1, False
    if hi0 > clip_hi:
        if lo0 > clip_hi:
            return lo0, hi0, lo1, hi1, False
        hi0 = clip_hi
        lo1, hi1, ok = _update_endpoint(lo1, hi1, not neg_slope,
                                        _interpolate_f64(clip_hi, a0, b0,
                                                         a1, b1))
        if not ok:
            return lo0, hi0, lo1, hi1, False
    return lo0, hi0, lo1, hi1, True


def clip_edge(a: Tuple[float, float], b: Tuple[float, float],
              clip_rect) -> Optional[Tuple[Tuple[float, float],
                                           Tuple[float, float]]]:
    """Clip 2D segment AB to rect (u_lo, u_hi, v_lo, v_hi).

    s2/edge_clipping.go:144-166.
    """
    u_lo, u_hi, v_lo, v_hi = clip_rect
    lo0, hi0 = min(a[0], b[0]), max(a[0], b[0])
    lo1, hi1 = min(a[1], b[1]), max(a[1], b[1])
    neg_slope = (a[0] > b[0]) != (a[1] > b[1])
    lo0, hi0, lo1, hi1, ok = _clip_bound_axis(
        a[0], b[0], lo0, hi0, a[1], b[1], lo1, hi1, neg_slope, u_lo, u_hi)
    if not ok:
        return None
    lo1, hi1, lo0, hi0, ok = _clip_bound_axis(
        a[1], b[1], lo1, hi1, a[0], b[0], lo0, hi0, neg_slope, v_lo, v_hi)
    if not ok:
        return None
    ai = 1 if a[0] > b[0] else 0
    aj = 1 if a[1] > b[1] else 0
    xs = (lo0, hi0)
    ys = (lo1, hi1)
    return ((xs[ai], ys[aj]), (xs[1 - ai], ys[1 - aj]))


class FaceSegment(NamedTuple):
    face: int
    a: Tuple[float, float]
    b: Tuple[float, float]


def _move_origin_to_valid_face(face, a, ab, a_uv):
    """s2/edge_clipping.go:588-645."""
    max_safe = 1 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv[0]), abs(a_uv[1])) <= max_safe:
        return face, a_uv
    n = face_xyz_to_uvw(face, ab)
    if _intersects_face(n):
        uv = _exit_point(n, _exit_axis(n))
        exit_xyz = np.array(stuv.face_uv_to_xyz(face, uv[0], uv[1]),
                            dtype=np.float64)
        abn = np.asarray(ab) / np.linalg.norm(np.asarray(ab))
        a_tangent = np.cross(abn, np.asarray(a, dtype=np.float64))
        if float((exit_xyz - np.asarray(a)) @ a_tangent) >= \
                -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv
    if abs(a_uv[0]) >= abs(a_uv[1]):
        face = uvw_face(face, 0, 1 if a_uv[0] > 0 else 0)
    else:
        face = uvw_face(face, 1, 1 if a_uv[1] > 0 else 0)
    au, av = (float(v) for v in stuv.valid_face_xyz_to_uv(
        np.int64(face), *(np.float64(v) for v in a)))
    return face, (max(-1.0, min(1.0, au)), max(-1.0, min(1.0, av)))


def _next_face(face, exit_uv, axis, n, target_face):
    """s2/edge_clipping.go:647-687."""
    exit_a = exit_uv[axis]
    exit_1ma = exit_uv[1 - axis]
    exit_a_pos = 1 if exit_a > 0 else 0
    exit_1ma_pos = 1 if exit_1ma > 0 else 0
    if (abs(exit_1ma) == 1 and
            uvw_face(face, 1 - axis, exit_1ma_pos) == target_face and
            _sum_equal(exit_uv[0] * n[0], exit_uv[1] * n[1], -n[2])):
        return target_face
    return uvw_face(face, axis, exit_a_pos)


def face_segments(a, b) -> List[FaceSegment]:
    """Subdivide edge AB at every cube-face boundary.

    s2/edge_clipping.go:531-586; returns contiguous segments from A to
    B with all vertices in [-1,1]x[-1,1].
    """
    fa, au, av = (int(stuv.xyz_to_face_uv(*(np.float64(v) for v in a))[0]),
                  *(float(v) for v in stuv.valid_face_xyz_to_uv(
                      stuv.face(*(np.float64(v) for v in a)),
                      *(np.float64(v) for v in a))))
    fb, bu, bv = (int(stuv.xyz_to_face_uv(*(np.float64(v) for v in b))[0]),
                  *(float(v) for v in stuv.valid_face_xyz_to_uv(
                      stuv.face(*(np.float64(v) for v in b)),
                      *(np.float64(v) for v in b))))
    if fa == fb:
        return [FaceSegment(fa, (au, av), (bu, bv))]
    ab = point_cross(a, b)
    fa, a_uv = _move_origin_to_valid_face(fa, a, ab, (au, av))
    fb, b_uv = _move_origin_to_valid_face(fb, b, -np.asarray(ab), (bu, bv))
    segments: List[FaceSegment] = []
    face = fa
    seg_a = a_uv
    b_saved = b_uv
    guard = 0
    while face != fb:
        guard += 1
        if guard > 20:  # 6 faces; paths are short — defensive only
            break
        n = face_xyz_to_uvw(face, ab)
        exit_axis = _exit_axis(n)
        exit_uv = _exit_point(n, exit_axis)
        segments.append(FaceSegment(face, seg_a, exit_uv))
        exit_xyz = tuple(float(v) for v in stuv.face_uv_to_xyz(
            face, exit_uv[0], exit_uv[1]))
        face = _next_face(face, exit_uv, exit_axis, n, fb)
        exit_uvw = face_xyz_to_uvw(face, exit_xyz)
        seg_a = (exit_uvw[0], exit_uvw[1])
    segments.append(FaceSegment(face, seg_a, b_saved))
    return segments

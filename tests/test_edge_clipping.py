"""Edge clipping conformance (strategy of s2/edge_clipping_test.go):
FaceSegments continuity + closeness to the line AB; ClipToPaddedFace
consistency; 2D ClipEdge against sampling."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geo_ray.functions import stuv
from geo_ray.functions.distance import chord2_point_edge
from geo_ray.functions.edge_clipping import (FACE_CLIP_ERROR_UV_DIST,
                                             clip_edge, clip_to_face,
                                             clip_to_padded_face,
                                             face_segments)
from geo_ray.functions.latlng import latlng_deg_to_xyz

RNG = np.random.default_rng(66)


def _rand_point():
    v = RNG.normal(size=3)
    return tuple(v / np.linalg.norm(v))


def _uv_to_point(face, u, v):
    x, y, z = stuv.face_uv_to_xyz(face, u, v)
    n = math.sqrt(float(x * x + y * y + z * z))
    return (float(x) / n, float(y) / n, float(z) / n)


def test_face_segments_continuous_and_near_line():
    for _ in range(100):
        a = _rand_point()
        b = _rand_point()
        segs = face_segments(a, b)
        assert len(segs) >= 1
        # First/last endpoints correspond to A and B.
        first = _uv_to_point(segs[0].face, *segs[0].a)
        last = _uv_to_point(segs[-1].face, *segs[-1].b)
        assert np.allclose(first, a, atol=1e-12)
        assert np.allclose(last, b, atol=1e-12)
        prev_exit = None
        for seg in segs:
            # vertices inside the face square
            for uv in (seg.a, seg.b):
                assert max(abs(uv[0]), abs(uv[1])) <= 1 + 1e-12
            # continuity across faces
            if prev_exit is not None:
                here = _uv_to_point(seg.face, *seg.a)
                assert np.allclose(here, prev_exit, atol=1e-9)
            prev_exit = _uv_to_point(seg.face, *seg.b)
            # all vertices near the edge AB
            for uv in (seg.a, seg.b):
                p = np.asarray(_uv_to_point(seg.face, *uv))
                d2 = float(chord2_point_edge(p, np.asarray(a), np.asarray(b)))
                assert d2 < (1e-9) ** 2 + 1e-24


def test_clip_to_face_same_face_roundtrip():
    a = tuple(float(v) for v in latlng_deg_to_xyz(10.0, 20.0))
    b = tuple(float(v) for v in latlng_deg_to_xyz(15.0, 30.0))
    a_uv, b_uv, ok = clip_to_face(a, b, 0)
    assert ok
    assert np.allclose(_uv_to_point(0, *a_uv), a, atol=1e-12)
    assert np.allclose(_uv_to_point(0, *b_uv), b, atol=1e-12)


def test_clip_to_padded_face_covers_face_segments():
    """Every face touched by FaceSegments must also report an
    intersection from clip_to_padded_face (with a little padding)."""
    for _ in range(50):
        a, b = _rand_point(), _rand_point()
        touched = {seg.face for seg in face_segments(a, b)}
        for f in touched:
            _, _, ok = clip_to_padded_face(a, b, f, 1e-10)
            assert ok, (a, b, f)


def test_clip_edge_2d():
    rect = (-0.5, 0.5, -0.25, 0.25)
    # fully inside
    got = clip_edge((-0.1, 0.0), (0.2, 0.1), rect)
    assert got == ((-0.1, 0.0), (0.2, 0.1))
    # fully outside (no overlap in u)
    assert clip_edge((0.9, 0.0), (1.5, 0.1), rect) is None
    # crossing: clipped endpoints lie on the rect boundary and on AB
    a, b = (-1.0, -0.5), (1.0, 0.5)
    got = clip_edge(a, b, rect)
    assert got is not None
    (x0, y0), (x1, y1) = got
    for (x, y) in ((x0, y0), (x1, y1)):
        assert rect[0] - 1e-12 <= x <= rect[1] + 1e-12
        assert rect[2] - 1e-12 <= y <= rect[3] + 1e-12
        # on the line y = 0.5 x
        assert abs(y - 0.5 * x) < 1e-12
    # direction preserved (a-side endpoint first)
    assert x0 < x1
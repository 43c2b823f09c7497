"""Cube-face (s,t) / (u,v) / (i,j) coordinate transforms.

Semantics of reference s2/stuv.go (quadratic projection only, the one
the reference implements — s2/stuv.go:146-147,186-201).  All array
functions are numpy-vectorized, float64 in/out, and are the single
source of truth for point->cell assignment; scalar wrappers delegate to
them so both paths round identically.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL          # 2^30, s2/cellid.go:77-97
MAX_SITI = 1 << (MAX_LEVEL + 1)    # 2^31, s2/stuv.go:157-180


def st_to_uv(s):
    """Quadratic ST->UV, s2/stuv.go:186-191."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def uv_to_st(u):
    """Quadratic UV->ST, s2/stuv.go:196-201."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0,
                        0.5 * np.sqrt(1.0 + 3.0 * u),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def st_to_ij(s):
    """ST -> discrete leaf coordinate in [0, 2^30-1], s2/stuv.go:227-229."""
    ij = np.floor(np.asarray(s, dtype=np.float64) * MAX_SIZE)
    return np.clip(ij, 0, MAX_SIZE - 1).astype(np.int64)


def ij_to_st_min(i):
    """Lower bound ST of leaf column i, s2/stuv.go:233-235."""
    return np.asarray(i, dtype=np.float64) / MAX_SIZE


def siti_to_st(si):
    """si/ti in [0, 2^31] -> ST, s2/stuv.go:163-166."""
    return np.asarray(si, dtype=np.float64) / MAX_SITI


def face(x, y, z):
    """Face with largest |component| (sign -> +3), s2/stuv.go:205-216."""
    x = np.asarray(x); y = np.asarray(y); z = np.asarray(z)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    f = np.where(ax > ay,
                 np.where(ax > az, 0, 2),
                 np.where(ay > az, 1, 2))
    comp = np.choose(f, [x, y, z])
    return np.where(comp < 0.0, f + 3, f).astype(np.int64)


def valid_face_xyz_to_uv(f, x, y, z):
    """(face, xyz) -> (u, v); point must be on the +face side.

    Per-face ratios from s2/stuv.go:234-248.
    """
    f = np.asarray(f)
    u = np.empty(np.broadcast(f, x).shape, dtype=np.float64)
    v = np.empty_like(u)
    m0 = f == 0; m1 = f == 1; m2 = f == 2
    m3 = f == 3; m4 = f == 4; m5 = f == 5
    with np.errstate(divide="ignore", invalid="ignore"):
        np.divide(y, x, out=u, where=m0); np.divide(z, x, out=v, where=m0)
        np.divide(-x, y, out=u, where=m1); np.divide(z, y, out=v, where=m1)
        np.divide(-x, z, out=u, where=m2); np.divide(-y, z, out=v, where=m2)
        np.divide(z, x, out=u, where=m3); np.divide(y, x, out=v, where=m3)
        np.divide(z, y, out=u, where=m4); np.divide(-x, y, out=v, where=m4)
        np.divide(-y, z, out=u, where=m5); np.divide(-x, z, out=v, where=m5)
    return u, v


def xyz_to_face_uv(x, y, z):
    """xyz -> (face, u, v), s2/stuv.go:252-256."""
    f = face(x, y, z)
    u, v = valid_face_xyz_to_uv(f, x, y, z)
    return f, u, v


def face_uv_to_xyz(f, u, v):
    """(face, u, v) -> xyz (NOT normalized), s2/stuv.go:259-274."""
    f = np.asarray(f)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    shape = np.broadcast(f, u, v).shape
    one = np.ones(shape, dtype=np.float64)
    fb = np.broadcast_to(f, shape)
    ub = np.broadcast_to(u, shape)
    vb = np.broadcast_to(v, shape)
    x = np.select([fb == 0, fb == 1, fb == 2, fb == 3, fb == 4, fb == 5],
                  [one, -ub, -ub, -one, vb, vb])
    y = np.select([fb == 0, fb == 1, fb == 2, fb == 3, fb == 4, fb == 5],
                  [ub, one, -vb, -vb, -one, ub])
    z = np.select([fb == 0, fb == 1, fb == 2, fb == 3, fb == 4, fb == 5],
                  [vb, vb, one, -ub, -ub, -one])
    return x, y, z


def u_norm(f: int, u: float):
    """Outward normal of the plane u=const on face f, s2/stuv.go:282-296."""
    return ((u, -1.0, 0.0), (1.0, u, 0.0), (1.0, 0.0, u),
            (-u, 0.0, 1.0), (0.0, -u, 1.0), (0.0, -1.0, -u))[f]


def v_norm(f: int, v: float):
    """Outward normal of the plane v=const on face f, s2/stuv.go:300-314."""
    return ((-v, 0.0, 1.0), (0.0, -v, 1.0), (0.0, -1.0, -v),
            (v, -1.0, 0.0), (1.0, v, 0.0), (1.0, 0.0, v))[f]

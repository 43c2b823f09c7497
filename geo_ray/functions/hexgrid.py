"""Hexagonal grid binning on the cube-face gnomonic planes — the
"H3-flavored" index family of the north rule ("H3/S2 index") realized
from scratch: points project to their S2 face's (u, v) plane
(s2/stuv.go:205-256 semantics via functions/stuv.xyz_to_face_uv), then
bin into a pointy-top axial hex lattice by the standard fractional
axial -> cube-coordinate rounding (the public "cube round" algorithm
from Red Blob Games' hexagonal-grids reference, as used by H3's local
IJ math).  Unlike true H3 there is no icosahedral base — the cube
faces play that role — but the contract is the same: every point maps
to exactly one hex cell id, neighbors differ by one axial step, and
the binning is a pure per-row vectorized map (no shuffle until the
count aggregate).

Exactness: qf/rf are two multiplies, one subtract and one divide on
bit-identical doubles (IEEE exact-rounded on both engines); rounding
is floor(x + 0.5) (NOT numpy's banker's np.round), and the cube-round
correction is pure comparisons — so the SQL oracle reproduces cell
assignments bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from .stuv import xyz_to_face_uv

# pointy-top axial basis constants (embed the SAME doubles in SQL)
C_Q_U = 0.5773502691896258   # sqrt(3)/3
C_Q_V = 0.3333333333333333   # 1/3
C_R_V = 0.6666666666666666   # 2/3


def hex_assign(x, y, z, size: float):
    """(x, y, z) unit vectors -> (face, q, r) axial hex coordinates of
    edge-size ``size`` on the point's face plane."""
    f, u, v = xyz_to_face_uv(np.asarray(x), np.asarray(y), np.asarray(z))
    qf = (u * C_Q_U - v * C_Q_V) / size
    rf = (v * C_R_V) / size
    q, r = cube_round(qf, rf)
    return f.astype(np.int64), q, r


def cube_round(qf: np.ndarray, rf: np.ndarray):
    """Fractional axial -> nearest hex center (integer axial), via
    cube coordinates: round each of (x, y, z = x+y+z == 0) with
    floor(.+0.5) and recompute the coordinate with the largest
    rounding error from the other two."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)  # rx already corrected = final
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_center_uv(q, r, size: float):
    """Axial hex center back to (u, v) on the face plane (the inverse
    basis), for rendering / round-trip tests."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    sqrt3 = 1.7320508075688772
    u = size * (sqrt3 * q + sqrt3 / 2.0 * r)
    v = size * (1.5 * r)
    return u, v

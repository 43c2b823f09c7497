"""Scalar Cell geometry: uv bounds, vertices, edge normals, containment.

Semantics of reference s2/cell.go:59-491 and s2/cellid.go:656-671
(ijLevelToBoundUV).  Used by region predicates inside the covering
generator; the per-record hot paths use the vectorized kernels instead.
"""

from __future__ import annotations

import numpy as np

from ..functions import cellid as cid
from ..functions import stuv
from ..functions.predicates import DBL_EPSILON


class Cell:
    __slots__ = ("id", "face", "level", "u_lo", "u_hi", "v_lo", "v_hi")

    def __init__(self, ci: int):
        self.id = ci
        f, i, j, _ = cid.face_ij_orientation(ci)
        self.face = f
        self.level = cid.level(ci)
        size = 1 << (30 - self.level)
        i_lo = i & -size
        j_lo = j & -size
        # s2/cellid.go:656-671
        self.u_lo = float(stuv.st_to_uv(i_lo / stuv.MAX_SIZE))
        self.u_hi = float(stuv.st_to_uv((i_lo + size) / stuv.MAX_SIZE))
        self.v_lo = float(stuv.st_to_uv(j_lo / stuv.MAX_SIZE))
        self.v_hi = float(stuv.st_to_uv((j_lo + size) / stuv.MAX_SIZE))

    def vertices(self):
        """4 vertices in CCW order (lower-left first), normalized.

        s2/cell.go:117-126.
        """
        uv = ((self.u_lo, self.v_lo), (self.u_hi, self.v_lo),
              (self.u_hi, self.v_hi), (self.u_lo, self.v_hi))
        out = []
        for u, v in uv:
            x, y, z = stuv.face_uv_to_xyz(self.face, u, v)
            n = float(np.sqrt(x * x + y * y + z * z))
            out.append((float(x) / n, float(y) / n, float(z) / n))
        return out

    def edge_normal(self, k: int):
        """Inward-pointing normal of edge k (bottom,right,top,left).

        s2/cell.go:146-157 returns the outward normal of the edge plane;
        like the reference we return the raw (unnormalized) vector with
        the reference's sign convention: Edge(k) such that the cell
        interior is on the NEGATIVE side for k in {2,3} ... concretely
        EdgeRaw: k0 vNorm(v_lo), k1 uNorm(u_hi), k2 -vNorm(v_hi),
        k3 -uNorm(u_lo).
        """
        if k == 0:
            return stuv.v_norm(self.face, self.v_lo)
        if k == 1:
            return stuv.u_norm(self.face, self.u_hi)
        if k == 2:
            n = stuv.v_norm(self.face, self.v_hi)
            return (-n[0], -n[1], -n[2])
        n = stuv.u_norm(self.face, self.u_lo)
        return (-n[0], -n[1], -n[2])

    def contains_point(self, p) -> bool:
        """s2/cell.go:462-491: project to this face's uv, compare with
        the uv rect expanded by 2*dblEpsilon."""
        x, y, z = p
        f = self.face
        # faceXYZToUV: requires the point to be on the correct side
        major = (x, y, z)[f % 3]
        if f < 3:
            if major <= 0:
                return False
        else:
            if major >= 0:
                return False
        u, v = (float(a) for a in stuv.valid_face_xyz_to_uv(
            np.int64(f), np.float64(x), np.float64(y), np.float64(z)))
        eps = 2 * DBL_EPSILON
        return (self.u_lo - eps <= u <= self.u_hi + eps and
                self.v_lo - eps <= v <= self.v_hi + eps)

    def center(self):
        x, y, z = cid.cell_id_to_point(self.id)
        return (x, y, z)

    def children(self):
        return [Cell(c) for c in cid.children(self.id)]

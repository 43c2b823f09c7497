"""PaddedCell: a cell whose (u,v)-bound is outward-padded, with
incremental child construction — the traversal structure behind the
reference's recursive edge descent.

Semantics of s2/paddedcell.go:28-254: PaddedCellFromCellID /
PaddedCellFromParentIJ / Middle / Bound / ShrinkToFit.  Bounds are
plain [u_lo, u_hi, v_lo, v_hi] lists (the r2.Rect of the reference).
"""

from __future__ import annotations

import math

from ..functions import cellid as cid
from ..functions.hilbert import (IJ_TO_POS, INVERT_MASK, POS_TO_IJ,
                                 POS_TO_ORIENTATION, SWAP_MASK)
from ..functions.stuv import (MAX_LEVEL, face_uv_to_xyz, ij_to_st_min,
                              siti_to_st, st_to_ij, st_to_uv, uv_to_st)

_EPS64 = 2.0 ** -52


def _size_ij(level: int) -> int:
    return 1 << (MAX_LEVEL - level)


class PaddedCell:
    """See module docstring.  Construct with :meth:`from_cell_id` or
    :meth:`from_parent_ij`."""

    __slots__ = ("id", "padding", "bound", "_middle", "i_lo", "j_lo",
                 "orientation", "level")

    def __init__(self):
        self._middle = None

    @classmethod
    def from_cell_id(cls, ci: int, padding: float = 0.0) -> "PaddedCell":
        """s2/paddedcell.go:39-62 (incl. the face-cell fast path)."""
        p = cls()
        p.id = ci
        p.padding = padding
        if cid.is_face(ci):
            limit = padding + 1.0
            p.bound = [-limit, limit, -limit, limit]
            p._middle = [-padding, padding, -padding, padding]
            p.orientation = (ci >> 61) & 1
            p.level = 0
            p.i_lo = p.j_lo = 0
            return p
        _, i, j, orient = cid.face_ij_orientation(ci)
        p.level = cid.level(ci)
        ij_size = _size_ij(p.level)
        p.i_lo = i & -ij_size
        p.j_lo = j & -ij_size
        # ijLevelToBoundUV expanded by the padding margin
        u_lo = float(st_to_uv(ij_to_st_min(p.i_lo)))
        u_hi = float(st_to_uv(ij_to_st_min(p.i_lo + ij_size)))
        v_lo = float(st_to_uv(ij_to_st_min(p.j_lo)))
        v_hi = float(st_to_uv(ij_to_st_min(p.j_lo + ij_size)))
        p.bound = [u_lo - padding, u_hi + padding,
                   v_lo - padding, v_hi + padding]
        p.orientation = orient
        return p

    @classmethod
    def from_parent_ij(cls, parent: "PaddedCell", i: int,
                       j: int) -> "PaddedCell":
        """Child at (i, j) — i/j index increasing u/v respectively —
        built incrementally from the parent (s2/paddedcell.go:66-102):
        one bound corner comes from the parent, the diagonally
        opposite one from the parent's middle."""
        pos = IJ_TO_POS[parent.orientation][2 * i + j]
        p = cls()
        p.id = cid.children(parent.id)[pos]
        p.padding = parent.padding
        p.orientation = parent.orientation ^ POS_TO_ORIENTATION[pos]
        p.level = parent.level + 1
        ij_size = _size_ij(p.level)
        p.i_lo = parent.i_lo + i * ij_size
        p.j_lo = parent.j_lo + j * ij_size
        b = list(parent.bound)
        middle = parent.middle()
        if i == 1:
            b[0] = middle[0]
        else:
            b[1] = middle[1]
        if j == 1:
            b[2] = middle[2]
        else:
            b[3] = middle[3]
        p.bound = b
        return p

    def middle(self):
        """The (u,v) rect shared by all four children, computed lazily
        (s2/paddedcell.go:128-141)."""
        if self._middle is None:
            ij_size = _size_ij(self.level)
            u = float(st_to_uv(siti_to_st(2 * self.i_lo + ij_size)))
            v = float(st_to_uv(siti_to_st(2 * self.j_lo + ij_size)))
            self._middle = [u - self.padding, u + self.padding,
                            v - self.padding, v + self.padding]
        return self._middle

    def child_ij(self, pos: int):
        """(i, j) of the child at Hilbert traversal position ``pos``
        (s2/paddedcell.go:150-154)."""
        ij = POS_TO_IJ[self.orientation][pos]
        return ij >> 1, ij & 1

    def entry_vertex(self):
        """Vertex where the space-filling curve enters this cell
        (s2/paddedcell.go:157-169)."""
        i, j = self.i_lo, self.j_lo
        if self.orientation & INVERT_MASK:
            ij_size = _size_ij(self.level)
            i += ij_size
            j += ij_size
        return self._vertex_xyz(i, j)

    def exit_vertex(self):
        """Vertex where the curve exits (s2/paddedcell.go:172-185)."""
        i, j = self.i_lo, self.j_lo
        ij_size = _size_ij(self.level)
        if self.orientation == 0 or \
                self.orientation == SWAP_MASK + INVERT_MASK:
            i += ij_size
        else:
            j += ij_size
        return self._vertex_xyz(i, j)

    def _vertex_xyz(self, i: int, j: int):
        u = float(st_to_uv(siti_to_st(2 * i)))
        v = float(st_to_uv(siti_to_st(2 * j)))
        x, y, z = face_uv_to_xyz(self.id >> 61, u, v)
        n = math.sqrt(x * x + y * y + z * z)
        return (x / n, y / n, z / n)

    def shrink_to_fit(self, rect) -> int:
        """Smallest CellID containing all descendants of this padded
        cell whose bounds intersect ``rect`` — skips the initial
        only-one-child-expands levels of a recursive subdivision
        (s2/paddedcell.go:187-254).  ``rect`` must intersect this
        cell's bound."""
        if self.level == 0:
            if (rect[0] <= 0.0 <= rect[1]) or (rect[2] <= 0.0 <= rect[3]):
                return self.id
        ij_size = _size_ij(self.level)
        if (rect[0] <= float(st_to_uv(siti_to_st(2 * self.i_lo + ij_size)))
                <= rect[1]) or \
           (rect[2] <= float(st_to_uv(siti_to_st(2 * self.j_lo + ij_size)))
                <= rect[3]):
            return self.id
        pad = self.padding + 1.5 * _EPS64
        p_ulo, p_uhi = rect[0] - pad, rect[1] + pad
        p_vlo, p_vhi = rect[2] - pad, rect[3] + pad
        i_min = max(self.i_lo, int(st_to_ij(uv_to_st(p_ulo))))
        a = self.i_lo + ij_size - 1
        b = int(st_to_ij(uv_to_st(p_uhi)))
        i_xor = i_min ^ min(a, b)
        j_min = max(self.j_lo, int(st_to_ij(uv_to_st(p_vlo))))
        a = self.j_lo + ij_size - 1
        b = int(st_to_ij(uv_to_st(p_vhi)))
        j_xor = j_min ^ min(a, b)
        level_msb = ((i_xor | j_xor) << 1) + 1
        lvl = MAX_LEVEL - (level_msb.bit_length() - 1)
        if lvl <= self.level:
            return self.id
        return cid.parent(
            cid.cell_id_from_face_ij(self.id >> 61, i_min, j_min), lvl)

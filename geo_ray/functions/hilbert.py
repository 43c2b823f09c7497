"""Hilbert curve lookup tables for the S2 cell-ID quadtree.

Semantics of reference s2/cellid.go:673-738 (``initLookupCell`` and the
4-bit lookup tables): positions along the Hilbert curve within a cell
are related to (i,j) subcell coordinates through an orientation state
machine with two bits, ``SWAP_MASK`` (swap i/j) and ``INVERT_MASK``
(invert direction).  The reference chose 4-bit tables ("2KB fits easily
in the primary cache", s2/cellid.go:692-694); we keep the same shape so
the encode/decode loops run in 8 table-gather steps, which vectorizes
as ``np.take`` over whole uint64 columns.
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# posToIJ[orientation][pos] = ij (2 bits: i<<1 | j), s2/cellid.go:702-703
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order:    (0,0), (0,1), (1,1), (1,0)
    (0, 2, 3, 1),  # axes swapped:       (0,0), (1,0), (1,1), (0,1)
    (3, 2, 0, 1),  # bits inverted:      (1,1), (1,0), (0,0), (0,1)
    (3, 1, 0, 2),  # swapped & inverted: (1,1), (0,1), (0,0), (1,0)
)
# posToOrientation[pos] = orientation delta, s2/cellid.go:706-708
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

# ijToPos[orientation][ij] = pos (inverse of POS_TO_IJ)
IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in POS_TO_IJ
)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup_cell(level: int, i: int, j: int, orig_orientation: int,
                      pos: int, orientation: int) -> None:
    # s2/cellid.go:713-731
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        ij = r[index]
        _init_lookup_cell(level, i + (ij >> 1), j + (ij & 1), orig_orientation,
                          pos + index, orientation ^ POS_TO_ORIENTATION[index])


for _o in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _o, 0, _o)

LOOKUP_POS: np.ndarray = _LOOKUP_POS
LOOKUP_IJ: np.ndarray = _LOOKUP_IJ
# Python-int copies for the scalar twins (avoids numpy scalar promotion traps)
LOOKUP_POS_PY: tuple = tuple(int(x) for x in _LOOKUP_POS)
LOOKUP_IJ_PY: tuple = tuple(int(x) for x in _LOOKUP_IJ)

"""Vertex snap functions (vectorized).

Semantics of reference s2/builder_snapper.go:82-505: IdentitySnapper,
CellIDSnapper (snap to cell centers at a level), IntLatLngSnapper
(snap to an E5/E6/E7 fixed-point lat/lng lattice).  The reference has
no full S2Builder (s2/builder.go:17-35 is constants only); snapping is
exposed here as map_batches-ready kernels producing grid-aligned
geometry.
"""

from __future__ import annotations

import numpy as np

from . import cellid as cid
from .latlng import latlng_deg_to_xyz, xyz_to_latlng_deg
from .metric import MIN_WIDTH


def identity_snap(x, y, z):
    """s2/builder_snapper.go:96-130."""
    return np.asarray(x), np.asarray(y), np.asarray(z)


def cell_id_snap(x, y, z, level: int):
    """Snap points to the centers of cells at ``level``
    (s2/builder_snapper.go:150-260)."""
    leaf = cid.cell_id_from_point_v(x, y, z)
    parent = cid.parent_v(leaf, level)
    return cid.cell_id_to_point_v(parent)


def cell_id_snap_level_for_limit(snap_radius_rad: float) -> int:
    """Min level whose snap radius is within the limit
    (minLevelForSnapRadius semantics, s2/builder_snapper.go:190-220)."""
    return MIN_WIDTH.max_level(2 * snap_radius_rad)


def int_latlng_snap(x, y, z, exponent: int):
    """Snap to the 10^-exponent-degree lat/lng lattice (E5/E6/E7,
    s2/builder_snapper.go:380-505)."""
    if not 0 <= exponent <= 10:
        raise ValueError("exponent out of range")
    scale = 10.0 ** exponent
    lat, lng = xyz_to_latlng_deg(np.asarray(x), np.asarray(y), np.asarray(z))
    lat_i = np.rint(np.asarray(lat) * scale)
    lng_i = np.rint(np.asarray(lng) * scale)
    return latlng_deg_to_xyz(lat_i / scale, lng_i / scale)

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

import math

from . import cellid as cid
from .latlng import latlng_deg_to_xyz, xyz_to_latlng_deg
from .metric import MAX_DIAG, MIN_DIAG, MIN_EDGE, MIN_WIDTH

MACHINE_EPS = 2.0 ** -52            # s2/predicates.go:40
MAX_SNAP_RADIUS = math.radians(70)  # s2/builder_snapper.go:122


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
    # round half AWAY from zero (the reference's roundAngle / C++
    # lround), not numpy's half-even rint: E1-scale ties are real on
    # coarse-lattice inputs
    lat_v = np.asarray(lat) * scale
    lng_v = np.asarray(lng) * scale
    lat_i = np.trunc(lat_v + np.copysign(0.5, lat_v))
    lng_i = np.trunc(lng_v + np.copysign(0.5, lng_v))
    return latlng_deg_to_xyz(lat_i / scale, lng_i / scale)


# ---------------------------------------------------------------------------
# Snapper objects with the reference's radius/separation guarantees
# (s2/builder_snapper.go:82-505).  SnapPoint semantics for the lat/lng
# snapper follow the documented E5/E6/E7 DEGREE lattice (the C++
# behavior its comments describe; the Go port's SnapPoint is missing
# the radians->degrees conversion and its conformance test is
# commented out pending that fix).
# ---------------------------------------------------------------------------

class IdentitySnapper:
    """s2/builder_snapper.go:134-169."""

    def __init__(self, snap_radius: float = 0.0):
        self.snap_radius = float(snap_radius)

    def min_vertex_separation(self) -> float:
        return self.snap_radius

    def min_edge_vertex_separation(self) -> float:
        return 0.5 * self.snap_radius

    def snap_point(self, x, y, z):
        return identity_snap(x, y, z)


class CellIDSnapper:
    """Snap to cell centers at a level (s2/builder_snapper.go:171-330)."""

    def __init__(self, level: int = 30, snap_radius: float = None):
        self.level = int(level)
        self.snap_radius = (self.min_snap_radius_for_level(self.level)
                            if snap_radius is None else float(snap_radius))

    @staticmethod
    def min_snap_radius_for_level(level: int) -> float:
        """~half the max cell diagonal plus conversion error bounds
        (s2/builder_snapper.go:214-224)."""
        return 0.5 * MAX_DIAG.value(level) + 4 * MACHINE_EPS

    @staticmethod
    def level_for_max_snap_radius(snap_radius: float) -> int:
        """s2/builder_snapper.go:236-240."""
        return MAX_DIAG.min_level(2 * (snap_radius - 4 * MACHINE_EPS))

    def min_vertex_separation(self) -> float:
        """max of the constant / proportional / asymptotic bounds
        (s2/builder_snapper.go:244-271)."""
        return max(MIN_EDGE.value(self.level),
                   0.548 * self.snap_radius,
                   self.snap_radius - 0.5 * MAX_DIAG.value(self.level))

    def min_edge_vertex_separation(self) -> float:
        """s2/builder_snapper.go:277-324."""
        min_diag = MIN_DIAG.value(self.level)
        if self.snap_radius == self.min_snap_radius_for_level(self.level):
            return 0.565 * min_diag
        vs = self.min_vertex_separation()
        return max(0.397 * min_diag, 0.219 * self.snap_radius,
                   0.5 * (vs / self.snap_radius) * vs)

    def snap_point(self, x, y, z):
        return cell_id_snap(x, y, z, self.level)


class IntLatLngSnapper:
    """Snap to the E<exponent> integer lat/lng lattice
    (s2/builder_snapper.go:355-505)."""

    def __init__(self, exponent: int, snap_radius: float = None):
        if not 0 <= exponent <= 10:
            raise ValueError("exponent out of range")
        self.exponent = int(exponent)
        self.to = 10.0 ** -self.exponent  # degrees per lattice step
        self.snap_radius = (
            self.min_snap_radius_for_exponent(self.exponent)
            if snap_radius is None else float(snap_radius))

    @staticmethod
    def min_snap_radius_for_exponent(exponent: int) -> float:
        """(1/sqrt(2)) * 10^-exponent degrees plus conversion error
        bounds (s2/builder_snapper.go:392-425)."""
        power = 10.0 ** exponent
        return (math.radians((1 / math.sqrt(2)) / power)
                + (9 * math.sqrt(2) + 1.5) * MACHINE_EPS)

    @staticmethod
    def exponent_for_max_snap_radius(snap_radius: float) -> int:
        """s2/builder_snapper.go:428-441."""
        r = max(snap_radius - (9 * math.sqrt(2) + 1.5) * MACHINE_EPS, 1e-30)
        exponent = math.log10((1 / math.sqrt(2)) / math.degrees(r))
        return min(10, max(0, math.ceil(exponent - 2 * MACHINE_EPS)))

    def min_vertex_separation(self) -> float:
        """s2/builder_snapper.go:444-462."""
        return max(0.471 * self.snap_radius,
                   self.snap_radius
                   - math.radians((1 / math.sqrt(2)) * self.to))

    def min_edge_vertex_separation(self) -> float:
        """s2/builder_snapper.go:468-494."""
        vs = self.min_vertex_separation()
        return max(0.277 * math.radians(self.to),
                   0.222 * self.snap_radius,
                   0.5 * (vs / self.snap_radius) * vs)

    def snap_point(self, x, y, z):
        return int_latlng_snap(x, y, z, self.exponent)

"""Lat/lng <-> unit-xyz conversions (vectorized).

Semantics of reference s2/latlng.go:85-97.  Tables store degrees; all
kernels convert to radians internally.  Every lat/lng->xyz conversion in
the engine goes through these functions so that scalar (driver) and
vectorized (map_batches) code paths produce bit-identical coordinates.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.01  # reference earth/earth.go:44


def latlng_to_xyz(lat_rad, lng_rad):
    """s2/latlng.go:85-90: PointFromLatLng."""
    lat = np.asarray(lat_rad, dtype=np.float64)
    lng = np.asarray(lng_rad, dtype=np.float64)
    phi, theta = lat, lng
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def latlng_deg_to_xyz(lat_deg, lng_deg):
    lat = np.deg2rad(np.asarray(lat_deg, dtype=np.float64))
    lng = np.deg2rad(np.asarray(lng_deg, dtype=np.float64))
    return latlng_to_xyz(lat, lng)


def xyz_to_latlng(x, y, z):
    """s2/latlng.go:93-97: LatLngFromPoint (radians)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    lat = np.arctan2(z, np.sqrt(x * x + y * y))
    lng = np.arctan2(y, x)
    return lat, lng


def xyz_to_latlng_deg(x, y, z):
    lat, lng = xyz_to_latlng(x, y, z)
    return np.rad2deg(lat), np.rad2deg(lng)


def normalize_xyz(x, y, z):
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def chord2(x1, y1, z1, x2, y2, z2):
    """Squared chord length |p1-p2|^2 — the ChordAngle distance metric
    (s1/chordangle.go:107): monotone in angle, cheap to compare."""
    dx = x1 - x2
    dy = y1 - y2
    dz = z1 - z2
    return dx * dx + dy * dy + dz * dz


def chord2_to_angle(c2):
    """ChordAngle -> s1.Angle radians (s1/chordangle.go:247-252)."""
    c2 = np.asarray(c2, dtype=np.float64)
    return 2.0 * np.arcsin(0.5 * np.sqrt(np.minimum(c2, 4.0)))


def angle_to_chord2(rad):
    """s1.Angle -> ChordAngle squared-chord (s1/chordangle.go:71-80)."""
    rad = np.asarray(rad, dtype=np.float64)
    s = 2.0 * np.sin(0.5 * np.minimum(rad, np.pi))
    return s * s

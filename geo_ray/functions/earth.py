"""Earth-radius unit conversions (reference earth/earth.go:44-119)."""

from __future__ import annotations

import math

import numpy as np

RADIUS_KM = 6371.01  # earth/earth.go:44
RADIUS_M = RADIUS_KM * 1000.0


def angle_from_km(km):
    """earth/earth.go:61-67 (AngleFromLength)."""
    return np.asarray(km, dtype=np.float64) / RADIUS_KM


def km_from_angle(rad):
    """earth/earth.go:69-75 (LengthFromAngle)."""
    return np.asarray(rad, dtype=np.float64) * RADIUS_KM


def km_between_latlng_deg(lat1, lng1, lat2, lng2):
    """Great-circle distance in km (LengthFromPoints semantics)."""
    from .latlng import chord2, chord2_to_angle, latlng_deg_to_xyz
    x1, y1, z1 = latlng_deg_to_xyz(lat1, lng1)
    x2, y2, z2 = latlng_deg_to_xyz(lat2, lng2)
    return km_from_angle(chord2_to_angle(chord2(x1, y1, z1, x2, y2, z2)))


def initial_bearing_deg(lat1, lng1, lat2, lng2):
    """Initial bearing from point 1 to point 2 (earth/earth.go:95-119)."""
    lat1 = np.deg2rad(np.asarray(lat1, dtype=np.float64))
    lat2 = np.deg2rad(np.asarray(lat2, dtype=np.float64))
    dlng = np.deg2rad(np.asarray(lng2, dtype=np.float64) -
                      np.asarray(lng1, dtype=np.float64))
    y = np.sin(dlng) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlng)
    return np.rad2deg(np.arctan2(y, x))

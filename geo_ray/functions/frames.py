"""Orthonormal frames and rotations (vectorized).

Semantics of reference s2/matrix3x3.go:26-118 (getFrame/toFrame/
fromFrame) and s2/point.go Rotate (Rodrigues rotation about an axis).
"""

from __future__ import annotations

import numpy as np

from .edges import ortho


def get_frame(z) -> np.ndarray:
    """Right-handed orthonormal frame with column 2 = z
    (s2/matrix3x3.go:86-96)."""
    z = np.asarray(z, dtype=np.float64)
    y = np.asarray(ortho(tuple(z)), dtype=np.float64)
    x = np.cross(y, z)
    return np.stack([x, y, z], axis=1)


def to_frame(m: np.ndarray, p) -> np.ndarray:
    """World -> frame coordinates: m^T p (s2/matrix3x3.go:98-104)."""
    return np.asarray(m).T @ np.asarray(p, dtype=np.float64)


def from_frame(m: np.ndarray, p) -> np.ndarray:
    """Frame -> world coordinates: m p (s2/matrix3x3.go:106-112)."""
    return np.asarray(m) @ np.asarray(p, dtype=np.float64)


def rotate(p, axis, angle_rad: float) -> np.ndarray:
    """Rotate p about axis by angle (right-hand rule), s2/point.go
    Rotate: decompose into components parallel/perpendicular to the
    axis."""
    p = np.asarray(p, dtype=np.float64)
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    center = axis * float(p @ axis)
    dx = p - center
    dy = np.cross(axis, p)
    out = dx * np.cos(angle_rad) + dy * np.sin(angle_rad) + center
    return out / np.linalg.norm(out)


def rotate_batch(pts: np.ndarray, axis, angle_rad: float) -> np.ndarray:
    """(n,3) batch Rodrigues rotation."""
    pts = np.asarray(pts, dtype=np.float64)
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    par = np.outer(pts @ axis, axis)
    dx = pts - par
    dy = np.cross(np.broadcast_to(axis, pts.shape), pts)
    out = dx * np.cos(angle_rad) + dy * np.sin(angle_rad) + par
    return out / np.linalg.norm(out, axis=1, keepdims=True)

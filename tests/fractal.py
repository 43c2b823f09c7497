"""Koch-snowflake-style fractal loop generator, mirroring the worst-case
index geometry of the reference test infra (s2/s2_test.go:459-530):
recursive edge subdivision in a tangent frame, projected to the sphere.
"""

from __future__ import annotations

import math

import numpy as np

from geo_ray.functions.frames import from_frame, get_frame
from geo_ray.state.loop import Loop


def koch_loop(center_xyz, nominal_radius_rad: float, level: int) -> Loop:
    """A Koch snowflake with 3*4^level edges around center."""
    # complex-plane snowflake in the tangent frame
    pts = [complex(math.cos(a), math.sin(a))
           for a in (math.pi / 2, math.pi / 2 + 2 * math.pi / 3,
                     math.pi / 2 + 4 * math.pi / 3)]

    def subdivide(chain):
        out = []
        # bump points OUTWARD (right of travel for a CCW chain) so the
        # curve stays simple at every level
        rot = complex(math.cos(-math.pi / 3), math.sin(-math.pi / 3))
        n = len(chain)
        for i in range(n):
            a, b = chain[i], chain[(i + 1) % n]
            d = (b - a) / 3
            out.extend([a, a + d, a + d + d * rot, a + 2 * d])
        return out

    for _ in range(level):
        pts = subdivide(pts)
    m = get_frame(center_xyz)
    r = nominal_radius_rad
    verts = []
    for z in pts:
        # gnomonic-ish placement: tangent offsets scaled by radius
        v = np.array([z.real * math.sin(r), z.imag * math.sin(r),
                      math.cos(r)])
        v = v / np.linalg.norm(v)
        w = from_frame(m, v)
        verts.append(tuple(float(c) for c in w / np.linalg.norm(w)))
    return Loop(verts)

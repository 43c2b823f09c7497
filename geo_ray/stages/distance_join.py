"""Distance (radius) join: points within distance r of a geometry.

Shape (SURVEY §2.5/§2.7): the build side's covering is expanded by the
radius (ExpandByRadius, s2/cellunion.go:508-520) so the candidate
filter is one vectorized range-membership test; candidates are then
refined with exact chord distances — zero if inside the region, else
the min over edge distances (IsDistanceLess semantics over a
ShapeIndex target, s2/edge_query.go + s2/min_distance_targets.go).
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa

from ..functions.distance import chord2_point_edge
from ..functions.latlng import angle_to_chord2
from ..state import cellunion as cu
from ..state.coverer import RegionCoverer
from ..state.loop import Loop
from ..state.polygon import Polygon
from ..state.polyline import Polyline


class DistanceJoinState:
    """Broadcastable build side for a within-distance join."""

    def __init__(self, geometry: Union[Loop, Polygon, Polyline],
                 radius_rad: float, max_cells: int = 64,
                 max_level: int = 16):
        self.radius_rad = float(radius_rad)
        self.radius_chord2 = float(angle_to_chord2(radius_rad))
        if isinstance(geometry, Polyline):
            from ..functions.measures import angle_between
            from ..state.cap import Cap

            self.polygon = None
            self.edges = [(np.asarray(a), np.asarray(b))
                          for a, b in zip(geometry.vertices,
                                          geometry.vertices[1:])]
            # One covering cap per edge: centered on the edge midpoint
            # with radius half-edge-length + join radius (conservative,
            # covers the whole edge's r-neighborhood).
            rc = RegionCoverer(max_cells=8, max_level=max_level)
            parts = []
            for a, b in self.edges:
                mid = a + b
                n = np.linalg.norm(mid)
                mid = mid / (n if n else 1.0)
                half = float(angle_between(a, b)) / 2.0
                cap = Cap.from_center_angle(tuple(mid),
                                            half + radius_rad + 1e-9)
                parts.append(rc.cell_union(cap))
            cover = cu.from_union(*parts) if parts else []
        else:
            poly = geometry if isinstance(geometry, Polygon) \
                else Polygon.from_loop(geometry)
            self.polygon = poly
            self.edges = []
            for l in poly.loops:
                for a, b in l.edges():
                    self.edges.append((np.asarray(a), np.asarray(b)))
            rc = RegionCoverer(max_cells=max_cells, max_level=max_level)
            cover = cu.normalize(
                cu.from_union(*[rc.cell_union(l) for l in poly.loops]))
            cover = cu.expand_by_radius(cover, radius_rad)
        self.rmin, self.rmax = cu.to_ranges(cover)

    def refine(self, x, y, z) -> np.ndarray:
        """Exact within-distance mask for candidate points."""
        pts = np.stack([x, y, z], axis=1)
        best = np.full(len(pts), 4.0)
        for a, b in self.edges:
            best = np.minimum(best, chord2_point_edge(pts, a, b))
        within = best <= self.radius_chord2
        if self.polygon is not None:
            within |= self.polygon.contains_points_batch(pts)
        return within


def within_distance(batch: pa.Table, state) -> pa.Table:
    """map_batches body: candidate range filter + exact refine."""
    import ray
    if isinstance(state, ray.ObjectRef):
        state = ray.get(state)
    leaf = batch.column("cell_id").to_numpy()
    cand = cu.contains_leaf_v(state.rmin, state.rmax, leaf)
    sub = batch.filter(pa.array(cand))
    if len(sub) == 0:
        return sub
    mask = state.refine(sub.column("x").to_numpy(),
                        sub.column("y").to_numpy(),
                        sub.column("z").to_numpy())
    return sub.filter(pa.array(mask))

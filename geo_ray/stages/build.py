"""Distributed snap-rounding assembly of edge soups into polygons.

Input: an edge table ``(shape_id, edge_id, a_lat, a_lng, b_lat,
b_lng)`` in degrees — directed boundary edges with the region interior
on the left, in any order, possibly with duplicate edges, cancelling
sibling pairs (shared borders) and vertex jitter below the snap
radius.  The assembly is a ``groupby(shape_id).map_groups`` stage: one
shape's edges must fit in one group (the polygon-side "small geometry,
many shapes" regime; a single shape with 10^8 edges would need the
sort-merge CellIndex path instead).  Groups are sorted by ``edge_id``
before assembly so site selection — and therefore the output — is
deterministic under shuffling.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from ..functions.latlng import latlng_deg_to_xyz
from ..functions.snap import IdentitySnapper
from ..state.builder import Builder
from .overlay import polygon_to_text


def _assemble_group(g: pd.DataFrame, snapper, split_crossing_edges: bool
                    ) -> pd.DataFrame:
    g = g.sort_values("edge_id", kind="mergesort")
    ax, ay, az = latlng_deg_to_xyz(g["a_lat"].to_numpy(np.float64),
                                   g["a_lng"].to_numpy(np.float64))
    bx, by, bz = latlng_deg_to_xyz(g["b_lat"].to_numpy(np.float64),
                                   g["b_lng"].to_numpy(np.float64))
    b = Builder(snapper, split_crossing_edges=split_crossing_edges)
    for i in range(len(g)):
        b.add_edge((ax[i], ay[i], az[i]), (bx[i], by[i], bz[i]))
    poly = b.build_polygon()
    real = [l for l in poly.loops if not l.is_empty()]
    return pd.DataFrame({
        "shape_id": [g["shape_id"].iloc[0]],
        "num_loops": [len(real)],
        "num_vertices": [sum(len(l.vertices) for l in real)],
        "area": [poly.area()],
        "boundary": [polygon_to_text(poly)],
    })


def assemble_polygons(ds, snapper=None, *, split_crossing_edges: bool = False):
    """Edge-soup Dataset -> one assembled polygon row per shape_id."""
    snapper = snapper if snapper is not None else IdentitySnapper()
    return ds.groupby("shape_id").map_groups(
        lambda g: _assemble_group(g, snapper, split_crossing_edges),
        batch_format="pandas")

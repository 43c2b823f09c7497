"""Distributed covering generation: fan the RegionCoverer out over a
polygon TABLE (SURVEY §3.2: "per-polygon scalar computation in driver
or fanned out via map_batches over the polygon table").

Input rows: (polygon_id: string, rings: list<list<struct<lat,lng>>>)
— degrees, one outer list entry per loop.  Output rows:
(polygon_id, cell_id: uint64, token, level, is_interior: bool), i.e.
the distributed form of the JoinState build for polygon sets too large
to cover on the driver.  The downstream covering join consumes this
table by building the CellIndex from it (JoinState.from_covering_rows).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from ..functions import cellid as cid
from ..state import cellunion as cu
from ..state.coverer import RegionCoverer
from ..state.loop import Loop
from ..state.polygon import Polygon


def polygons_to_table(polygons: List[Tuple[str, Polygon]]) -> pa.Table:
    """Driver helper: polygon objects -> the Arrow polygon table."""
    from ..functions.latlng import xyz_to_latlng_deg

    names, rings = [], []
    for name, poly in polygons:
        loops = []
        for l in poly.loops:
            arr = np.asarray(l.vertices)
            lat, lng = xyz_to_latlng_deg(arr[:, 0], arr[:, 1], arr[:, 2])
            loops.append([{"lat": float(a), "lng": float(b)}
                          for a, b in zip(lat, lng)])
        names.append(name)
        rings.append(loops)
    ring_type = pa.list_(pa.list_(pa.struct([("lat", pa.float64()),
                                             ("lng", pa.float64())])))
    return pa.table({"polygon_id": pa.array(names, pa.string()),
                     "rings": pa.array(rings, ring_type)})


def cover_batch(batch: pa.Table, max_cells: int = 64,
                max_level: int = 18) -> pa.Table:
    """map_batches body: coverings for each polygon row."""
    rc = RegionCoverer(max_cells=max_cells, max_level=max_level)
    out_pid, out_cell, out_tok, out_lvl, out_int = [], [], [], [], []
    for row in range(len(batch)):
        pid = batch.column("polygon_id")[row].as_py()
        rings = batch.column("rings")[row].as_py()
        loops = [Loop.from_latlngs_deg([(v["lat"], v["lng"]) for v in ring])
                 for ring in rings]
        poly = Polygon(loops)
        cover = rc.cell_union(poly)
        interior = cu.normalize(rc.interior_covering(poly))
        boundary = cu.from_difference(cover, interior)
        for ci in interior:
            out_pid.append(pid); out_cell.append(ci)
            out_tok.append(cid.token(ci)); out_lvl.append(cid.level(ci))
            out_int.append(True)
        for ci in boundary:
            out_pid.append(pid); out_cell.append(ci)
            out_tok.append(cid.token(ci)); out_lvl.append(cid.level(ci))
            out_int.append(False)
    return pa.table({
        "polygon_id": pa.array(out_pid, pa.string()),
        "cell_id": pa.array(np.array(out_cell, dtype=np.uint64), pa.uint64()),
        "token": pa.array(out_tok, pa.string()),
        "level": pa.array(out_lvl, pa.int32()),
        "is_interior": pa.array(out_int, pa.bool_()),
    })


def cover_polygons(polygons_ds, max_cells: int = 64, max_level: int = 18):
    return polygons_ds.map_batches(
        lambda b: cover_batch(b, max_cells, max_level),
        batch_format="pyarrow", batch_size=8)

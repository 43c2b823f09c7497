"""Distributed polygon boolean overlay stage.

Each row of the input carries two polygons (text DSL: loops separated
by ';', vertices "lat:lng, lat:lng, ..." degrees — the reference test
DSL, s2/textformat_test.go:22-137).  The stage is a stateless
vectorized-per-row ``map_batches`` transform: every pair is an
independent overlay computation (geo_ray.state.boolean), so the
pipeline scales row-parallel with no shuffle — the natural Ray Data
shape for vector-vector geometry ops at fleet scale.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
import pyarrow as pa

from ..functions.latlng import xyz_to_latlng_deg
from ..state.boolean import polygon_boolean
from ..state.loop import Loop
from ..state.polygon import Polygon

OPS = ("intersection", "union", "difference", "symmetric_difference")


def polygon_to_text(poly: Polygon) -> str:
    parts = []
    for lp in poly.loops:
        if lp.is_full():
            parts.append("full")
            continue
        if lp.is_empty():
            parts.append("empty")
            continue
        lat, lng = xyz_to_latlng_deg(lp._varr[:, 0], lp._varr[:, 1],
                                     lp._varr[:, 2])
        parts.append(", ".join(f"{la:.15g}:{ln:.15g}"
                               for la, ln in zip(lat, lng)))
    return "; ".join(parts)


def polygon_from_text(text: str) -> Polygon:
    loops = []
    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if part == "full":
            loops.append(Loop.full())
        elif part == "empty":
            loops.append(Loop.empty())
        else:
            loops.append(Loop.from_text(part))
    return Polygon(loops)


def overlay_batch(batch: pa.Table, ops: Iterable[str] = OPS) -> pa.Table:
    """(pair_id, a, b) -> one row per (pair, op) with the result
    boundary, loop count and area."""
    pair_ids = batch.column("pair_id").to_pylist()
    a_texts = batch.column("a").to_pylist()
    b_texts = batch.column("b").to_pylist()
    out_pair, out_op, out_loops, out_area, out_boundary = [], [], [], [], []
    for pid, at, bt in zip(pair_ids, a_texts, b_texts):
        a = polygon_from_text(at)
        b = polygon_from_text(bt)
        for op in ops:
            r = polygon_boolean(op, a, b)
            out_pair.append(pid)
            out_op.append(op)
            out_loops.append(sum(1 for l in r.loops if not l.is_empty()))
            out_area.append(r.area())
            out_boundary.append(polygon_to_text(r))
    return pa.table({
        "pair_id": pa.array(out_pair, pa.int64()),
        "op": pa.array(out_op, pa.string()),
        "num_loops": pa.array(out_loops, pa.int64()),
        "area": pa.array(out_area, pa.float64()),
        "boundary": pa.array(out_boundary, pa.string()),
    })


def overlay_pairs(ds, ops: Iterable[str] = OPS):
    """Dataset of (pair_id, a, b) -> Dataset of per-op overlay results."""
    ops = tuple(ops)
    return ds.map_batches(lambda b: overlay_batch(b, ops),
                          batch_format="pyarrow")

"""Distributed bounding-cap aggregate: the reference's incremental
``Cap.AddPoint`` / ``Cap.AddCap`` folds (s2/cap.go:278-312) wired as a
Ray Data ``AggregateFn`` — the cap twin of the RectBounder fold and
the Bloom build (stages/bloom.py): one streaming pass, per-block
partial caps, associative AddCap merge, nothing materialized.

Per-block accumulation is exactly the sequential AddPoint fold: the
cap's center is pinned by the FIRST point it sees (AddPoint never
re-centers), after which the radius is a plain running max of
squared-chord distances — so a block folds in one vectorized
``chord2``/max.  The merge step is Go's AddCap, whose epsilon
round-up keeps containment true under any merge order; the merged
cap is therefore a (slightly conservative, order-dependent in the
last ulps) bound that always CONTAINS every input point — the same
contract the reference documents for AddCap.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

from ..functions.latlng import chord2
from ..state.cap import Cap

# Accumulator: (cx, cy, cz, radius_chord2); radius < 0 == empty.
_EMPTY: Tuple[float, float, float, float] = (1.0, 0.0, 0.0, -1.0)


def _fold_block(acc, block: pa.Table, cols) -> Tuple[float, float, float, float]:
    x = block.column(cols[0]).to_numpy(zero_copy_only=False)
    y = block.column(cols[1]).to_numpy(zero_copy_only=False)
    z = block.column(cols[2]).to_numpy(zero_copy_only=False)
    if len(x) == 0:
        return tuple(acc)
    cx, cy, cz, r2 = acc
    start = 0
    if r2 < 0:  # empty: center on the first point, zero height
        cx, cy, cz, r2 = float(x[0]), float(y[0]), float(z[0]), 0.0
        start = 1
    if start < len(x):
        d2 = chord2(x[start:], y[start:], z[start:], cx, cy, cz)
        r2 = max(r2, min(float(d2.max()), 4.0))
    return (cx, cy, cz, r2)


def _merge(a, b) -> Tuple[float, float, float, float]:
    ca_ = Cap((a[0], a[1], a[2]), a[3])
    cb = Cap((b[0], b[1], b[2]), b[3])
    out = ca_.add_cap(cb)
    return (*out.center, out.radius_chord2)


def bounding_cap(ds, x_col: str = "x", y_col: str = "y",
                 z_col: str = "z") -> Cap:
    """One-pass distributed bounding cap of the unit-vector columns.

    Returns a Cap guaranteed to contain every input point (AddCap's
    epsilon round-up makes containment survive the float rounding at
    each merge)."""
    from ray.data.aggregate import AggregateFn

    cols = (x_col, y_col, z_col)
    agg = AggregateFn(
        init=lambda _k: _EMPTY,
        accumulate_block=lambda acc, block: _fold_block(acc, block, cols),
        merge=_merge,
        name="cap")
    got = ds.aggregate(agg)["cap"]
    return Cap((got[0], got[1], got[2]), got[3])

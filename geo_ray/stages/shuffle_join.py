"""Shuffle (sort-merge interval) spatial join — the scale path for
polygon sets too large to broadcast.

The broadcast semi-join (stages/join.py) ships ONE JoinState to every
task; at millions of polygons the covering table and edge indexes no
longer fit in a task heap, and SURVEY §7.1 step 5 prescribes the SHUF
variant patterned on the reference's CellIndex delta sweep
(s2/cell_index.go:406): range-partition BOTH sides by Hilbert (cell id)
order and run the interval sweep per partition.

    points  --sample--> partition bounds (quantiles of leaf cell_id;
                        O(sample_cap) driver rows, skew-adaptive)
    points  --MB------> (part, point row)          [one partition each]
    polygons --MB-----> coverings (cover_batch)    [fan-out per polygon]
             --MB-----> (part, covering row)       [replicated ONLY to
                        partitions its leaf range overlaps]
    union --groupby(part)--> local CellIndex sweep -> candidates
      interior candidates: accepted
      boundary candidates --groupby(hash(polygon_id))--> co-partitioned
                        exact refine against the polygon rings
                        (geometry moves once per refine partition,
                        never per point)

Every shuffle moves narrow rows (ids + cell ids + 3 floats); pixel or
text payloads never enter the join.  Output rows match the broadcast
join exactly (same coverer parameters, same refine predicate).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cellid as cid
from ..state.cellindex import CellIndex
from ..state.loop import Loop
from ..state.polygon import Polygon

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _poly_part(pid_arr: pa.Array, refine_parts: int) -> np.ndarray:
    """Deterministic cross-process partition of polygon ids (Python's
    hash() is per-process salted and would break co-partitioning)."""
    import zlib

    h = np.array([zlib.crc32(s.encode("utf-8"))
                  for s in pid_arr.to_pylist()], dtype=np.uint64)
    return (((h * _MIX) >> np.uint64(33))
            % np.uint64(refine_parts)).astype(np.int32)


def sample_bounds(points_ds, num_parts: int, *, sample_cap: int = 8192,
                  sample_frac: float = 0.05) -> np.ndarray:
    """Quantile partition bounds over the point leaf-cell distribution
    (skew-adaptive: dense city ranges get narrow partitions).  Driver
    traffic is capped at ``sample_cap`` uint64 rows."""
    smp = (points_ds.select_columns(["cell_id"])
           .random_sample(sample_frac).limit(sample_cap).to_pandas())
    leafs = np.sort(smp["cell_id"].to_numpy().astype(np.uint64))
    if len(leafs) == 0 or num_parts <= 1:
        return np.array([], dtype=np.uint64)
    qs = np.linspace(0, len(leafs) - 1, num_parts + 1)[1:-1]
    return np.unique(leafs[qs.astype(np.int64)])


def covering_rows(polygon_table_ds, *, max_cells: int = 64,
                  max_level: int = 18):
    """(polygon_id, rings) -> (polygon_id, cell_id, is_interior) rows,
    fanned out per polygon (reuses stages/cover.py)."""
    from .cover import cover_batch

    return polygon_table_ds.map_batches(
        lambda b: cover_batch(b, max_cells, max_level)
        .select(["polygon_id", "cell_id", "is_interior"]),
        batch_format="pyarrow")


def _part_points(batch: pa.Table, bounds: np.ndarray, id_col: str
                 ) -> pa.Table:
    leaf = batch.column("cell_id").to_numpy().astype(np.uint64)
    part = np.searchsorted(bounds, leaf, side="right").astype(np.int32)
    n = len(batch)
    return pa.table({
        "part": pa.array(part, pa.int32()),
        "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
        "pid": batch.column(id_col).cast(pa.string()),
        "cell_id": pa.array(leaf, pa.uint64()),
        "x": batch.column("x"),
        "y": batch.column("y"),
        "z": batch.column("z"),
        "polygon_id": pa.nulls(n, pa.string()),
        "is_interior": pa.nulls(n, pa.bool_()),
    })


def _part_covers(batch: pa.Table, bounds: np.ndarray) -> pa.Table:
    ci = batch.column("cell_id").to_numpy().astype(np.uint64)
    lo = cid.range_min_v(ci)
    hi = cid.range_max_v(ci)
    p_lo = np.searchsorted(bounds, lo, side="right").astype(np.int64)
    p_hi = np.searchsorted(bounds, hi, side="right").astype(np.int64)
    reps = p_hi - p_lo + 1
    total = int(reps.sum())
    # ragged arange: partition id runs [p_lo[k] .. p_hi[k]] per row k
    part = (np.repeat(p_lo + reps - np.cumsum(reps), reps)
            + np.arange(total, dtype=np.int64)).astype(np.int32)
    idx = np.repeat(np.arange(len(ci), dtype=np.int64), reps)
    return pa.table({
        "part": pa.array(part, pa.int32()),
        "kind": pa.array(np.ones(total, np.int8), pa.int8()),
        "pid": pa.nulls(total, pa.string()),
        "cell_id": pa.array(ci[idx], pa.uint64()),
        "x": pa.nulls(total, pa.float64()),
        "y": pa.nulls(total, pa.float64()),
        "z": pa.nulls(total, pa.float64()),
        "polygon_id": batch.column("polygon_id").take(pa.array(idx)),
        "is_interior": batch.column("is_interior").take(pa.array(idx)),
    })


def _sweep_group(g: pd.DataFrame) -> pd.DataFrame:
    """One range partition: local CellIndex over the covering rows that
    overlap it, swept by the partition's points."""
    cov = g[g["kind"] == 1]
    pts = g[g["kind"] == 0]
    if not len(cov) or not len(pts):
        return pd.DataFrame({
            "pid": pd.Series([], dtype=object),
            "cell_id": pd.Series([], dtype=np.uint64),
            "x": pd.Series([], dtype=np.float64),
            "y": pd.Series([], dtype=np.float64),
            "z": pd.Series([], dtype=np.float64),
            "polygon_id": pd.Series([], dtype=object),
            "need_refine": pd.Series([], dtype=bool),
        })
    poly_ids, poly_inv = np.unique(cov["polygon_id"].to_numpy(dtype=object),
                                   return_inverse=True)
    labels = poly_inv.astype(np.int64) * 2 + \
        (~cov["is_interior"].to_numpy(dtype=bool)).astype(np.int64)
    entries = list(zip(cov["cell_id"].to_numpy().astype(np.uint64).tolist(),
                       labels.tolist()))
    index = CellIndex(entries)
    leafs = pts["cell_id"].to_numpy().astype(np.uint64)
    rows, lab = index.lookup_batch(leafs)
    k = (lab >> 1).astype(np.int64)
    boundary = (lab & 1) == 1
    return pd.DataFrame({
        "pid": pts["pid"].to_numpy(dtype=object)[rows],
        "cell_id": leafs[rows],
        "x": pts["x"].to_numpy(np.float64)[rows],
        "y": pts["y"].to_numpy(np.float64)[rows],
        "z": pts["z"].to_numpy(np.float64)[rows],
        "polygon_id": poly_ids[k],
        "need_refine": boundary,
    })


def _refine_group(g: pd.DataFrame) -> pd.DataFrame:
    """One refine partition: candidates co-partitioned with their
    polygons' ring geometry; each polygon's Loop structures are built
    once and applied to all of its candidates vectorized."""
    geo = g[g["kind"] == 1]
    cand = g[g["kind"] == 0]
    polys = {}
    for _, row in geo.iterrows():
        loops = [Loop.from_latlngs_deg([(v["lat"], v["lng"]) for v in ring])
                 for ring in row["rings"]]
        polys[row["polygon_id"]] = Polygon(loops)
    frames = []
    for poly_id, sub in cand.groupby("polygon_id", sort=False):
        poly = polys[poly_id]
        pts = np.stack([sub["x"].to_numpy(np.float64),
                        sub["y"].to_numpy(np.float64),
                        sub["z"].to_numpy(np.float64)], axis=1)
        inside = poly.contains_points_batch(pts)
        frames.append(pd.DataFrame({
            "pid": sub["pid"].to_numpy(dtype=object)[inside],
            "cell_id": sub["cell_id"].to_numpy()[inside],
            "polygon_id": poly_id,
        }))
    if not frames:
        return pd.DataFrame({"pid": pd.Series([], dtype=object),
                             "cell_id": pd.Series([], dtype=np.uint64),
                             "polygon_id": pd.Series([], dtype=object)})
    return pd.concat(frames, ignore_index=True)


def shuffle_polygon_join(points_ds, polygon_table_ds, *,
                         num_parts: int = 32, refine_parts: int = 16,
                         id_col: str = "image_id",
                         max_cells: int = 64, max_level: int = 18,
                         bounds: Optional[np.ndarray] = None):
    """Sort-merge interval spatial join.  ``points_ds`` must carry
    (id_col, cell_id, x, y, z); ``polygon_table_ds`` is the
    (polygon_id, rings) table of stages/cover.py.  Returns
    (id_col, cell_id, polygon_id) match rows, identical to the
    broadcast join's output set for the same coverer parameters."""
    if bounds is None:
        bounds = sample_bounds(points_ds, num_parts)
    covers = covering_rows(polygon_table_ds, max_cells=max_cells,
                           max_level=max_level)

    pts_tagged = points_ds.map_batches(
        lambda b: _part_points(b, bounds, id_col), batch_format="pyarrow")
    cov_tagged = covers.map_batches(
        lambda b: _part_covers(b, bounds), batch_format="pyarrow")

    cands = (pts_tagged.union(cov_tagged)
             .groupby("part")
             .map_groups(lambda g: _sweep_group(g.drop(columns=["part"])),
                         batch_format="pandas")).materialize()

    accepted = cands.filter(expr="need_refine == False") \
        .select_columns(["pid", "cell_id", "polygon_id"])

    def _tag_cand(batch: pa.Table) -> pa.Table:
        pid = batch.column("polygon_id")
        part = _poly_part(pid, refine_parts)
        return pa.table({
            "part": pa.array(part, pa.int32()),
            "kind": pa.array(np.zeros(len(batch), np.int8), pa.int8()),
            "pid": batch.column("pid"),
            "cell_id": batch.column("cell_id"),
            "x": batch.column("x"),
            "y": batch.column("y"),
            "z": batch.column("z"),
            "polygon_id": pid,
            "rings": pa.nulls(len(batch), pa.list_(pa.list_(pa.struct(
                [("lat", pa.float64()), ("lng", pa.float64())])))),
        })

    def _tag_geo(batch: pa.Table) -> pa.Table:
        pid = batch.column("polygon_id")
        part = _poly_part(pid, refine_parts)
        n = len(batch)
        return pa.table({
            "part": pa.array(part, pa.int32()),
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            "pid": pa.nulls(n, pa.string()),
            "cell_id": pa.nulls(n, pa.uint64()),
            "x": pa.nulls(n, pa.float64()),
            "y": pa.nulls(n, pa.float64()),
            "z": pa.nulls(n, pa.float64()),
            "polygon_id": pid,
            "rings": batch.column("rings"),
        })

    boundary = cands.filter(expr="need_refine == True")
    refined = (boundary.map_batches(_tag_cand, batch_format="pyarrow")
               .union(polygon_table_ds.map_batches(_tag_geo,
                                                   batch_format="pyarrow"))
               .groupby("part")
               .map_groups(lambda g: _refine_group(g.drop(columns=["part"])),
                           batch_format="pandas"))

    out = accepted.union(refined)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column("pid"),
            "cell_id": batch.column("cell_id").cast(pa.uint64()),
            "polygon_id": batch.column("polygon_id"),
        })

    return out.map_batches(_rename, batch_format="pyarrow")

"""Distributed connected-component labeling of an active-cell grid.

The raster segmentation primitive (blob detection over a tiled
mosaic, flood-fill labeling of a density mask): given sparse ACTIVE
cells (x, y) of an integer lattice, label every cell with the minimum
packed id of its 4-connected component — across tile boundaries.

Scale shape (the "ghost halo" pattern of distributed raster
processing):

  G1  each active cell maps to its (x // tile, y // tile) tile group;
      cells on a tile's boundary ALSO copy into the adjacent tile's
      group (<= 3 rows per cell: own + x-halo + y-halo; 4-connectivity
      needs no diagonal ghosts).  One narrow (tile, x, y) shuffle.
  G2  per tile group, adjacency pairs are found vectorized (sort +
      searchsorted against (x+1, y) and (x, y+1) probes — no pixel
      matrix, no Python loop) and emitted as packed int64 edges.  A
      pair straddling a boundary is found by BOTH tiles; duplicate
      edges are harmless downstream.
  G3  stages/cc.connected_components over the edges (+ every cell as
      a node, so isolated actives label themselves): per-block
      union-find contraction, multi-level fold, hash-min +
      pointer-jump rounds — O(log diameter) exchanges, single-block
      fast path when the contracted forest fits one block.

Packing: id = (x + OFFSET) * SPAN + (y + OFFSET) — lexicographic in
(x, y), so the component label is the component's minimum (x, y).
Coordinates must satisfy |x|, |y| < OFFSET; asserted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

OFFSET = np.int64(1 << 20)
SPAN = np.int64(1 << 21)


def pack_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    assert x.size == 0 or (np.abs(x).max() < OFFSET
                           and np.abs(y).max() < OFFSET), \
        "grid_cc packs coordinates below 2^20"
    return (x.astype(np.int64) + OFFSET) * SPAN \
        + (y.astype(np.int64) + OFFSET)


def unpack_xy(pk: np.ndarray):
    return (pk // SPAN - OFFSET).astype(np.int64), \
        (pk % SPAN - OFFSET).astype(np.int64)


def label_grid_components(cells_ds, *, x_col: str = "x",
                          y_col: str = "y", tile: int = 64,
                          num_parts: int = 64):
    """Active-cell Dataset -> (x, y, blob) Dataset; blob = packed min
    (x, y) id of the 4-connected component.  Input rows must be
    globally unique (dedupe upstream)."""
    from .cc import connected_components

    def _halo(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy().astype(np.int64)
        y = batch.column(y_col).to_numpy().astype(np.int64)
        tx, ty = x // tile, y // tile
        xs, ys, gs = [x], [y], [pack_xy(tx, ty)]
        lo_x = x % tile == 0
        hi_x = x % tile == tile - 1
        lo_y = y % tile == 0
        hi_y = y % tile == tile - 1
        for m, dtx, dty in ((lo_x, -1, 0), (hi_x, 1, 0),
                            (lo_y, 0, -1), (hi_y, 0, 1)):
            if m.any():
                xs.append(x[m])
                ys.append(y[m])
                gs.append(pack_xy(tx[m] + dtx, ty[m] + dty))
        return pa.table({
            "g": pa.array(np.concatenate(gs), pa.int64()),
            "x": pa.array(np.concatenate(xs), pa.int64()),
            "y": pa.array(np.concatenate(ys), pa.int64()),
        })

    def _adjacent(g: pd.DataFrame) -> pd.DataFrame:
        pk = np.sort(pack_xy(g["x"].to_numpy(np.int64),
                             g["y"].to_numpy(np.int64)))
        out_a, out_b = [], []
        for d in (SPAN, np.int64(1)):     # (x+1, y) and (x, y+1)
            probe = pk + d
            pos = np.searchsorted(pk, probe)
            hit = (pos < len(pk)) & \
                (pk[np.minimum(pos, len(pk) - 1)] == probe)
            out_a.append(pk[hit])
            out_b.append(probe[hit])
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    edges = (cells_ds.map_batches(_halo, batch_format="pyarrow")
             .groupby("g")
             .map_groups(lambda g: _adjacent(g.drop(columns=["g"])),
                         batch_format="pandas"))

    def _nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(
            pack_xy(batch.column(x_col).to_numpy().astype(np.int64),
                    batch.column(y_col).to_numpy().astype(np.int64)),
            pa.int64())})

    nodes = cells_ds.map_batches(_nodes, batch_format="pyarrow")
    labeled, info = connected_components(edges, nodes_ds=nodes,
                                         num_parts=num_parts)

    def _unpack(batch: pa.Table) -> pa.Table:
        x, y = unpack_xy(batch.column("node").to_numpy())
        return pa.table({
            x_col: pa.array(x, pa.int64()),
            y_col: pa.array(y, pa.int64()),
            "blob": batch.column("rep").cast(pa.int64()),
        })

    return labeled.map_batches(_unpack, batch_format="pyarrow"), info

"""Raster -> vector: trace a tile's filled-pixel mask into exact
spherical polygon rings (the inverse of stages/tiles.py).

Rendering projects points into per-cell pixel grids; this stage goes
the other way: the boundary between filled and empty pixels is traced
as directed lattice edges (filled region kept on the LEFT), stitched
into closed rings, and each lattice corner is mapped through the
tile's exact integer (i, j) geometry (s2/cellid.go:656-671, same grid
as tile_pixel_partials) onto the unit sphere.  Outer rings come out
CCW and holes CW automatically, so the ring set forms an even-odd
polygon whose parity containment (state/polygon.py) reproduces the
mask EXACTLY at pixel centers — the raster->vector half of the
round-trip QA (the vector->raster half is tile_pixel_centers_latlng).

Scale shape: one map_batches over rendered-tile rows (a tile's mask is
px*px booleans; tracing is O(boundary length)); no shuffle at all —
the tiling stage already grouped per tile.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from ..functions import cellid as cid
from ..functions import stuv

# directed edge steps in corner-lattice coords ((col, row) = (x, y)):
# for each filled pixel (r, c) and each empty 4-neighbor, emit the
# shared edge directed so the pixel is on its left (y grows upward in
# pixel rows here; orientation is fixed globally, parity containment
# is orientation-insensitive anyway)


def trace_mask(mask: np.ndarray) -> List[List[Tuple[int, int]]]:
    """Filled-pixel mask (h, w) -> closed corner-lattice rings.

    Each ring is a list of (x, y) lattice corners (y = row index, x =
    column index), closed implicitly (last connects to first).  The
    filled region lies on the left of every directed edge, so outer
    boundaries and hole boundaries get opposite orientations — ready
    for even-odd assembly.  At a corner where two diagonal pixels
    touch, the edge pairing continues around the SAME pixel (sharp
    turn): two distinct components trace separate rings, and a
    component touching ITSELF diagonally yields one ring that touches
    (never crosses) the pinch vertex — crossing parity at off-lattice
    pixel centers is unaffected either way."""
    h, w = mask.shape
    # directed edges: key = start corner, value = list of end corners
    nxt: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def _edge(a, b):
        nxt.setdefault(a, []).append(b)

    filled = np.nonzero(mask)
    for r, c in zip(*filled):
        r, c = int(r), int(c)
        if r == 0 or not mask[r - 1, c]:        # top side: left->right
            _edge((c, r), (c + 1, r))
        if r == h - 1 or not mask[r + 1, c]:    # bottom: right->left
            _edge((c + 1, r + 1), (c, r + 1))
        if c == 0 or not mask[r, c - 1]:        # left side: up
            _edge((c, r + 1), (c, r))
        if c == w - 1 or not mask[r, c + 1]:    # right side: down
            _edge((c + 1, r), (c + 1, r + 1))

    def _succ(a: Tuple[int, int], b: Tuple[int, int]) -> Tuple[int, int]:
        """Successor of directed edge a->b: a PURELY LOCAL pairing.
        At a pinch corner (two diagonal filled pixels, 2 ins / 2 outs)
        continue along the boundary of the SAME pixel — the sharp +90
        degree turn in screen coords (x right, y down).  The sharp
        directions of the two (opposite) incoming edges are opposite,
        so the pairing is a bijection and every extracted cycle is
        vertex-simple (a figure-eight merge would break the
        crossing-parity containment)."""
        outs = nxt[b]
        if len(outs) == 1:
            return outs[0]
        din = (b[0] - a[0], b[1] - a[1])
        sharp = (b[0] - din[1], b[1] + din[0])
        straight = (b[0] + din[0], b[1] + din[1])
        if sharp in outs:
            return sharp
        if straight in outs:
            return straight
        return outs[0]

    rings: List[List[Tuple[int, int]]] = []
    consumed = set()
    all_edges = sorted((a, b) for a, outs in nxt.items() for b in outs)
    for first in all_edges:
        if first in consumed:
            continue
        ring = [first[0]]
        edge = first
        while True:
            consumed.add(edge)
            nxt_v = _succ(*edge)
            edge = (edge[1], nxt_v)
            if edge == first:
                break
            ring.append(edge[0])
        # drop collinear midpoints (straight runs of lattice edges)
        out = []
        n = len(ring)
        for i in range(n):
            a, b, c2 = ring[i - 1], ring[i], ring[(i + 1) % n]
            if (b[0] - a[0], b[1] - a[1]) != (c2[0] - b[0], c2[1] - b[1]):
                out.append(b)
        rings.append(out)
    return rings


def tile_corner_xyz(tile_id: int, px: int, corners: np.ndarray):
    """Lattice corners (n, 2) of a tile's px*px grid -> unit xyz.

    Corner (x, y) sits at fraction (x/px, y/px) of the tile's leaf
    (i, j) square — the same integer-exact grid the renderer uses
    (stages/tiles.py tile_pixel_partials), mapped leaf-ij -> st -> uv
    -> xyz."""
    f, i, j, _ = cid.face_ij_orientation(int(tile_id))
    level = cid.level(int(tile_id))
    size = 1 << (30 - level)
    i_lo, j_lo = i & -size, j & -size
    gi = i_lo + corners[:, 0].astype(np.int64) * size // px
    gj = j_lo + corners[:, 1].astype(np.int64) * size // px
    # corner st: exact i/2^30 (the grid line itself, not a cell center)
    si = gi.astype(np.float64) / stuv.MAX_SIZE
    ti = gj.astype(np.float64) / stuv.MAX_SIZE
    u = stuv.st_to_uv(si)
    v = stuv.st_to_uv(ti)
    x, y, z = stuv.face_uv_to_xyz(np.full(len(gi), f), u, v)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def vectorize_tile(tile_id: int, mask: np.ndarray, px: int):
    """One tile's mask -> Polygon (even-odd ring set) or None.

    Each traced ring is normalized to enclose its SMALL side (invert
    when the spherical area exceeds 2*pi): parity containment over
    disk-normalized rings reproduces the mask for any nesting (outer /
    hole / island), independent of the lattice trace orientation."""
    import math

    from ..state.loop import Loop
    from ..state.polygon import Polygon

    rings = trace_mask(mask)
    if not rings:
        return None
    loops = []
    for ring in rings:
        arr = np.asarray(ring, dtype=np.int64)
        x, y, z = tile_corner_xyz(tile_id, px, arr)
        lp = Loop([(float(x[i]), float(y[i]), float(z[i]))
                   for i in range(len(arr))])
        if lp.area() > 2.0 * math.pi:
            lp = lp.invert()
        loops.append(lp)
    return Polygon(loops)


_GRID_CACHE: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}


def _center_grid(px: int):
    g = _GRID_CACHE.get(px)
    if g is None:
        cc, rr = np.meshgrid(np.arange(px), np.arange(px), indexing="xy")
        g = _GRID_CACHE[px] = (cc.ravel()[:, None].copy(),
                               rr.ravel()[:, None].copy())
    return g


def mask_from_rings(rings: List[List[Tuple[int, int]]],
                    px: int) -> np.ndarray:
    """Even-odd parity of the pixel centers against rectilinear rings
    (exact integer/half-integer ray casting).  Within one tile this is
    MATHEMATICALLY the spherical parity: the gnomonic (face-UV)
    projection maps geodesics to straight lines and the quadratic
    st->uv transform maps lattice-aligned st lines to uv-axis-aligned
    lines, so a traced ring's spherical interior corresponds exactly
    to its lattice interior (pytest cross-checks the spherical form
    per tile; this closed form keeps the per-tile QA O(boundary))."""
    out = np.zeros((px, px), dtype=bool)
    vx, vy0, vy1 = [], [], []
    for ring in rings:
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            if a[0] == b[0]:  # vertical lattice edge
                vx.append(a[0])
                vy0.append(min(a[1], b[1]))
                vy1.append(max(a[1], b[1]))
    if not vx:
        return out
    vx = np.asarray(vx, np.int64)
    vy0 = np.asarray(vy0, np.int64)
    vy1 = np.asarray(vy1, np.int64)
    cx, cy = _center_grid(px)         # centers at (cx + 0.5, cy + 0.5)
    # horizontal ray to +x: crossing iff vy0 <= cy < vy1 and vx > cx
    cross = (vy0[None, :] <= cy) & (cy < vy1[None, :]) & \
        (vx[None, :] > cx)
    return (cross.sum(axis=1) % 2 == 1).reshape(px, px)


def vectorize_tiles(mask_ds, px: int, bucket_levels_up: int = 4):
    """(tile_id, pixel) filled-pixel rows -> per-tile vector summary
    rows (token, n_rings, n_filled, qa_ok).

    ``qa_ok`` is the per-tile round-trip oracle evaluated in place:
    parity containment of the traced polygon must reproduce the mask
    at every pixel center (uses the engine's own batch containment —
    raster and vector agree bit-for-bit or the row says so).

    Tiles group under a parent-cell bucket (same batching trick as the
    renderer) so one map_groups call vectorizes dozens of tiles AND a
    tile's pixel rows can never straddle a batch boundary."""
    import pandas as pd

    def _per_tile(group: pd.DataFrame) -> pa.Table:
        tiles = group["tile_id"].to_numpy().astype(np.uint64)
        pix = group["pixel"].to_numpy().astype(np.int64)
        order = np.argsort(tiles, kind="stable")
        tiles, pix = tiles[order], pix[order]
        uniq, starts = np.unique(tiles, return_index=True)
        bounds = np.append(starts, len(tiles))
        toks, nrings, nfill, qa = [], [], [], []
        for t in range(len(uniq)):
            tid = int(uniq[t])
            p = pix[bounds[t]:bounds[t + 1]]
            mask = np.zeros((px, px), dtype=bool)
            mask[p // px, p % px] = True
            rings = trace_mask(mask)
            back = mask_from_rings(rings, px)
            toks.append(cid.token(tid))
            nrings.append(len(rings))
            nfill.append(int(mask.sum()))
            qa.append(bool((back == mask).all()))
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n_rings": pa.array(np.array(nrings, np.int64), pa.int64()),
            "n_filled": pa.array(np.array(nfill, np.int64), pa.int64()),
            "qa_ok": pa.array(qa, pa.bool_()),
        })

    def _bucket(batch: pa.Table) -> pa.Table:
        tile = batch.column("tile_id").to_numpy().astype(np.uint64)
        lvl = int(cid.level_v(tile[:1])[0]) if len(tile) else 0
        b = cid.parent_v(tile, max(0, lvl - bucket_levels_up))
        # int64 REINTERPRET: Ray groupby keys must not be uint64
        # (they fall back to object-pickled extension arrays)
        return batch.append_column("bucket",
                                   pa.array(b.view(np.int64), pa.int64()))

    bucketed = mask_ds.map_batches(_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        lambda g: _per_tile(g.drop(columns=["bucket"])),
        batch_format="pandas")

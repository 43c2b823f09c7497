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


def trace_masks_batch(masks: np.ndarray):
    """Vectorized tracer over a STACK of masks (n, px, px) — the same
    ring decomposition as :func:`trace_mask` (including the sharp-turn
    pairing at pinch corners and collinear-midpoint removal), computed
    for every tile at once with no per-tile Python loop.

    Returns ``(ring_tile, ring_len, vx, vy)``:

    * ``ring_tile`` int64 (R,) — stack index of each ring's tile;
    * ``ring_len`` int64 (R,) — vertex count per ring;
    * ``vx, vy`` int64 (sum(ring_len),) — ring vertices concatenated
      in ring order (rings ordered by ``ring_tile`` then by their
      minimum directed edge, matching per-tile ``trace_mask`` output
      up to ring rotation — parity/area identical).

    Cost: O(E log E) vectorized where E = total boundary edges across
    the stack (pointer-doubling cycle decomposition), vs the scalar
    tracer's O(E) *Python* dict operations — ~20x faster/tile at
    px=16, and the gap grows with batch size."""
    n, h, w = masks.shape
    cw = w + 1                               # corner lattice pitch
    per = (h + 1) * cw                       # corners per tile
    m = masks

    # boundary sides, each a (n, h, w) boolean stack
    top = m.copy();    top[:, 1:, :] &= ~m[:, :-1, :]
    bot = m.copy();    bot[:, :-1, :] &= ~m[:, 1:, :]
    left = m.copy();   left[:, :, 1:] &= ~m[:, :, :-1]
    right = m.copy();  right[:, :, :-1] &= ~m[:, :, 1:]

    starts, ends, dirs, tiles = [], [], [], []
    # direction codes: 0 = +x, 1 = -x, 2 = -y, 3 = +y
    for side, code in ((top, 0), (bot, 1), (left, 2), (right, 3)):
        t, r, c = np.nonzero(side)
        if code == 0:     # (c, r) -> (c+1, r)
            s = r * cw + c;            e = r * cw + c + 1
        elif code == 1:   # (c+1, r+1) -> (c, r+1)
            s = (r + 1) * cw + c + 1;  e = (r + 1) * cw + c
        elif code == 2:   # (c, r+1) -> (c, r)
            s = (r + 1) * cw + c;      e = r * cw + c
        else:             # (c+1, r) -> (c+1, r+1)
            s = r * cw + c + 1;        e = (r + 1) * cw + c + 1
        off = t.astype(np.int64) * per
        starts.append(off + s)
        ends.append(off + e)
        dirs.append(np.full(len(t), code, np.int8))
        tiles.append(t.astype(np.int64))
    if not starts:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    start = np.concatenate(starts)
    E = len(start)

    # re-index edges by start corner (tile-major): cycles then live in
    # small contiguous index ranges, so every doubling gather below is
    # cache-local (~5x faster than gathering across the side-blocks)
    order = np.argsort(start, kind="stable")
    start = start[order]
    end = np.concatenate(ends)[order]
    dcode = np.concatenate(dirs)[order]
    tile = np.concatenate(tiles)[order]

    # successor of edge e = out-edge at end[e]; 1 or 2 candidates
    lo = np.searchsorted(start, end, side="left")
    hi = np.searchsorted(start, end, side="right")
    succ = lo.astype(np.int64)                # the count==1 case
    two = np.nonzero(hi - lo == 2)[0]
    if len(two):
        # sharp turn: direction rotated +90 in screen coords
        # (+x,-x,-y,+y) -> (+y,-y,+x,-x) = codes (3,2,0,1)
        sharp = np.array([3, 2, 0, 1], np.int8)[dcode[two]]
        cand0 = lo[two]
        cand1 = lo[two] + 1
        pick1 = dcode[cand1] == sharp
        pick0 = dcode[cand0] == sharp
        # no sharp match -> straight (same code); else first candidate
        straight1 = (~pick0 & ~pick1) & (dcode[cand1] == dcode[two])
        succ[two] = np.where(pick1 | straight1, cand1, cand0)

    # cycle representative (min edge index in cycle) by doubling:
    # after k rounds rep[e] = min over 2^k consecutive cycle edges.
    # A cycle never leaves its tile, so its length is bounded by one
    # tile's boundary budget (4*h*w directed unit edges), not by E —
    # ceil(log2(min(E, 4*h*w))) rounds always cover the whole cycle.
    idx = np.arange(E, dtype=np.int64)
    rep = idx.copy()
    jump = succ.astype(np.int64)
    for _ in range(int(min(E, 4 * h * w) - 1).bit_length()):
        rep = np.minimum(rep, rep[jump])
        jump = jump[jump]

    # position within cycle: distance from rep along succ == distance
    # from e back to rep along pred (rep rooted as a fixed point)
    pred = np.empty(E, np.int64)
    pred[succ] = idx
    is_rep = rep == idx
    pred[is_rep] = idx[is_rep]
    J = pred
    S = (J != idx).astype(np.int64)
    while S.any() and (J != J[J]).any():
        S = S + S[J]
        J = J[J]
    S = S + S[J]                              # final absorb round
    pos = S

    # ring layout: edges sorted by (rep, pos)
    lex = np.lexsort((pos, rep))
    r_rep = rep[lex]
    ring_break = np.empty(E, bool)
    ring_break[0] = True
    ring_break[1:] = r_rep[1:] != r_rep[:-1]
    ring_id = np.cumsum(ring_break) - 1
    ring_start = np.nonzero(ring_break)[0]
    ring_end = np.append(ring_start[1:], E)

    # vertex of each slot = start corner of its edge; drop collinear
    # midpoints: keep slot iff prev-in-ring direction != this direction
    v = start[lex]
    d = dcode[lex]
    prev = np.empty(E, np.int64)
    prev[ring_start] = ring_end - 1
    inside = np.nonzero(~ring_break)[0]
    prev[inside] = inside - 1
    keep = d != d[prev]
    ring_tile_all = tile[lex]

    ring_len = np.bincount(ring_id[keep], minlength=len(ring_start))
    ring_tile = ring_tile_all[ring_start]
    vk = v[keep]
    vt = vk // per
    rem = vk - vt * per
    vy = rem // cw
    vx = rem - vy * cw
    return ring_tile, ring_len.astype(np.int64), vx, vy


def masks_from_rings_batch(ring_tile: np.ndarray, ring_len: np.ndarray,
                           vx: np.ndarray, vy: np.ndarray,
                           n: int, px: int) -> np.ndarray:
    """Batch form of :func:`mask_from_rings`: even-odd parity of pixel
    centers against each tile's rectilinear rings, for the whole stack
    at once.  Returns (n, px, px) bool."""
    cross = np.zeros((n, px, px + 1), np.int64)
    if len(vx):
        # consecutive vertex pairs within each ring (wrap-around)
        starts = np.cumsum(np.append(0, ring_len[:-1]))
        ends = starts + ring_len
        nz = ring_len > 0
        nxt_idx = np.arange(len(vx)) + 1
        nxt_idx[ends[nz] - 1] = starts[nz]
        bx, by = vx[nxt_idx], vy[nxt_idx]
        vert = vx == bx
        if vert.any():
            sx = vx[vert]
            y0 = np.minimum(vy[vert], by[vert])
            y1 = np.maximum(vy[vert], by[vert])
            seg_tile = np.repeat(ring_tile, ring_len)[vert]
            # expand each vertical segment into unit rows (ragged
            # arange: position within segment via prefix-sum offsets)
            lens = (y1 - y0).astype(np.int64)
            total = int(lens.sum())
            base = np.repeat(y0, lens)
            offs = np.arange(total) - np.repeat(
                np.cumsum(np.append(0, lens[:-1])), lens)
            np.add.at(cross, (np.repeat(seg_tile, lens), base + offs,
                              np.repeat(sx, lens)), 1)
    # parity of crossings strictly right of pixel center c+0.5:
    # sum over columns c+1..px
    suffix = np.cumsum(cross[:, :, ::-1], axis=2)[:, :, ::-1]
    return (suffix[:, :, 1:] % 2) == 1


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
        uniq, inv = np.unique(tiles, return_inverse=True)
        n = len(uniq)
        # one mask stack for the whole bucket, one batched trace
        stack = np.zeros((n, px, px), dtype=bool)
        stack[inv, pix // px, pix % px] = True
        ring_tile, ring_len, vx, vy = trace_masks_batch(stack)
        back = masks_from_rings_batch(ring_tile, ring_len, vx, vy,
                                      n, px)
        nrings = np.bincount(ring_tile, minlength=n).astype(np.int64)
        nfill = stack.reshape(n, -1).sum(axis=1).astype(np.int64)
        qa = (back == stack).reshape(n, -1).all(axis=1)
        toks = [cid.token(int(t)) for t in uniq]
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n_rings": pa.array(nrings, pa.int64()),
            "n_filled": pa.array(nfill, pa.int64()),
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

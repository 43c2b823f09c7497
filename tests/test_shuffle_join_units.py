"""Pure-function tests for the shuffle join internals: covering-row
replication must hit exactly the partitions a cell's leaf range
overlaps, and the local sweep must agree with a brute containment
check — no Ray session required."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_ray.functions import cellid as cid
from geo_ray.stages.shuffle_join import (_part_covers, _part_points,
                                         _sweep_group)

RNG = np.random.default_rng(20260819)


def _rand_cells(n, max_level=12):
    """Valid cell ids at random levels via random points."""
    v = RNG.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leafs = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    lvls = RNG.integers(2, max_level + 1, n)
    return np.array([cid.parent(int(c), int(l))
                     for c, l in zip(leafs, lvls)], dtype=np.uint64)


@given(seed=st.integers(0, 10_000), n_bounds=st.integers(0, 9))
@settings(max_examples=50, deadline=None)
def test_cover_replication_exact(seed, n_bounds):
    rng = np.random.default_rng(seed)
    cells = _rand_cells(20)
    bounds = np.unique(rng.integers(1, 2 ** 63, n_bounds, dtype=np.uint64))
    batch = pa.table({
        "polygon_id": pa.array([f"p{i}" for i in range(len(cells))]),
        "cell_id": pa.array(cells, pa.uint64()),
        "is_interior": pa.array(rng.random(len(cells)) < 0.5),
    })
    out = _part_covers(batch, bounds)
    got = set(zip(out.column("polygon_id").to_pylist(),
                  out.column("part").to_numpy().tolist()))
    # under part(k) = searchsorted(bounds, k, 'right'), partition p owns
    # the key interval [B[p-1], B[p]-1] (ends open-ended); a covering row
    # must land in exactly the partitions its [lo, hi] leaf range overlaps
    want = set()
    B = [int(b) for b in bounds]
    for i, c in enumerate(cells):
        lo, hi = cid.range_min(int(c)), cid.range_max(int(c))
        for p in range(len(B) + 1):
            part_lo = B[p - 1] if p > 0 else 0
            part_hi = (B[p] - 1) if p < len(B) else (1 << 64) - 1
            if lo <= part_hi and hi >= part_lo:
                want.add((f"p{i}", p))
    assert got == want


def test_point_partition_matches_searchsorted():
    leafs = _rand_cells(50, max_level=30)
    bounds = np.sort(RNG.integers(1, 2 ** 63, 7, dtype=np.uint64))
    batch = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(len(leafs))]),
        "cell_id": pa.array(leafs, pa.uint64()),
        "x": pa.array(np.zeros(len(leafs))),
        "y": pa.array(np.zeros(len(leafs))),
        "z": pa.array(np.zeros(len(leafs))),
    })
    out = _part_points(batch, bounds, "image_id")
    np.testing.assert_array_equal(
        out.column("part").to_numpy(),
        np.searchsorted(bounds, leafs, side="right").astype(np.int32))


def test_sweep_group_matches_brute():
    """Local sweep == brute (leaf in cell range) containment, with
    interior/boundary labels preserved."""
    cells = _rand_cells(12, max_level=8)
    v = RNG.standard_normal((200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leafs = cid.cell_id_from_point_v(v[:, 0], v[:, 1], v[:, 2])
    interior = RNG.random(len(cells)) < 0.5
    g = pd.DataFrame({
        "kind": np.concatenate([np.zeros(len(leafs), np.int8),
                                np.ones(len(cells), np.int8)]),
        "pid": ([f"pt{i}" for i in range(len(leafs))] +
                [None] * len(cells)),
        "cell_id": np.concatenate([leafs, cells]).astype(np.uint64),
        "x": np.concatenate([v[:, 0], np.zeros(len(cells))]),
        "y": np.concatenate([v[:, 1], np.zeros(len(cells))]),
        "z": np.concatenate([v[:, 2], np.zeros(len(cells))]),
        "polygon_id": ([None] * len(leafs) +
                       [f"poly{j}" for j in range(len(cells))]),
        "is_interior": np.concatenate([np.zeros(len(leafs), bool),
                                       interior]),
    })
    out = _sweep_group(g)
    got = set(zip(out["pid"], out["polygon_id"], out["need_refine"]))
    want = set()
    for i, leaf in enumerate(leafs):
        for j, c in enumerate(cells):
            if cid.range_min(int(c)) <= int(leaf) <= cid.range_max(int(c)):
                want.add((f"pt{i}", f"poly{j}", not interior[j]))
    assert got == want

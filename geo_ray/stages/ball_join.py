"""Exact L-infinity epsilon-ball self-join via shifted-grid
co-partitioning.

The primitive behind feature-space near-dup detection (the image
pipeline's analog of the text side's pigeonhole Hamming banding,
stages/dedup.py simhash_neardup): report every unordered pair of rows
whose feature vectors differ by at most ``eps`` in every coordinate.

Scale design: each row is replicated to the 2**d grid cells
``floor(F_index / cell) + o`` for every offset o in {0,1}**d over the
``d`` index dimensions (cell size == eps, so any qualifying pair's
home cells differ by at most 1 per dim).  A pair within eps therefore
shares at least one replicated cell, and it is emitted ONLY from the
canonical cell T* = elementwise max of the two home cells — detectable
locally inside a group because T* is exactly the shared cell where
both copies carry a zero offset bit in every dimension (min(o_a, o_b)
== 0 per dim).  Every pair is thus emitted exactly once with NO
distinct-pair shuffle, the same locality argument as the simhash
first-band rule.  Shuffle volume: 2**d narrow rows per input row
(id + features + one packed cell key + one offset byte); no driver
materialization anywhere.

Exactness (unlike LSH): candidate generation is a deterministic
superset for the L-inf metric restricted to the index dims, and the
in-group verification applies the full-precision predicate over ALL
feature dims, so recall is 1.0 by construction.

Partitioning assumption: features must spread over many grid cells;
a feature whose values concentrate in one eps-cell makes one group
quadratic (pick index dims with entropy, or shrink eps).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.images import splitmix64

_COORD_BITS = 20                      # per-dim packed cell coordinate
_COORD_BIAS = 1 << (_COORD_BITS - 1)  # shift signed coords positive
_COORD_MASK = (1 << _COORD_BITS) - 1


def _pack_cells(cells: np.ndarray) -> np.ndarray:
    """(n, d<=3) int64 cell coords -> one int64 key (21 bits/dim)."""
    n, d = cells.shape
    shifted = cells + _COORD_BIAS
    if shifted.min() < 0 or shifted.max() > _COORD_MASK:
        raise ValueError(
            "grid cell coordinate out of the +/-2^19 packing range; "
            "index feature range / eps is too large")
    key = np.zeros(n, dtype=np.int64)
    for j in range(d):
        key |= shifted[:, j] << (_COORD_BITS * j)
    return key


def linf_ball_self_join(ds, feature_cols: Sequence[str], eps: float, *,
                        id_col: str, index_cols: Sequence[str] | None = None,
                        n_buckets: int = 1024):
    """All unordered pairs with ``max_j |F_a[j] - F_b[j]| <= eps``
    over ``feature_cols``; candidates are generated on ``index_cols``
    (default: the first 3 feature columns; at most 3).

    Returns a Dataset with columns (id_a, id_b, linf) where
    id_a < id_b and linf is the exact L-inf feature distance.

    The shuffle key is a bounded hash bucket of the cell (``n_buckets``
    groups total, like the simhash LSH buckets) — one map_groups body
    per CELL would mean a Python call per grid cell, and most cells
    hold a single row; inside a bucket the per-cell pair generation is
    one sort + a loop over only the cells with >= 2 rows.
    """
    feature_cols = list(feature_cols)
    index_cols = list(index_cols or feature_cols[:3])
    assert 1 <= len(index_cols) <= 3, "pack supports up to 3 index dims"
    assert set(index_cols) <= set(feature_cols)
    d = len(index_cols)
    offsets = np.stack(np.meshgrid(*([np.arange(2)] * d), indexing="ij"),
                       axis=-1).reshape(-1, d).astype(np.int64)  # (2^d, d)
    eps = float(eps)

    def _replicate(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch.column(id_col)
        F = np.stack([batch.column(c).to_numpy().astype(np.float64)
                      for c in feature_cols], axis=1)
        # cell = eps * (1 + 1e-9): the tiny slack guarantees a pair at
        # EXACTLY distance eps still lands in adjacent cells even when
        # the two divisions round in opposite directions.
        H = np.floor(
            np.stack([batch.column(c).to_numpy().astype(np.float64)
                      for c in index_cols], axis=1)
            / (eps * (1.0 + 1e-9))).astype(np.int64)
        m = len(offsets)
        targets = H[:, None, :] + offsets[None, :, :]        # (n, 2^d, d)
        keys = _pack_cells(targets.reshape(-1, d))
        obits = np.bitwise_or.reduce(
            [(offsets[:, j] << j) for j in range(d)]).astype(np.int8)
        rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
        bucket = (splitmix64(keys.view(np.uint64))
                  % np.uint64(n_buckets)).astype(np.int32)
        cols = {
            "bucket": pa.array(bucket, pa.int32()),
            "cell": pa.array(keys, pa.int64()),
            "obits": pa.array(np.tile(obits, n), pa.int8()),
            "_id": ids.take(rep_idx),
        }
        for j, c in enumerate(feature_cols):
            cols[f"_f{j}"] = pa.array(np.repeat(F[:, j], m), pa.float64())
        return pa.table(cols)

    k = len(feature_cols)

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one bucket = many cells; sort by (cell, id) and emit pairs
        # only from the cells with >= 2 rows (the vast majority of
        # cells hold one copy and never enter the Python loop)
        order = np.lexsort((group["_id"].to_numpy(),
                            group["cell"].to_numpy()))
        cell = group["cell"].to_numpy()[order]
        ids = group["_id"].to_numpy()[order]
        ob = group["obits"].to_numpy().astype(np.int8)[order]
        F = np.stack([group[f"_f{j}"].to_numpy() for j in range(k)],
                     axis=1)[order]
        out_a: list = []
        out_b: list = []
        out_d: list = []
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        for s, t in zip(starts, ends):
            if t - s < 2:
                continue
            ii, jj = np.triu_indices(t - s, k=1)
            # canonical-cell rule: emit only where BOTH copies carry a
            # zero offset bit in every dim (this cell is the pair's
            # elementwise-max home cell)
            canonical = (ob[s:t][ii] & ob[s:t][jj]) == 0
            dist = np.abs(F[s:t][ii] - F[s:t][jj]).max(axis=1)
            ok = canonical & (dist <= eps)
            if ok.any():
                out_a.append(ids[s:t][ii[ok]])
                out_b.append(ids[s:t][jj[ok]])
                out_d.append(dist[ok])
        if out_a:
            return pd.DataFrame({"id_a": np.concatenate(out_a),
                                 "id_b": np.concatenate(out_b),
                                 "linf": np.concatenate(out_d)})
        id_dtype = "object" if ids.dtype == object else ids.dtype
        return pd.DataFrame({"id_a": pd.Series(dtype=id_dtype),
                             "id_b": pd.Series(dtype=id_dtype),
                             "linf": pd.Series(dtype="float64")})

    return (ds.map_batches(_replicate, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(lambda g: _pairs(g.drop(columns=["bucket"])),
                          batch_format="pandas"))

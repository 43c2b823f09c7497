"""Broadcast dimension join: map a fact column through a small keyed
dimension table shipped once via ``ray.put``.

The relational twin of the spatial broadcast join (stages/join.py):
the dimension side is read once on the driver (column-pruned), put in
the object store once, and every map_batches task resolves keys with
a zero-copy ``np.searchsorted`` against the shared arrays — no
shuffle of the fact table at all.  Switch to the shuffle join
(co-partition both sides on the key, the stages/shuffle_join.py /
stages/asof.py pattern) when the dimension no longer fits a worker;
the cost arithmetic is recorded in BASELINE.md.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DimTable:
    """Sorted-key dimension snapshot (int64 keys -> int64 values)."""

    def __init__(self, keys: np.ndarray, values: np.ndarray):
        order = np.argsort(keys, kind="mergesort")
        self.keys = np.ascontiguousarray(keys[order].astype(np.int64))
        self.values = np.ascontiguousarray(values[order].astype(np.int64))

    def lookup(self, k: np.ndarray) -> np.ndarray:
        """Vectorized key -> value; raises on a missing key (the
        dimension tables here are complete by construction)."""
        pos = np.searchsorted(self.keys, k)
        if (pos >= len(self.keys)).any() or \
                (self.keys[np.minimum(pos, len(self.keys) - 1)] != k).any():
            raise KeyError("fact key missing from dimension table")
        return self.values[pos]


def read_dim_table(path: str, key_col: str, value_col: str) -> DimTable:
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[key_col, value_col])
    return DimTable(t.column(key_col).to_numpy(),
                    t.column(value_col).to_numpy())


def attach_dim_column(ds, fact_key_col: str, out_col: str, dim_ref):
    """fact Dataset + object-store DimTable ref -> same rows with the
    mapped ``out_col`` appended; dim_ref is resolved once per task."""
    import ray

    def _attach(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref) if not isinstance(dim_ref, DimTable) \
            else dim_ref
        k = batch.column(fact_key_col).to_numpy().astype(np.int64)
        return batch.append_column(out_col,
                                   pa.array(dim.lookup(k), pa.int64()))

    return ds.map_batches(_attach, batch_format="pyarrow")

"""Grouped top-k: per key, the k best rows by (value DESC, id ASC).

The mergeable-combiner shape: any batch's contribution to a key's
final top-k is contained in that batch's own per-key top-k, so the
combiner truncates inside map_batches and the shuffle moves at most
k rows per (batch, key) — row count never crosses the wire.  Same
partial/merge contract as the kNN stage (stages/knn.py), generalized
to arbitrary keyed tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _splitmix


def _bucket_of(vals: np.ndarray, nb: int) -> np.ndarray:
    """Deterministic hash bucket for int OR string key columns
    (splitmix64 for ints, pandas fixed-key siphash for strings —
    both stable across processes)."""
    if vals.dtype.kind in "OUS":
        h = pd.util.hash_array(vals.astype(object))
    else:
        h = _splitmix(vals.astype(np.uint64))
    return (h % np.uint64(nb)).astype(np.int32)


def _topk_frame(df: pd.DataFrame, key_col: str, value_col: str,
                id_col: str, k: int) -> pd.DataFrame:
    df = df.sort_values([key_col, value_col, id_col], kind="mergesort",
                        ascending=[True, False, True])
    return df.groupby(key_col, sort=False).head(k).reset_index(drop=True)


def global_topk(ds, value_col: str, id_col: str, k: int,
                with_rank: bool = True) -> pd.DataFrame:
    """GLOBAL (single-group) top-k without a merge shuffle: each block
    truncates to its own top-k inside map_batches, and the <=k-per-
    block survivors merge on the driver — bounded by k x block count
    (tiny even at the 65536-bucket co-partition cap), so this is a
    k-row result fetch, not a table materialization.  Returns the
    final pandas frame in (value DESC, id ASC) order with an optional
    1-based int64 ``rank``."""
    cols = [value_col, id_col]

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        df = df.sort_values([value_col, id_col], kind="mergesort",
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values([value_col, id_col], kind="mergesort",
                            ascending=[False, True]).head(k) \
        .reset_index(drop=True)
    if with_rank:
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def latest_by_key(ds, key_col: str, order_cols, keep_cols=None):
    """Changelog compaction (latest-wins upsert): one surviving row
    per key, the maximum of ``order_cols`` (lexicographic, e.g.
    (ts, event_id)).  Same mergeable shape as grouped_topk with k=1:
    each batch keeps its per-key latest, so exactly one row per
    (batch, key) shuffles regardless of update rate."""
    order_cols = list(order_cols)
    cols = [key_col] + order_cols + [c for c in (keep_cols or [])
                                     if c not in order_cols]

    def _latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col] + order_cols, kind="mergesort",
                            ascending=[True] + [False] * len(order_cols))
        return df.groupby(key_col, sort=False).head(1) \
            .reset_index(drop=True)

    def _partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_latest(batch.select(cols)
                                            .to_pandas()),
                                    preserve_index=False)

    def _tag(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(key_col).to_numpy(
            zero_copy_only=False), 64)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    # hash-bucket merge for the same reason as grouped_topk: _latest
    # is key-aware and vectorized per bucket
    partials = ds.map_batches(_partial, batch_format="pyarrow") \
        .map_batches(_tag, batch_format="pyarrow")
    return partials.groupby("__b").map_groups(
        lambda g: _latest(g.drop(columns=["__b"])),
        batch_format="pandas")


def grouped_topk(ds, key_col: str, value_col: str, id_col: str,
                 k: int, with_rank: bool = True):
    """Dataset -> per-key top-k rows, deterministic (value DESC,
    id ASC) order, optional 1-based ``rank`` column."""
    cols = [key_col, value_col, id_col]

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        return pa.Table.from_pandas(
            _topk_frame(df, key_col, value_col, id_col, k),
            preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = _topk_frame(g, key_col, value_col, id_col, k)
        if with_rank:
            out["rank"] = out.groupby(key_col, sort=False).cumcount() \
                .astype(np.int64) + 1
        return out

    def _tag(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(key_col).to_numpy(
            zero_copy_only=False), 64)
        return batch.append_column("__b", pa.array(b, pa.int32()))

    # groupby on the HASH BUCKET, not the key: the merge body
    # (_topk_frame) is key-aware and vectorized, so one bucket of many
    # keys resolves in one pandas pass — Ray's per-key map_groups
    # would iterate keys in Python, the repo's documented pathology at
    # 10^5+ distinct keys
    partials = ds.map_batches(_partial, batch_format="pyarrow") \
        .map_batches(_tag, batch_format="pyarrow")
    return partials.groupby("__b").map_groups(
        lambda g: _final(g.drop(columns=["__b"])),
        batch_format="pandas")

"""Exact distributed quantiles over a bounded-cardinality value
domain, by counting aggregation.

The classic approximate route (t-digest/KLL) trades exactness for
unbounded domains; monetary / fixed-precision columns (here: 2-decimal
event values as integer cents) have a bounded distinct-value set, so
the exact answer costs one combiner pass plus a shuffle of
(key, value, count) rows — volume = distinct pairs, independent of row
count — and a per-key counting-sort pick.  This is the shape that
stays exact at 10^12 rows: no raw values ever move, only the count
table.

Quantile convention (mirrored exactly by the SQL oracle): for p in
(0,1], the value at 1-based rank ceil(p * n) of the sorted multiset.
"""

from __future__ import annotations

from typing import Sequence

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def cents_counts_partial(batch: pa.Table, key_col: str,
                         value_col: str) -> pa.Table:
    """Per-batch combiner: (key, cents, n) partial counts."""
    df = pd.DataFrame({
        "key": batch.column(key_col).to_pandas(),
        "cents": np.round(batch.column(value_col).to_numpy()
                          * 100.0).astype(np.int64),
    })
    g = df.groupby(["key", "cents"], sort=False).size().reset_index(name="n")
    return pa.Table.from_pandas(g, preserve_index=False)


def _pick_group(g: pd.DataFrame, ps: Sequence[float]) -> pd.DataFrame:
    g = g.sort_values("cents", kind="mergesort")
    cents = g["cents"].to_numpy()
    cum = np.cumsum(g["n"].to_numpy())
    total = int(cum[-1])
    out = {"key": [g["key"].iloc[0]]}
    for p in ps:
        rank = max(1, math.ceil(p * total))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out[f"p{int(round(p * 100))}_cents"] = \
            pd.Series([int(cents[idx])], dtype="int64")
    return pd.DataFrame(out)


def log_bucket(g: np.ndarray) -> np.ndarray:
    """Integer log-histogram bucket id (the mergeable quantile sketch
    for unbounded domains, DDSketch-style — but with PURE-INTEGER
    bucketing so both engines bucket bit-identically, no libm):
    values < 16 map to themselves (exact); otherwise the bucket is
    (exponent, top-4-mantissa-bits), i.e. bid = (e-3)*16 + sub with
    e = floor(log2 g) and sub = (g >> (e-4)) - 16.  Bucket width is
    2^(e-4), so the representative (the bucket's lower bound) is
    within 1/16 = 6.25% relative error of any member."""
    g = np.asarray(g, dtype=np.int64)
    assert (g >= 0).all()
    small = g < 16
    gg = np.maximum(g, 16)
    # floor(log2) via branchless binary search over 6 shift levels —
    # integer-only on purpose (float log2 misrounds near 2^k)
    e = np.zeros_like(gg)
    v = gg.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.int64(1) << shift)
        e += np.where(big, shift, 0)
        v = np.where(big, v >> shift, v)
    sub = (gg >> np.maximum(e - 4, 0)) - 16
    bid = (e - 3) * 16 + sub
    return np.where(small, g, bid)


def bucket_rep(bid: np.ndarray) -> np.ndarray:
    """Bucket id -> representative value (the bucket's lower bound);
    exact inverse of log_bucket on bucket boundaries."""
    bid = np.asarray(bid, dtype=np.int64)
    small = bid < 16
    e = np.maximum(bid, 16) // 16 + 3
    sub = np.maximum(bid, 16) % 16
    return np.where(small, bid, (16 + sub) << np.maximum(e - 4, 0))


def sketch_quantiles_by_key(ds, key_col: str, value_col: str,
                            ps: Sequence[float] = (0.5, 0.9, 0.99)):
    """Approximate per-key quantiles for unbounded-domain values via
    the integer log-histogram: per-batch (key, bucket, n) partials
    (≤ ~1000 buckets per key regardless of cardinality), one
    (key, bucket) groupby-sum, then the same rank-pick as the exact
    path — answers are bucket lower bounds, within 6.25% relative
    error, and BIT-IDENTICAL across engines because bucketing is
    integer-only."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "key": batch.column(key_col).to_pandas(),
            "bucket": log_bucket(batch.column(value_col).to_numpy()),
        })
        g = df.groupby(["key", "bucket"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort")
        cum = np.cumsum(g["n"].to_numpy())
        total = int(cum[-1])
        reps = bucket_rep(g["bucket"].to_numpy())
        out = {"key": [g["key"].iloc[0]]}
        for p in ps:
            rank = max(1, math.ceil(p * total))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out[f"p{int(round(p * 100))}_est"] = \
                pd.Series([int(reps[idx])], dtype="int64")
        return pd.DataFrame(out)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    counts = partials.groupby(["key", "bucket"]) \
        .aggregate(Sum("n", alias_name="n"))
    return counts.groupby("key").map_groups(_pick,
                                            batch_format="pandas")


def exact_quantiles_by_key(ds, key_col: str, value_col: str,
                           ps: Sequence[float] = (0.5, 0.9, 0.99)):
    """Dataset -> one row per key with exact p-quantiles (as integer
    cents).  Two-level aggregation: batch combiner, then (key, cents)
    merge inside ~256 cents-hash buckets (a vectorized pandas groupby
    per bucket — per-key Ray aggregates iterate the distinct-value
    key space in Python, measured pathological at 10^5+ keys), then a
    per-key counting-sort pick over the count table
    (distinct-value-sized, never row-sized)."""
    from .sample import _splitmix

    partials = ds.map_batches(
        lambda b: cents_counts_partial(b, key_col, value_col),
        batch_format="pyarrow")

    def _bucket(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").to_numpy().astype(np.uint64)
        return batch.append_column(
            "__b", pa.array((_splitmix(c) % np.uint64(256))
                            .astype(np.int32), pa.int32()))

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["key", "cents"], sort=False)["n"].sum() \
            .reset_index()

    counts = (partials.map_batches(_bucket, batch_format="pyarrow")
              .groupby("__b")
              .map_groups(lambda g: _merge(g.drop(columns=["__b"])),
                          batch_format="pandas"))
    return counts.groupby("key").map_groups(
        lambda g: _pick_group(g, ps), batch_format="pandas")

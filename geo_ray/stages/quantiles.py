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


def exact_quantiles_by_key(ds, key_col: str, value_col: str,
                           ps: Sequence[float] = (0.5, 0.9, 0.99)):
    """Dataset -> one row per key with exact p-quantiles (as integer
    cents).  Two-level aggregation: batch combiner, (key, cents)
    groupby-sum, then a per-key counting-sort pick over the count
    table (distinct-value-sized, never row-sized)."""
    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        lambda b: cents_counts_partial(b, key_col, value_col),
        batch_format="pyarrow")
    counts = partials.groupby(["key", "cents"]) \
        .aggregate(Sum("n", alias_name="n"))
    return counts.groupby("key").map_groups(
        lambda g: _pick_group(g, ps), batch_format="pandas")

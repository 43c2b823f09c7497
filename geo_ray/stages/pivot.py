"""Distributed pivot (long -> wide conditional aggregation): one row
per group key, one column per pivot category, cells = count and/or an
exact integer measure sum.

Scale shape: the category list is discovered by a cheap distinct pass
over the pivot column (bounded: a pivot wider than ``max_categories``
is a modeling error, not a bigger shuffle), then every batch folds its
rows into per-key partial WIDE rows locally — the shuffle moves one
row per (key x batch), never per event — and a groupby-sum merges the
partials.  Measures integerize per row (cents) before summing so the
result is order-independent and hash-comparable across engines.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def discover_categories(ds, pivot_col: str,
                        max_categories: int = 256) -> List[str]:
    """Distinct pivot values via per-batch dedup + tiny driver merge
    (the measured pass; same idiom as salt.measured_hot_keys)."""
    import pyarrow.compute as pc

    def _distinct(batch: pa.Table) -> pa.Table:
        return pa.table({pivot_col: pc.unique(batch.column(pivot_col))})

    vals = ds.map_batches(_distinct, batch_format="pyarrow") \
        .to_pandas()[pivot_col]
    cats = sorted(set(vals))
    if len(cats) > max_categories:
        raise ValueError(
            f"pivot on {pivot_col}: {len(cats)} categories exceeds "
            f"max_categories={max_categories}")
    return cats


def pivot_counts(ds, key_col: str, pivot_col: str, *,
                 categories: Optional[List[str]] = None,
                 measure_col: Optional[str] = None,
                 measure_scale: float = 100.0,
                 max_categories: int = 256):
    """Pivot ``ds`` to one row per ``key_col`` with, per category C,
    ``n_<C>`` (count) and — when ``measure_col`` is given —
    ``sum_<C>`` (integer sum of round(measure * measure_scale)).
    Unknown categories can be pinned via ``categories`` to skip the
    discovery pass."""
    from ray.data.aggregate import Sum

    cats = categories if categories is not None else \
        discover_categories(ds, pivot_col, max_categories)
    cat_index = {c: i for i, c in enumerate(cats)}

    def _partial(batch: pa.Table) -> pa.Table:
        pv_s = batch.column(pivot_col).to_pandas().map(cat_index)
        if pv_s.isna().any():
            # caller-pinned categories that miss values present in the
            # data would otherwise produce NaN indices and a cryptic
            # fancy-index failure inside np.add.at
            bad = sorted(set(batch.column(pivot_col).to_pandas()
                             [pv_s.isna()].unique()))
            raise ValueError(
                f"pivot on {pivot_col}: values {bad[:10]} not in the "
                f"pinned categories list")
        pv = pv_s.to_numpy().astype(np.int64)
        keys = batch.column(key_col).to_numpy()
        uk, inv = np.unique(keys, return_inverse=True)
        out = {key_col: uk}
        onehot = np.zeros((len(uk), len(cats)), dtype=np.int64)
        np.add.at(onehot, (inv, pv), 1)
        for c, ci in cat_index.items():
            out[f"n_{c}"] = onehot[:, ci]
        if measure_col is not None:
            m = np.round(batch.column(measure_col).to_numpy()
                         * measure_scale).astype(np.int64)
            sums = np.zeros((len(uk), len(cats)), dtype=np.int64)
            np.add.at(sums, (inv, pv), m)
            for c, ci in cat_index.items():
                out[f"sum_{c}"] = sums[:, ci]
        return pa.table(out)

    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in cats]
    if measure_col is not None:
        aggs += [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in cats]
    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(key_col).aggregate(*aggs))


def unpivot(ds, key_col: str, value_cols: List[str],
            var_name: str = "variable", value_name: str = "value"):
    """Wide -> long: emit one (key, variable, value) row per wide cell.
    Pure per-batch fan-out, no shuffle."""
    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch.column(key_col)
        ks, vs, vals = [], [], []
        for c in value_cols:
            ks.append(keys)
            vs.append(pa.array([c] * n, pa.string()))
            vals.append(batch.column(c))
        return pa.table({
            key_col: pa.concat_arrays(
                [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                 else k for k in ks]),
            var_name: pa.concat_arrays(vs),
            value_name: pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray)
                 else v for v in vals]),
        })

    return ds.map_batches(_melt, batch_format="pyarrow")

"""Distributed ordered prefix scan: running aggregates over a GLOBAL
order — the primitive behind watermark tracking, late-data
accounting, running totals over event streams, and gap detection.

Shape: range-partition by the order key (quantile bounds from a
bounded sample, the shuffle_join.sample_bounds idiom — skew-adaptive,
driver traffic capped), one in-partition sort + vectorized local
scan, then a P-sized partition-summary pass gives each partition the
exclusive prefix of everything before it; a final stateless map
combines local scan + carry-in.  Data moves through exactly one
shuffle; the only driver state is P partition summaries.

Equal order-key values always land in one partition (searchsorted
'right' against sampled bounds), so ties resolve inside the sorted
partition by the caller's tie-break columns.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa


def sample_order_bounds(ds, order_col: str, num_parts: int,
                        *, sample_cap: int = 8192) -> np.ndarray:
    """Quantile partition bounds over the order key (int64).

    Every block contributes an evenly-spaced sample (<=64 rows), and
    ALL block samples are aggregated before the quantile cut — a
    ``limit()`` here would read the FIRST blocks only, so data stored
    in order of the key (typical for event time) would yield bounds
    covering just the low end and send everything else to the last
    partition.  Driver traffic is 64 x num_blocks rows; the cap is
    applied by thinning the combined sample, not by truncating it."""
    def _sample(batch: pa.Table) -> pa.Table:
        v = batch.column(order_col).to_numpy()
        if len(v) > 64:
            idx = np.linspace(0, len(v) - 1, 64).astype(np.int64)
            v = v[idx]
        return pa.table({order_col: pa.array(v)})

    vals = np.sort(ds.map_batches(_sample, batch_format="pyarrow")
                   .to_pandas()[order_col]
                   .to_numpy().astype(np.int64))
    if len(vals) > sample_cap:
        idx = np.linspace(0, len(vals) - 1, sample_cap).astype(np.int64)
        vals = vals[idx]
    if len(vals) == 0 or num_parts <= 1:
        return np.array([], dtype=np.int64)
    qs = np.linspace(0, len(vals) - 1, num_parts + 1)[1:-1]
    return np.unique(vals[qs.astype(np.int64)])


def prefix_max_scan(ds, order_cols: List[str], value_col: str,
                    out_col: str = "running_max", *,
                    num_parts: int = 32, inclusive: bool = True):
    """Attach ``out_col`` = running max of ``value_col`` in the
    global (order_cols) order — inclusive of the current row by
    default; ``inclusive=False`` gives the strict-predecessors max
    (INT64_MIN for the globally first row), the form dominance /
    skyline filters need.  order_cols[0] must be int64; later columns
    only break ties inside a partition."""
    import ray

    key = order_cols[0]
    bounds = sample_order_bounds(ds, key, num_parts)

    def _part(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy().astype(np.int64)
        p = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__p", pa.array(p, pa.int32()))

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        cm = np.maximum.accumulate(
            g[value_col].to_numpy().astype(np.int64))
        if inclusive:
            g["__local"] = cm
        else:
            g["__local"] = np.r_[np.iinfo(np.int64).min, cm[:-1]] \
                if len(cm) else cm
        return g

    # materialize = the two-pass requirement (summary, then combine)
    # realized as Ray block pinning; the object store spills to disk
    # under pressure, so this is storage-bounded, not heap-bounded.
    # For runs that must survive process loss, the checkpointed
    # variant is pipelines/checkpoint.sharded_stage_checkpoint.
    local = parted.groupby("__p").map_groups(
        _local, batch_format="pandas").materialize()

    # P-sized summary -> exclusive prefix per partition.  Summaries
    # must reflect the partition's INCLUSIVE max even in exclusive
    # mode, so carry-ins cover every predecessor row.
    def _summary(batch: pa.Table) -> pa.Table:
        import pandas as pd2
        df = pd2.DataFrame({
            "__p": batch.column("__p").to_numpy(),
            "m": batch.column(value_col).to_numpy()})
        g = df.groupby("__p", sort=False)["m"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    summ = local.map_batches(_summary, batch_format="pyarrow") \
        .to_pandas().groupby("__p")["m"].max()
    n_parts = int(summ.index.max()) + 1 if len(summ) else 0
    # exclusive prefix of partition maxima as a dense array — the
    # combine is then a single vectorized gather, no per-row dict
    imin = np.iinfo(np.int64).min
    inc = np.full(n_parts, imin, np.int64)
    if len(summ):
        inc[summ.index.to_numpy().astype(np.int64)] = \
            summ.to_numpy().astype(np.int64)
    carry_arr = np.r_[imin, np.maximum.accumulate(inc)[:-1]] \
        if n_parts else np.array([], np.int64)
    ref = ray.put(carry_arr)

    def _combine(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        p = batch.column("__p").to_numpy().astype(np.int64)
        loc = batch.column("__local").to_numpy()
        if len(c):
            cin = np.where(p < len(c), c[np.minimum(p, len(c) - 1)],
                           imin)
        else:
            cin = np.full(len(p), imin, np.int64)
        out = np.maximum(loc, cin)
        return batch.drop_columns(["__p", "__local"]).append_column(
            out_col, pa.array(out))

    return local.map_batches(_combine, batch_format="pyarrow")


def prefix_sum_scan(ds, order_cols: List[str], value_col: str,
                    out_col: str = "running_sum", *,
                    num_parts: int = 32, inclusive: bool = True):
    """Attach ``out_col`` = running int64 SUM of ``value_col`` in the
    global (order_cols) order — the distributed prefix-sum primitive
    (token-budget shard packing, byte-offset assignment, cumulative
    quotas).  Same two-pass shape as prefix_max_scan: range-partition
    by the sampled order bounds, one in-partition sort + local
    cumsum, a P-sized partition-summary pass turns partition totals
    into exclusive carry-ins, and a stateless map combines.
    ``inclusive=False`` yields the strict-predecessors sum (0 for
    the globally first row) — the offset form packers need.  Sums are
    exact int64; the caller owns the < 2^63 total bound."""
    import ray

    key = order_cols[0]
    bounds = sample_order_bounds(ds, key, num_parts)

    def _part(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy().astype(np.int64)
        p = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__p", pa.array(p, pa.int32()))

    parted = ds.map_batches(_part, batch_format="pyarrow")

    def _local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        cs = np.cumsum(g[value_col].to_numpy().astype(np.int64))
        if inclusive:
            g["__local"] = cs
        else:
            g["__local"] = np.r_[np.int64(0), cs[:-1]] if len(cs) \
                else cs
        return g

    local = parted.groupby("__p").map_groups(
        _local, batch_format="pandas").materialize()

    def _summary(batch: pa.Table) -> pa.Table:
        import pandas as pd2
        df = pd2.DataFrame({
            "__p": batch.column("__p").to_numpy(),
            "s": batch.column(value_col).to_numpy().astype(np.int64)})
        g = df.groupby("__p", sort=False)["s"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    summ = local.map_batches(_summary, batch_format="pyarrow") \
        .to_pandas().groupby("__p")["s"].sum()
    n_parts = int(summ.index.max()) + 1 if len(summ) else 0
    tot = np.zeros(n_parts, np.int64)
    if len(summ):
        tot[summ.index.to_numpy().astype(np.int64)] = \
            summ.to_numpy().astype(np.int64)
    carry_arr = np.r_[np.int64(0), np.cumsum(tot)[:-1]] if n_parts \
        else np.array([], np.int64)
    ref = ray.put(carry_arr)

    def _combine(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        p = batch.column("__p").to_numpy().astype(np.int64)
        loc = batch.column("__local").to_numpy().astype(np.int64)
        if len(c):
            cin = np.where(p < len(c), c[np.minimum(p, len(c) - 1)],
                           np.int64(0))
        else:
            cin = np.zeros(len(p), np.int64)
        return batch.drop_columns(["__p", "__local"]).append_column(
            out_col, pa.array(loc + cin, pa.int64()))

    return local.map_batches(_combine, batch_format="pyarrow")

"""2-D skyline (Pareto-dominance) filter — min cents, max dateu.

The skyline is DISTRIBUTIVE over any partition of the input:
``skyline(S) = skyline(∪_i skyline(S_i))`` — a point dominated in S
is dominated by some surviving point of the subset that dominated
it, and an S-survivor survives in its own subset a fortiori.  That
gives the barrier-free plan: each block reduces to its own front
(vectorized, typically a few dozen rows out of tens of thousands),
and one bounded driver fetch + a final front pass finishes —
zero AllToAll exchanges.

The front of anti-correlated data can be the WHOLE table (price and
date both increasing: nothing dominates anything), so the driver
fetch is guarded by ``max_front_rows`` exactly like
``agg.driver_merged_sum``: exceeding it raises with instructions to
run the distributed three-exchange plan (per-price group max +
strict-prefix scan + co-partitioned filter — see
pipelines/queries.q_orders_skyline(driver_merge=False)) instead of
silently materializing a table-sized result.

Dominance convention (matches the NOT EXISTS SQL oracle): a
dominates b iff a.cents <= b.cents AND a.dateu >= b.dateu AND
(a.cents < b.cents OR a.dateu > b.dateu).  Exact duplicates on both
axes do not dominate each other — all of them survive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NEG_INF = np.int64(-(2 ** 62))


def pareto_front_2d_mask(cents: np.ndarray,
                         dateu: np.ndarray) -> np.ndarray:
    """Boolean survivor mask, original row order.  A row survives iff
    (a) no same-cents row has a strictly later dateu and (b) no
    strictly-cheaper row has dateu >= its own."""
    n = len(cents)
    if n == 0:
        return np.zeros(0, dtype=bool)
    cents = np.asarray(cents, dtype=np.int64)
    dateu = np.asarray(dateu, dtype=np.int64)
    order = np.lexsort((-dateu, cents))   # cents asc, dateu desc
    c = cents[order]
    d = dateu[order]
    new_run = np.r_[True, c[1:] != c[:-1]]
    run_id = np.cumsum(new_run) - 1
    run_max = d[new_run]                  # per-cents max dateu
    # E[r] = max dateu among STRICTLY cheaper runs (exclusive cummax)
    e = np.r_[_NEG_INF, np.maximum.accumulate(run_max)[:-1]]
    surv = (d == run_max[run_id]) & (d > e[run_id])
    mask = np.empty(n, dtype=bool)
    mask[order] = surv
    return mask


def skyline_2d(ds, *, cents_col: str = "cents",
               dateu_col: str = "dateu",
               max_front_rows: int = 2_000_000):
    """Per-block front + bounded driver merge.  Returns a pandas
    DataFrame with the input columns, survivors only.  Raises when
    the union of block fronts exceeds ``max_front_rows`` (see module
    docstring for the distributed alternative)."""

    def _front(batch: pa.Table) -> pa.Table:
        m = pareto_front_2d_mask(
            batch.column(cents_col).to_numpy(),
            batch.column(dateu_col).to_numpy())
        return batch.filter(pa.array(m))

    fronts = ds.map_batches(_front, batch_format="pyarrow") \
        .to_pandas()
    if len(fronts) > max_front_rows:
        raise ValueError(
            f"skyline_2d fetched {len(fronts)} front rows "
            f"(> max_front_rows={max_front_rows}); the axes are "
            "anti-correlated at this scale — run the distributed "
            "plan (q_orders_skyline(driver_merge=False)) instead")
    m = pareto_front_2d_mask(fronts[cents_col].to_numpy(),
                             fronts[dateu_col].to_numpy())
    return fronts[m].reset_index(drop=True)

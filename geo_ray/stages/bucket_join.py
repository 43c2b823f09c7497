"""Bucketed tagged-union equi-join — the scale path for joins where
NEITHER side fits a worker heap (fact x fact, fact x large dim).

Both sides stream through cheap per-batch preparation (filter,
pre-aggregate, project to narrow columns), are tagged with a
deterministic hash bucket of the join key, unioned, and resolved
per bucket by a vectorized pandas body.  Nothing is materialized on
the driver and nothing broadcasts: each of the B buckets holds
~rows/B narrow rows, so worker memory is bounded by the bucket
count, which scales with the cluster.

This generalizes the pattern proven by q_tpch_q4 (see
pipelines/queries.py) and replaces the round-2 driver-side
``pq.read_table(orders)`` broadcasts flagged in VERDICT round 2
(tpch_q3/q5/q10, orders_by_nation).

Contract:
  * every side dataset must share ONE schema that includes the
    int64 join-key column ``key`` (pad the union columns with
    pa.nulls, as the callers do);
  * ``resolve`` receives one bucket as a pandas DataFrame (the
    bucket column already dropped) and returns a DataFrame of
    output partials;
  * the bucket id is splitmix64(key) % num_buckets — deterministic
    across processes (Python's salted hash() would break
    co-partitioning).
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _splitmix

BUCKET_COL = "__b"


def tag_buckets(batch: pa.Table, key: str, num_buckets: int) -> pa.Table:
    """Append the deterministic hash-bucket column for ``key``."""
    k = batch.column(key).to_numpy().astype(np.uint64)
    b = (_splitmix(k) % np.uint64(num_buckets)).astype(np.int32)
    return batch.append_column(BUCKET_COL, pa.array(b, pa.int32()))


def bucketed_join(sides: Sequence, key: str,
                  resolve: Callable[[pd.DataFrame], pd.DataFrame],
                  *, num_buckets: int = 128):
    """Union ``sides`` (same schema, int64 ``key``), co-partition by
    hash bucket, and apply ``resolve`` per bucket.  Returns the
    dataset of concatenated resolve outputs."""
    tagged = [s.map_batches(
        lambda b, k=key, nb=num_buckets: tag_buckets(b, k, nb),
        batch_format="pyarrow") for s in sides]
    union = reduce(lambda a, b: a.union(b), tagged)
    return union.groupby(BUCKET_COL).map_groups(
        lambda g: resolve(g.drop(columns=[BUCKET_COL])),
        batch_format="pandas")

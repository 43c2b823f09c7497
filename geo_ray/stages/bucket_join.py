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

# ~rows per resolve group the vectorized pandas bodies digest
# comfortably; buckets scale linearly with the fact side above it
ROWS_PER_BUCKET = 50_000


def adaptive_buckets(fact_rows: int, *, lo: int = 16,
                     hi: int = 65_536) -> int:
    """Right-size the co-partition count to the measured fact side
    (parquet-metadata row count — no data scan): too few buckets caps
    join parallelism and balloons per-group state at 10^9+ rows; too
    many drowns small inputs in per-group scheduling overhead (the
    measured cost of a fixed 128 at sf0.1 is ~0.8 s per join)."""
    return int(np.clip(fact_rows // ROWS_PER_BUCKET, lo, hi))


def parquet_rows(path: str) -> int:
    """Row count from parquet FOOTER metadata only (no column reads) —
    the driver-side cardinality probe adaptive_buckets feeds on."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


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

"""Deterministic hash sampling: keep a row iff splitmix64(id) falls
under an exact-rational threshold.

The coordination-free sampling idiom for distributed pipelines: no
RNG state, no pass counting, no shuffle — membership is a pure
function of the row id, so any worker (or a later re-run, or the SQL
oracle) selects the identical sample.  Rates are exact rationals
(num/den) so the threshold is an integer and no float rounding can
disagree across engines.  Stratified variant applies a per-class
rate — the class-rebalancing shape of training-data curation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa

_M = np.uint64(0xFFFFFFFFFFFFFFFF)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = (z + _GOLDEN)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def threshold_of(num: int, den: int) -> int:
    """Exact integer threshold: keep iff hash < floor(num * 2^64 / den)
    (num == den keeps everything)."""
    assert 0 <= num <= den and den > 0
    return ((1 << 64) * num) // den


def hash_sample(ds, id_col: str, num: int, den: int):
    """Uniform deterministic sample at exact rate num/den."""
    th = threshold_of(num, den)

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        if th >= (1 << 64):
            return batch
        return batch.filter(pa.array(_splitmix(ids) < np.uint64(th)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def distinct_sketch_partial(batch: pa.Table, key_col: str,
                            id_col: str, m: int) -> pa.Table:
    """Linear probabilistic counting partial: (key, bit) rows where
    bit = splitmix64(id) % m.  Bitmaps merge by union (a groupby on
    (key, bit)), so the sketch is order-independent and
    deterministic — the estimate m*ln(m/zero_bits) is then a pure
    function of the exact surviving bit set, which is why even this
    APPROXIMATE distinct count can hash-match a SQL oracle."""
    import pandas as pd
    ids = batch.column(id_col).to_numpy().astype(np.uint64)
    df = pd.DataFrame({
        "key": batch.column(key_col).to_pandas(),
        "bit": (_splitmix(ids) % np.uint64(m)).astype(np.int64),
    }).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def lpc_estimate(bits_set: int, m: int) -> int:
    """Whang et al. linear counting estimate, floored to an integer
    so both engines emit the identical value."""
    import math
    zeros = m - bits_set
    if zeros <= 0:
        return m  # saturated; callers should size m >> distinct
    return int(math.floor(m * math.log(m / zeros)))


def distinct_sketch_by_key(ds, key_col: str, id_col: str,
                           m: int = 4096):
    """Approximate per-key distinct count in bounded space.  Two-level
    like every other aggregate here: batch partials emit unique
    (key, bit) rows, a (key, bit) groupby dedups globally (so the
    final per-key group is bounded by m rows — never
    #batches x m), then a per-key count + estimate.  Standard error
    ~ sqrt(m*(e^(n/m)-n/m-1))/n — under ~2% for n <= m."""
    import pandas as pd
    from ray.data.aggregate import Count

    def _estimate(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": [g["key"].iloc[0]],
            "est_distinct": pd.Series([lpc_estimate(len(g), m)],
                                      dtype="int64"),
        })

    partials = ds.map_batches(
        lambda b: distinct_sketch_partial(b, key_col, id_col, m),
        batch_format="pyarrow")
    uniq = (partials.groupby(["key", "bit"])
            .aggregate(Count(alias_name="_n")).drop_columns(["_n"]))
    return uniq.groupby("key").map_groups(_estimate,
                                          batch_format="pandas")


def stratified_sample(ds, id_col: str, class_col: str,
                      rates: Dict[str, Tuple[int, int]]):
    """Per-class deterministic rates; classes absent from ``rates``
    are dropped."""
    ths = {c: threshold_of(n, d) for c, (n, d) in rates.items()}

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        cls = batch.column(class_col).to_pylist()
        h = _splitmix(ids)
        keep = np.zeros(len(ids), dtype=bool)
        for c, th in ths.items():
            m = np.fromiter((x == c for x in cls), dtype=bool,
                            count=len(cls))
            if th >= (1 << 64):
                keep |= m
            else:
                keep |= m & (h < np.uint64(th))
        return batch.filter(pa.array(keep))

    return ds.map_batches(_keep, batch_format="pyarrow")

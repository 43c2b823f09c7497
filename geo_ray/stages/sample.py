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


def hll_alpha_ppb(m: int) -> int:
    """HyperLogLog bias constant as an INTEGER (parts-per-billion):
    the estimator contract below is pure integer arithmetic, so both
    engines must share the same exact alpha literal (Flajolet et al.
    2007 values: 0.673/0.697/0.709 for m=16/32/64, else
    0.7213/(1+1.079/m))."""
    import math
    if m == 16:
        return 673_000_000
    if m == 32:
        return 697_000_000
    if m == 64:
        return 709_000_000
    return round(0.7213 / (1.0 + 1.079 / m) * 1e9)


_HLL_WINDOW = 52        # rho window width: values < 2^52 are exact
_HLL_RHO_CAP = _HLL_WINDOW + 1


def hll_partial(batch: pa.Table, key_col: str, id_col: str,
                p: int) -> pa.Table:
    """HyperLogLog partial: per-(key, bucket) max-rho rows.

    bucket = top p hash bits; rho = 1 + leading-zero count within a
    FIXED 52-bit window below the bucket bits (capped at 53).  The
    window keeps the value below 2^52 so its float64 is exact and
    np.frexp returns the exact bit length — no log2-rounding hazard
    on either engine (the SQL oracle measures the same window with a
    binary-string length).  Registers merge by max, so the sketch is
    order/partition-independent and the estimate is a pure function
    of the exact register table — an approximate operator with an
    exact cross-engine contract (same design as the LPC sketch and
    the log-histogram quantiles)."""
    import pandas as pd
    assert 4 <= p <= 12, "p<=12 keeps the rho window below the bucket"
    ids = batch.column(id_col).to_numpy().astype(np.uint64)
    h = _splitmix(ids)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = ((h >> np.uint64(64 - p - _HLL_WINDOW))
            & np.uint64((1 << _HLL_WINDOW) - 1))
    # exact bit length: rest < 2^52 is exactly representable
    _, exp = np.frexp(rest.astype(np.float64))
    rho = np.where(rest > 0, _HLL_RHO_CAP - exp,
                   _HLL_RHO_CAP).astype(np.int64)
    df = pd.DataFrame({
        "key": batch.column(key_col).to_pandas(),
        "bucket": bucket,
        "rho": rho,
    }).groupby(["key", "bucket"], sort=False)["rho"].max().reset_index()
    return pa.Table.from_pandas(df, preserve_index=False)


def hll_estimate(rhos, m: int) -> int:
    """Integer-exact HLL estimate from a key's register list (absent
    registers are zero).  The harmonic sum is a rational with
    denominator 2^53: num = sum over registers of 2^(53 - rho)
    (zero register -> 2^53), so
    est = (alpha_ppb * m^2 * 2^53) // (num * 10^9) in unbounded
    integers — no float in the raw path.  Small-range correction
    switches to linear counting (the one float, the same
    FLOOR(m*ln(m/V)) both engines compute) when est <= 2.5m and
    empty registers remain."""
    import math
    rhos = [int(r) for r in rhos]
    cnt = len(rhos)
    num = (m - cnt) * (1 << _HLL_RHO_CAP) + \
        sum(1 << (_HLL_RHO_CAP - r) for r in rhos)
    est = (hll_alpha_ppb(m) * m * m *
           (1 << _HLL_RHO_CAP)) // (num * 10**9)
    v = m - cnt
    if v > 0 and est <= (5 * m) // 2:
        return lpc_estimate(m - v, m)
    return int(est)


def hll_sketch_by_key(ds, key_col: str, id_col: str, p: int = 6):
    """Approximate per-key distinct count in O(2^p) space per key at
    ANY cardinality (relative error ~1.04/sqrt(2^p)).  Two-level:
    batch partials emit per-(key, bucket) max-rho rows (<= 2^p per
    key per batch), a (key, bucket) groupby merges registers by max,
    then a per-key integer estimate.  Complements the linear-counting
    sketch (exact-contract but saturating near m) for 10^9+-distinct
    domains."""
    import pandas as pd
    from ray.data.aggregate import Max

    m = 1 << p

    def _estimate(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": [g["key"].iloc[0]],
            "est_distinct": pd.Series(
                [hll_estimate(g["rho"].to_numpy(), m)], dtype="int64"),
        })

    partials = ds.map_batches(
        lambda b: hll_partial(b, key_col, id_col, p),
        batch_format="pyarrow")
    regs = (partials.groupby(["key", "bucket"])
            .aggregate(Max("rho", alias_name="rho")))
    return regs.groupby("key").map_groups(_estimate,
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

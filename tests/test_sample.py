"""Deterministic hash sampling: threshold exactness, determinism,
stratified class handling; oracle parity runs in test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_ray.stages.sample import (_splitmix, hash_sample,
                                   stratified_sample, threshold_of)


def test_threshold_exact_rationals():
    assert threshold_of(1, 1) == 1 << 64
    assert threshold_of(1, 2) == 1 << 63
    assert threshold_of(0, 5) == 0
    # floor semantics, no float involved
    assert threshold_of(1, 3) == ((1 << 64) // 3)


def test_rate_statistics():
    ids = np.arange(200_000, dtype=np.uint64)
    h = _splitmix(ids)
    frac = float((h < np.uint64(threshold_of(1, 4))).mean())
    assert abs(frac - 0.25) < 0.01


def test_lpc_estimate_accuracy():
    """Linear counting error stays within ~3x its theoretical standard
    error across load factors, and saturation is handled."""
    import math
    from geo_ray.stages.sample import lpc_estimate
    m = 4096
    rng = np.random.default_rng(3)
    for n in (50, 500, 2000, 4000):
        ids = rng.integers(0, 2**63, n).astype(np.uint64)
        bits = len(np.unique(_splitmix(ids) % np.uint64(m)))
        est = lpc_estimate(bits, m)
        t = n / m
        se = math.sqrt(m * (math.exp(t) - t - 1)) / n
        assert abs(est - n) / n <= max(3 * se, 0.02), (n, est, se)
    assert lpc_estimate(m, m) == m  # saturated bitmap


def test_sample_deterministic_and_stratified(ray_session):
    import ray.data as rd

    n = 5000
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
        "value": pa.array(np.zeros(n), pa.float64()),
    })
    ds = rd.from_arrow(t)
    out1 = stratified_sample(ds, "event_id", "event_type",
                             {"a": (1, 1), "b": (1, 10)}).to_pandas()
    out2 = stratified_sample(ds, "event_id", "event_type",
                             {"a": (1, 1), "b": (1, 10)}).to_pandas()
    a = out1.sort_values("event_id").reset_index(drop=True)
    b = out2.sort_values("event_id").reset_index(drop=True)
    assert a.equals(b)                       # re-run identical
    na = (a["event_type"] == "a").sum()
    nb = (a["event_type"] == "b").sum()
    assert na == n // 2                      # rate 1 keeps everything
    assert 0.03 * n / 2 < nb < 0.18 * n / 2  # ~10%

    uni = hash_sample(ds, "event_id", 1, 2).to_pandas()
    assert 0.45 * n < len(uni) < 0.55 * n

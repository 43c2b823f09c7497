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


def test_hll_rho_matches_bit_string_reference():
    """The frexp-based rho must equal the binary-string length the SQL
    oracle computes, over hash values that stress the window edges."""
    from geo_ray.stages.sample import hll_partial

    ids = np.concatenate([
        np.arange(5000, dtype=np.int64),
        np.array([0, 1, (1 << 63) - 1], dtype=np.int64),
    ])
    t = pa.table({"k": pa.array(np.zeros(len(ids), np.int64)),
                  "id": pa.array(ids, pa.int64())})
    p = 6
    out = hll_partial(t, "k", "id", p)
    # reference: per (bucket) max over string bit lengths
    h = _splitmix(ids.astype(np.uint64))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = ((h >> np.uint64(64 - p - 52))
            & np.uint64((1 << 52) - 1)).astype(object)
    rho = np.array([53 - len(format(int(r), "b")) if r > 0 else 53
                    for r in rest], dtype=np.int64)
    want = {}
    for b, r in zip(bucket, rho):
        want[b] = max(want.get(b, 0), r)
    got = dict(zip(out.column("bucket").to_pylist(),
                   out.column("rho").to_pylist()))
    assert got == want


def test_hll_estimate_accuracy_and_saturation():
    """HLL keeps tracking far past the linear-counting saturation
    point; error stays within ~3 sigma of 1.04/sqrt(m)."""
    import math
    from geo_ray.stages.sample import hll_estimate, lpc_estimate

    for n, p in ((500, 6), (100_000, 6), (100_000, 12)):
        m = 1 << p
        ids = np.arange(n, dtype=np.uint64) * np.uint64(2654435761)
        h = _splitmix(ids)
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h >> np.uint64(64 - p - 52)) & np.uint64((1 << 52) - 1)
        _, e = np.frexp(rest.astype(np.float64))
        rho = np.where(rest > 0, 53 - e, 53).astype(np.int64)
        regs = {}
        for b, r in zip(bucket, rho):
            regs[b] = max(regs.get(b, 0), int(r))
        est = hll_estimate(list(regs.values()), m)
        sigma = 1.04 / math.sqrt(m)
        assert abs(est - n) / n <= 3 * sigma, (n, p, est)
    # the LPC bitmap saturates at m; HLL above stayed within 3 sigma
    assert lpc_estimate(4096, 4096) == 4096


def test_hll_merge_invariance(ray_session):
    """Register max-merge makes the sketch independent of how rows
    are partitioned: 1 block vs 16 blocks give identical estimates."""
    import ray.data as rd
    from geo_ray.stages.sample import hll_sketch_by_key

    n = 20000
    t = pa.table({
        "k": pa.array((np.arange(n) % 3).astype(np.int64)),
        "id": pa.array((np.arange(n) * 7919 % 6007).astype(np.int64)),
    })
    a = hll_sketch_by_key(rd.from_arrow(t).repartition(1),
                          "k", "id", p=6).to_pandas()
    b = hll_sketch_by_key(rd.from_arrow(t).repartition(16),
                          "k", "id", p=6).to_pandas()
    a = a.sort_values("key").reset_index(drop=True)
    b = b.sort_values("key").reset_index(drop=True)
    assert a.equals(b)

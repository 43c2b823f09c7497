"""Bloom-filter semi-join: sketch properties, mergeable build, and
exactness of the join independent of the false-positive rate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.bloom import (BloomFilter, bloom_build,
                                  bloom_params, bloom_prefilter,
                                  bloom_semi_join, _contains, _set_bits)


def _local_filter(keys: np.ndarray, m_bits: int, k: int) -> BloomFilter:
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    _set_bits(words, m_bits, k, keys.astype(np.uint64))
    return BloomFilter(words=words, m_bits=m_bits, k=k)


def test_params_sane():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0
    # ~9.6 bits/key at 1% fpp
    assert 9 * 10_000 <= m <= 11 * 10_000
    assert 5 <= k <= 9


def test_no_false_negatives_and_fpp():
    rng_keys = (np.arange(20_000, dtype=np.int64) * 2_654_435_761) % (1 << 40)
    inset = rng_keys[:10_000]
    outset = rng_keys[10_000:]
    m, k = bloom_params(len(inset), 0.01)
    bf = _local_filter(inset, m, k)
    assert bf.contains(inset).all()            # never a false negative
    fpr = bf.contains(outset).mean()
    assert fpr < 0.03                          # nominal 1%, generous cap


def test_distributed_build_matches_local(ray_session):
    import ray.data as rd
    keys = np.arange(5_000, dtype=np.int64) * 7 + 3
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
    bf = bloom_build(ds, "k", fpp=0.01)
    local = _local_filter(keys, bf.m_bits, bf.k)
    assert np.array_equal(bf.words, local.words)  # OR-merge == one pass


def test_prefilter_passes_all_members(ray_session):
    import ray
    import ray.data as rd
    keys = np.arange(1_000, dtype=np.int64)
    members = keys[keys % 3 == 0]
    bf = _local_filter(members, *bloom_params(len(members), 0.01))
    ds = rd.from_arrow(pa.table({"k": keys, "v": keys * 10}))
    out = bloom_prefilter(ds, "k", ray.put(bf)).to_pandas()
    got = set(out["k"])
    assert set(members).issubset(got)          # supersets, never drops


@pytest.mark.parametrize("fpp,n_hint", [(0.01, None), (0.5, 4)])
def test_semi_join_exact_even_with_tiny_filter(ray_session, fpp, n_hint):
    """The recheck pass must kill every false positive: drive the join
    through a deliberately undersized filter (n_hint=4 for 300 build
    keys => near-total saturation) and still match the exact answer."""
    import ray.data as rd
    rng = np.random.RandomState(7)
    probe = pd.DataFrame({
        "k": rng.randint(0, 1_000, size=5_000).astype(np.int64),
        "payload": rng.randint(0, 10, size=5_000).astype(np.int64),
    })
    build_keys = np.unique(rng.randint(0, 1_000, size=300)).astype(np.int64)
    pds = rd.from_pandas(probe).repartition(6)
    bds = rd.from_arrow(pa.table({"bk": build_keys})).repartition(3)
    out = bloom_semi_join(pds, bds, "k", "bk",
                          fpp=fpp, n_build_keys=n_hint).to_pandas()
    want = probe[probe["k"].isin(build_keys)]
    got = out.sort_values(["k", "payload"]).reset_index(drop=True)
    want = want.sort_values(["k", "payload"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "payload"]],
                                  want[["k", "payload"]])


def test_prefilter_cuts_shuffle_volume(ray_session):
    """The whole point: with a selective build side, the survivor set
    is close to the true-match set, far below the probe size."""
    import ray
    import ray.data as rd
    rng = np.random.RandomState(3)
    probe_keys = rng.randint(0, 100_000, size=50_000).astype(np.int64)
    build_keys = np.arange(0, 100_000, 100, dtype=np.int64)  # 1% of space
    bf = _local_filter(build_keys, *bloom_params(len(build_keys), 0.01))
    ds = rd.from_arrow(pa.table({"k": probe_keys}))
    survivors = bloom_prefilter(ds, "k", ray.put(bf)).count()
    true_matches = int(np.isin(probe_keys, build_keys).sum())
    assert survivors < 0.05 * len(probe_keys)
    assert survivors >= true_matches


def test_tpch_q8_bloom_plan_matches_direct(ray_session):
    """q_tpch_q8's cost-based Bloom prefilter (chosen past the fact
    row threshold) must be output-identical to the direct plan — the
    in-bucket isin recheck absorbs false positives."""
    from geo_ray.pipelines.queries import q_tpch_q8

    sf = "/root/testdata/sf0.01"
    direct = q_tpch_q8(sf)                      # below threshold
    bloom = q_tpch_q8(sf, bloom_min_rows=0)     # forced bloom path
    pd.testing.assert_frame_equal(
        direct.sort_values("o_year").reset_index(drop=True),
        bloom.sort_values("o_year").reset_index(drop=True),
        check_exact=True)


def test_tpch_q19_bloom_plan_matches_direct(ray_session):
    from geo_ray.pipelines.queries import q_tpch_q19

    sf = "/root/testdata/sf0.01"
    direct = q_tpch_q19(sf).to_pandas()
    bloom = q_tpch_q19(sf, bloom_min_rows=0).to_pandas()
    pd.testing.assert_frame_equal(direct, bloom, check_exact=True)


def test_tpch_q17_bloom_plan_matches_direct(ray_session):
    from geo_ray.pipelines.queries import q_tpch_q17

    sf = "/root/testdata/sf0.01"
    direct = q_tpch_q17(sf).to_pandas()
    bloom = q_tpch_q17(sf, bloom_min_rows=0).to_pandas()
    pd.testing.assert_frame_equal(direct, bloom, check_exact=True)

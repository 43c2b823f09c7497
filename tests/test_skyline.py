"""stages/skyline.py: the vectorized 2-D front mask vs a brute
quadratic dominance oracle, and the driver-merge plan vs the
distributed plan on real data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.skyline import pareto_front_2d_mask, skyline_2d


def _brute_mask(c, d):
    n = len(c)
    m = np.ones(n, dtype=bool)
    for i in range(n):
        dom = (c <= c[i]) & (d >= d[i]) & ((c < c[i]) | (d > d[i]))
        m[i] = not dom.any()
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_front_mask_matches_brute(seed):
    rng = np.random.RandomState(seed)
    c = rng.randint(0, 40, 300).astype(np.int64)      # many ties
    d = rng.randint(0, 40, 300).astype(np.int64)
    assert np.array_equal(pareto_front_2d_mask(c, d), _brute_mask(c, d))


def test_front_mask_duplicates_and_edges():
    # exact duplicates never dominate each other: both survive
    c = np.array([5, 5, 5, 9], np.int64)
    d = np.array([7, 7, 6, 8], np.int64)
    assert pareto_front_2d_mask(c, d).tolist() == [True, True, False,
                                                   True]
    assert pareto_front_2d_mask(np.empty(0, np.int64),
                                np.empty(0, np.int64)).tolist() == []
    assert pareto_front_2d_mask(np.array([1], np.int64),
                                np.array([1], np.int64)).tolist() == [True]


def test_skyline_distributive_merge(ray_session):
    """Per-block fronts + final front == whole-input front, with the
    input split across many blocks."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    c = rng.randint(0, 1000, 20000).astype(np.int64)
    d = rng.randint(0, 1000, 20000).astype(np.int64)
    k = np.arange(20000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"o_orderkey": k, "cents": c,
                                 "dateu": d})).repartition(13)
    got = skyline_2d(ds).sort_values("o_orderkey").reset_index(drop=True)
    want = pd.DataFrame({"o_orderkey": k, "cents": c, "dateu": d})
    want = want[_brute_mask(c, d)].sort_values("o_orderkey") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_skyline_guard_trips(ray_session):
    import ray.data as rd

    # perfectly anti-correlated: everything survives
    n = 500
    ds = rd.from_arrow(pa.table({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "cents": np.arange(n, dtype=np.int64),
        "dateu": np.arange(n, dtype=np.int64)}))
    with pytest.raises(ValueError, match="anti-correlated"):
        skyline_2d(ds, max_front_rows=100)


def test_query_plans_identical(ray_session):
    from geo_ray.pipelines.queries import q_orders_skyline

    sf = "/root/testdata/sf0.01"
    a = q_orders_skyline(sf).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    b = q_orders_skyline(sf, driver_merge=False).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)

"""Pivot / unpivot: partial-fold correctness, category discovery
bounds, and the wide<->long round trip."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.pivot import (discover_categories, pivot_counts,
                                  unpivot)


def _ds(df, parts=4):
    import ray.data as rd
    return rd.from_pandas(df).repartition(parts)


def _frame(n=1000, seed=0):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "k": rng.randint(0, 7, size=n).astype(np.int64),
        "cat": rng.choice(["a", "b", "c"], size=n),
        "value": rng.uniform(0, 100, size=n).round(2),
    })


def test_pivot_matches_pandas(ray_session):
    df = _frame()
    out = pivot_counts(_ds(df), "k", "cat", measure_col="value") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    for c in ["a", "b", "c"]:
        sub = df[df["cat"] == c]
        want_n = sub.groupby("k").size()
        want_s = sub.assign(cents=np.round(sub["value"] * 100)
                            .astype(np.int64)).groupby("k")["cents"].sum()
        got = out.set_index("k")
        for k in out["k"]:
            assert got.loc[k, f"n_{c}"] == want_n.get(k, 0)
            assert got.loc[k, f"sum_{c}"] == want_s.get(k, 0)


def test_pivot_partials_merge_across_blocks(ray_session):
    """The same key spread over many blocks must merge to one row."""
    df = pd.DataFrame({"k": np.zeros(64, np.int64),
                       "cat": ["a", "b"] * 32,
                       "value": np.ones(64)})
    out = pivot_counts(_ds(df, parts=8), "k", "cat",
                       measure_col="value").to_pandas()
    assert len(out) == 1
    assert out["n_a"].iloc[0] == 32 and out["n_b"].iloc[0] == 32
    assert out["sum_a"].iloc[0] == 3200


def test_discovery_bound(ray_session):
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                       "cat": [f"c{i}" for i in range(100)]})
    with pytest.raises(ValueError):
        pivot_counts(_ds(df), "k", "cat", max_categories=10)
    cats = discover_categories(_ds(df), "cat", max_categories=128)
    assert len(cats) == 100 and cats == sorted(cats)


def test_pinned_categories_skip_discovery(ray_session):
    df = _frame(200, seed=1)
    out = pivot_counts(_ds(df), "k", "cat",
                       categories=["a", "b", "c", "zeta"]).to_pandas()
    assert (out["n_zeta"] == 0).all()


def test_unpivot_round_trip(ray_session):
    df = _frame(300, seed=2)
    wide = pivot_counts(_ds(df), "k", "cat")
    long = unpivot(wide, "k", ["n_a", "n_b", "n_c"]).to_pandas()
    # total cell mass is preserved
    assert long["value"].sum() == len(df)
    back = long.pivot(index="k", columns="variable",
                      values="value").reset_index()
    want = pivot_counts(_ds(df), "k", "cat").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    back = back.sort_values("k").reset_index(drop=True)
    for c in ["n_a", "n_b", "n_c"]:
        assert (back[c].to_numpy() == want[c].to_numpy()).all()


def test_pinned_categories_missing_value_raises(ray_session):
    import ray.data as rd
    from geo_ray.stages.pivot import pivot_counts
    df = pd.DataFrame({"k": [1, 1, 2], "cat": ["a", "b", "zz"]})
    ds = rd.from_pandas(df)
    with pytest.raises((ValueError, Exception)) as ei:
        pivot_counts(ds, "k", "cat", categories=["a", "b"]) \
            .to_pandas()
    assert "zz" in str(ei.value)

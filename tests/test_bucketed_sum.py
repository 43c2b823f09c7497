"""bucketed_sum: exact sums at high key cardinality, multi-key
packing, and equality with a pandas reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.agg import bucketed_sum, _pack_keys, _unpack_keys


def _ds(df, parts=8):
    import ray.data as rd
    return rd.from_pandas(df).repartition(parts)


def test_single_key_high_cardinality(ray_session):
    rng = np.random.RandomState(0)
    n = 200_000
    df = pd.DataFrame({
        "k": rng.randint(0, 80_000, n).astype(np.int64),
        "v": rng.randint(-1000, 1000, n).astype(np.int64),
        "w": rng.randint(0, 10, n).astype(np.int64)})
    out = bucketed_sum(_ds(df), ["k"], ["v", "w"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k", sort=True).sum().reset_index()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_multi_key_with_negatives(ray_session):
    rng = np.random.RandomState(1)
    df = pd.DataFrame({
        "a": rng.randint(-500, 500, 5000).astype(np.int64),
        "b": rng.randint(0, 50, 5000).astype(np.int64),
        "v": rng.randint(0, 100, 5000).astype(np.int64)})
    out = bucketed_sum(_ds(df), ["a", "b"], ["v"]).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = df.groupby(["a", "b"], sort=True).sum().reset_index()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_pack_range_guard():
    with pytest.raises(ValueError):
        _pack_keys([np.array([1 << 21], np.int64),
                    np.array([0], np.int64)])


def test_pack_round_trip():
    rng = np.random.RandomState(2)
    cols = [rng.randint(-(1 << 19), 1 << 19, 1000).astype(np.int64)
            for _ in range(3)]
    packed = _pack_keys(cols)
    back = _unpack_keys(packed, 3)
    for c, b in zip(cols, back):
        assert np.array_equal(c, b)


def test_unbounded_single_key_passthrough(ray_session):
    df = pd.DataFrame({"k": np.array([1 << 40, -(1 << 40), 7], np.int64),
                       "v": np.array([1, 2, 3], np.int64)})
    out = bucketed_sum(_ds(df, 2), ["k"], ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == sorted([1 << 40, -(1 << 40), 7])


# --------------------------------------------------------------------------
# edit-distance join kernels
# --------------------------------------------------------------------------

def test_levenshtein_reference():
    from geo_ray.stages.fuzzy import levenshtein
    cases = [("", "", 0), ("a", "", 1), ("", "abc", 3),
             ("kitten", "sitting", 3), ("flaw", "lawn", 2),
             ("abc", "abc", 0), ("abc", "acb", 2),
             ("intention", "execution", 5),
             ("red widget", "red gadget", 2)]
    for a, b, d in cases:
        assert levenshtein(a, b) == d, (a, b)
        assert levenshtein(b, a) == d, (b, a)


def test_edit_pairs_exactly_once_and_exact(ray_session):
    import ray.data as rd
    from geo_ray.stages.fuzzy import edit_distance_pairs, levenshtein
    vals = ["cat", "cats", "bat", "hat", "chat", "dog", "dogs",
            "catalog", "zebra", "zebras", "cab", "crab"]
    df = pd.DataFrame({"name": np.repeat(vals, 5)})  # duplicates
    out = edit_distance_pairs(rd.from_pandas(df).repartition(4),
                              "name", 2).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))
    want = set()
    for i, a in enumerate(sorted(set(vals))):
        for b in sorted(set(vals))[i + 1:]:
            if levenshtein(a, b) <= 2:
                want.add((a, b))
    assert got == want
    assert len(out) == len(got)          # exactly once
    assert (out["name_a"] < out["name_b"]).all()


# --------------------------------------------------------------------------
# int64 exactness past 2^53 and the string-key variant
# --------------------------------------------------------------------------

def test_sums_exact_past_float53(ray_session):
    """Per-key totals beyond 2^53 must stay exact (float64-weight
    bincount would round): values near 2^60 summed per key."""
    big = (1 << 60) + 1
    df = pd.DataFrame({"k": np.array([1, 1, 2, 2, 2], np.int64),
                       "v": np.array([big, 3, big, big, 1], np.int64)})
    out = bucketed_sum(_ds(df, 2), ["k"], ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["v"]) == [big + 3, 2 * big + 1]


def test_bucketed_sum_str_matches_pandas(ray_session):
    from geo_ray.stages.agg import bucketed_sum_str
    rng = np.random.RandomState(7)
    terms = np.array([f"t{i:05d}" for i in range(5000)], dtype=object)
    df = pd.DataFrame({
        "term": terms[rng.randint(0, 5000, 100_000)],
        "n": rng.randint(1, 50, 100_000).astype(np.int64)})
    out = bucketed_sum_str(_ds(df), "term", ["n"]).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    want = df.groupby("term", sort=True, as_index=False).sum()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_bucketed_sum_str_exact_past_float53(ray_session):
    from geo_ray.stages.agg import bucketed_sum_str
    big = (1 << 60) + 1
    df = pd.DataFrame({"term": ["a", "a", "b"],
                       "n": np.array([big, 5, big], np.int64)})
    out = bucketed_sum_str(_ds(df, 2), "term", ["n"]).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    assert list(out["n"]) == [big + 5, big]

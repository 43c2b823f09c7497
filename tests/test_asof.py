"""As-of join: brute-force oracle on small cases, and a hypothesis
property test that the skew-proof bucketed path is row-identical to
the single-shuffle simple path (same contract the two-phase
sessionization carries)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from geo_ray.stages.asof import (_fill_group, _phase1_part, _phase2_part,
                                 _PART_MIX, tag_side)


def _brute(lefts, rights):
    """lefts/rights: list of (key, t, event_id).  Returns the spec:
    match = argmax (t, event_id) over rights with same key, t <= lt."""
    out = []
    for (lk, lt_, lid) in lefts:
        cands = [(t, eid) for (k, t, eid) in rights if k == lk and t <= lt_]
        if cands:
            mt, mid = max(cands)
            out.append((lid, mid, lt_ - mt))
        else:
            out.append((lid, -1, -1))
    return pd.DataFrame(out, columns=["event_id", "match_id", "lag_us"]) \
        .astype("int64").sort_values("event_id").reset_index(drop=True)


def _tagged_frame(lefts, rights):
    rows = [(k, t, 1, eid) for (k, t, eid) in lefts] + \
           [(k, t, 0, eid) for (k, t, eid) in rights]
    return pd.DataFrame(rows, columns=["key", "t_us", "flag", "event_id"]) \
        .astype({"key": "int64", "t_us": "int64", "flag": "int8",
                 "event_id": "int64"})


def _simple_local(df):
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("event_id", "match_id", "lag_us")})
    return pd.concat(
        [_fill_group(g.drop(columns=["key"]))
         for _, g in df.groupby("key")], ignore_index=True) \
        .sort_values("event_id").reset_index(drop=True)


def _bucketed_local(df, bucket_us, num_parts=4):
    if len(df) == 0:
        return _simple_local(df)
    df = df.copy()
    df["bucket"] = df["t_us"].to_numpy() // bucket_us
    mix = (df["key"].to_numpy().astype(np.uint64) * _PART_MIX) \
        ^ df["bucket"].to_numpy().astype(np.uint64)
    df["part"] = (mix % np.uint64(num_parts)).astype(np.int32)
    p1 = pd.concat([_phase1_part(g.drop(columns=["part"]))
                    for _, g in df.groupby("part")], ignore_index=True)
    p1["part"] = (p1["key"].to_numpy().astype(np.uint64)
                  % np.uint64(num_parts)).astype(np.int32)
    return pd.concat([_phase2_part(g.drop(columns=["part"]))
                      for _, g in p1.groupby("part")], ignore_index=True) \
        .sort_values("event_id").reset_index(drop=True)


def test_brute_small():
    lefts = [(1, 100, 10), (1, 50, 11), (2, 10, 12)]
    rights = [(1, 100, 20), (1, 40, 21), (3, 5, 22)]
    df = _tagged_frame(lefts, rights)
    want = _brute(lefts, rights)
    got = _simple_local(df)
    pd.testing.assert_frame_equal(got, want)
    # inclusive <=: left at t=100 matches right at t=100
    assert int(want[want.event_id == 10]["match_id"].iloc[0]) == 20
    assert int(want[want.event_id == 10]["lag_us"].iloc[0]) == 0
    # key 2 has no rights at all
    assert int(want[want.event_id == 12]["match_id"].iloc[0]) == -1


def test_equal_t_right_tiebreak():
    """Two rights at the same t: the larger event_id wins."""
    lefts = [(7, 100, 1)]
    rights = [(7, 100, 2), (7, 100, 9), (7, 100, 5)]
    got = _simple_local(_tagged_frame(lefts, rights))
    assert int(got["match_id"].iloc[0]) == 9


events = st.lists(
    st.tuples(st.integers(0, 4),            # key (few -> collisions)
              st.integers(0, 500),          # t (small range -> ties)
              st.integers(0, 10**6)),       # event_id
    max_size=60)


@settings(max_examples=200, deadline=None)
@given(lefts=events, rights=events,
       bucket_us=st.sampled_from([1, 7, 64, 1000]))
def test_bucketed_equals_simple_equals_brute(lefts, rights, bucket_us):
    lefts = [(k, t, 2 * i) for i, (k, t, _) in enumerate(lefts)]
    rights = list({(k, t, 2 * i + 1) for i, (k, t, _) in enumerate(rights)})
    df = _tagged_frame(lefts, rights)
    want = _brute(lefts, rights)
    simple = _simple_local(df)
    bucketed = _bucketed_local(df, bucket_us)
    pd.testing.assert_frame_equal(simple, want)
    pd.testing.assert_frame_equal(bucketed, want)


def _range_brute(lefts, rights, w):
    """Spec: per left, count/cent-sum of same-key rights in (t-w, t]."""
    out = []
    for (lk, lt_, lid) in lefts:
        sel = [c for (k, t, _, c) in rights
               if k == lk and lt_ - w < t <= lt_]
        out.append((lid, len(sel), sum(sel)))
    return pd.DataFrame(out, columns=["event_id", "n_matches",
                                      "sum_cents"]) \
        .astype("int64").sort_values("event_id").reset_index(drop=True)


def _range_local(lefts, rights, w, bucket_us, num_parts=4):
    from geo_ray.stages.asof import _range_part
    rows = []
    for (k, t, eid) in lefts:
        rows.append((k, t // bucket_us, t, 1, eid, 0))
    for (k, t, eid, c) in rights:
        b = t // bucket_us
        rows.append((k, b, t, 0, eid, c))
        if t > (b + 1) * bucket_us - w:
            rows.append((k, b + 1, t, 0, eid, c))
    df = pd.DataFrame(rows, columns=["key", "bucket", "t_us", "flag",
                                     "event_id", "cents"]) \
        .astype({"flag": "int8"})
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("event_id", "n_matches",
                                       "sum_cents")})
    mix = (df["key"].to_numpy().astype(np.uint64) * _PART_MIX) \
        ^ df["bucket"].to_numpy().astype(np.uint64)
    df["part"] = (mix % np.uint64(num_parts)).astype(np.int32)
    return pd.concat([_range_part(g.drop(columns=["part"]), w)
                      for _, g in df.groupby("part")],
                     ignore_index=True) \
        .sort_values("event_id").reset_index(drop=True)


@settings(max_examples=200, deadline=None)
@given(lefts=events, rights=events,
       w=st.sampled_from([1, 5, 50, 400]),
       bucket_mult=st.sampled_from([1, 2, 5]))
def test_range_join_equals_brute(lefts, rights, w, bucket_mult):
    lefts = [(k, t, 2 * i) for i, (k, t, _) in enumerate(lefts)]
    rights = [(k, t, 2 * i + 1, (t % 7) * 13)
              for i, (k, t, _) in enumerate(rights)]
    want = _range_brute(lefts, rights, w)
    got = _range_local(lefts, rights, w, bucket_us=w * bucket_mult)
    pd.testing.assert_frame_equal(got, want)


def test_range_join_window_edges():
    """Exclusive lower bound, inclusive upper bound, replication at
    the bucket boundary."""
    w, bucket = 10, 20
    lefts = [(1, 25, 0)]
    rights = [(1, 15, 1, 100),   # t == l.t - w -> excluded
              (1, 16, 3, 200),   # in window, previous bucket -> replica
              (1, 25, 5, 400),   # t == l.t -> included
              (1, 26, 7, 800)]   # after left -> excluded
    got = _range_local(lefts, rights, w, bucket_us=bucket)
    assert int(got["n_matches"].iloc[0]) == 2
    assert int(got["sum_cents"].iloc[0]) == 600


def test_mega_key_single_user(ray_session):
    """The skew case the two-phase design exists for: ALL events on
    one key.  Phase-1 units stay bounded by events-per-bucket and the
    result still equals the single-group simple path."""
    import pyarrow as pa
    import ray.data as rd
    from geo_ray.stages.asof import asof_join_bucketed, asof_join_simple

    rng = np.random.default_rng(7)
    n = 20_000
    ts = np.sort(rng.integers(0, 3_000_000_000, n)) \
        .astype("datetime64[us]")
    t = pa.table({
        "user_id": pa.array(np.zeros(n, np.int64)),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts),
        "event_type": pa.array(
            np.where(np.arange(n) % 3 == 0, "purchase", "click")),
    })
    ds = rd.from_arrow(t)
    left = ds.filter(expr="event_type == 'purchase'")
    right = ds.filter(expr="event_type == 'click'")
    a = asof_join_simple(left, right).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = asof_join_bucketed(left, right, bucket_sec=600,
                           num_parts=16).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(a) == (n + 2) // 3
    pd.testing.assert_frame_equal(a, b)


def test_dataset_paths_equal(ray_session):
    """End-to-end through Ray Data: bucketed == simple on real events;
    the registered query's oracle parity runs in test_oracle_parity."""
    import ray.data as rd
    from geo_ray.stages.asof import asof_join_bucketed, asof_join_simple

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])
    left = ds.filter(expr="event_type == 'purchase'")
    right = ds.filter(expr="event_type == 'click'")
    a = asof_join_simple(left, right).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = asof_join_bucketed(left, right, num_parts=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_query_asof_plans_identical(ray_session):
    """q_events_asof's sampled skew probe picks a plan, never rows:
    the simple path (no hot user at the default threshold) and the
    forced bucketed path (hot_threshold=1 makes every user hot) must
    be output-identical on real data."""
    import pandas as pd
    from geo_ray.pipelines.queries import q_events_asof

    sf = "/root/testdata/sf0.01"
    a = q_events_asof(sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    b = q_events_asof(sf, hot_threshold=1).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True,
                                  check_dtype=False)

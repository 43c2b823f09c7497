"""Property tests for the skew-proof two-phase sessionization: for ANY
event stream, composing the phase functions exactly as the distributed
pipeline partitions them must equal the simple per-user sessionization.
Runs the pure phase functions in-process (no Ray), so hypothesis can
afford hundreds of adversarial streams — ties on ts, gaps exactly at
the threshold, sessions spanning dozens of buckets, single-event
users, all-in-one-bucket bursts."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_ray.stages.windows import (_PART_MIX, merge_session_partials_part,
                                    session_group,
                                    session_partials_part)

COLS = ["user_id", "session_no", "n", "first_ts", "last_ts"]


def _simple(df: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    out = [session_group(g, gap_sec)
           for _, g in df.groupby("user_id", sort=True)]
    return (pd.concat(out, ignore_index=True)[COLS]
            .sort_values(COLS).reset_index(drop=True))


def _bucketed(df: pd.DataFrame, gap_sec: int, bucket_sec: int,
              num_parts: int) -> pd.DataFrame:
    """The distributed plan, executed deterministically in-process:
    phase 1 over hash-of-(user,bucket) partitions, phase 2 over
    hash-of-user partitions — the same data movement the Ray stage
    performs, minus the object store."""
    ts = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    bucket = ts // bucket_sec
    uid = df["user_id"].to_numpy().astype(np.int64)
    mix = (uid.astype(np.uint64) * _PART_MIX) ^ bucket.astype(np.uint64)
    keyed = pd.DataFrame({
        "user_id": uid, "event_id": df["event_id"].to_numpy(),
        "ts_epoch": ts, "bucket": bucket,
        "part": (mix % np.uint64(num_parts)).astype(np.int32),
    })
    partials = [session_partials_part(g.drop(columns=["part"]), gap_sec)
                for _, g in keyed.groupby("part", sort=False)]
    frags = pd.concat(partials, ignore_index=True)
    frags["part"] = (frags["user_id"].to_numpy().astype(np.uint64)
                     % np.uint64(num_parts)).astype(np.int32)
    merged = [merge_session_partials_part(g.drop(columns=["part"]), gap_sec)
              for _, g in frags.groupby("part", sort=False)]
    return (pd.concat(merged, ignore_index=True)[COLS]
            .sort_values(COLS).reset_index(drop=True))


def _frame(users, tss):
    n = len(users)
    return pd.DataFrame({
        "user_id": np.asarray(users, dtype=np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.asarray(tss, dtype="datetime64[s]"),
    })


@given(
    data=st.lists(
        st.tuples(st.integers(0, 3),           # user
                  st.integers(0, 40_000)),     # ts (seconds)
        min_size=1, max_size=300),
    gap_sec=st.sampled_from([1, 300, 1800]),
    bucket_sec=st.sampled_from([600, 3600, 7200]),
    num_parts=st.sampled_from([1, 7, 64]),
)
@settings(max_examples=200, deadline=None)
def test_bucketed_equals_simple_random(data, gap_sec, bucket_sec, num_parts):
    users = [u for u, _ in data]
    tss = [t for _, t in data]
    df = _frame(users, tss)
    pd.testing.assert_frame_equal(
        _simple(df, gap_sec),
        _bucketed(df, gap_sec, bucket_sec, num_parts),
        check_dtype=False)


def test_gap_exactly_threshold():
    """gap == gap_sec continues the session in BOTH paths (> semantics),
    including when the threshold event lands in the next bucket."""
    gap, bucket = 1800, 3600
    tss = [0, 1800, 3600, 5400, 5400 + 1801]
    df = _frame([1] * 5, tss)
    simple = _simple(df, gap)
    assert len(simple) == 2 and simple["n"].tolist() == [4, 1]
    pd.testing.assert_frame_equal(simple, _bucketed(df, gap, bucket, 8),
                                  check_dtype=False)


def test_session_spanning_fifty_buckets():
    """One continuous mega-session across 50 buckets must chain-merge
    back into a single session, with counts conserved."""
    gap, bucket = 120, 600
    tss = list(range(0, 50 * 600, 100))           # continuous, 100s apart
    df = _frame([9] * len(tss), tss)
    out = _bucketed(df, gap, bucket, 16)
    assert len(out) == 1
    assert out.loc[0, "n"] == len(tss)
    assert out.loc[0, "first_ts"] == 0
    assert out.loc[0, "last_ts"] == tss[-1]


def test_duplicate_timestamps_and_negative_epoch():
    gap, bucket = 60, 600
    tss = [-1200, -1200, -1200, -601, -600, 0, 0, 59, 120]
    df = _frame([2] * len(tss), tss)
    pd.testing.assert_frame_equal(_simple(df, gap),
                                  _bucketed(df, gap, bucket, 8),
                                  check_dtype=False)

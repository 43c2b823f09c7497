"""Stream-shaped windowed aggregates over an ordered event log.

Ray Data has no event-time watermarks; the reference is strictly batch
(SURVEY §2.11).  Windows are realized as deterministic batch
transforms: tumbling/sliding windows key rows by integer window ids in
map_batches (combiner first, tiny groupby after); session windows sort
each user's events inside ``groupby(user).map_groups`` and split on
inactivity gaps — the ordering assumption (ts, event_id) is explicit
and matches the SQL oracle's window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sliding_window_partials(batch: pa.Table, size_sec: int,
                            step_sec: int) -> pa.Table:
    """Each event joins size/step consecutive windows; emits per-batch
    (event_type, window_start_epoch, n) partials."""
    assert size_sec % step_sec == 0
    k = size_sec // step_sec
    ts = batch.column("ts").to_numpy()
    base = (ts.astype("datetime64[s]").astype(np.int64) // step_sec) * step_sec
    et = np.array(batch.column("event_type").to_pylist())
    frames = []
    for i in range(k):
        frames.append(pd.DataFrame({
            "event_type": et,
            "window_start": base - i * step_sec,
        }))
    df = pd.concat(frames, ignore_index=True)
    g = df.groupby(["event_type", "window_start"]).size().reset_index(name="n")
    return pa.Table.from_pandas(g, preserve_index=False)


def sliding_window_counts(events_ds, size_sec: int, step_sec: int):
    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(
        lambda b: sliding_window_partials(b, size_sec, step_sec),
        batch_format="pyarrow")
    return partials.groupby(["event_type", "window_start"]) \
        .aggregate(Sum("n", alias_name="n"))


def session_group(group: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Per-user sessionization: sorted by (ts, event_id); a gap greater
    than ``gap_sec`` starts a new session."""
    g = group.sort_values(["ts", "event_id"], kind="mergesort")
    ts = g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
    new_session = np.ones(len(g), dtype=np.int64)
    if len(g) > 1:
        new_session[1:] = (ts[1:] - ts[:-1] > gap_sec).astype(np.int64)
    session_no = np.cumsum(new_session)
    out = pd.DataFrame({
        "user_id": g["user_id"].to_numpy(),
        "session_no": session_no,
        "ts_epoch": ts,
    })
    agg = out.groupby(["user_id", "session_no"]).agg(
        n=("ts_epoch", "size"),
        first_ts=("ts_epoch", "min"),
        last_ts=("ts_epoch", "max")).reset_index()
    return agg


def session_windows(events_ds, gap_sec: int):
    return events_ds.groupby("user_id").map_groups(
        lambda g: session_group(g, gap_sec), batch_format="pandas")


def session_partials_group(group: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Partial sessions within one (user, time-bucket) group: same gap
    split as session_group, but emits (first_ts, last_ts, n) fragments
    that phase 2 may merge across bucket boundaries."""
    g = group.sort_values(["ts_epoch", "event_id"], kind="mergesort")
    ts = g["ts_epoch"].to_numpy()
    new_session = np.ones(len(g), dtype=np.int64)
    if len(g) > 1:
        new_session[1:] = (ts[1:] - ts[:-1] > gap_sec).astype(np.int64)
    sid = np.cumsum(new_session)
    out = pd.DataFrame({"user_id": g["user_id"].to_numpy(), "sid": sid,
                        "ts_epoch": ts})
    return out.groupby(["user_id", "sid"]).agg(
        n=("ts_epoch", "size"),
        first_ts=("ts_epoch", "min"),
        last_ts=("ts_epoch", "max")).reset_index().drop(columns=["sid"])


def merge_session_partials(group: pd.DataFrame, gap_sec: int) -> pd.DataFrame:
    """Phase 2: merge a user's boundary-adjacent session fragments.
    Operates on O(sessions + buckets) rows per user, never raw events."""
    g = group.sort_values(["first_ts", "last_ts"], kind="mergesort")
    first = g["first_ts"].to_numpy()
    last = g["last_ts"].to_numpy()
    n = g["n"].to_numpy()
    # a fragment starts a new session iff its gap to the running
    # session end exceeds gap_sec; fragments are time-sorted and
    # non-overlapping (they came from disjoint time buckets)
    sess_first, sess_last, sess_n = [], [], []
    for i in range(len(g)):
        if sess_last and first[i] - sess_last[-1] <= gap_sec:
            sess_last[-1] = max(sess_last[-1], int(last[i]))
            sess_n[-1] += int(n[i])
        else:
            sess_first.append(int(first[i]))
            sess_last.append(int(last[i]))
            sess_n.append(int(n[i]))
    return pd.DataFrame({
        "user_id": g["user_id"].to_numpy()[:len(sess_n)],
        "session_no": np.arange(1, len(sess_n) + 1, dtype=np.int64),
        "n": pd.Series(sess_n, dtype="int64"),
        "first_ts": pd.Series(sess_first, dtype="int64"),
        "last_ts": pd.Series(sess_last, dtype="int64"),
    })


def session_windows_bucketed(events_ds, gap_sec: int,
                             bucket_sec: int = 6 * 3600):
    """Skew-proof sessionization: phase 1 groups by (user, time bucket)
    so a mega-user's events split across buckets (each group is bounded
    by the user's event count per bucket_sec, not their total), phase 2
    merges boundary-crossing fragments over tiny per-session rows.
    Output is identical to session_windows for any input."""
    def _key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[s]") \
            .astype(np.int64)
        bucket = ts // bucket_sec
        out = pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_epoch": pa.array(ts, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
        })
        return out

    partials = (events_ds.map_batches(_key, batch_format="pyarrow")
                .groupby(["user_id", "bucket"])
                .map_groups(lambda g: session_partials_group(
                    g.drop(columns=["bucket"]), gap_sec),
                    batch_format="pandas"))
    return partials.groupby("user_id").map_groups(
        lambda g: merge_session_partials(g, gap_sec),
        batch_format="pandas")

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

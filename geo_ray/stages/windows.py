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
    et = batch.column("event_type").to_numpy(zero_copy_only=False)
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


def _group_cols(group, names):
    """Numpy columns from a pa.Table OR pandas group body, plus a flag
    for which container to emit.  Lets the phase functions run
    Arrow-native inside map_groups (no pandas round-trip per
    partition) while staying callable with DataFrames from the
    property-test suite."""
    if isinstance(group, pa.Table):
        return [group.column(n).to_numpy() for n in names], True
    return [group[n].to_numpy() for n in names], False


def _emit(is_arrow: bool, cols: dict):
    if is_arrow:
        return pa.table({k: pa.array(np.asarray(v, dtype=np.int64),
                                     pa.int64())
                         for k, v in cols.items()})
    return pd.DataFrame({k: pd.Series(v, dtype="int64")
                         for k, v in cols.items()})


def session_partials_part(group, gap_sec: int):
    """Partial sessions for EVERY (user, time-bucket) pair hashed into
    this partition, in one vectorized pass: sort (lexsort — no pandas
    in the hot path), mark segment starts where the (user, bucket)
    key changes or the gap exceeds gap_sec, and aggregate by run
    boundaries.  One map_groups call covers thousands of
    (user, bucket) groups — per-group Python calls were the 100x
    slowdown the first cut of this stage had."""
    (u, b, ts, eid), is_arrow = _group_cols(
        group, ["user_id", "bucket", "ts_epoch", "event_id"])
    order = np.lexsort((eid, ts, b, u))
    u, b, ts = u[order], b[order], ts[order]
    new = np.ones(len(u), dtype=bool)
    if len(u) > 1:
        same = (u[1:] == u[:-1]) & (b[1:] == b[:-1])
        new[1:] = ~same | (ts[1:] - ts[:-1] > gap_sec)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(u)) - 1
    return _emit(is_arrow, {
        "user_id": u[starts],
        "n": ends - starts + 1,
        "first_ts": ts[starts],
        "last_ts": ts[ends],
    })


def merge_session_partials_part(group, gap_sec: int):
    """Phase 2, vectorized over every user in the partition: fragments
    of one user are disjoint time intervals, so sorted by first_ts
    their last_ts is increasing and the merge test is simply
    first[i] - last[i-1] > gap_sec (transitive chain merge)."""
    (u, f, last, n), is_arrow = _group_cols(
        group, ["user_id", "first_ts", "last_ts", "n"])
    order = np.lexsort((last, f, u))
    u, f, last, n = u[order], f[order], last[order], n[order]
    new = np.ones(len(u), dtype=bool)
    if len(u) > 1:
        new[1:] = (u[1:] != u[:-1]) | (f[1:] - last[:-1] > gap_sec)
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(u)) - 1
    n_sum = np.add.reduceat(n, starts).astype(np.int64)
    su = u[starts]
    # session_no = 1-based rank of the merged session within its user
    user_new = np.ones(len(starts), dtype=bool)
    if len(starts) > 1:
        user_new[1:] = su[1:] != su[:-1]
    idx = np.arange(len(starts), dtype=np.int64)
    base = np.maximum.accumulate(np.where(user_new, idx, 0))
    return _emit(is_arrow, {
        "user_id": su,
        "session_no": idx - base + 1,
        "n": n_sum,
        "first_ts": f[starts],
        "last_ts": last[ends],
    })


def _gap_phase1(g: pd.DataFrame) -> pd.DataFrame:
    """All (user, bucket) units in this partition: in-bucket
    consecutive gaps (each tagged with the LATER event's type) plus
    one per-unit summary row (kind=1) carrying the unit's first and
    last timestamps and the first event's type, for the boundary
    gaps phase 2 stitches."""
    g = g.sort_values(["user_id", "bucket", "t_us", "event_id"],
                      kind="mergesort")
    u = g["user_id"].to_numpy()
    b = g["bucket"].to_numpy()
    t = g["t_us"].to_numpy()
    et = g["event_type"].to_numpy()
    n = len(g)
    same = np.zeros(n, dtype=bool)
    if n > 1:
        same[1:] = (u[1:] == u[:-1]) & (b[1:] == b[:-1])
    gaps = pd.DataFrame({
        "kind": np.zeros(int(same.sum()), np.int8),
        "user_id": u[same],
        "bucket": b[same],
        "t_first": t[same] - np.concatenate([[0], t[:-1]])[same],
        "t_last": np.zeros(int(same.sum()), np.int64),
        "event_type": et[same],
    }).rename(columns={"t_first": "gap_us"})
    new_unit = ~same
    starts = np.nonzero(new_unit)[0]
    ends = np.append(starts[1:], n) - 1
    summaries = pd.DataFrame({
        "kind": np.ones(len(starts), np.int8),
        "user_id": u[starts],
        "bucket": b[starts],
        "gap_us": t[starts],          # first t of the unit
        "t_last": t[ends],
        "event_type": et[starts],     # type of the unit's first event
    })
    return pd.concat([gaps, summaries], ignore_index=True)


def _gap_phase2(g: pd.DataFrame) -> pd.DataFrame:
    """Per-key boundary gaps: summaries sorted by (user, bucket);
    each unit's first event closes a gap against the PREVIOUS unit's
    last timestamp (same user).  In-bucket gap rows pass through."""
    out = g[g["kind"] == 0][["event_type", "gap_us"]]
    s = g[g["kind"] == 1].sort_values(["user_id", "bucket"],
                                      kind="mergesort")
    if len(s):
        u = s["user_id"].to_numpy()
        first_t = s["gap_us"].to_numpy()
        last_t = s["t_last"].to_numpy()
        et = s["event_type"].to_numpy()
        same_user = np.zeros(len(s), dtype=bool)
        same_user[1:] = u[1:] == u[:-1]
        prev_last = np.concatenate([[0], last_t[:-1]])
        bnd = pd.DataFrame({
            "event_type": et[same_user],
            "gap_us": (first_t - prev_last)[same_user],
        })
        out = pd.concat([out, bnd], ignore_index=True)
    return out.reset_index(drop=True)


def user_gaps_bucketed(events_ds, bucket_sec: int = 6 * 3600,
                       num_parts: int = 64):
    """(event_type, gap_us) rows — each event's distance to the same
    user's previous event in (ts, event_id) order, tagged with the
    later event's type.  Two-phase like the bucketed sessionization:
    phase-1 units are (user, time-bucket) so a mega-user splits;
    phase 2 stitches only per-unit summary rows."""
    def _key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        bucket = ts // (np.int64(bucket_sec) * 1_000_000)
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        mix = (uid.astype(np.uint64) * _PART_MIX) ^ bucket.astype(np.uint64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "t_us": pa.array(ts, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "part": pa.array((mix % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()),
        })

    p1 = (events_ds.map_batches(_key, batch_format="pyarrow")
          .groupby("part")
          .map_groups(lambda g: _gap_phase1(g.drop(columns=["part"])),
                      batch_format="pandas"))

    def _key2(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.uint64)
        return batch.append_column(
            "part", pa.array((uid % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()))

    return (p1.map_batches(_key2, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: _gap_phase2(g.drop(columns=["part"])),
                        batch_format="pandas"))


_PART_MIX = np.uint64(0x9E3779B97F4A7C15)


def session_windows_bucketed(events_ds, gap_sec: int,
                             bucket_sec: int = 6 * 3600,
                             num_parts: int = 64):
    """Skew-proof sessionization: phase 1 partitions by a hash of
    (user, time bucket) so a mega-user's events split across buckets
    (each phase-1 unit is bounded by the user's event count per
    bucket_sec, not their total), phase 2 merges boundary-crossing
    fragments per user over tiny per-fragment rows.  Both phases
    shuffle into ``num_parts`` coarse partitions and vectorize over
    all groups inside each — per-(user,bucket) map_groups calls would
    pay ~1 ms of Python overhead per group.  Output is identical to
    session_windows for any input."""
    def _key(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[s]") \
            .astype(np.int64)
        bucket = ts // bucket_sec
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        mix = (uid.astype(np.uint64) * _PART_MIX) ^ bucket.astype(np.uint64)
        return pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "ts_epoch": pa.array(ts, pa.int64()),
            "bucket": pa.array(bucket, pa.int64()),
            "part": pa.array((mix % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()),
        })

    partials = (events_ds.map_batches(_key, batch_format="pyarrow")
                .groupby("part")
                .map_groups(lambda g: session_partials_part(g, gap_sec),
                            batch_format="pyarrow"))

    def _key2(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.uint64)
        return batch.append_column(
            "part", pa.array((uid % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()))

    return (partials.map_batches(_key2, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: merge_session_partials_part(g, gap_sec),
                        batch_format="pyarrow"))

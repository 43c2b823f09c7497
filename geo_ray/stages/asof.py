"""Distributed as-of join: for each left event, the latest right event
of the same key at-or-before its timestamp.

Ray Data has no as-of/range join; the reference is purely spatial.
This is the event-time analog of the covering join: a classic
training-data / feature-attribution primitive (SURVEY §2.11's
"streaming" family) expressed as deterministic batch transforms.

Semantics (deterministic, oracle-checkable): left row l matches the
right row r maximizing (t, event_id) among rows with r.key = l.key
and r.t <= l.t; ties at equal t resolve right-before-left and then by
the larger right event_id.  No match -> match_id = lag_us = -1.

Scale shape (the bucketed path): phase 1 hashes (key, time-bucket)
units across ``num_parts`` coarse partitions, so a mega-user's events
split by bucket — per-unit work is bounded by the user's event count
per ``bucket_sec``, never their total.  In-bucket matches resolve
locally in one vectorized forward-fill; each unit also emits its max
right row ("tail", one row per non-empty (key, bucket)).  Phase 2
re-partitions by key alone and resolves boundary-crossing lefts
against the tails of strictly-earlier buckets — tail rows are tiny
(one per unit), so only unresolved lefts plus O(#units) summary rows
shuffle twice; resolved matches pass through untouched.  Output is
row-identical to the single-shuffle ``asof_join_simple`` for any
input (property-tested in tests/test_asof.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_PART_MIX = np.uint64(0x9E3779B97F4A7C15)

# inter-phase row kinds
_RESOLVED = 0
_PENDING = 1
_TAIL = 2


def _t_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    return batch.column(ts_col).to_numpy().astype("datetime64[us]") \
        .astype(np.int64)


def tag_side(batch: pa.Table, flag: int, by: str, ts_col: str,
             id_col: str) -> pa.Table:
    """Narrow (key, t_us, flag, event_id) projection of one join side;
    everything downstream shuffles only these four int columns."""
    return pa.table({
        "key": batch.column(by).cast(pa.int64()),
        "t_us": pa.array(_t_us(batch, ts_col), pa.int64()),
        "flag": pa.array(np.full(batch.num_rows, flag, np.int8), pa.int8()),
        "event_id": batch.column(id_col).cast(pa.int64()),
    })


def _fill_group(g: pd.DataFrame) -> pd.DataFrame:
    """One key's rows -> per-left matches via a vectorized
    forward-fill of the last right index (rights sort before lefts at
    equal t, so t == left t is inclusive)."""
    g = g.sort_values(["t_us", "flag", "event_id"], kind="mergesort")
    t = g["t_us"].to_numpy()
    flag = g["flag"].to_numpy()
    eid = g["event_id"].to_numpy()
    idx = np.arange(len(g))
    last = np.maximum.accumulate(np.where(flag == 0, idx, -1))
    left = flag == 1
    ll = last[left]
    ok = ll >= 0
    match = np.where(ok, eid[np.maximum(ll, 0)], -1)
    lag = np.where(ok, t[left] - t[np.maximum(ll, 0)], -1)
    return pd.DataFrame({
        "event_id": pd.Series(eid[left], dtype="int64"),
        "match_id": pd.Series(match, dtype="int64"),
        "lag_us": pd.Series(lag, dtype="int64"),
    })


def asof_join_simple(left_ds, right_ds, by: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id"):
    """Baseline: one shuffle keyed by ``by``; per-key vectorized
    forward-fill.  Correct at any scale a single key fits in memory."""
    tagged = (left_ds.map_batches(
                  lambda b: tag_side(b, 1, by, ts_col, id_col),
                  batch_format="pyarrow")
              .union(right_ds.map_batches(
                  lambda b: tag_side(b, 0, by, ts_col, id_col),
                  batch_format="pyarrow")))
    return tagged.groupby("key").map_groups(
        lambda g: _fill_group(g.drop(columns=["key"])),
        batch_format="pandas")


def _phase1_part(g: pd.DataFrame) -> pd.DataFrame:
    """All (key, bucket) units hashed into this partition, one
    vectorized pass: local matches resolve; lefts with no in-bucket
    predecessor become PENDING; each unit emits its max right row as
    a TAIL.  Output rows carry a ``kind`` discriminator."""
    g = g.sort_values(["key", "bucket", "t_us", "flag", "event_id"],
                      kind="mergesort")
    if len(g) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("kind", "key", "bucket", "t_us",
                                       "event_id", "match_id", "lag_us")}) \
            .astype({"kind": "int8"})
    k = g["key"].to_numpy()
    b = g["bucket"].to_numpy()
    t = g["t_us"].to_numpy()
    flag = g["flag"].to_numpy()
    eid = g["event_id"].to_numpy()
    n = len(g)
    idx = np.arange(n)
    new_unit = np.ones(n, dtype=bool)
    if n > 1:
        new_unit[1:] = (k[1:] != k[:-1]) | (b[1:] != b[:-1])
    unit_start = np.maximum.accumulate(np.where(new_unit, idx, 0))
    is_right = flag == 0
    last_right = np.maximum.accumulate(np.where(is_right, idx, -1))
    valid = last_right >= unit_start

    left = flag == 1
    res = left & valid
    pend = left & ~valid
    lr = np.maximum(last_right, 0)

    starts = np.nonzero(new_unit)[0]
    unit_end = np.append(starts[1:], n) - 1
    tail_ok = valid[unit_end] if n else np.zeros(0, bool)
    tails = lr[unit_end][tail_ok]

    def _rows(kind, key, bucket, t_us, event_id, match_id, lag_us):
        return pd.DataFrame({
            "kind": pd.Series(np.full(len(key), kind, np.int8),
                              dtype="int8"),
            "key": pd.Series(key, dtype="int64"),
            "bucket": pd.Series(bucket, dtype="int64"),
            "t_us": pd.Series(t_us, dtype="int64"),
            "event_id": pd.Series(event_id, dtype="int64"),
            "match_id": pd.Series(match_id, dtype="int64"),
            "lag_us": pd.Series(lag_us, dtype="int64"),
        })

    return pd.concat([
        _rows(_RESOLVED, k[res], b[res], t[res], eid[res],
              eid[lr[res]], t[res] - t[lr[res]]),
        _rows(_PENDING, k[pend], b[pend], t[pend], eid[pend],
              np.full(int(pend.sum()), -1), np.full(int(pend.sum()), -1)),
        _rows(_TAIL, k[tails], b[unit_end][tail_ok], t[tails], eid[tails],
              np.full(len(tails), -1), np.full(len(tails), -1)),
    ], ignore_index=True)


def _phase2_part(g: pd.DataFrame) -> pd.DataFrame:
    """Every key hashed into this partition: pendings of bucket k may
    match tails of buckets < k only, encoded as sort key bucket+1 for
    tails vs bucket for pendings (tails first at equal sort key), then
    the same forward-fill with per-key reset.  RESOLVED rows pass
    through."""
    out_res = g[g["kind"] == _RESOLVED]
    g = g[g["kind"] != _RESOLVED]
    if len(g) == 0:
        return out_res[["event_id", "match_id", "lag_us"]] \
            .reset_index(drop=True)
    is_tail = (g["kind"] == _TAIL).to_numpy()
    skey = g["bucket"].to_numpy() + np.where(is_tail, 1, 0)
    g = g.assign(skey=skey, sflag=np.where(is_tail, 0, 1)) \
         .sort_values(["key", "skey", "sflag", "t_us", "event_id"],
                      kind="mergesort")
    k = g["key"].to_numpy()
    t = g["t_us"].to_numpy()
    eid = g["event_id"].to_numpy()
    is_tail = (g["kind"] == _TAIL).to_numpy()
    n = len(g)
    idx = np.arange(n)
    new_key = np.ones(n, dtype=bool)
    if n > 1:
        new_key[1:] = k[1:] != k[:-1]
    key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
    last_tail = np.maximum.accumulate(np.where(is_tail, idx, -1))
    valid = last_tail >= key_start
    pend = ~is_tail
    lt = np.maximum(last_tail, 0)
    match = np.where(valid[pend], eid[lt[pend]], -1)
    lag = np.where(valid[pend], t[pend] - t[lt[pend]], -1)
    out_pend = pd.DataFrame({
        "event_id": pd.Series(eid[pend], dtype="int64"),
        "match_id": pd.Series(match, dtype="int64"),
        "lag_us": pd.Series(lag, dtype="int64"),
    })
    return pd.concat([out_res[["event_id", "match_id", "lag_us"]],
                      out_pend], ignore_index=True)


def _range_part(g: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """All (key, bucket) units of one partition, one merge-cumsum
    pass: each left contributes two query points (t - W exclusive,
    t inclusive); rights sort before queries at equal t; the prefix
    count/sum difference between the two query positions counts
    exactly the same-unit rights in (t-W, t] — both query rows share
    the left's (key, bucket), so no per-unit reset is needed."""
    rights = g[g["flag"] == 0]
    lefts = g[g["flag"] == 1]
    nq = len(lefts)
    if nq == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("event_id", "n_matches",
                                       "sum_cents")})
    lt = lefts["t_us"].to_numpy()
    key = np.concatenate([rights["key"].to_numpy(),
                          lefts["key"].to_numpy(),
                          lefts["key"].to_numpy()])
    bucket = np.concatenate([rights["bucket"].to_numpy(),
                             lefts["bucket"].to_numpy(),
                             lefts["bucket"].to_numpy()])
    t = np.concatenate([rights["t_us"].to_numpy(),
                        lt - window_us, lt])
    nr = len(rights)
    isr = np.zeros(nr + 2 * nq, dtype=np.int64)
    isr[:nr] = 1
    cents = np.zeros(nr + 2 * nq, dtype=np.int64)
    cents[:nr] = rights["cents"].to_numpy()
    qid = np.full(nr + 2 * nq, -1, dtype=np.int64)
    qid[nr:nr + nq] = np.arange(nq)           # lower bound queries
    qid[nr + nq:] = np.arange(nq) + nq        # upper bound queries
    order = np.lexsort((1 - isr, t, bucket, key))
    pn = np.cumsum(isr[order])
    pc = np.cumsum(cents[order])
    qs = qid[order]
    qrows = qs >= 0
    at = np.empty(2 * nq, dtype=np.int64)
    at[qs[qrows]] = pn[qrows]
    ac = np.empty(2 * nq, dtype=np.int64)
    ac[qs[qrows]] = pc[qrows]
    return pd.DataFrame({
        "event_id": pd.Series(lefts["event_id"].to_numpy(), dtype="int64"),
        "n_matches": pd.Series(at[nq:] - at[:nq], dtype="int64"),
        "sum_cents": pd.Series(ac[nq:] - ac[:nq], dtype="int64"),
    })


def windowed_range_join(left_ds, right_ds, window_sec: int,
                        by: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        value_col: str = "value",
                        bucket_sec: int | None = None,
                        num_parts: int = 64):
    """Range (interval) join as a trailing-window aggregate: per left
    event, the count and exact cent-sum of right events in
    (t - window, t].  Single shuffle with boundary replication: a
    right row lands in its own (key, bucket) unit and is replicated
    into the NEXT bucket iff its window can reach it (t > next bucket
    start - window; requires bucket_sec >= window_sec), so every
    (left, right) pair meets in exactly one unit and the kernel is one
    vectorized merge-cumsum — no phase 2, no carry chain.  Values are
    summed as integer cents so distributed order never perturbs the
    float result."""
    if bucket_sec is None:
        bucket_sec = 2 * window_sec
    assert bucket_sec >= window_sec
    window_us = np.int64(window_sec) * 1_000_000
    bucket_us = np.int64(bucket_sec) * 1_000_000

    def _left(batch: pa.Table) -> pa.Table:
        t = _t_us(batch, ts_col)
        n = batch.num_rows
        return pa.table({
            "key": batch.column(by).cast(pa.int64()),
            "bucket": pa.array(t // bucket_us, pa.int64()),
            "t_us": pa.array(t, pa.int64()),
            "flag": pa.array(np.ones(n, np.int8), pa.int8()),
            "event_id": batch.column(id_col).cast(pa.int64()),
            "cents": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def _right(batch: pa.Table) -> pa.Table:
        t = _t_us(batch, ts_col)
        key = batch.column(by).to_numpy().astype(np.int64)
        cents = np.round(batch.column(value_col).to_numpy()
                         * 100.0).astype(np.int64)
        eid = batch.column(id_col).to_numpy().astype(np.int64)
        bucket = t // bucket_us
        rep = t > (bucket + 1) * bucket_us - window_us
        t2 = np.concatenate([t, t[rep]])
        return pa.table({
            "key": pa.array(np.concatenate([key, key[rep]]), pa.int64()),
            "bucket": pa.array(np.concatenate([bucket, bucket[rep] + 1]),
                               pa.int64()),
            "t_us": pa.array(t2, pa.int64()),
            "flag": pa.array(np.zeros(len(t2), np.int8), pa.int8()),
            "event_id": pa.array(np.concatenate([eid, eid[rep]]),
                                 pa.int64()),
            "cents": pa.array(np.concatenate([cents, cents[rep]]),
                              pa.int64()),
        })

    def _part(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy().astype(np.uint64)
        bucket = batch.column("bucket").to_numpy().astype(np.uint64)
        mix = (key * _PART_MIX) ^ bucket
        return batch.append_column(
            "part", pa.array((mix % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()))

    tagged = (left_ds.map_batches(_left, batch_format="pyarrow")
              .union(right_ds.map_batches(_right, batch_format="pyarrow"))
              .map_batches(_part, batch_format="pyarrow"))
    return tagged.groupby("part").map_groups(
        lambda g: _range_part(g.drop(columns=["part"]),
                              int(window_us)),
        batch_format="pandas")


def asof_join_bucketed(left_ds, right_ds, by: str = "user_id",
                       ts_col: str = "ts", id_col: str = "event_id",
                       bucket_sec: int = 6 * 3600, num_parts: int = 64):
    """Skew-proof two-phase as-of join (module docstring); output
    row-identical to ``asof_join_simple``."""
    bucket_us = np.int64(bucket_sec) * 1_000_000

    def _key1(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        bucket = batch.column("t_us").to_numpy() // bucket_us
        mix = (key.astype(np.uint64) * _PART_MIX) ^ bucket.astype(np.uint64)
        return (batch
                .append_column("bucket", pa.array(bucket, pa.int64()))
                .append_column("part", pa.array(
                    (mix % np.uint64(num_parts)).astype(np.int32),
                    pa.int32())))

    tagged = (left_ds.map_batches(
                  lambda b: tag_side(b, 1, by, ts_col, id_col),
                  batch_format="pyarrow")
              .union(right_ds.map_batches(
                  lambda b: tag_side(b, 0, by, ts_col, id_col),
                  batch_format="pyarrow"))
              .map_batches(_key1, batch_format="pyarrow"))

    p1 = (tagged.groupby("part")
          .map_groups(lambda g: _phase1_part(g.drop(columns=["part"])),
                      batch_format="pandas"))

    def _key2(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy().astype(np.uint64)
        return batch.append_column(
            "part", pa.array((key % np.uint64(num_parts)).astype(np.int32),
                             pa.int32()))

    return (p1.map_batches(_key2, batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: _phase2_part(g.drop(columns=["part"])),
                        batch_format="pandas"))

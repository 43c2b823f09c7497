"""Integer log-histogram sketch + two-phase gap extraction: bucket
round-trip and error-bound properties, and bucketed gaps == a simple
per-user diff for any stream.  Oracle parity runs in
test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from geo_ray.stages.quantiles import bucket_rep, log_bucket
from geo_ray.stages.windows import _gap_phase1, _gap_phase2, _PART_MIX


@settings(max_examples=300, deadline=None)
@given(g=st.one_of(st.integers(0, 200),
                   st.integers(0, 2**50),
                   st.builds(lambda e, d: (1 << e) + d,
                             st.integers(4, 49), st.integers(-2, 2))))
def test_bucket_roundtrip_and_error(g):
    g = max(0, g)
    bid = int(log_bucket(np.array([g]))[0])
    rep = int(bucket_rep(np.array([bid]))[0])
    assert rep <= g, (g, bid, rep)
    if g < 16:
        assert rep == g                       # exact small values
    else:
        # bit_length is the exact floor(log2); float math.log2
        # misrounds near 2^k (e.g. bit_length 49 values where
        # math.log2 returns 49.0) — the very pitfall the integer
        # bucketing exists to avoid, so don't assert against it.
        e = g.bit_length() - 1
        assert g - rep < (1 << (e - 4))       # within one sub-bucket
        assert (g - rep) / rep <= 1 / 16 + 1e-12
    # monotone: the next value never gets a smaller bucket
    assert int(log_bucket(np.array([g + 1]))[0]) >= bid


def test_buckets_monotone_dense():
    g = np.arange(1, 1 << 12)
    b = log_bucket(g)
    assert (np.diff(b) >= 0).all()
    assert (bucket_rep(b) <= g).all()


def _simple_gaps(rows):
    """rows: (user, t, event_id, type) -> per-user consecutive gaps
    tagged with the later event's type."""
    df = pd.DataFrame(rows, columns=["user_id", "t_us", "event_id",
                                     "event_type"]) \
        .sort_values(["user_id", "t_us", "event_id"], kind="mergesort")
    out = []
    for _, g in df.groupby("user_id"):
        t = g["t_us"].to_numpy()
        et = g["event_type"].to_numpy()
        for i in range(1, len(g)):
            out.append((et[i], int(t[i] - t[i - 1])))
    return pd.DataFrame(out, columns=["event_type", "gap_us"]) \
        .astype({"event_type": "object", "gap_us": "int64"}) \
        .sort_values(["event_type", "gap_us"]).reset_index(drop=True)


def _bucketed_gaps(rows, bucket_us, num_parts=4):
    df = pd.DataFrame(rows, columns=["user_id", "t_us", "event_id",
                                     "event_type"])
    df["bucket"] = df["t_us"].to_numpy() // bucket_us
    mix = (df["user_id"].to_numpy().astype(np.uint64) * _PART_MIX) \
        ^ df["bucket"].to_numpy().astype(np.uint64)
    df["part"] = (mix % np.uint64(num_parts)).astype(np.int32)
    p1 = pd.concat([_gap_phase1(g.drop(columns=["part"]))
                    for _, g in df.groupby("part")], ignore_index=True)
    p1["part"] = (p1["user_id"].to_numpy().astype(np.uint64)
                  % np.uint64(num_parts)).astype(np.int32)
    out = pd.concat([_gap_phase2(g.drop(columns=["part"]))
                     for _, g in p1.groupby("part")],
                    ignore_index=True)
    return out.sort_values(["event_type", "gap_us"]) \
        .reset_index(drop=True).astype({"gap_us": "int64"})


streams = st.lists(
    st.tuples(st.integers(0, 3),            # user
              st.integers(0, 400),          # t
              st.integers(0, 10**6),        # event id (uniquified below)
              st.sampled_from(["a", "b"])),
    min_size=1, max_size=60)


@settings(max_examples=200, deadline=None)
@given(rows=streams, bucket_us=st.sampled_from([1, 7, 64, 1000]))
def test_bucketed_gaps_equal_simple(rows, bucket_us):
    rows = [(u, t, 2 * i, e) for i, (u, t, _, e) in enumerate(rows)]
    want = _simple_gaps(rows)
    got = _bucketed_gaps(rows, bucket_us)
    pd.testing.assert_frame_equal(got, want)

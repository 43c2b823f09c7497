"""Distributed N-way CellUnion intersection sweep — the SHUF variant
of state/s2intersect.find sketched in SURVEY.md §2.5 (reference
semantics: s2/s2intersect/s2intersect.go Find, O(max(i log i, c))).

Shape (the stages/scan.py two-pass ordered-scan pattern): flatten
every union's cells into (+1 at range_min, -1 at range_max+2) limit
events, range-partition by the sampled event position (all events of
one position land in one partition — the tie invariant the sweep
needs), then

  pass 1: per partition, the per-union NET delta and the partition's
          max position — a P x active-unions summary;
  driver: exclusive prefix of the summaries gives each partition its
          carry-in active multiset and the global boundary
          immediately before it (P-sized state, like prefix_sum_scan);
  pass 2: per partition, the scalar sweep seeded with the carry-in,
          emitting one row per (maximal active subset, covering cell);
  final:  groupby(subset) normalizes each subset's cell list
          (sibling collapse), matching the scalar find() output.

Event positions are BIASED (uint64 pos XOR 2^63, stored as int64) so
the signed sort order equals the uint64 sweep order exactly.  A plain
int64 view is NOT safe here even though no cell interval crosses a
face boundary: a face-3 cell touching the face-3/4 boundary closes at
range_max + 2 == 2^63 + 1, whose raw int64 view goes NEGATIVE and
would sort before its own open event (found by the randomized
oracle test).

Partitioning assumption (documented per the brief): correctness
needs only that equal event positions co-locate; a union with many
cells at one position loads a single partition, never breaks the
result."""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import cellunion as cu
from .scan import sample_order_bounds

_MASK = (1 << 64) - 1


def _to_u64(v: int) -> int:
    return v & _MASK


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


_BIAS = np.uint64(1 << 63)


def _unbias(v: int) -> int:
    """Biased int64 sort key -> the real uint64 position."""
    return (v & _MASK) ^ (1 << 63)


def _events_table(batch: pa.Table) -> pa.Table:
    idx = batch.column("idx").to_numpy().astype(np.int64)
    cells = batch.column("cell").to_numpy().view(np.uint64)
    lsb = cells & (~cells + np.uint64(1))
    lo = ((cells - (lsb - np.uint64(1))) ^ _BIAS).view(np.int64)
    hi = ((cells + (lsb - np.uint64(1)) + np.uint64(2))
          ^ _BIAS).view(np.int64)
    n = len(cells)
    return pa.table({
        "pos": pa.array(np.concatenate([lo, hi]), pa.int64()),
        "delta": pa.array(np.concatenate(
            [np.ones(n, np.int64), -np.ones(n, np.int64)]), pa.int64()),
        "idx": pa.array(np.concatenate([idx, idx]), pa.int64()),
    })


def find_distributed(unions_ds, *, num_parts: int = 32):
    """``unions_ds``: rows (idx: int64 union index, cell: int64 view
    of a valid uint64 cell id).  Returns a Dataset of rows
    (members: str "i,j,..." ascending, cell: int64 view) — one row
    per covering cell of each 2+-way intersection region, normalized
    per subset; collectively equal to state/s2intersect.find."""
    import ray

    events = unions_ds.map_batches(_events_table,
                                   batch_format="pyarrow")
    bounds = sample_order_bounds(events, "pos", num_parts)

    def _part(batch: pa.Table) -> pa.Table:
        v = batch.column("pos").to_numpy().astype(np.int64)
        p = np.searchsorted(bounds, v, side="right").astype(np.int32)
        return batch.append_column("__p", pa.array(p, pa.int32()))

    parted = events.map_batches(_part,
                                batch_format="pyarrow").materialize()

    # pass 1: per-partition (idx, net delta) + max pos; the sentinel
    # idx -1 row carries max_pos even when all nets cancel
    def _summary(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["__p"].iloc[0])
        net = g.groupby("idx", sort=False)["delta"].sum().reset_index()
        net = net[net["delta"] != 0]
        return pd.DataFrame({
            "__p": [p] * (len(net) + 1),
            "idx": [-1] + net["idx"].tolist(),
            "net": [0] + net["delta"].tolist(),
            "max_pos": [int(g["pos"].max())] * (len(net) + 1)})

    summ = (parted.groupby("__p")
            .map_groups(_summary, batch_format="pandas").to_pandas())

    # driver: exclusive prefixes (P-sized state)
    carry: Dict[int, Dict[int, int]] = {}
    prev_boundary: Dict[int, int] = {}
    active: Dict[int, int] = {}
    last_pos = None
    for p in sorted(summ["__p"].unique()):
        carry[int(p)] = dict(active)
        if last_pos is not None:
            prev_boundary[int(p)] = last_pos
        rows = summ[summ["__p"] == p]
        for idx, net in zip(rows["idx"], rows["net"]):
            if idx < 0:
                continue
            c = active.get(int(idx), 0) + int(net)
            if c:
                active[int(idx)] = c
            else:
                active.pop(int(idx), None)
        last_pos = int(rows["max_pos"].iloc[0])
    ref = ray.put((carry, prev_boundary))

    # pass 2: seeded scalar sweep per partition
    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        carry_l, prevb_l = ray.get(ref)
        p = int(g["__p"].iloc[0])
        act: Dict[int, int] = dict(carry_l.get(p, {}))
        prev = prevb_l.get(p)
        g = g.sort_values(["pos", "idx"], kind="mergesort")
        pos = g["pos"].to_numpy(np.int64)
        delta = g["delta"].to_numpy(np.int64)
        idxs = g["idx"].to_numpy(np.int64)
        out_m: List[str] = []
        out_c: List[int] = []
        i, n = 0, len(pos)
        while i < n:
            b = int(pos[i])
            if prev is not None and b > prev:
                live = sorted(k for k, v in act.items() if v > 0)
                if len(live) >= 2:
                    key = ",".join(map(str, live))
                    for ci in cu.from_range(_unbias(prev), _unbias(b)):
                        out_m.append(key)
                        out_c.append(_to_i64(ci))
            while i < n and pos[i] == b:
                k = int(idxs[i])
                c = act.get(k, 0) + int(delta[i])
                if c:
                    act[k] = c
                else:
                    act.pop(k, None)
                i += 1
            prev = b
        return pd.DataFrame({"members": pd.array(out_m, dtype=str),
                             "cell": np.array(out_c, np.int64)})

    regions = (parted.groupby("__p")
               .map_groups(_sweep, batch_format="pandas"))

    # final: per-subset normalization (sibling collapse across
    # partition-split regions), matching the scalar find()
    def _norm(g: pd.DataFrame) -> pd.DataFrame:
        cells = cu.normalize([_to_u64(int(c)) for c in g["cell"]])
        return pd.DataFrame({
            "members": pd.array([g["members"].iloc[0]] * len(cells),
                                dtype=str),
            "cell": np.array([_to_i64(c) for c in cells], np.int64)})

    return regions.groupby("members").map_groups(
        _norm, batch_format="pandas")

"""Distributed grid DBSCAN over S2-celled points on the sphere.

Density-based spatial clustering — the standard "find dense places /
drop GPS noise" operator a geospatial pipeline needs next to kNN and
radius joins (Ester et al., KDD'96).  The contract here is the
deterministic variant:

  core      |N_eps(p)| + 1 >= min_pts   (eps-ball neighbor count,
                                         self included)
  cluster   connected component of CORE points under eps-adjacency;
            cluster id = min point id of the component's cores
  border    non-core point with >= 1 core within eps; it takes the
            MINIMUM cluster id over those cores (classic DBSCAN is
            first-scan-order-dependent here; min makes the output a
            pure function of the input, so it is SQL-mirrorable)
  noise     everything else, cluster = -1

Scale shape (no driver state, no all-pairs):

  E1  one groupby(cell) pass at level L with 8-ring copies — chosen
      so eps_angle <= MIN_WIDTH(L), the same ring-coverage guard the
      kNN stages use (every eps-ball lives inside the 3x3 ring).
      Each point's degree is EXACT inside its own group (all of its
      eps-neighbors are present), so core flags need no merge; the
      group also emits every directed eps-pair (i -> j) exactly once.
  E2  co-partition pairs by hash(j) with the flag rows to attach j's
      core flag: core-core rows become CC edges, (non-core -> core)
      rows become border candidates.
  E3  connected components over the core-core edges
      (stages/cc.connected_components — contraction + hash-min +
      pointer jumping; isolated cores ride in as nodes_ds).
  E4  co-partition border candidates by hash(j) with the CC labels to
      swap the core endpoint for its cluster id.
  E5  co-partition by hash(i) with the non-core flag rows: min
      cluster id per border point; flags with no candidate are noise.

Every exchange moves only int64 id/flag rows; per-group pairwise work
is bounded by the 3x3-ring population (dense cells are the documented
cap — the measured-hot-cell descend of stages/knn.all_knn does not
compose with the eps-ball coverage guard, so a pathological cell pays
its own quadratic locally rather than losing exactness).

Reference semantics analog: the eps-adjacency probe is the same
chord²-threshold predicate as s2/edge_query.go's DistanceLimit
(exclusive there, inclusive here) over s2/cellid.go AllNeighbors
candidate rings.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import cellid as cid
from ..functions.metric import MIN_WIDTH
from .sample import _splitmix


def level_for_eps_chord2(eps_chord2: float) -> int:
    """Largest cell level whose MIN_WIDTH still covers the eps ball
    (ring-coverage guard: all eps-neighbors inside the 3x3 ring)."""
    eps_angle = 2.0 * math.asin(min(1.0, math.sqrt(eps_chord2) / 2.0))
    lvl = 0
    while lvl < 30 and MIN_WIDTH.value(lvl + 1) >= eps_angle:
        lvl += 1
    return lvl


def _part(ids: np.ndarray, nb: int) -> np.ndarray:
    return (_splitmix(ids.astype(np.int64).view(np.uint64))
            % np.uint64(nb)).astype(np.int32)


def _finish_local(df: pd.DataFrame):
    """E2-E5 on one in-memory (kind, i, i_core, j) frame: flag lookup,
    core-core CC (the same vectorized hash-min + pointer-doubling loop
    as stages/cc._contract), border min-label, noise fill.  Used by
    the measured driver-merge fast path; proven identical to the
    distributed exchanges in tests/test_dbscan.py."""
    kind = df["kind"].to_numpy().astype(np.int8)
    fi = df["i"].to_numpy(np.int64)[kind == 0]
    fc = df["i_core"].to_numpy().astype(np.int8)[kind == 0]
    pi = df["i"].to_numpy(np.int64)[kind == 1]
    pic = df["i_core"].to_numpy().astype(np.int8)[kind == 1]
    pj = df["j"].to_numpy(np.int64)[kind == 1]
    o = np.argsort(fi, kind="mergesort")
    fi, fc = fi[o], fc[o]
    jc = fc[np.searchsorted(fi, pj)] if len(pj) else \
        np.zeros(0, np.int8)
    ee = (pic == 1) & (jc == 1)
    bb = (pic == 0) & (jc == 1)
    cores = fi[fc == 1]
    ia = np.searchsorted(cores, pi[ee])
    ib = np.searchsorted(cores, pj[ee])
    lab = np.arange(len(cores), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, ia, lab[ib])
        np.minimum.at(new, ib, lab[ia])
        new = new[new]
        new = new[new]
        if np.array_equal(new, lab):
            break
        lab = new
    rep_core = cores[lab]
    bi_ids, bj = pi[bb], pj[bb]
    rep_j = rep_core[np.searchsorted(cores, bj)] if len(bj) else \
        np.zeros(0, np.int64)
    ub, inv = np.unique(bi_ids, return_inverse=True)
    mn = np.full(len(ub), np.iinfo(np.int64).max)
    if len(ub):
        np.minimum.at(mn, inv, rep_j)
    nc = fi[fc == 0]
    cl = np.full(len(nc), -1, np.int64)
    if len(ub) and len(nc):
        pos = np.searchsorted(ub, nc)
        hit = (pos < len(ub)) & (ub[np.minimum(pos, len(ub) - 1)] == nc)
        cl[hit] = mn[pos[hit]]
    return pa.table({
        "i": pa.array(np.concatenate([cores, nc]), pa.int64()),
        "cluster": pa.array(np.concatenate([rep_core, cl]), pa.int64()),
        "is_core": pa.array(np.concatenate(
            [np.ones(len(cores), np.int8), np.zeros(len(nc), np.int8)]),
            pa.int8()),
    })


def dbscan(points_ds, eps_chord2: float, min_pts: int, *,
           id_col: str = "id", level: int = None,
           num_buckets: int = 64,
           driver_merge_rows: int = 2_000_000) -> Tuple["object", dict]:
    """points_ds (id_col, x, y, z, cell_id uint64 leaf) ->
    (Dataset (id, cluster, is_core int8), info).  cluster = -1 marks
    noise.

    Plan selection is MEASURED: E1's flag+pair table is materialized
    either way (two downstream consumers); when its row count fits
    ``driver_merge_rows``, exchanges E2-E5 (each a Ray groupby
    barrier costing ~0.5-1 s at 32 CPUs regardless of volume) are
    replaced by one bounded fetch + the identical vectorized kernel
    on the driver.  ``driver_merge_rows=0`` forces the distributed
    plan (exercised against the fast path in tests)."""
    from .cc import connected_components

    if level is None:
        level = level_for_eps_chord2(eps_chord2)
    eps_angle = 2.0 * math.asin(min(1.0, math.sqrt(eps_chord2) / 2.0))
    if MIN_WIDTH.value(level) < eps_angle:
        raise ValueError(
            f"ring coverage guard: eps angle {eps_angle:.6f} exceeds "
            f"MIN_WIDTH({level}) = {MIN_WIDTH.value(level):.6f}")
    eps2 = float(eps_chord2)
    nb = int(num_buckets)

    # ---- E1: cell-grouped exact degrees + directed eps-pairs --------
    def _emit(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        z = batch.column("z").to_numpy()
        own = cid.parent_v(batch.column("cell_id").to_numpy()
                           .astype(np.uint64), level)
        ring = np.sort(cid.all_neighbors_same_level_v(own), axis=1)
        # the 8-ring may repeat a cell near face corners (AllNeighbors
        # semantics) — a duplicate copy would double-count degrees
        keep = np.ones(ring.shape, bool)
        keep[:, 1:] = ring[:, 1:] != ring[:, :-1]
        n = len(ids)
        cells = np.concatenate([own[:, None], ring], axis=1)
        role = np.zeros((n, 9), np.int8)
        role[:, 1:] = 1
        mask = np.concatenate([np.ones((n, 1), bool), keep],
                              axis=1).reshape(-1)
        rep = np.repeat(np.arange(n), 9)[mask]
        return pa.table({
            "cell": pa.array(cells.reshape(-1)[mask].view(np.int64),
                             pa.int64()),
            "role": pa.array(role.reshape(-1)[mask], pa.int8()),
            "id": pa.array(ids[rep], pa.int64()),
            "x": pa.array(x[rep], pa.float64()),
            "y": pa.array(y[rep], pa.float64()),
            "z": pa.array(z[rep], pa.float64()),
        })

    def _group(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["id"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        z = g["z"].to_numpy(np.float64)
        base = (g["role"].to_numpy(np.int8) == 0)
        bi = np.nonzero(base)[0]
        if not len(bi):
            return pd.DataFrame({"kind": pd.Series(dtype="int8"),
                                 "i": pd.Series(dtype="int64"),
                                 "i_core": pd.Series(dtype="int8"),
                                 "j": pd.Series(dtype="int64")})
        # same scalar expression as the SQL mirror: dx*dx+dy*dy+dz*dz
        dx = x[bi, None] - x[None, :]
        dy = y[bi, None] - y[None, :]
        dz = z[bi, None] - z[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        hit = (d2 <= eps2) & (ids[bi, None] != ids[None, :])
        deg = hit.sum(axis=1)
        core = ((deg + 1) >= min_pts).astype(np.int8)
        pi, pj = np.nonzero(hit)
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(len(bi), np.int8),
                                    np.ones(len(pi), np.int8)]),
            "i": np.concatenate([ids[bi], ids[bi[pi]]]),
            "i_core": np.concatenate([core, core[pi]]).astype(np.int8),
            "j": np.concatenate([np.full(len(bi), -1, np.int64),
                                 ids[pj]]),
        })

    stepA = (points_ds.map_batches(_emit, batch_format="pyarrow")
             .groupby("cell")
             .map_groups(lambda g: _group(g.drop(columns=["cell"])),
                         batch_format="pandas")).materialize()
    if stepA.count() <= driver_merge_rows:
        import ray.data as rd
        out = rd.from_arrow(_finish_local(stepA.to_pandas()))
        return out, {"level": level, "cc_rounds": 0,
                     "num_buckets": nb, "driver_merged": True}
    flags = stepA.filter(expr="kind == 0")       # (i=id, i_core)
    pairs = stepA.filter(expr="kind == 1")       # (i, i_core, j)

    # ---- E2: attach j's core flag ------------------------------------
    def _tag_by_j(batch: pa.Table) -> pa.Table:
        k = batch.column("kind").to_numpy()
        key = np.where(k == 0, batch.column("i").to_numpy(),
                       batch.column("j").to_numpy()).astype(np.int64)
        return batch.append_column(
            "part", pa.array(_part(key, nb), pa.int32()))

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        f = g[g["kind"] == 0]
        p = g[g["kind"] == 1]
        if not len(p):
            return pd.DataFrame({"kind": pd.Series(dtype="int8"),
                                 "a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        jcore = p["j"].map(dict(zip(f["i"].to_numpy(np.int64),
                                    f["i_core"].to_numpy(np.int8))))
        jc = jcore.fillna(0).to_numpy(np.int8)
        ic = p["i_core"].to_numpy(np.int8)
        i = p["i"].to_numpy(np.int64)
        j = p["j"].to_numpy(np.int64)
        ee = (ic == 1) & (jc == 1)
        bb = (ic == 0) & (jc == 1)
        return pd.DataFrame({
            "kind": np.concatenate([np.full(ee.sum(), 2, np.int8),
                                    np.full(bb.sum(), 3, np.int8)]),
            "a": np.concatenate([i[ee], i[bb]]),
            "b": np.concatenate([j[ee], j[bb]]),
        })

    e2 = (flags.union(pairs)
          .map_batches(_tag_by_j, batch_format="pyarrow")
          .groupby("part")
          .map_groups(lambda g: _resolve(g.drop(columns=["part"])),
                      batch_format="pandas")).materialize()
    core_edges = e2.filter(expr="kind == 2").select_columns(["a", "b"])
    border_cands = e2.filter(expr="kind == 3")   # (a=i non-core, b=j core)

    # ---- E3: components over core-core edges -------------------------
    cores = flags.filter(expr="i_core == 1") \
        .map_batches(lambda b: pa.table({"node": b.column("i")}),
                     batch_format="pyarrow")
    cc_out, info = connected_components(core_edges, nodes_ds=cores,
                                        node_cols=("a", "b"),
                                        num_parts=nb)

    # ---- E4: swap border candidates' core endpoint for its label -----
    lab4 = cc_out.map_batches(
        lambda b: pa.table({"kind": pa.array(np.zeros(len(b), np.int8)),
                            "a": b.column("node").cast(pa.int64()),
                            "b": b.column("rep").cast(pa.int64())}),
        batch_format="pyarrow")
    cand4 = border_cands.map_batches(
        lambda b: pa.table({"kind": pa.array(np.ones(len(b), np.int8)),
                            "a": b.column("a").cast(pa.int64()),
                            "b": b.column("b").cast(pa.int64())}),
        batch_format="pyarrow")

    def _swap(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0]
        cand = g[g["kind"] == 1]
        if not len(cand):
            return pd.DataFrame({"i": pd.Series(dtype="int64"),
                                 "rep": pd.Series(dtype="int64")})
        rep = cand["b"].map(dict(zip(lab["a"].to_numpy(np.int64),
                                     lab["b"].to_numpy(np.int64))))
        return pd.DataFrame({"i": cand["a"].to_numpy(np.int64),
                             "rep": rep.to_numpy(np.int64)})

    def _tag4(batch: pa.Table) -> pa.Table:
        # label rows key on the core node (a); candidate rows on j (b)
        key = np.where(batch.column("kind").to_numpy() == 0,
                       batch.column("a").to_numpy(),
                       batch.column("b").to_numpy()).astype(np.int64)
        return batch.append_column(
            "part", pa.array(_part(key, nb), pa.int32()))

    e4 = (lab4.union(cand4)
          .map_batches(_tag4, batch_format="pyarrow")
          .groupby("part")
          .map_groups(lambda g: _swap(g.drop(columns=["part"])),
                      batch_format="pandas"))

    # ---- E5: min label per border point; leftovers are noise ---------
    noncore = flags.filter(expr="i_core == 0").map_batches(
        lambda b: pa.table({"kind": pa.array(np.zeros(len(b), np.int8)),
                            "i": b.column("i").cast(pa.int64()),
                            "rep": pa.array(np.full(len(b), -1,
                                                    np.int64))}),
        batch_format="pyarrow")
    cands5 = e4.map_batches(
        lambda b: pa.table({"kind": pa.array(np.ones(len(b), np.int8)),
                            "i": b.column("i").cast(pa.int64()),
                            "rep": b.column("rep").cast(pa.int64())}),
        batch_format="pyarrow")

    def _min_label(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["kind"] == 0]
        cand = g[g["kind"] == 1]
        out = base[["i"]].copy()
        if len(cand):
            m = cand.groupby("i", sort=False)["rep"].min()
            out["cluster"] = out["i"].map(m).fillna(-1).astype(np.int64)
        else:
            out["cluster"] = np.full(len(out), -1, np.int64)
        out["is_core"] = np.zeros(len(out), np.int8)
        return out

    e5 = (noncore.union(cands5)
          .map_batches(lambda b: b.append_column(
              "part", pa.array(_part(
                  b.column("i").to_numpy().astype(np.int64), nb),
                  pa.int32())), batch_format="pyarrow")
          .groupby("part")
          .map_groups(lambda g: _min_label(g.drop(columns=["part"])),
                      batch_format="pandas"))

    core_rows = cc_out.map_batches(
        lambda b: pa.table({"i": b.column("node").cast(pa.int64()),
                            "cluster": b.column("rep").cast(pa.int64()),
                            "is_core": pa.array(np.ones(len(b), np.int8))}),
        batch_format="pyarrow")

    out = core_rows.union(e5)
    return out, {"level": level, "cc_rounds": info.get("rounds"),
                 "num_buckets": nb}

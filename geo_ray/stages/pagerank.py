"""Integer fixed-point PageRank over a directed edge dataset, in two
execution shapes with BIT-IDENTICAL int64 outputs.

Arithmetic contract (cross-engine exact, mirrored by the SQL oracle
in pipelines/queries.py): rank0 = SCALE per node; each iteration
sends ``rank // deg`` (floor) along every directed edge and sets
``rank' = base + (DAMP_NUM * inbound) // DAMP_DEN`` where
``base = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN``; nodes with no
inbound edges get ``base``.

* ``pagerank_broadcast`` — node state ships per iteration via one
  ``ray.put`` of PRE-SORTED (keys, contribution) arrays, so the
  per-batch work is a single searchsorted + gather (no per-batch
  state rebuild).  Inbound sums pre-aggregate per batch (exact int64
  sort + reduceat) and merge driver-side through
  ``agg.driver_merged_sum`` — ZERO AllToAll barriers per iteration
  (a Ray groupby barrier costs ~0.5-1 s at 32 CPUs regardless of
  volume; the driver already holds node-sized state by this
  variant's contract, so the merge adds no new ceiling).  Right
  while node state fits a worker heap.

* ``pagerank_bucketed`` — rank/degree live as a DATASET
  co-partitioned with the edges by the deterministic hash bucket of
  the node id (stages/bucket_join.py); each iteration is two
  bucketed exchanges (state|x|edges by src -> per-dst partials;
  partials|x|state by dst -> new state) and the driver never holds
  node- or edge-sized state.  This is the 10^9-node shape.

Inputs: ``edges_ds`` with int64 columns (src, dst) — every directed
edge exactly once; ``nodes`` / ``nodes_ds`` — the node universe
(isolated nodes keep rank = base after one iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_sum, driver_merged_sum
from .bucket_join import bucketed_join

SCALE = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN


def _group_sum_int64(keys: np.ndarray, vals: np.ndarray):
    """Exact int64 per-key sums via sort + reduceat (no float64
    bincount rounding, no Python loop).  Returns (sorted unique keys,
    sums)."""
    if len(keys) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], ks[1:] != ks[:-1])))
    return ks[starts], np.add.reduceat(vals[order], starts)


def pagerank_broadcast(edges_ds, nodes: np.ndarray, iters: int,
                       *, max_partial_rows: int = 16_000_000
                       ) -> pa.Table:
    """Broadcast-state shape.  ``nodes`` is the sorted unique int64
    node array (node-sized driver state — the documented ceiling of
    this variant; ``max_partial_rows`` guards the matching bound on
    the per-batch partials the driver merges).  Returns a
    (user_id, rank_units) arrow table."""
    import ray

    nodes = np.sort(np.unique(nodes.astype(np.int64)))

    def _partial_deg(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy().astype(np.int64)
        u, c = _group_sum_int64(s, np.ones(len(s), np.int64))
        return pa.table({"src": pa.array(u, pa.int64()),
                         "one": pa.array(c, pa.int64())})

    deg_df = driver_merged_sum(
        edges_ds.map_batches(_partial_deg, batch_format="pyarrow"),
        ["src"], ["one"], max_rows=max_partial_rows)
    # degree keys/values sorted ONCE; every iteration reuses them
    order = np.argsort(deg_df["src"].to_numpy())
    deg_keys = deg_df["src"].to_numpy().astype(np.int64)[order]
    deg_vals = deg_df["one"].to_numpy().astype(np.int64)[order]
    deg_pos = np.searchsorted(nodes, deg_keys)

    rank = np.full(len(nodes), SCALE, np.int64)
    for _ in range(iters):
        # pre-sorted (key, contribution) payload, built once per
        # iteration — per-batch cost is searchsorted + gather only
        contrib = rank[deg_pos] // deg_vals
        ref = ray.put((deg_keys, contrib))

        def _contrib(batch: pa.Table) -> pa.Table:
            ks, cv = ray.get(ref)
            s = batch.column("src").to_numpy().astype(np.int64)
            d = batch.column("dst").to_numpy().astype(np.int64)
            u, sums = _group_sum_int64(
                d, cv[np.searchsorted(ks, s)])
            return pa.table({"dst": pa.array(u, pa.int64()),
                             "c": pa.array(sums, pa.int64())})

        inbound = driver_merged_sum(
            edges_ds.map_batches(_contrib, batch_format="pyarrow"),
            ["dst"], ["c"], max_rows=max_partial_rows)
        nxt = np.full(len(nodes), BASE, np.int64)
        dpos = np.searchsorted(nodes, inbound["dst"].to_numpy()
                               .astype(np.int64))
        nxt[dpos] = BASE + (DAMP_NUM * inbound["c"].to_numpy()
                            .astype(np.int64)) // DAMP_DEN
        rank = nxt

    return pa.table({"user_id": pa.array(nodes, pa.int64()),
                     "rank_units": pa.array(rank, pa.int64())})


def pagerank_bucketed(edges_ds, nodes_ds, iters: int,
                      *, num_buckets: int = 64,
                      node_col: str = "user_id"):
    """Co-partitioned-state shape: no ray.put, no to_pandas, no
    driver-side node or edge structures — state is a
    (user_id, rank, deg) dataset that meets the edges in hash
    buckets.  Individual contribution values must stay below 2^53
    (they pass through the pandas group body as float64 before the
    int64 cast); at SCALE = 1e6 fixed-point that allows ~9e9-node
    inbound sums per single edge value — far past any real rank.
    Returns the (user_id, rank_units) dataset."""
    edges = edges_ds.map_batches(
        lambda b: pa.table({
            "k": b.column("src").cast(pa.int64()),
            "dst": b.column("dst").cast(pa.int64()),
            "rank": pa.nulls(len(b), pa.int64()),
            "deg": pa.nulls(len(b), pa.int64()),
        }), batch_format="pyarrow").materialize()

    # initial state: deg from a bucketed count join against the node
    # universe; rank starts at SCALE
    deg = bucketed_sum(
        edges_ds.map_batches(
            lambda b: pa.table({
                "src": b.column("src"),
                "one": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow"),
        ["src"], ["one"], n_buckets=num_buckets)

    def _node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column(node_col).cast(pa.int64()),
            "c": pa.nulls(len(batch), pa.int64()),
        })

    def _deg_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column("src").cast(pa.int64()),
            "c": batch.column("one").cast(pa.int64()),
        })

    def _init_state(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g.loc[g["c"].isna(), "k"].to_numpy(np.int64)
        dmap = g[g["c"].notna()].set_index("k")["c"]
        deg_v = pd.Series(nodes).map(dmap).fillna(0) \
            .to_numpy(np.float64).astype(np.int64)
        return pd.DataFrame({
            "k": nodes,
            "rank": np.full(len(nodes), SCALE, np.int64),
            "deg": deg_v})

    state = bucketed_join(
        [nodes_ds.map_batches(_node_rows, batch_format="pyarrow"),
         deg.map_batches(_deg_rows, batch_format="pyarrow")],
        "k", _init_state, num_buckets=num_buckets).materialize()

    def _state_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "k": batch.column("k").cast(pa.int64()),
            "dst": pa.nulls(len(batch), pa.int64()),
            "rank": batch.column("rank").cast(pa.int64()),
            "deg": batch.column("deg").cast(pa.int64()),
        })

    def _contrib(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["dst"].isna()].set_index("k")
        ed = g[g["dst"].notna()]
        rk = ed["k"].map(st["rank"]).to_numpy(np.float64) \
            .astype(np.int64)
        dg = ed["k"].map(st["deg"]).to_numpy(np.float64) \
            .astype(np.int64)
        out = pd.DataFrame({
            "k": ed["dst"].to_numpy(np.float64).astype(np.int64),
            "c": rk // dg})
        return out.groupby("k", sort=False, as_index=False).sum()

    def _contrib_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "k": batch.column("k").cast(pa.int64()),
            "c": batch.column("c").cast(pa.int64()),
            "rank": pa.nulls(n, pa.int64()),
            "deg": pa.nulls(n, pa.int64()),
        })

    def _update(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["rank"].notna()]
        inc = g[g["rank"].isna()]
        if len(inc):
            # int64 before the cross-bucket merge: float64 partial
            # sums would round past 2^53
            inb = pd.DataFrame({
                "k": inc["k"].to_numpy(np.int64),
                "c": inc["c"].to_numpy(np.float64).astype(np.int64),
            }).groupby("k")["c"].sum()
        else:
            inb = None
        nodes = st["k"].to_numpy(np.int64)
        c = (st["k"].map(inb) if inb is not None
             else pd.Series(np.nan, index=st.index))
        has = c.notna().to_numpy()
        rank = np.full(len(nodes), BASE, np.int64)
        rank[has] = BASE + (DAMP_NUM * c.to_numpy(np.float64)[has]
                            .astype(np.int64)) // DAMP_DEN
        return pd.DataFrame({
            "k": nodes, "rank": rank,
            "deg": st["deg"].to_numpy(np.int64)})

    for _ in range(iters):
        partials = bucketed_join(
            [state.map_batches(_state_rows, batch_format="pyarrow"),
             edges],
            "k", _contrib, num_buckets=num_buckets)
        state = bucketed_join(
            [state.map_batches(
                lambda b: pa.table({
                    "k": b.column("k").cast(pa.int64()),
                    "c": pa.nulls(len(b), pa.int64()),
                    "rank": b.column("rank").cast(pa.int64()),
                    "deg": b.column("deg").cast(pa.int64()),
                }), batch_format="pyarrow"),
             partials.map_batches(_contrib_rows,
                                  batch_format="pyarrow")],
            "k", _update, num_buckets=num_buckets).materialize()

    return state.map_batches(
        lambda b: pa.table({"user_id": b.column("k"),
                            "rank_units": b.column("rank")}),
        batch_format="pyarrow")


def hits_broadcast(edges_ds, nodes: np.ndarray, iters: int,
                   *, max_partial_rows: int = 16_000_000) -> pa.Table:
    """Integer fixed-point HITS (hubs and authorities, Kleinberg) over
    a DIRECTED distinct-edge dataset, broadcast-state shape with the
    same arithmetic contract discipline as :func:`pagerank_broadcast`
    so a SQL oracle reproduces it bit-for-bit:

      hub0 = SCALE per node;
      auth_i  = sum over edges j->i of hub_j,  then normalize
                auth = auth * SCALE // max(auth)   (skip if max = 0);
      hub_i   = sum over edges i->j of auth_j, then normalize the
                same way;
      repeat ``iters`` times.

    All sums are exact int64 (sort + reduceat partials merged via
    driver_merged_sum, zero AllToAll barriers per iteration); the
    normalized scores stay in [0, SCALE] so the per-iteration raw
    sums are bounded by SCALE x max-degree (document: exactness holds
    while that product stays under 2^63, same contract as every
    cents rollup).  Node-sized pre-sorted arrays ship once per
    half-iteration via ray.put; per-batch work is searchsorted +
    gather + one reduceat.  Returns (user_id, hub_units, auth_units).
    """
    import ray

    nodes = np.sort(np.unique(nodes.astype(np.int64)))
    hub = np.full(len(nodes), SCALE, np.int64)
    auth = np.zeros(len(nodes), np.int64)

    def _half(score_ref, from_col: str, to_col: str) -> np.ndarray:
        def _partial(batch: pa.Table) -> pa.Table:
            ks, sv = ray.get(score_ref)
            f = batch.column(from_col).to_numpy().astype(np.int64)
            t = batch.column(to_col).to_numpy().astype(np.int64)
            u, sums = _group_sum_int64(t, sv[np.searchsorted(ks, f)])
            return pa.table({"k": pa.array(u, pa.int64()),
                             "s": pa.array(sums, pa.int64())})

        merged = driver_merged_sum(
            edges_ds.map_batches(_partial, batch_format="pyarrow"),
            ["k"], ["s"], max_rows=max_partial_rows)
        out = np.zeros(len(nodes), np.int64)
        pos = np.searchsorted(nodes, merged["k"].to_numpy()
                              .astype(np.int64))
        out[pos] = merged["s"].to_numpy().astype(np.int64)
        m = out.max() if len(out) else 0
        if m > 0:
            out = out * SCALE // m
        return out

    for _ in range(iters):
        ref_h = ray.put((nodes, hub))
        auth = _half(ref_h, "src", "dst")
        ref_a = ray.put((nodes, auth))
        hub = _half(ref_a, "dst", "src")

    return pa.table({"user_id": pa.array(nodes, pa.int64()),
                     "hub_units": pa.array(hub, pa.int64()),
                     "auth_units": pa.array(auth, pa.int64())})


def hits_bucketed(edges_ds, nodes_ds, iters: int,
                  *, num_buckets: int = 64,
                  node_col: str = "user_id"):
    """Co-partitioned-state HITS, bit-identical to
    :func:`hits_broadcast` (the pagerank_bucketed counterpart for the
    10^9-node case): (user_id, hub, auth) lives as a dataset that
    meets the edges in hash buckets; each half-iteration is one
    bucketed gather-and-sum exchange plus a state update join.  The
    only driver state per half-iteration is the ONE int64
    normalization maximum (a bounded partial-max fetch) — never a
    node- or edge-sized structure.  Contribution values pass through
    pandas float64 before the int64 cast, so per-edge values must
    stay below 2^53 (same documented bound as pagerank_bucketed).
    Returns the (user_id, hub_units, auth_units) dataset."""
    from .bucket_join import bucketed_join

    def _edge_rows(from_col, to_col):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b.column(from_col).cast(pa.int64()),
                "to": b.column(to_col).cast(pa.int64()),
                "s": pa.nulls(len(b), pa.int64()),
            })
        return _f

    e_by_src = edges_ds.map_batches(_edge_rows("src", "dst"),
                                    batch_format="pyarrow") \
        .materialize()
    e_by_dst = edges_ds.map_batches(_edge_rows("dst", "src"),
                                    batch_format="pyarrow") \
        .materialize()

    state = nodes_ds.map_batches(
        lambda b: pa.table({
            "k": b.column(node_col).cast(pa.int64()),
            "hub": pa.array(np.full(len(b), SCALE, np.int64)),
            "auth": pa.array(np.zeros(len(b), np.int64)),
        }), batch_format="pyarrow").materialize()

    def _half(state, edges, score_col, out_col):
        # state(score) |x| edges by k -> (to, c) partials, exact
        # int64 per-bucket sums, then one more bucketed_sum keyed to
        def _sr(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b.column("k").cast(pa.int64()),
                "to": pa.nulls(len(b), pa.int64()),
                "s": b.column(score_col).cast(pa.int64()),
            })

        def _resolve(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["to"].isna()].set_index("k")["s"]
            ed = g[g["to"].notna()]
            sv = ed["k"].map(st).to_numpy(np.float64).astype(np.int64)
            out = pd.DataFrame({
                "to": ed["to"].to_numpy(np.float64).astype(np.int64),
                "c": sv})
            return out.groupby("to", sort=False, as_index=False).sum()

        partials = bucketed_join(
            [state.map_batches(_sr, batch_format="pyarrow"), edges],
            "k", _resolve, num_buckets=num_buckets)

        # the state join merges each key's partials itself (all rows
        # for key k land in k's bucket), so no intermediate
        # bucketed_sum exchange is needed; the state stores the RAW
        # merged inbound and normalization becomes one max reduce +
        # one stateless map — 3 barriers per half instead of 5
        # (measured 73s -> 46s on the 1500-node synthetic)
        def _upd_raw(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["c"].isna()]
            inc = g[g["c"].notna()]
            if len(inc):
                imap = pd.DataFrame({
                    "k": inc["k"].to_numpy(np.int64),
                    "c": inc["c"].to_numpy(np.float64)
                    .astype(np.int64)}).groupby("k")["c"].sum()
                cv = st["k"].map(imap)
            else:
                cv = pd.Series(np.nan, index=st.index)
            raw = cv.fillna(0).to_numpy(np.float64).astype(np.int64)
            out = pd.DataFrame({
                "k": st["k"].to_numpy(np.int64),
                "hub": st["hub"].to_numpy(np.int64),
                "auth": st["auth"].to_numpy(np.int64)})
            out[out_col] = raw
            return out

        def _full_state_rows(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b.column("k").cast(pa.int64()),
                "c": pa.nulls(len(b), pa.int64()),
                "hub": b.column("hub").cast(pa.int64()),
                "auth": b.column("auth").cast(pa.int64()),
            })

        def _inb_rows(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table({
                "k": b.column("to").cast(pa.int64()),
                "c": b.column("c").cast(pa.int64()),
                "hub": pa.nulls(n, pa.int64()),
                "auth": pa.nulls(n, pa.int64()),
            })

        raw_state = bucketed_join(
            [state.map_batches(_full_state_rows,
                               batch_format="pyarrow"),
             partials.map_batches(_inb_rows, batch_format="pyarrow")],
            "k", _upd_raw, num_buckets=num_buckets).materialize()

        # the ONLY driver-visible value: one int64 (a Ray max reduce,
        # never a node-sized fetch)
        mv = raw_state.max(on=out_col)
        m = int(mv) if mv is not None else 0
        if m <= 0:
            return raw_state

        def _normalize(b: pa.Table) -> pa.Table:
            v = b.column(out_col).to_numpy().astype(np.int64)
            return b.set_column(
                b.schema.get_field_index(out_col), out_col,
                pa.array(v * SCALE // m, pa.int64()))

        return raw_state.map_batches(_normalize,
                                     batch_format="pyarrow") \
            .materialize()

    for _ in range(iters):
        state = _half(state, e_by_src, "hub", "auth")
        state = _half(state, e_by_dst, "auth", "hub")

    return state.map_batches(
        lambda b: pa.table({"user_id": b.column("k"),
                            "hub_units": b.column("hub"),
                            "auth_units": b.column("auth")}),
        batch_format="pyarrow")

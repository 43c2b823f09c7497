"""Distributed connected components -> duplicate-cluster representatives.

The dedup pipelines (exact, MinHash-LSH, embedding near-dup) emit
candidate PAIRS; a real training-data pipeline must then pick ONE
representative per duplicate *cluster* (pairs are not transitive-
closed: a~b and b~c puts a,c in one cluster without a direct pair).
This stage computes, for every node, the minimum node id of its
connected component — the canonical keep-list key — using only
co-partitioned groupby shuffles over (node, label) rows:

  round = hash-min propagate  (label(n) <- min over n and neighbors)
        + pointer-jump        (label(n) <- label(label(n)))

The pointer-jump halves chain depth every round, so convergence is
O(log diameter) rounds even for path-shaped components — plain
hash-min alone needs O(diameter) rounds, which is the difference
between 9 shuffles and 400 on a 400-doc chain.  Labels only ever
decrease, so a fixed point is detected by an unchanged sum(label)
(two cheap scalar aggregates per round).  Every shuffle moves only
int64 (node, label) pairs: O(V + E) per round, independent of
document size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _part_of(x: np.ndarray, num_parts: int) -> np.ndarray:
    return ((x.astype(np.uint64) * _MIX) >> np.uint64(33)) \
        % np.uint64(num_parts)


def propagate_part(g: pd.DataFrame) -> pd.DataFrame:
    """One bucket of the hash-min round: kind-0 rows carry (node,
    label), kind-1 rows carry directed edges (node, nbr=val); emits the
    kept labels plus one (nbr, label(node)) message per edge."""
    lab = g[g["kind"] == 0]
    ed = g[g["kind"] == 1]
    out_node = [lab["node"].to_numpy(np.int64)]
    out_label = [lab["val"].to_numpy(np.int64)]
    if len(ed):
        m = ed.merge(lab[["node", "val"]].rename(columns={"val": "label"}),
                     on="node", how="left")
        out_node.append(m["val"].to_numpy(np.int64))
        out_label.append(m["label"].to_numpy(np.int64))
    return pd.DataFrame({"node": np.concatenate(out_node),
                         "label": np.concatenate(out_label)})


def min_part(g: pd.DataFrame) -> pd.DataFrame:
    agg = g.groupby("node", sort=False)["label"].min().reset_index()
    return agg.astype({"node": np.int64, "label": np.int64})


def shortcut_part(g: pd.DataFrame) -> pd.DataFrame:
    """One bucket of the pointer-jump: kind-0 rows are the label table
    (node, val=label) hashed by node; kind-1 rows are requests (node,
    val=label(node)) hashed by val.  Emits (node, label(label(node)))."""
    lab = g[g["kind"] == 0]
    req = g[g["kind"] == 1]
    m = req.merge(
        lab[["node", "val"]].rename(columns={"node": "val",
                                             "val": "tlabel"}),
        on="val", how="left")
    t = m["tlabel"].to_numpy()
    # a label always names an existing node, so the lookup can only
    # miss if the caller passed an incomplete node set
    if np.isnan(t.astype(np.float64)).any() if t.dtype != np.int64 else False:
        raise ValueError("shortcut lookup missed: label table incomplete")
    return pd.DataFrame({"node": m["node"].to_numpy(np.int64),
                         "label": t.astype(np.int64)})


def connected_components(edges_ds, *, nodes_ds=None,
                         node_cols: Tuple[str, str] = ("a", "b"),
                         node_col: str = "node",
                         num_parts: int = 64,
                         max_iters: int = 64,
                         contraction_levels: int = 2):
    """Edges (a, b) [+ optional isolated-node table] -> Dataset
    (node, rep) with rep = min node id of the connected component.

    Returns (dataset, info) where info records the round count.  The
    label table is materialized once per round (it is the iteration
    state — the one case where mid-pipeline materialization is the
    algorithm, not an accident); each round's shuffles move only int64
    pairs."""
    import ray.data as rd

    ca, cb = node_cols

    def _contract(batch: pa.Table) -> pa.Table:
        """Local contraction: union-find over this edge block alone,
        emitting its spanning forest as star edges (node, local_root).
        Connectivity is preserved while long paths that happen to share
        a block collapse to depth 1 — the effective global diameter
        drops to ~the number of blocks, so the O(log diameter) round
        bound binds on #blocks, not raw chain length ("CC in MapReduce
        and beyond"-style preprocessing).  Output never exceeds the
        block's unique-node count."""
        a = batch.column(ca).to_numpy().astype(np.int64)
        b = batch.column(cb).to_numpy().astype(np.int64)
        nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        ia, ib = inv[:len(a)], inv[len(a):]
        # vectorized hash-min with pointer doubling (no per-edge Python
        # loop): labels are node INDICES (nodes is sorted, so index
        # order == id order); each round takes the min over edge
        # neighbors then follows label chains twice.  Labels are
        # monotone nonincreasing and a fixpoint forces equality across
        # every edge, so the result is the per-component min — the same
        # star edges the union-find emitted.
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            new = lab.copy()
            np.minimum.at(new, ia, lab[ib])
            np.minimum.at(new, ib, lab[ia])
            new = new[new]
            new = new[new]
            if np.array_equal(new, lab):
                break
            lab = new
        keep = lab != np.arange(len(nodes))
        return pa.table({
            ca: pa.array(nodes[keep], pa.int64()),
            cb: pa.array(nodes[lab[keep]], pa.int64()),
        })

    # batch_size=None: contract each block as-is (no cross-block
    # combining, which also cannot mix pandas/arrow source blocks)
    edges_ds = edges_ds.map_batches(_contract, batch_format="pyarrow",
                                    batch_size=None)

    # Multi-level contraction: the label loop's round count is
    # O(log diameter) and the post-contraction diameter ~ #edge
    # blocks, so fold blocks 64:1 and contract again (≤2 levels).
    # Each level is one narrow repartition + map over (a, b) int64
    # pairs — far cheaper than a label round (3 shuffles + a sum) —
    # and block size stays bounded by 64x the original block, so the
    # top level never concentrates the graph on one worker at scale.
    for _ in range(contraction_levels):
        edges_ds = edges_ds.materialize()
        nb = edges_ds.num_blocks()
        if nb <= 1:
            break
        edges_ds = edges_ds.repartition(max(1, nb // 64)) \
            .map_batches(_contract, batch_format="pyarrow",
                         batch_size=None)

    # FAST PATH: when the multi-level contraction collapsed the whole
    # graph into ONE block, its min-id union-find output IS the exact
    # component labeling (star edges node -> component-min root), so
    # the label loop would spend ~6 shuffle barriers confirming a
    # fixpoint.  The work is bounded by a block that already sat on
    # one worker; at cluster scale the contracted forest spans many
    # blocks and this path never triggers.
    edges_ds = edges_ds.materialize()
    if edges_ds.num_blocks() <= 1:
        import ray

        forest = edges_ds.take_all()
        fk = np.array([int(r[ca]) for r in forest], dtype=np.int64)
        fv = np.array([int(r[cb]) for r in forest], dtype=np.int64)
        order = np.argsort(fk, kind="mergesort")
        fk, fv = fk[order], fv[order]
        fnodes = np.unique(np.concatenate([fk, fv]))
        fpos = np.searchsorted(fk, fnodes)
        fhit = (fpos < len(fk)) & (fk[np.minimum(fpos, max(len(fk) - 1,
                                                           0))] == fnodes) \
            if len(fk) else np.zeros(len(fnodes), bool)
        freps = np.where(fhit, fv[np.minimum(fpos, max(len(fk) - 1, 0))]
                         if len(fk) else fnodes, fnodes)
        base = rd.from_arrow(pa.table({
            "node": pa.array(fnodes, pa.int64()),
            "rep": pa.array(freps, pa.int64())}))
        if nodes_ds is None:
            return base, {"rounds": 0, "num_parts": num_parts,
                          "fast_path": True}
        ref = ray.put(fnodes)

        def _isolated(batch: pa.Table) -> pa.Table:
            known = ray.get(ref)
            n = batch.column(node_col).to_numpy().astype(np.int64)
            p = np.searchsorted(known, n)
            seen = (p < len(known)) & \
                (known[np.minimum(p, max(len(known) - 1, 0))] == n) \
                if len(known) else np.zeros(len(n), bool)
            iso = n[~seen]
            return pa.table({"node": pa.array(iso, pa.int64()),
                             "rep": pa.array(iso, pa.int64())})

        out = base.union(nodes_ds.map_batches(_isolated,
                                              batch_format="pyarrow"))
        return out, {"rounds": 0, "num_parts": num_parts,
                     "fast_path": True}

    def _sym(batch: pa.Table) -> pa.Table:
        a = batch.column(ca).to_numpy().astype(np.int64)
        b = batch.column(cb).to_numpy().astype(np.int64)
        node = np.concatenate([a, b])
        nbr = np.concatenate([b, a])
        return pa.table({
            "part": pa.array(_part_of(node, num_parts).astype(np.int32),
                             pa.int32()),
            "kind": pa.array(np.ones(len(node), np.int8), pa.int8()),
            "node": pa.array(node, pa.int64()),
            "val": pa.array(nbr, pa.int64()),
        })

    sym = edges_ds.map_batches(_sym, batch_format="pyarrow").materialize()

    def _init_from_edges(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy()
        return pa.table({"node": pa.array(n, pa.int64()),
                         "label": pa.array(n, pa.int64())})

    inits = [sym.map_batches(_init_from_edges, batch_format="pyarrow")]
    if nodes_ds is not None:
        def _init_nodes(batch: pa.Table) -> pa.Table:
            n = batch.column(node_col).to_numpy().astype(np.int64)
            return pa.table({"node": pa.array(n, pa.int64()),
                             "label": pa.array(n, pa.int64())})
        inits.append(nodes_ds.map_batches(_init_nodes,
                                          batch_format="pyarrow"))
    raw = inits[0] if len(inits) == 1 else inits[0].union(*inits[1:])

    def _with_part(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_numpy()
        return batch.append_column(
            "part", pa.array(_part_of(n, num_parts).astype(np.int32),
                             pa.int32()))

    labels = (raw.map_batches(_with_part, batch_format="pyarrow")
              .groupby("part")
              .map_groups(lambda g: min_part(g.drop(columns=["part"])),
                          batch_format="pandas")).materialize()
    prev_sum = labels.sum("label")

    rounds = 0
    for rounds in range(1, max_iters + 1):
        # hash-min propagate
        lab_tagged = labels.map_batches(
            lambda b: pa.table({
                "part": pa.array(_part_of(
                    b.column("node").to_numpy(), num_parts)
                    .astype(np.int32), pa.int32()),
                "kind": pa.array(np.zeros(len(b), np.int8), pa.int8()),
                "node": b.column("node"),
                "val": b.column("label"),
            }), batch_format="pyarrow")
        merged = (lab_tagged.union(sym)
                  .groupby("part")
                  .map_groups(lambda g: propagate_part(
                      g.drop(columns=["part"])), batch_format="pandas"))
        labels = (merged.map_batches(_with_part, batch_format="pyarrow")
                  .groupby("part")
                  .map_groups(lambda g: min_part(g.drop(columns=["part"])),
                              batch_format="pandas"))

        # pointer-jump: label <- label(label)
        def _tag_shortcut(batch: pa.Table) -> pa.Table:
            n = batch.column("node").to_numpy().astype(np.int64)
            l = batch.column("label").to_numpy().astype(np.int64)
            part = np.concatenate([_part_of(n, num_parts),
                                   _part_of(l, num_parts)]).astype(np.int32)
            kind = np.concatenate([np.zeros(len(n), np.int8),
                                   np.ones(len(n), np.int8)])
            return pa.table({
                "part": pa.array(part, pa.int32()),
                "kind": pa.array(kind, pa.int8()),
                "node": pa.array(np.concatenate([n, n]), pa.int64()),
                "val": pa.array(np.concatenate([l, l]), pa.int64()),
            })

        labels = (labels.map_batches(_tag_shortcut, batch_format="pyarrow")
                  .groupby("part")
                  .map_groups(lambda g: shortcut_part(
                      g.drop(columns=["part"])), batch_format="pandas")
                  ).materialize()

        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    out = labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rep": b.column("label")}),
        batch_format="pyarrow")
    return out, {"rounds": rounds, "num_parts": num_parts}


def chain_edges_by_gap(ds, value_col: str, id_col: str, delta: int,
                       band_width: int = 1024):
    """Linear-size edge set whose connectivity equals the interval
    graph {(a, b) : |v(a) - v(b)| <= delta}: consecutive-in-sorted-
    order pairs with gap <= delta (each consecutive gap between two
    values within delta is itself <= delta, so the chain connects
    exactly the same components as the quadratic pairwise graph).

    Distributed shape: band = v // band_width partitions the sorted
    order into contiguous runs; in-band consecutive pairs come from a
    groupby(band) map_groups sort, and the cross-band stitches use only
    each band's (first, last) rows — a table of O(#bands) rows, a
    bounded aggregate like a top-k, NOT O(rows) driver traffic."""
    import ray.data as rd

    def _banded(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.int64)
        return pa.table({
            "band": pa.array(v // band_width, pa.int64()),
            "value": pa.array(v, pa.int64()),
            "id": pa.array(batch.column(id_col).to_numpy().astype(np.int64),
                           pa.int64()),
        })

    banded = ds.map_batches(_banded, batch_format="pyarrow").materialize()

    def _in_band(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "id"], kind="mergesort")
        v = g["value"].to_numpy()
        i = g["id"].to_numpy()
        keep = (v[1:] - v[:-1]) <= delta
        return pd.DataFrame({"a": i[:-1][keep], "b": i[1:][keep]})

    in_band = banded.groupby("band").map_groups(_in_band,
                                               batch_format="pandas")

    def _boundary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["value", "id"], kind="mergesort")
        return pd.DataFrame({
            "band": [g["band"].iloc[0]],
            "first_v": [g["value"].iloc[0]], "first_id": [g["id"].iloc[0]],
            "last_v": [g["value"].iloc[-1]], "last_id": [g["id"].iloc[-1]],
        })

    # O(#bands) rows: safe to bring to the driver
    bounds = (banded.groupby("band").map_groups(_boundary,
                                                batch_format="pandas")
              .to_pandas().sort_values("band").reset_index(drop=True))
    cross_a, cross_b = [], []
    for k in range(1, len(bounds)):
        if bounds["first_v"].iloc[k] - bounds["last_v"].iloc[k - 1] <= delta:
            cross_a.append(int(bounds["last_id"].iloc[k - 1]))
            cross_b.append(int(bounds["first_id"].iloc[k]))
    cross = rd.from_arrow(pa.table({"a": pa.array(cross_a, pa.int64()),
                                    "b": pa.array(cross_b, pa.int64())}))
    return in_band.union(cross) if len(cross_a) else in_band

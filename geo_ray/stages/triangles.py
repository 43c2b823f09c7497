"""Distributed triangle counting and edge support over an undirected
graph.

The classic degree-ordered node-iterator kernel (Schank & Wagner'05;
the MapReduce form is Suri & Vassilvitskii'11 "Counting Triangles and
the Curse of the Last Reducer"): orient every edge from its lower
endpoint to its higher endpoint in the total order (degree, id), form
wedges only at the apex — the unique vertex of each triangle with two
out-edges — and close each wedge against the edge set.  Orientation
bounds every out-degree by O(sqrt(m)), so the wedge volume is
O(m^1.5) worst-case and near-linear on skewed real graphs, and each
triangle is generated exactly once.

Two outputs share the engine:

  triangle_counts  per-node triangle participation counts;
  edge_supports    per-edge common-neighbor counts (= triangles
                   through the edge — the k-truss support and the
                   link-prediction common-neighbors feature), plus
                   both endpoint degrees.

Exchange plan (all rows are narrow int64 tuples; no driver state):

  X1  pair-key dedup: raw (a, b) pairs bucket by hash(packed pair);
      each bucket body dedupes vectorized and emits unique edges plus
      per-bucket (node, 1) degree partials.
  X2  exact bucketed integer sum of the degree partials.
  X3  tagged-union co-partition by endpoint a: edges pick up deg_a.
  X4  same by endpoint b: edges pick up deg_b; orient.
  X5  wedge expansion: bucket by src; per-src out-neighbor segments
      expand through stages/dedup.segment_all_pairs (zero Python
      loops); wedges key by the packed (v, w) pair.
  X6  tagged-union co-partition by pair key: wedges whose key exists
      in the edge set close a triangle; emit the three corners
      (nodes mode) or the three edge keys (edges mode), combined per
      bucket before the final exact sum.

Plan selection is MEASURED, not assumed: the input pair set is
materialized up front (the X1 dedup consumes it either way); when its
raw row count fits ``driver_merge_rows``, the six exchanges (each a
~0.5-1 s Ray groupby barrier at 32 CPUs regardless of volume) are
replaced by one bounded fetch + the identical vectorized kernel on
the driver.  ``driver_merge_rows=0`` forces the distributed plan
(exercised against the fast path in tests).

Node ids must fit 32 bits unsigned (packed pair keys are
(a << 32) | b); asserted, not assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_sum
from .dedup import segment_all_pairs
from .sample import _splitmix


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a, b) -> one int64 key: uint64 math (so the full 32-bit id
    range packs without overflow), int64 VIEW for the shuffle column
    (the repo-wide convention — uint64 keys fall back to object-pickled
    extension arrays in Ray's shuffle)."""
    assert a.size == 0 or (a.max() < (1 << 32) and a.min() >= 0
                           and b.max() < (1 << 32) and b.min() >= 0), \
        "triangle kernels pack node ids into 32 bits"
    return ((a.astype(np.uint64) << np.uint64(32))
            | b.astype(np.uint64)).view(np.int64)


def _hi(pk: np.ndarray) -> np.ndarray:
    return (pk.view(np.uint64) >> np.uint64(32)).astype(np.int64)


def _lo(pk: np.ndarray) -> np.ndarray:
    return (pk.view(np.uint64)
            & np.uint64(0xFFFFFFFF)).astype(np.int64)


def _bucket_col(keys: np.ndarray, nb: int) -> pa.Array:
    return pa.array((_splitmix(keys.astype(np.uint64))
                     % np.uint64(nb)).astype(np.int32), pa.int32())


def _closed_wedges(pk: np.ndarray):
    """Shared local kernel: unique edges (packed) -> (nodes array,
    per-edge code arrays (ia, ib), degree array, closed-wedge corner
    CODES (apex, lo, hi))."""
    a, b = _hi(pk), _lo(pk)
    nodes, codes = np.unique(np.concatenate([a, b]),
                             return_inverse=True)
    ia, ib = codes[:len(a)], codes[len(a):]
    deg = np.bincount(np.concatenate([ia, ib]),
                      minlength=len(nodes)).astype(np.int64)
    order = np.lexsort((nodes, deg))
    rnk = np.empty(len(nodes), np.int64)
    rnk[order] = np.arange(len(nodes))
    a_first = rnk[ia] < rnk[ib]
    src = np.where(a_first, ia, ib)
    dst = np.where(a_first, ib, ia)
    o = np.argsort(src, kind="mergesort")
    src, dst = src[o], dst[o]
    _, sizes = np.unique(src, return_counts=True)
    ii, jj = segment_all_pairs(sizes)
    n = np.int64(len(nodes))
    lo = np.minimum(dst[ii], dst[jj])
    hi = np.maximum(dst[ii], dst[jj])
    wk = lo * n + hi
    ekc = np.minimum(ia, ib) * n + np.maximum(ia, ib)
    ek_order = np.argsort(ekc, kind="mergesort")
    ek_sorted = ekc[ek_order]
    pos = np.searchsorted(ek_sorted, wk)
    hit = (pos < len(ek_sorted)) & \
        (ek_sorted[np.minimum(pos, len(ek_sorted) - 1)] == wk) \
        if len(ek_sorted) else np.zeros(len(wk), bool)
    return (nodes, ia, ib, deg, n, ek_sorted, ek_order,
            src[ii][hit], lo[hit], hi[hit])


def _local_triangles(pk: np.ndarray):
    """(nodes, counts) for nodes in >= 1 triangle."""
    if len(pk) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    nodes, _ia, _ib, _deg, _n, _eks, _eko, apex, lo, hi = \
        _closed_wedges(pk)
    corners = np.concatenate([apex, lo, hi])
    cnt = np.bincount(corners, minlength=len(nodes)) \
        if len(corners) else np.zeros(len(nodes), np.int64)
    keep = cnt > 0
    return nodes[keep], cnt[keep].astype(np.int64)


def _local_edge_support(pk: np.ndarray):
    """Per original edge: (a, b, support, deg_a, deg_b)."""
    if len(pk) == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z, z
    nodes, ia, ib, deg, n, ek_sorted, ek_order, apex, lo, hi = \
        _closed_wedges(pk)
    sup_sorted = np.zeros(len(pk), np.int64)
    for u, v in ((apex, lo), (apex, hi), (lo, hi)):
        keys = np.minimum(u, v) * n + np.maximum(u, v)
        pos = np.searchsorted(ek_sorted, keys)
        np.add.at(sup_sorted, pos, 1)
    support = np.zeros(len(pk), np.int64)
    support[ek_order] = sup_sorted
    return (nodes[ia], nodes[ib], support, deg[ia], deg[ib])


def _engine(pairs_ds, a_col: str, b_col: str, nb: int,
            driver_merge_rows: int, mode: str):
    import ray.data as rd

    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= driver_merge_rows:
        df = pairs_ds.to_pandas()
        if len(df):
            pk = np.unique(_pack(df[a_col].to_numpy().astype(np.int64),
                                 df[b_col].to_numpy().astype(np.int64)))
        else:
            pk = np.zeros(0, np.int64)
        if mode == "nodes":
            nodes, cnt = _local_triangles(pk)
            return rd.from_arrow(pa.table({
                "node": pa.array(nodes, pa.int64()),
                "n_triangles": pa.array(cnt, pa.int64())}))
        a, b, sup, da, db = _local_edge_support(pk)
        return rd.from_arrow(pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "support": pa.array(sup, pa.int64()),
            "deg_a": pa.array(da, pa.int64()),
            "deg_b": pa.array(db, pa.int64())}))

    # ---- X1: dedup edges, emit degree partials --------------------
    def _tag_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy().astype(np.int64)
        b = batch.column(b_col).to_numpy().astype(np.int64)
        pk = _pack(a, b)
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "__b": _bucket_col(pk, nb)})

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        pk = np.unique(g["pk"].to_numpy())
        a, b = _hi(pk), _lo(pk)
        nodes, cnt = np.unique(np.concatenate([a, b]),
                               return_counts=True)
        return pd.concat([
            pd.DataFrame({"kind": np.int8(0), "k1": pk,
                          "k2": np.int64(0)}),
            pd.DataFrame({"kind": np.int8(1), "k1": nodes,
                          "k2": cnt.astype(np.int64)}),
        ])

    # materialized: the deduped edge set is a bounded intermediate
    # consumed by three downstream exchanges (X3, X6) — without the
    # pin, each consumer would re-execute the raw pair generation
    mixed = (pairs_ds.map_batches(_tag_pairs, batch_format="pyarrow")
             .groupby("__b")
             .map_groups(lambda g: _dedup(g.drop(columns=["__b"])),
                         batch_format="pandas")).materialize()

    def _sel(kind: int, names):
        def _f(t: pa.Table) -> pa.Table:
            m = pa.compute.equal(t.column("kind"), kind)
            t = t.filter(m)
            return pa.table({n: t.column(c)
                             for n, c in zip(names, ("k1", "k2"))})
        return _f

    edges = mixed.map_batches(_sel(0, ("pk",)), batch_format="pyarrow")
    deg_partials = mixed.map_batches(_sel(1, ("node", "deg")),
                                     batch_format="pyarrow")

    # ---- X2: exact global degrees ---------------------------------
    # materialized: consumed by both X3 and X4 (one narrow row per
    # node — the smallest dataset in the plan)
    degrees = bucketed_sum(deg_partials, ["node"], ["deg"],
                           n_buckets=nb).materialize()

    # ---- X3/X4: tagged-union co-partition by one endpoint ----------
    # ``payload`` columns ride along on the edge rows (degree rows
    # fill zeros); side 0 keys on a (pk >> 32), side 1 on b.
    def _attach(side: int, payload):
        def _tag_edges(batch: pa.Table) -> pa.Table:
            pk = batch.column("pk").to_numpy()
            key = _lo(pk) if side == 1 else _hi(pk)
            cols = {
                "kind": pa.array(np.zeros(len(pk), np.int8), pa.int8()),
                "key": pa.array(key, pa.int64()),
                "pk": pa.array(pk, pa.int64())}
            for p in payload:
                cols[p] = batch.column(p).cast(pa.int64()) \
                    if p in batch.column_names else \
                    pa.array(np.zeros(len(pk), np.int64), pa.int64())
            cols["__b"] = _bucket_col(key, nb)
            return pa.table(cols)

        def _tag_deg(batch: pa.Table) -> pa.Table:
            node = batch.column("node").to_numpy().astype(np.int64)
            cols = {
                "kind": pa.array(np.ones(len(node), np.int8), pa.int8()),
                "key": pa.array(node, pa.int64()),
                "pk": pa.array(np.zeros(len(node), np.int64),
                               pa.int64())}
            for p in payload:
                cols[p] = pa.array(np.zeros(len(node), np.int64),
                                   pa.int64())
            # the degree value rides in the LAST payload slot's target
            cols["__deg"] = batch.column("deg").cast(pa.int64())
            cols["__b"] = _bucket_col(node, nb)
            return pa.table(cols)

        def _pad_edges(batch: pa.Table) -> pa.Table:
            return batch.add_column(
                batch.num_columns - 1, "__deg",
                pa.array(np.zeros(len(batch), np.int64), pa.int64())) \
                if "__deg" not in batch.column_names else batch

        out_col = f"deg_{'ab'[side]}"

        def _resolve(g: pd.DataFrame) -> pd.DataFrame:
            kind = g["kind"].to_numpy()
            dn = g["key"].to_numpy()[kind == 1]
            dv = g["__deg"].to_numpy()[kind == 1]
            order = np.argsort(dn, kind="mergesort")
            dn, dv = dn[order], dv[order]
            ek = g["key"].to_numpy()[kind == 0]
            got = dv[np.searchsorted(dn, ek)] if len(ek) else \
                np.zeros(0, np.int64)
            out = {"pk": g["pk"].to_numpy()[kind == 0]}
            for p in payload:
                out[p] = g[p].to_numpy()[kind == 0]
            out[out_col] = got
            return pd.DataFrame(out)

        return _tag_edges, _tag_deg, _pad_edges, _resolve

    def _attach_pass(ds, side: int, payload):
        te, td, pad, res = _attach(side, payload)
        return (ds.map_batches(te, batch_format="pyarrow")
                .map_batches(pad, batch_format="pyarrow")
                .union(degrees.map_batches(td, batch_format="pyarrow"))
                .groupby("__b")
                .map_groups(lambda g: res(g.drop(columns=["__b"])),
                            batch_format="pandas"))

    eab = _attach_pass(_attach_pass(edges, 0, []), 1, ["deg_a"])

    # ---- X5: orient + wedge expansion -----------------------------
    def _orient(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy()
        a, b = _hi(pk), _lo(pk)
        da = batch.column("deg_a").to_numpy()
        db = batch.column("deg_b").to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "__b": _bucket_col(src, nb)})

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        _, sizes = np.unique(src, return_counts=True)
        ii, jj = segment_all_pairs(sizes)
        lo = np.minimum(dst[ii], dst[jj])
        hi = np.maximum(dst[ii], dst[jj])
        return pd.DataFrame({"kind": np.int8(1),
                             "key": _pack(lo, hi),
                             "apex": src[ii]})

    wedges = (eab.map_batches(_orient, batch_format="pyarrow")
              .groupby("__b")
              .map_groups(lambda g: _wedges(g.drop(columns=["__b"])),
                          batch_format="pandas"))

    # ---- X6: close wedges against the edge set --------------------
    def _tag_edge_keys(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy()
        return pa.table({
            "kind": pa.array(np.zeros(len(pk), np.int8), pa.int8()),
            "key": pa.array(pk, pa.int64()),
            "apex": pa.array(np.zeros(len(pk), np.int64), pa.int64()),
            "__b": _bucket_col(pk, nb)})

    def _tag_wedges(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        return pa.table({
            "kind": batch.column("kind").cast(pa.int8()),
            "key": batch.column("key").cast(pa.int64()),
            "apex": batch.column("apex").cast(pa.int64()),
            "__b": _bucket_col(key, nb)})

    def _close(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].to_numpy()
        ek = np.sort(g["key"].to_numpy()[kind == 0])
        wk = g["key"].to_numpy()[kind == 1]
        apex = g["apex"].to_numpy()[kind == 1]
        if len(ek) == 0 or len(wk) == 0:
            if mode == "nodes":
                return pd.DataFrame({
                    "node": np.zeros(0, np.int64),
                    "n_triangles": np.zeros(0, np.int64)})
            return pd.DataFrame({"pk": np.zeros(0, np.int64),
                                 "support": np.zeros(0, np.int64)})
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        wk, apex = wk[hit], apex[hit]
        v, w = _hi(wk), _lo(wk)
        if mode == "nodes":
            corners = np.concatenate([apex, v, w])
            nodes, cnt = np.unique(corners, return_counts=True)
            return pd.DataFrame({"node": nodes,
                                 "n_triangles": cnt.astype(np.int64)})
        eks = [wk]
        for u, t in ((apex, v), (apex, w)):
            eks.append(_pack(np.minimum(u, t), np.maximum(u, t)))
        allk, cnt = np.unique(np.concatenate(eks), return_counts=True)
        return pd.DataFrame({"pk": allk,
                             "support": cnt.astype(np.int64)})

    closed = (edges.map_batches(_tag_edge_keys, batch_format="pyarrow")
              .union(wedges.map_batches(_tag_wedges,
                                        batch_format="pyarrow"))
              .groupby("__b")
              .map_groups(lambda g: _close(g.drop(columns=["__b"])),
                          batch_format="pandas"))
    if mode == "nodes":
        return bucketed_sum(closed, ["node"], ["n_triangles"],
                            n_buckets=nb)

    # edges mode: zero rows keep support-0 edges; degrees re-attach
    def _zero(batch: pa.Table) -> pa.Table:
        return pa.table({
            "pk": batch.column("pk"),
            "support": pa.array(np.zeros(len(batch), np.int64),
                                pa.int64())})

    summed = bucketed_sum(
        closed.union(edges.map_batches(_zero, batch_format="pyarrow")),
        ["pk"], ["support"], n_buckets=nb)
    full = _attach_pass(_attach_pass(summed, 0, ["support"]), 1,
                        ["support", "deg_a"])

    def _unpack(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy()
        return pa.table({
            "a": pa.array(_hi(pk), pa.int64()),
            "b": pa.array(_lo(pk), pa.int64()),
            "support": batch.column("support").cast(pa.int64()),
            "deg_a": batch.column("deg_a").cast(pa.int64()),
            "deg_b": batch.column("deg_b").cast(pa.int64()),
        })

    return full.map_batches(_unpack, batch_format="pyarrow")


def triangle_counts(pairs_ds, *, a_col: str = "a", b_col: str = "b",
                    n_buckets: int = 64,
                    driver_merge_rows: int = 2_000_000):
    """Per-node triangle participation counts.

    ``pairs_ds``: rows of undirected edges with ``a < b`` (duplicates
    allowed — X1 dedupes).  Returns a Dataset of (node, n_triangles)
    for every node in at least one triangle, unsorted."""
    return _engine(pairs_ds, a_col, b_col, n_buckets,
                   driver_merge_rows, "nodes")


def edge_supports(pairs_ds, *, a_col: str = "a", b_col: str = "b",
                  n_buckets: int = 64,
                  driver_merge_rows: int = 2_000_000):
    """Per-edge common-neighbor counts (k-truss support): one row per
    UNIQUE edge (a, b, support, deg_a, deg_b), support-0 edges
    included, unsorted."""
    return _engine(pairs_ds, a_col, b_col, n_buckets,
                   driver_merge_rows, "edges")

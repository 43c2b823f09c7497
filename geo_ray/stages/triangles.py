"""Distributed per-node triangle counting over an undirected graph.

The classic degree-ordered node-iterator kernel (Schank & Wagner'05;
the MapReduce form is Suri & Vassilvitskii'11 "Counting Triangles and
the Curse of the Last Reducer"): orient every edge from its lower
endpoint to its higher endpoint in the total order (degree, id), form
wedges only at the apex — the unique vertex of each triangle with two
out-edges — and close each wedge against the edge set.  Orientation
bounds every out-degree by O(sqrt(m)), so the wedge volume is
O(m^1.5) worst-case and near-linear on skewed real graphs, and each
triangle is generated exactly once.

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
      in the edge set close a triangle; emit (node, 1) for all three
      corners, combined per bucket before the final exact sum.

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
        "triangle_counts packs node ids into 32 bits"
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


def _local_triangles(pk: np.ndarray):
    """The same degree-ordered kernel over one in-memory edge array
    (int64 packed pairs, globally unique): returns (nodes, counts)
    for nodes in >= 1 triangle.  Shared by the driver-merge fast path
    and (per bucket, conceptually) the distributed plan — outputs are
    proven identical in tests/test_triangles.py."""
    a, b = _hi(pk), _lo(pk)
    nodes, codes = np.unique(np.concatenate([a, b]),
                             return_inverse=True)
    ia, ib = codes[:len(a)], codes[len(a):]
    deg = np.bincount(np.concatenate([ia, ib]), minlength=len(nodes))
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
    ek = np.sort(np.minimum(ia, ib) * n + np.maximum(ia, ib))
    pos = np.searchsorted(ek, wk)
    hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk) \
        if len(ek) else np.zeros(len(wk), bool)
    corners = np.concatenate([src[ii][hit], lo[hit], hi[hit]])
    cnt = np.bincount(corners, minlength=len(nodes)) \
        if len(corners) else np.zeros(len(nodes), np.int64)
    keep = cnt > 0
    return nodes[keep], cnt[keep].astype(np.int64)


def triangle_counts(pairs_ds, *, a_col: str = "a", b_col: str = "b",
                    n_buckets: int = 64,
                    driver_merge_rows: int = 2_000_000):
    """Per-node triangle participation counts.

    ``pairs_ds``: rows of undirected edges with ``a < b`` (duplicates
    allowed — X1 dedupes).  Returns a Dataset of (node, n_triangles)
    for every node in at least one triangle, unsorted.

    Plan selection is MEASURED, not assumed: X1's deduped edge set is
    materialized either way (three downstream consumers); when its
    row count fits ``driver_merge_rows`` the remaining five exchanges
    (each a ~0.5-1 s Ray groupby barrier at 32 CPUs regardless of
    volume) are replaced by one bounded fetch + the identical
    vectorized kernel on the driver.  ``driver_merge_rows=0`` forces
    the distributed plan (exercised against the fast path in tests).
    """
    import ray.data as rd
    nb = n_buckets

    # Fast-path gate on the RAW pair count (conservative: raw >=
    # deduped).  The input is materialized either way — the X1 dedup
    # consumes it, and at suite scale the fetch replaces X1's groupby
    # barrier too, not just X3-X6.
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= driver_merge_rows:
        df = pairs_ds.to_pandas()
        if len(df):
            pk = np.unique(_pack(df[a_col].to_numpy().astype(np.int64),
                                 df[b_col].to_numpy().astype(np.int64)))
        else:
            pk = np.zeros(0, np.int64)
        nodes, cnt = _local_triangles(pk)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "n_triangles": pa.array(cnt, pa.int64())}))

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

    # ---- X3/X4: attach deg to each endpoint -----------------------
    def _attach(side: int):
        # side 0: key = a (pk >> 32); side 1: key = b (pk & mask)
        def _tag_edges(batch: pa.Table) -> pa.Table:
            pk = batch.column("pk").to_numpy()
            other = (batch.column("deg_a").to_numpy()
                     if side == 1 else np.zeros(len(pk), np.int64))
            key = _lo(pk) if side == 1 else _hi(pk)
            return pa.table({
                "kind": pa.array(np.zeros(len(pk), np.int8), pa.int8()),
                "key": pa.array(key, pa.int64()),
                "pk": pa.array(pk, pa.int64()),
                "d": pa.array(other, pa.int64()),
                "__b": _bucket_col(key, nb)})

        def _tag_deg(batch: pa.Table) -> pa.Table:
            node = batch.column("node").to_numpy().astype(np.int64)
            return pa.table({
                "kind": pa.array(np.ones(len(node), np.int8), pa.int8()),
                "key": pa.array(node, pa.int64()),
                "pk": pa.array(np.zeros(len(node), np.int64), pa.int64()),
                "d": batch.column("deg").cast(pa.int64()),
                "__b": _bucket_col(node, nb)})

        def _resolve(g: pd.DataFrame) -> pd.DataFrame:
            kind = g["kind"].to_numpy()
            dn = g["key"].to_numpy()[kind == 1]
            dv = g["d"].to_numpy()[kind == 1]
            order = np.argsort(dn, kind="mergesort")
            dn, dv = dn[order], dv[order]
            ek = g["key"].to_numpy()[kind == 0]
            got = dv[np.searchsorted(dn, ek)] if len(ek) else \
                np.zeros(0, np.int64)
            if side == 0:
                return pd.DataFrame({
                    "pk": g["pk"].to_numpy()[kind == 0],
                    "deg_a": got})
            return pd.DataFrame({
                "pk": g["pk"].to_numpy()[kind == 0],
                "deg_a": g["d"].to_numpy()[kind == 0],
                "deg_b": got})
        return _tag_edges, _tag_deg, _resolve

    te, td, res = _attach(0)
    ea = (edges.map_batches(te, batch_format="pyarrow")
          .union(degrees.map_batches(td, batch_format="pyarrow"))
          .groupby("__b")
          .map_groups(lambda g: res(g.drop(columns=["__b"])),
                      batch_format="pandas"))
    te, td, res = _attach(1)
    eab = (ea.map_batches(te, batch_format="pyarrow")
           .union(degrees.map_batches(td, batch_format="pyarrow"))
           .groupby("__b")
           .map_groups(lambda g: res(g.drop(columns=["__b"])),
                       batch_format="pandas"))

    # ---- X5: orient + wedge expansion -----------------------------
    def _orient(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy()
        a, b = _hi(pk), _lo(pk)
        da = batch.column("deg_a").to_numpy()
        db = batch.column("deg_b").to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddst = np.where(a_first, db, da)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "ddst": pa.array(ddst, pa.int64()),
            "__b": _bucket_col(src, nb)})

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        ddst = g["ddst"].to_numpy()
        # segment by src; within a segment order out-neighbors by the
        # SAME total order (deg, id) so wedge pairs inherit v < w in it
        order = np.lexsort((dst, ddst, src))
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
            return pd.DataFrame({"node": np.zeros(0, np.int64),
                                 "n_triangles": np.zeros(0, np.int64)})
        pos = np.searchsorted(ek, wk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)
        wk, apex = wk[hit], apex[hit]
        corners = np.concatenate([apex, _hi(wk), _lo(wk)])
        nodes, cnt = np.unique(corners, return_counts=True)
        return pd.DataFrame({"node": nodes,
                             "n_triangles": cnt.astype(np.int64)})

    closed = (edges.map_batches(_tag_edge_keys, batch_format="pyarrow")
              .union(wedges.map_batches(_tag_wedges,
                                        batch_format="pyarrow"))
              .groupby("__b")
              .map_groups(lambda g: _close(g.drop(columns=["__b"])),
                          batch_format="pandas"))
    return bucketed_sum(closed, ["node"], ["n_triangles"],
                        n_buckets=nb)

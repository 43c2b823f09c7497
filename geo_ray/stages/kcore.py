"""Distributed k-core decomposition (coreness) over an undirected
graph.

Kernel: the h-index fixpoint iteration (Montresor, De Pellegrini &
Miorandi 2013, "Distributed k-core decomposition"; Lü et al. 2016
h-index formulation): start every node at its degree and repeatedly
set

    core[v]  <-  min(core[v], H({core[u] : u adjacent to v}))

where H is the h-index (the largest h such that >= h neighbors have
value >= h).  The sequence is monotone non-increasing and its fixpoint
is exactly the coreness; coreness(v) >= k iff v belongs to the k-core
(the maximal subgraph of minimum degree >= k).

The per-node H evaluation is one vectorized pass: with a node's
neighbor values sorted descending, value >= position+1 holds on a
PREFIX (descending values vs ascending positions), so H is a prefix
length — np.bincount of a boolean mask, no Python loops.

Plan selection is MEASURED, as in stages/triangles.py: the unique
edge set is counted first; when it fits ``driver_merge_rows`` the
round loop runs on the driver over int64 arrays (each distributed
round costs 2 co-partition barriers at ~0.5-1 s regardless of volume,
so small graphs pay pure latency).  ``driver_merge_rows=0`` forces
the distributed plan (exercised against the fast path in tests).

Distributed round (all rows narrow int64; labels live as a DATASET
co-partitioned with the edges — no driver state, no broadcast):

  X1  tagged union on dst: directed edges pick up core[dst], emit
      (src, val);
  X2  tagged union on src: each node's incoming vals meet its own
      label row; the prefix kernel yields H, new = min(old, H);
  the changed-node count is an exact int sum; the loop stops at 0.
Rounds are bounded by the graph's degeneracy ordering depth —
O(log n) on power-law graphs (Montresor et al.), max_rounds guards
pathologies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _splitmix


def _h_prefix(src: np.ndarray, val: np.ndarray, n: int) -> np.ndarray:
    """H-index per src from (src, val) rows: sort by (src, -val);
    within each segment the condition val >= pos+1 holds on a prefix
    whose length IS the h-index."""
    if src.size == 0:
        return np.zeros(n, np.int64)
    order = np.lexsort((-val, src))
    s = src[order]
    v = val[order]
    starts = np.r_[0, np.flatnonzero(s[1:] != s[:-1]) + 1]
    seg_id = np.cumsum(np.r_[0, (s[1:] != s[:-1]).astype(np.int64)])
    pos = np.arange(s.size, dtype=np.int64) - starts[seg_id]
    ok = v >= pos + 1
    return np.bincount(s[ok], minlength=n).astype(np.int64)


def coreness_arrays(a: np.ndarray, b: np.ndarray,
                    max_rounds: int = 10_000):
    """Exact coreness of the undirected graph given by unique edges
    (a, b) — int64 node ids, a != b.  Returns (nodes, core) sorted by
    node.  Pure vectorized numpy; the driver-merge fast path and the
    per-bucket distributed bodies both call this kernel's pieces."""
    nodes = np.unique(np.concatenate([a, b]))
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    src = np.concatenate([ai, bi])
    dst = np.concatenate([bi, ai])
    n = len(nodes)
    core = np.bincount(src, minlength=n).astype(np.int64)
    for _ in range(max_rounds):
        h = _h_prefix(src, core[dst], n)
        new = np.minimum(core, h)
        if np.array_equal(new, core):
            break
        core = new
    else:
        raise RuntimeError("coreness: max_rounds exceeded")
    return nodes, core


def _tag(batch: pa.Table, key: str, nb: int) -> pa.Table:
    k = batch.column(key).to_numpy().astype(np.uint64)
    return batch.append_column(
        "__b", pa.array((_splitmix(k) % np.uint64(nb)).astype(np.int32),
                        pa.int32()))


def coreness(edges_ds, a_col: str = "a", b_col: str = "b", *,
             n_buckets: int = 64, driver_merge_rows: int = 5_000_000,
             max_rounds: int = 256):
    """Dataset of unique undirected edges -> Dataset (node, coreness).

    Edges must be unique pairs (one row per undirected edge, a != b);
    dedupe upstream (stages/agg.bucketed_sum on the packed pair, or
    the caller's own exactly-once construction)."""
    import ray
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= driver_merge_rows:
        t = pa.concat_tables(
            ref for ref in edges_ds.to_arrow_refs()
            for ref in [ray.get(ref)])
        a = t.column(a_col).to_numpy().astype(np.int64)
        b = t.column(b_col).to_numpy().astype(np.int64)
        nodes, core = coreness_arrays(a, b)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "coreness": pa.array(core, pa.int64())}))

    nb = n_buckets

    def _directed(batch: pa.Table) -> pa.Table:
        av = batch.column(a_col).to_numpy().astype(np.int64)
        bv = batch.column(b_col).to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([av, bv]), pa.int64()),
            "dst": pa.array(np.concatenate([bv, av]), pa.int64()),
        })

    directed = edges_ds.map_batches(
        _directed, batch_format="pyarrow").materialize()

    # initial labels: degree, an exact bucketed count
    from .agg import bucketed_sum

    def _deg1(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy()
        u, c = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    labels = bucketed_sum(
        directed.map_batches(_deg1, batch_format="pyarrow"),
        ["node"], ["n"]).map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "core": b.column("n")}),
        batch_format="pyarrow").materialize()

    def _x1(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["tag"] == 1]
        ed = g[g["tag"] == 0]
        m = pd.Series(lab["core"].to_numpy(),
                      index=lab["key"].to_numpy())
        return pd.DataFrame({
            "src": ed["src"].to_numpy(),
            "val": m.reindex(ed["key"].to_numpy()).to_numpy()
            .astype(np.int64),
        })

    def _x2(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["tag"] == 1]
        vals = g[g["tag"] == 0]
        node = lab["key"].to_numpy().astype(np.int64)
        old = lab["core"].to_numpy().astype(np.int64)
        order = np.argsort(node, kind="mergesort")
        node, old = node[order], old[order]
        vi = np.searchsorted(node, vals["key"].to_numpy())
        h = _h_prefix(vi.astype(np.int64),
                      vals["val"].to_numpy().astype(np.int64),
                      len(node))
        new = np.minimum(old, h)
        return pd.DataFrame({
            "node": node, "core": new,
            "changed": (new != old).astype(np.int64)})

    for _ in range(max_rounds):
        # X1: edges keyed by dst meet labels keyed by node
        e1 = directed.map_batches(
            lambda b: _tag(pa.table({
                "key": b.column("dst"),
                "src": b.column("src"),
                "core": pa.nulls(b.num_rows, pa.int64()),
                "tag": pa.array(np.zeros(b.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")
        l1 = labels.map_batches(
            lambda b: _tag(pa.table({
                "key": b.column("node"),
                "src": pa.nulls(b.num_rows, pa.int64()),
                "core": b.column("core"),
                "tag": pa.array(np.ones(b.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")
        vals = e1.union(l1).groupby("__b").map_groups(
            lambda g: _x1(g.drop(columns=["__b"])),
            batch_format="pandas")

        # X2: vals keyed by src meet labels keyed by node
        v2 = vals.map_batches(
            lambda b: _tag(pa.table({
                "key": b.column("src"),
                "val": b.column("val"),
                "core": pa.nulls(b.num_rows, pa.int64()),
                "tag": pa.array(np.zeros(b.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")
        l2 = labels.map_batches(
            lambda b: _tag(pa.table({
                "key": b.column("node"),
                "val": pa.nulls(b.num_rows, pa.int64()),
                "core": b.column("core"),
                "tag": pa.array(np.ones(b.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")
        out = v2.union(l2).groupby("__b").map_groups(
            lambda g: _x2(g.drop(columns=["__b"])),
            batch_format="pandas").materialize()

        changed = out.sum("changed")
        labels = out.select_columns(["node", "core"]).materialize()
        if not changed:
            break
    else:
        raise RuntimeError("coreness: max_rounds exceeded")

    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "coreness": b.column("core")}),
        batch_format="pyarrow")


def kcore_members(edges_ds, k: int, a_col: str = "a",
                  b_col: str = "b", *, n_buckets: int = 64,
                  driver_merge_rows: int = 5_000_000):
    """Dataset of unique undirected edges -> Dataset
    (node, core_deg) for the k-core members, core_deg = the node's
    degree WITHIN the k-core subgraph (>= k by definition).

    Scale shape: coreness labels stay a dataset; membership reaches
    the edges through two tagged-union co-partitions (by each
    endpoint) and the surviving edges feed one exact bucketed degree
    count — no driver membership set, no broadcast."""
    import ray
    import ray.data as rd
    from .agg import bucketed_sum

    edges_ds = edges_ds.materialize()
    labels = coreness(edges_ds, a_col, b_col, n_buckets=n_buckets,
                      driver_merge_rows=driver_merge_rows)

    n_edges = edges_ds.count()
    if n_edges <= driver_merge_rows:
        lt = labels.to_pandas()
        member = lt[lt["coreness"] >= k]["node"].to_numpy()
        member.sort()
        t = pa.concat_tables(
            ray.get(ref) for ref in edges_ds.to_arrow_refs())
        a = t.column(a_col).to_numpy().astype(np.int64)
        b = t.column(b_col).to_numpy().astype(np.int64)
        ina = np.isin(a, member)
        inb = np.isin(b, member)
        keep = ina & inb
        deg = np.zeros(len(member), np.int64)
        np.add.at(deg, np.searchsorted(member, a[keep]), 1)
        np.add.at(deg, np.searchsorted(member, b[keep]), 1)
        sel = deg > 0
        return rd.from_arrow(pa.table({
            "node": pa.array(member[sel], pa.int64()),
            "core_deg": pa.array(deg[sel], pa.int64())}))

    nb = n_buckets

    def _memb(b: pa.Table) -> pa.Table:
        keep = np.asarray(b.column("coreness")) >= k
        return b.filter(pa.array(keep)).select(["node"])

    members = labels.map_batches(_memb, batch_format="pyarrow")

    def _semi(edges, key_col, other_col):
        """keep edge rows whose key_col endpoint is a member"""
        e = edges.map_batches(
            lambda bt: _tag(pa.table({
                "key": bt.column(key_col),
                "other": bt.column(other_col),
                "tag": pa.array(np.zeros(bt.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")
        m = members.map_batches(
            lambda bt: _tag(pa.table({
                "key": bt.column("node"),
                "other": pa.nulls(bt.num_rows, pa.int64()),
                "tag": pa.array(np.ones(bt.num_rows, np.int8)),
            }), "key", nb), batch_format="pyarrow")

        def _resolve(g: pd.DataFrame) -> pd.DataFrame:
            ok = set(g[g["tag"] == 1]["key"].to_numpy())
            ed = g[g["tag"] == 0]
            keep = ed["key"].isin(ok).to_numpy()
            return pd.DataFrame({
                "u": ed["key"].to_numpy()[keep],
                "v": ed["other"].to_numpy()[keep]})

        return e.union(m).groupby("__b").map_groups(
            lambda g: _resolve(g.drop(columns=["__b"])),
            batch_format="pandas")

    def _to_uv(bt: pa.Table) -> pa.Table:
        return pa.table({"u": bt.column(a_col), "v": bt.column(b_col)})

    s1 = _semi(edges_ds.map_batches(_to_uv, batch_format="pyarrow"),
               "u", "v")
    s2 = _semi(s1, "v", "u")   # emits (u=v-side key, v=other) swapped

    def _deg_rows(bt: pa.Table) -> pa.Table:
        allv = np.concatenate([bt.column("u").to_numpy(),
                               bt.column("v").to_numpy()])
        un, c = np.unique(allv, return_counts=True)
        return pa.table({"node": pa.array(un, pa.int64()),
                         "core_deg": pa.array(c.astype(np.int64),
                                              pa.int64())})

    return bucketed_sum(
        s2.map_batches(_deg_rows, batch_format="pyarrow"),
        ["node"], ["core_deg"])

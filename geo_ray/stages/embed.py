"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — each batch computes one matmul
against the broadcast query matrix and emits per-batch partial top-k
rows; a tiny groupby merges them (same shape as the geo kNN).  The
scale path (IVF: cluster centroids as an inverted index, probe the
nearest buckets only) keys the same partials by centroid id; planned
as a follow-up stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    return np.stack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


def cosine_topk_partial(batch: pa.Table, queries_ref, k: int,
                        id_col: str = "vec_id",
                        embed_col: str = "embedding") -> pa.Table:
    """Per-batch top-k cosine matches for every broadcast query row."""
    import ray
    qids, Q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
        else queries_ref
    X = _matrix(batch, embed_col)
    ids = batch.column(id_col).to_numpy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    sims = Xn @ Qn.T  # (n, P)
    n, P = sims.shape
    kk = min(k, n)
    out_q, out_id, out_s = [], [], []
    part = np.argpartition(-sims, kk - 1, axis=0)[:kk] if kk < n else \
        np.tile(np.arange(n)[:, None], (1, P))
    for p in range(P):
        for r in part[:, p]:
            out_q.append(int(qids[p]))
            out_id.append(int(ids[r]))
            out_s.append(float(sims[r, p]))
    return pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "neighbor_id": pa.array(out_id, pa.int64()),
        "cosine": pa.array(out_s, pa.float64()),
    })


def finalize_cosine_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def train_ivf_centroids(sample: np.ndarray, n_centroids: int,
                        iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the IVF
    coarse quantizer).  At 100 TB the sample comes from
    ``ds.random_sample``; training cost is independent of table size."""
    rng = np.random.default_rng(seed)
    X = np.asarray(sample, dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    idx = rng.choice(len(Xn), size=min(n_centroids, len(Xn)), replace=False)
    C = Xn[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(len(C)):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def ivf_assign(batch: pa.Table, centroids_ref,
               embed_col: str = "embedding") -> pa.Table:
    """Add the nearest-centroid bucket column (the IVF partition key)."""
    import ray
    C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
        else centroids_ref
    X = _matrix(batch, embed_col)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    bucket = np.argmax(Xn @ np.asarray(C).T, axis=1).astype(np.int32)
    return batch.append_column("ivf_bucket", pa.array(bucket, pa.int32()))


def embedding_knn_ivf(ds, queries: Tuple[Sequence[int], np.ndarray], k: int,
                      centroids: np.ndarray, nprobe: int = 4,
                      id_col: str = "vec_id", embed_col: str = "embedding"):
    """IVF-pruned cosine top-k: score each batch row only against the
    queries whose nprobe nearest centroids include the row's bucket.
    Approximate (recall < 1 possible at bucket boundaries) — the scale
    path next to the exact brute baseline; recall is measured in
    tests."""
    import ray

    C = np.asarray(centroids, dtype=np.float64)
    qids, Q = queries
    Qn = np.asarray(Q, dtype=np.float64)
    Qn = Qn / np.maximum(np.linalg.norm(Qn, axis=1, keepdims=True), 1e-30)
    # query -> set of probed buckets
    probe_order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    cref = ray.put(C)
    qref = ray.put((list(qids), Qn, probe_order))

    def _partial(batch: pa.Table) -> pa.Table:
        qids_l, Qn_l, probes_l = ray.get(qref)
        b = ivf_assign(batch, cref, embed_col)
        buckets = b.column("ivf_bucket").to_numpy()
        X = _matrix(batch, embed_col)
        ids = batch.column(id_col).to_numpy()
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(qids_l)):
            mask = np.isin(buckets, probes_l[qi])
            if not mask.any():
                continue
            sims = Xn[mask] @ Qn_l[qi]
            sel_ids = ids[mask]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sims) \
                else np.arange(len(sims))
            for r in top:
                out_q.append(int(qids_l[qi]))
                out_id.append(int(sel_ids[r]))
                out_s.append(float(sims[r]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=8192)
    return partials.groupby("query_id").map_groups(
        lambda g: finalize_cosine_topk(g, k), batch_format="pandas")


def embedding_knn(ds, queries: Tuple[Sequence[int], np.ndarray], k: int,
                  id_col: str = "vec_id", embed_col: str = "embedding"):
    """Brute-force cosine top-k of every dataset row against each
    broadcast query vector."""
    import ray
    qref = ray.put(queries)
    partials = ds.map_batches(
        lambda b: cosine_topk_partial(b, qref, k, id_col, embed_col),
        batch_format="pyarrow", batch_size=8192)
    return partials.groupby("query_id").map_groups(
        lambda g: finalize_cosine_topk(g, k), batch_format="pandas")

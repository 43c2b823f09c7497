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

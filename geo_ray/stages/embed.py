"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — each batch computes one matmul
against the broadcast query matrix and emits per-batch partial top-k
rows; a tiny groupby merges them (same shape as the geo kNN).  The
scale path (IVF: cluster centroids as an inverted index, probe the
nearest buckets only) scores each batch bucket-by-bucket so every
row is touched by exactly one matmul against the queries probing its
bucket; shuffle volume stays O(P * k * batches) either way.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from .knn import tie_complete_smallest


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) float64 view of a list<float> column — zero-copy
    through the flattened Arrow values buffer (no per-row Python)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten()
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
    else:
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError(f"ragged embedding column {col!r}")
    vals = flat.to_numpy(zero_copy_only=False)
    return vals.reshape(n, dim).astype(np.float64, copy=False)


def _unit_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)


def cosine_topk_partial(batch: pa.Table, queries_ref, k: int,
                        id_col: str = "vec_id",
                        embed_col: str = "embedding") -> pa.Table:
    """Per-batch top-k cosine matches for every broadcast query row
    (tie-complete at the k-th similarity, so the merge's
    (cosine desc, neighbor_id) order is exact on duplicates)."""
    import ray
    qids, Q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) \
        else queries_ref
    Xn = _unit_rows(_matrix(batch, embed_col))
    Qn = _unit_rows(np.asarray(Q, dtype=np.float64))
    sims = Xn @ Qn.T  # (n, P)
    rows, qcols = tie_complete_smallest(sims, k, largest=True)
    qarr = pa.array(list(qids))
    return pa.table({
        "query_id": qarr.take(pa.array(qcols, pa.int64())),
        "neighbor_id": batch.column(id_col).take(pa.array(rows, pa.int64())),
        "cosine": pa.array(sims[rows, qcols], pa.float64()),
    })


def finalize_cosine_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    g = group.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def train_ivf_centroids(sample: np.ndarray, n_centroids: int,
                        iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a bounded sample (the IVF coarse
    quantizer).  Callers must pass a STREAMED sample (``ds.limit`` /
    ``ds.random_sample``), never a full-table driver read; training
    cost is then independent of table size."""
    rng = np.random.default_rng(seed)
    X = np.asarray(sample, dtype=np.float64)
    Xn = _unit_rows(X)
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


def sample_embedding_matrix(ds, n_rows: int,
                            embed_col: str = "embedding") -> np.ndarray:
    """Bounded training sample via a streamed limit (only ``n_rows``
    rows ever reach the driver, regardless of table size)."""
    tbl = ds.limit(n_rows).take_batch(n_rows, batch_format="pyarrow")
    return _matrix(tbl, embed_col)


def ivf_assign(batch: pa.Table, centroids_ref,
               embed_col: str = "embedding") -> pa.Table:
    """Add the nearest-centroid bucket column (the IVF partition key)."""
    import ray
    C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
        else centroids_ref
    Xn = _unit_rows(_matrix(batch, embed_col))
    bucket = np.argmax(Xn @ np.asarray(C).T, axis=1).astype(np.int32)
    return batch.append_column("ivf_bucket", pa.array(bucket, pa.int32()))


def embedding_knn_ivf(ds, queries: Tuple[Sequence[int], np.ndarray], k: int,
                      centroids: np.ndarray, nprobe: int = 4,
                      id_col: str = "vec_id", embed_col: str = "embedding"):
    """IVF-pruned cosine top-k: rows are bucket-sorted per batch and
    each bucket does ONE matmul against the queries probing it (the
    inverted bucket->queries index is built once on the driver).
    Approximate (recall < 1 possible at bucket boundaries) — the scale
    path next to the exact brute baseline; recall is measured in
    tests."""
    import ray

    C = np.asarray(centroids, dtype=np.float64)
    qids, Q = queries
    Qn = _unit_rows(np.asarray(Q, dtype=np.float64))
    # query -> nprobe nearest centroids, inverted to bucket -> queries
    probe_order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    bucket_queries = {}
    for qi in range(len(qids)):
        for b in probe_order[qi]:
            bucket_queries.setdefault(int(b), []).append(qi)
    bucket_queries = {b: np.asarray(v, dtype=np.int64)
                      for b, v in bucket_queries.items()}
    cref = ray.put(C)
    qref = ray.put((pa.array(list(qids)), Qn, bucket_queries))

    def _partial(batch: pa.Table) -> pa.Table:
        qarr, Qn_l, b2q = ray.get(qref)
        b = ivf_assign(batch, cref, embed_col)
        buckets = b.column("ivf_bucket").to_numpy()
        Xn = _unit_rows(_matrix(batch, embed_col))
        order = np.argsort(buckets, kind="stable")
        sorted_b = buckets[order]
        starts = np.searchsorted(sorted_b, np.unique(sorted_b), side="left")
        bounds = np.append(starts, len(sorted_b))
        out_rows, out_q, out_s = [], [], []
        for i, bb in enumerate(np.unique(sorted_b)):
            qlist = b2q.get(int(bb))
            if qlist is None:
                continue
            rows_bb = order[bounds[i]:bounds[i + 1]]
            sims = Xn[rows_bb] @ Qn_l[qlist].T  # (nb, nq)
            r, c = tie_complete_smallest(sims, k, largest=True)
            out_rows.append(rows_bb[r])
            out_q.append(qlist[c])
            out_s.append(sims[r, c])
        if not out_rows:
            return pa.table({"query_id": pa.array([], qarr.type),
                             "neighbor_id": pa.array(
                                 [], batch.schema.field(id_col).type),
                             "cosine": pa.array([], pa.float64())})
        rows = np.concatenate(out_rows)
        qcols = np.concatenate(out_q)
        simv = np.concatenate(out_s)
        return pa.table({
            "query_id": qarr.take(pa.array(qcols, pa.int64())),
            "neighbor_id": batch.column(id_col)
                                .take(pa.array(rows, pa.int64())),
            "cosine": pa.array(simv, pa.float64())})

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


# -- embedding cosine near-duplicates ---------------------------------------

def gather_embeddings_ref(ds, id_col: str = "vec_id",
                          embed_col: str = "embedding"):
    """(ids, unit-row matrix) as ONE Ray object assembled by a cluster
    task from the dataset's blocks: the driver holds only the
    ObjectRef, never the data (broadcast-small-side pattern — valid in
    the regime where the embedding table fits the object store, which
    is exactly the regime of the brute baseline below)."""
    import ray

    refs = ds.to_arrow_refs()

    @ray.remote
    def _build(*tables):
        t = pa.concat_tables(tables)
        ids = t.column(id_col).to_numpy().astype(np.int64)
        return ids, _unit_rows(_matrix(t, embed_col))

    return _build.remote(*refs)


def embed_neardup(ds, threshold: float = 0.4, id_col: str = "vec_id",
                  embed_col: str = "embedding"):
    """All-pairs cosine near-duplicates (vec_a < vec_b, cosine >=
    threshold): the brute baseline of the near-dup family.  Each batch
    runs one matmul against the broadcast unit matrix and emits every
    qualifying unordered pair exactly once (from its smaller-id side);
    the O(n^2) work is the definition of the exact problem — the
    bucketed variant below is the scale path."""
    import ray

    ref = gather_embeddings_ref(ds, id_col, embed_col)

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_all, Mn = ray.get(ref)
        my_ids = batch.column(id_col).to_numpy().astype(np.int64)
        B = _unit_rows(_matrix(batch, embed_col))
        sims = B @ Mn.T
        mask = (sims >= threshold) & (my_ids[:, None] < ids_all[None, :])
        r, c = np.nonzero(mask)
        return pa.table({
            "vec_a": pa.array(my_ids[r], pa.int64()),
            "vec_b": pa.array(ids_all[c], pa.int64()),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow")


def embed_neardup_ivf(ds, threshold: float = 0.9, n_centroids: int = 16,
                      n_probe: int = 2, train_rows: int = 4096,
                      id_col: str = "vec_id",
                      embed_col: str = "embedding"):
    """Scale path: multi-probe IVF bucketing — each vector lands in its
    ``n_probe`` nearest coarse-centroid buckets, pairs form by exact
    cosine only WITHIN a bucket, and a final tiny groupby dedups pairs
    that shared more than one bucket.  Only (bucket, id, embedding)
    rows shuffle; recall is the probability that a qualifying pair
    shares at least one of each side's n_probe buckets (high for true
    near-dups; see tests/test_embed.py planted-corpus check)."""
    import ray

    C = train_ivf_centroids(sample_embedding_matrix(ds, train_rows),
                            n_centroids)
    c_ref = ray.put(C)

    def _assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        Xn = _unit_rows(_matrix(batch, embed_col))
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        sims = Xn @ np.asarray(cm).T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        n, dim = Xn.shape
        rep = np.repeat(np.arange(n), n_probe)
        flat = Xn[rep].ravel()
        offsets = np.arange(n * n_probe + 1, dtype=np.int32) * dim
        emb_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.float64()))
        return pa.table({
            "bucket": pa.array(top.ravel().astype(np.int32), pa.int32()),
            "vec_id": pa.array(ids[rep], pa.int64()),
            "unit": emb_arr,
        })

    def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.stack([np.asarray(v, dtype=np.float64)
                      for v in group["unit"].to_numpy()[order]])
        sims = M @ M.T
        mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
        r, c = np.nonzero(mask)
        return pd.DataFrame({"vec_a": pd.Series(ids[r], dtype="int64"),
                             "vec_b": pd.Series(ids[c], dtype="int64")})

    def _dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    pairs = (ds.map_batches(_assign, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(lambda g: _bucket_pairs(g.drop(columns=["bucket"])),
                         batch_format="pandas"))
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        _dedup, batch_format="pandas")


# ---------------------------------------------------------------------------
# Product quantization (PQ): the compressed-candidate scale path
# ---------------------------------------------------------------------------

def train_pq_codebooks(sample: np.ndarray, n_sub: int = 8,
                       n_codes: int = 256, iters: int = 10,
                       seed: int = 43) -> np.ndarray:
    """Per-subspace k-means codebooks on a BOUNDED sample (same
    contract as train_ivf_centroids: callers stream the sample, never
    the table).  Vectors are unit-normalized first so cosine becomes a
    plain inner product and the ADC tables decompose exactly:
    q . x_hat = sum_s q_s . c_{s, code_s}.  Returns
    (n_sub, n_codes, dim // n_sub) float64."""
    rng = np.random.default_rng(seed)
    Xn = _unit_rows(np.asarray(sample, dtype=np.float64))
    n, dim = Xn.shape
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d = dim // n_sub
    books = np.empty((n_sub, min(n_codes, n), d), dtype=np.float64)
    for s in range(n_sub):
        S = Xn[:, s * d:(s + 1) * d]
        idx = rng.choice(n, size=min(n_codes, n), replace=False)
        C = S[np.sort(idx)].copy()
        for _ in range(iters):
            # |x-c|^2 = |x|^2 - 2 x.c + |c|^2 via BLAS
            d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) \
                + (C * C).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(len(C)):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[s, :len(C)] = C
    return books


def pq_encode(batch: pa.Table, codebooks_ref,
              embed_col: str = "embedding") -> pa.Table:
    """Append ``pq_code`` (fixed_size_list<uint8>[n_sub]): at 64-dim
    float32 -> 8 bytes this is a 32x smaller scan payload; at 768-dim
    it is 384x.  Codes are what a 100-TB candidate scan reads; raw
    vectors stay behind for optional re-rank."""
    import ray
    books = ray.get(codebooks_ref) \
        if isinstance(codebooks_ref, ray.ObjectRef) else codebooks_ref
    Xn = _unit_rows(_matrix(batch, embed_col))
    n_sub, n_codes, d = books.shape
    codes = np.empty((len(Xn), n_sub), dtype=np.uint8)
    for s in range(n_sub):
        S = Xn[:, s * d:(s + 1) * d]
        C = books[s]
        d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    flat = pa.array(codes.reshape(-1), pa.uint8())
    arr = pa.FixedSizeListArray.from_arrays(flat, n_sub)
    return batch.append_column("pq_code", arr)


def embedding_knn_pq(ds, queries, k: int, codebooks: np.ndarray,
                     rerank: int = 32, id_col: str = "vec_id",
                     embed_col: str = "embedding",
                     exact_mode: bool = False):
    """PQ-ADC cosine top-k: each batch scores all rows against every
    query with 8 table gathers instead of a (n, dim) matmul, keeps the
    approx top-``rerank`` per query (tie-complete), then re-ranks just
    those candidates with EXACT cosines (the raw vectors are still in
    the batch, so re-rank is local and free of extra I/O).  Emitted
    partials carry exact cosines, so the global merge is the same
    deterministic (cosine desc, neighbor_id) order as the brute path;
    approximation only affects which candidates survive the per-batch
    cut (recall measured in tests).

    ``exact_mode`` makes the result BATCH-INDEPENDENT (the seeded-PQ
    driver representative): partials also carry the ADC approx score
    — a pure function of (row, query), so identical under any batch
    layout — and the finalize takes the GLOBAL approx top-``rerank``
    first, then the exact top-k within it.  Every per-batch top-R is
    a superset of its batch's members of the global top-R, so the cut
    loses nothing; the whole query becomes a deterministic function
    of the table and is SQL-expressible."""
    import ray

    qids, Q = queries
    Qn = _unit_rows(np.asarray(Q, dtype=np.float64))
    books = np.asarray(codebooks, dtype=np.float64)
    n_sub, n_codes, d = books.shape
    # ADC tables: T[p, s, c] = q_p[s-th subvector] . codebook[s][c]
    T = np.einsum("psd,scd->psc", Qn.reshape(len(Qn), n_sub, d), books)
    qref = ray.put((pa.array(list(qids)), Qn, T))
    bref = ray.put(books)
    cand = max(k, rerank)

    def _partial(batch: pa.Table) -> pa.Table:
        qarr, Qn_l, T_l = ray.get(qref)
        enc = pq_encode(batch, bref, embed_col) if "pq_code" not in \
            batch.column_names else batch
        codes = np.asarray(enc.column("pq_code").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(batch), -1)
        approx = np.zeros((len(batch), len(Qn_l)), dtype=np.float64)
        for s in range(codes.shape[1]):
            approx += T_l[:, s, codes[:, s]].T
        rows, qcols = tie_complete_smallest(approx, cand, largest=True)
        if not len(rows):
            out = {
                "query_id": qarr.take(pa.array([], pa.int64())),
                "neighbor_id": batch.column(id_col)
                                    .take(pa.array([], pa.int64())),
                "cosine": pa.array([], pa.float64()),
            }
            if exact_mode:
                out["approx"] = pa.array([], pa.float64())
            return pa.table(out)
        Xn = _unit_rows(_matrix(batch, embed_col))
        exact = np.einsum("ij,ij->i", Xn[rows], Qn_l[qcols])
        out = {
            "query_id": qarr.take(pa.array(qcols, pa.int64())),
            "neighbor_id": batch.column(id_col).take(
                pa.array(rows, pa.int64())),
            "cosine": pa.array(exact, pa.float64()),
        }
        if exact_mode:
            out["approx"] = pa.array(approx[rows, qcols], pa.float64())
        return pa.table(out)

    def _finalize_exact(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["approx", "neighbor_id"],
                          ascending=[False, True],
                          kind="mergesort").head(cand)
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g.drop(columns=["approx"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=4096)
    fin = _finalize_exact if exact_mode \
        else (lambda g: finalize_cosine_topk(g, k))
    return partials.groupby("query_id").map_groups(
        fin, batch_format="pandas")


def embedding_knn_ivfpq(ds, queries, k: int, centroids: np.ndarray,
                        codebooks: np.ndarray, nprobe: int = 4,
                        rerank: int = 64, id_col: str = "vec_id",
                        embed_col: str = "embedding"):
    """IVF + PQ composed (the canonical web-scale ANN shape): the IVF
    coarse quantizer prunes which rows each query touches at all, and
    within a probed bucket the candidate scan reads 8-byte PQ codes
    via ADC gathers instead of raw vectors; approx survivors re-rank
    with exact cosines in-batch.  Cost per batch ~
    sum_buckets(|bucket| x probing-queries x n_sub gathers) + a tiny
    exact matmul over survivors — both knobs (nprobe, rerank) trade
    recall for scan cost, measured in tests."""
    import ray

    C = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    n_sub, n_codes, d = books.shape
    qids, Q = queries
    Qn = _unit_rows(np.asarray(Q, dtype=np.float64))
    T = np.einsum("psd,scd->psc", Qn.reshape(len(Qn), n_sub, d), books)
    probe_order = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    bucket_queries = {}
    for qi in range(len(qids)):
        for b in probe_order[qi]:
            bucket_queries.setdefault(int(b), []).append(qi)
    bucket_queries = {b: np.asarray(v, dtype=np.int64)
                      for b, v in bucket_queries.items()}
    cref = ray.put(C)
    bref = ray.put(books)
    qref = ray.put((pa.array(list(qids)), Qn, T, bucket_queries))
    cand = max(k, rerank)

    def _partial(batch: pa.Table) -> pa.Table:
        qarr, Qn_l, T_l, b2q = ray.get(qref)
        enc = pq_encode(batch, bref, embed_col) \
            if "pq_code" not in batch.column_names else batch
        codes = np.asarray(enc.column("pq_code").combine_chunks()
                           .flatten().to_numpy(zero_copy_only=False)
                           ).reshape(len(batch), -1)
        b = ivf_assign(batch, cref, embed_col)
        buckets = b.column("ivf_bucket").to_numpy()
        order = np.argsort(buckets, kind="stable")
        sorted_b = buckets[order]
        uniq = np.unique(sorted_b)
        starts = np.searchsorted(sorted_b, uniq, side="left")
        bounds_ = np.append(starts, len(sorted_b))
        out_rows, out_q = [], []
        for i, bb in enumerate(uniq):
            qlist = b2q.get(int(bb))
            if qlist is None:
                continue
            rows_bb = order[bounds_[i]:bounds_[i + 1]]
            approx = np.zeros((len(rows_bb), len(qlist)), dtype=np.float64)
            for s in range(codes.shape[1]):
                approx += T_l[qlist][:, s, codes[rows_bb, s]].T
            r, c = tie_complete_smallest(approx, cand, largest=True)
            out_rows.append(rows_bb[r])
            out_q.append(qlist[c])
        if not out_rows:
            return pa.table({
                "query_id": qarr.take(pa.array([], pa.int64())),
                "neighbor_id": batch.column(id_col)
                                    .take(pa.array([], pa.int64())),
                "cosine": pa.array([], pa.float64())})
        rows = np.concatenate(out_rows)
        qcols = np.concatenate(out_q)
        Xn = _unit_rows(_matrix(batch, embed_col))
        exact = np.einsum("ij,ij->i", Xn[rows], Qn_l[qcols])
        return pa.table({
            "query_id": qarr.take(pa.array(qcols, pa.int64())),
            "neighbor_id": batch.column(id_col).take(
                pa.array(rows, pa.int64())),
            "cosine": pa.array(exact, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=8192)
    return partials.groupby("query_id").map_groups(
        lambda g: finalize_cosine_topk(g, k), batch_format="pandas")


# -- LSH (random signed hyperplanes) ANN -------------------------------------

def lsh_planes(dim: int, n_tables: int = 4, n_planes: int = 12,
               seed: int = 7) -> np.ndarray:
    """(n_tables, n_planes, dim) deterministic Gaussian hyperplanes —
    the random-hyperplane (SimHash-for-vectors) family: two unit
    vectors at angle theta land in the same 1-bit bucket with
    probability 1 - theta/pi, so a P-bit code over T tables gives the
    classic (1 - (1 - s^P)^T) LSH recall curve."""
    if n_planes > 62:
        raise ValueError("n_planes must fit an int64 code")
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _lsh_codes(Xn: np.ndarray, planes_t: np.ndarray) -> np.ndarray:
    """Pack one table's sign bits into int64 codes."""
    bits = (Xn @ planes_t.T) > 0.0          # (n, P)
    weights = (np.int64(1) << np.arange(bits.shape[1], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def embedding_knn_lsh(ds, queries: Tuple[Sequence[int], np.ndarray],
                      k: int, *, n_tables: int = 4, n_planes: int = 12,
                      multiprobe: int = 1, seed: int = 7,
                      id_col: str = "vec_id",
                      embed_col: str = "embedding"):
    """LSH-bucketed approximate cosine top-k — the hash-family scale
    path next to IVF (centroid family) and PQ (compression family).

    Driver side: each query registers in its exact code bucket per
    table, plus every 1-bit-flip neighbor bucket when ``multiprobe >=
    1`` (T x (1+P) dict entries per query — constant, broadcast once).
    Batch side: one sign-matmul per table codes all rows, rows
    bucket-sort per table, and each populated bucket that some query
    probes does ONE matmul of its rows against those queries.
    Candidate (row, query) pairs dedupe across tables inside the
    batch, then a per-batch per-query top-k bounds what shuffles to
    the same tiny groupby(query_id) merge the exact baseline uses —
    so a neighbor reaches the merge at most once and the final
    (cosine desc, neighbor_id) order is exact over the candidate set.
    Approximate overall (recall measured in tests vs the brute
    baseline); no full-table materialization anywhere."""
    import ray

    qids, Q = queries
    Qn = _unit_rows(np.asarray(Q, dtype=np.float64))
    planes = lsh_planes(Qn.shape[1], n_tables, n_planes, seed)
    P = n_planes
    bucket_queries: dict = {}
    for t in range(n_tables):
        qcodes = _lsh_codes(Qn, planes[t])
        for qi, code in enumerate(qcodes):
            probes = [int(code)]
            if multiprobe >= 1:
                probes += [int(code) ^ (1 << b) for b in range(P)]
            for c in probes:
                bucket_queries.setdefault((t << P) | c, []).append(qi)
    bucket_queries = {key: np.unique(np.asarray(v, dtype=np.int64))
                      for key, v in bucket_queries.items()}
    qref = ray.put((pa.array(list(qids)), Qn, planes, bucket_queries))

    def _partial(batch: pa.Table) -> pa.Table:
        qarr, Qn_l, planes_l, b2q = ray.get(qref)
        Xn = _unit_rows(_matrix(batch, embed_col))
        n = len(Xn)
        nq = len(Qn_l)
        cand_rows, cand_q = [], []
        for t in range(len(planes_l)):
            codes = (np.int64(t) << np.int64(P)) | _lsh_codes(
                Xn, planes_l[t])
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            uniq, starts = np.unique(sc, return_index=True)
            bounds = np.append(starts, n)
            for i, code in enumerate(uniq):
                qlist = b2q.get(int(code))
                if qlist is None:
                    continue
                rows = order[starts[i]:bounds[i + 1]]
                cand_rows.append(np.repeat(rows, len(qlist)))
                cand_q.append(np.tile(qlist, len(rows)))
        empty = pa.table({
            "query_id": qarr.take(pa.array([], pa.int64())),
            "neighbor_id": batch.column(id_col)
                                .take(pa.array([], pa.int64())),
            "cosine": pa.array([], pa.float64())})
        if not cand_rows:
            return empty
        pair = np.concatenate(cand_rows) * np.int64(nq) \
            + np.concatenate(cand_q)
        pair = np.unique(pair)              # dedupe across tables
        rows = pair // nq
        qcols = pair % nq
        cos = np.einsum("ij,ij->i", Xn[rows], Qn_l[qcols])
        # per-batch per-query top-k with the merge's exact comparator
        nbr = batch.column(id_col).to_numpy()[rows]
        order = np.lexsort((nbr, -cos, qcols))
        qs = qcols[order]
        new = np.empty(len(qs), dtype=bool)
        new[0] = True
        new[1:] = qs[1:] != qs[:-1]
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        pos = np.arange(len(qs)) - starts[gid]
        sel = order[pos < k]
        return pa.table({
            "query_id": qarr.take(pa.array(qcols[sel], pa.int64())),
            "neighbor_id": batch.column(id_col).take(
                pa.array(rows[sel], pa.int64())),
            "cosine": pa.array(cos[sel], pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=8192)
    return partials.groupby("query_id").map_groups(
        lambda g: finalize_cosine_topk(g, k), batch_format="pandas")

"""Embedding similarity search: exact brute top-k vs in-memory oracle;
IVF scale path recall."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

RNG = np.random.default_rng(77)

N, D = 3000, 32
# clustered vectors so IVF has structure
CENTERS = RNG.normal(size=(12, D))
ASSIGN = RNG.integers(0, 12, N)
X = CENTERS[ASSIGN] + 0.15 * RNG.normal(size=(N, D))
TBL = pa.table({
    "vec_id": pa.array(np.arange(N)),
    "embedding": pa.array([row.astype(np.float32).tolist() for row in X],
                          pa.list_(pa.float32())),
})
QIDS = list(range(5))
Q = np.asarray(X[:5], dtype=np.float64)
K = 10


def _oracle_topk():
    Xf = np.stack([np.asarray(v, dtype=np.float64)
                   for v in TBL.column("embedding").to_pylist()])
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    out = {}
    for qi, q in zip(QIDS, Q):
        qn = q / np.linalg.norm(q)
        sims = Xn @ qn
        order = np.lexsort((np.arange(N), -sims))[:K]
        out[qi] = list(order)
    return out


def test_embedding_knn_matches_oracle(ray_session):
    import ray.data as rd
    from geo_ray.stages.embed import embedding_knn

    got = embedding_knn(rd.from_arrow(TBL), (QIDS, Q), K).to_pandas()
    oracle = _oracle_topk()
    for qi in QIDS:
        sub = got[got["query_id"] == qi].sort_values("rank")
        assert list(sub["neighbor_id"]) == oracle[qi], qi


def test_ivf_recall(ray_session):
    import ray.data as rd
    from geo_ray.stages.embed import (embedding_knn_ivf,
                                      train_ivf_centroids)

    C = train_ivf_centroids(X, 12, iters=8)
    assert C.shape == (12, D)
    got = embedding_knn_ivf(rd.from_arrow(TBL), (QIDS, Q), K, C,
                            nprobe=3).to_pandas()
    oracle = _oracle_topk()
    recalls = []
    for qi in QIDS:
        sub = set(got[got["query_id"] == qi]["neighbor_id"])
        recalls.append(len(sub & set(oracle[qi])) / K)
    assert np.mean(recalls) >= 0.9, recalls


def test_ivf_assign_is_deterministic():
    from geo_ray.stages.embed import ivf_assign, train_ivf_centroids

    C = train_ivf_centroids(X, 8, iters=4)
    a1 = ivf_assign(TBL, C).column("ivf_bucket").to_numpy()
    a2 = ivf_assign(TBL, C).column("ivf_bucket").to_numpy()
    assert (a1 == a2).all()
    assert len(np.unique(a1)) > 1


def test_embed_neardup_ivf_planted_recall(ray_session):
    """IVF-bucketed near-dup (the scale path) must recover planted
    near-duplicates: perturbed copies of base vectors (cosine ~0.95+)
    at threshold 0.9, recall >= 0.9 vs the brute baseline and perfect
    precision (pairs are exact-cosine-verified inside buckets)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from geo_ray.stages.embed import embed_neardup, embed_neardup_ivf

    t = pq.read_table("/root/testdata/sf0.01/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    base = np.asarray(t.column("embedding").combine_chunks().values) \
        .reshape(len(t), -1).astype(np.float64)
    rng = np.random.default_rng(3)
    planted = base[:100] + 0.1 * rng.standard_normal((100, base.shape[1])) \
        * np.linalg.norm(base[:100], axis=1, keepdims=True) / 8.0
    allv = np.concatenate([base, planted]).astype(np.float32)
    ids = np.concatenate([t.column("vec_id").to_numpy().astype(np.int64),
                          np.arange(100) + 1_000_000])
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(allv), pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    want = embed_neardup(ds, threshold=0.9).to_pandas()
    got = embed_neardup_ivf(ds, threshold=0.9).to_pandas()
    want_set = set(zip(want["vec_a"], want["vec_b"]))
    got_set = set(zip(got["vec_a"], got["vec_b"]))
    assert len(want_set) >= 90  # the planted copies qualify
    assert got_set <= want_set  # perfect precision
    assert len(got_set & want_set) / len(want_set) >= 0.9  # recall


def test_pq_recall_and_exact_rerank(ray_session):
    """PQ-ADC with exact re-rank: recall >= 0.9 vs brute on clustered
    vectors, and every emitted cosine is the EXACT cosine (re-rank
    contract), so surviving candidates sort identically to brute."""
    import ray.data as rd
    from geo_ray.stages.embed import (embedding_knn_pq,
                                      train_pq_codebooks)

    books = train_pq_codebooks(X, n_sub=8, iters=8)
    assert books.shape == (8, 256, D // 8)
    # rerank depth must exceed the near-tie set: cluster members here
    # differ by ~1e-3 in cosine while PQ quantization error is ~0.05,
    # so the approx scan cannot rank WITHIN a cluster — it only needs
    # to surface the cluster, and the exact re-rank orders it.
    got = embedding_knn_pq(rd.from_arrow(TBL), (QIDS, Q), K, books,
                           rerank=320).to_pandas()
    oracle = _oracle_topk()
    Xf = np.stack([np.asarray(v, dtype=np.float64)
                   for v in TBL.column("embedding").to_pylist()])
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    recalls = []
    for qi in QIDS:
        sub = got[got["query_id"] == qi].sort_values("rank")
        recalls.append(len(set(sub["neighbor_id"]) & set(oracle[qi])) / K)
        qn = Q[qi] / np.linalg.norm(Q[qi])
        for nid, cos in zip(sub["neighbor_id"], sub["cosine"]):
            assert abs(float(Xn[nid] @ qn) - float(cos)) < 1e-12
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_encode_determinism_and_reconstruction():
    """Codes are deterministic; ADC on a vector that IS a reconstructed
    codeword recovers the exact decomposed inner product."""
    from geo_ray.stages.embed import pq_encode, train_pq_codebooks

    books = train_pq_codebooks(X, n_sub=8, iters=6)
    t1 = pq_encode(TBL, books)
    t2 = pq_encode(TBL, books)
    assert t1.column("pq_code").equals(t2.column("pq_code"))
    codes = np.asarray(t1.column("pq_code").combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)).reshape(N, 8)
    # reconstruct row 0 from its codes, then ADC(q, recon) must equal
    # the table-sum exactly
    d = D // 8
    recon = np.concatenate([books[s, codes[0, s]] for s in range(8)])
    q = Q[1] / np.linalg.norm(Q[1])
    T = np.einsum("sd,scd->sc", q.reshape(8, d), books)
    adc = sum(T[s, codes[0, s]] for s in range(8))
    assert abs(float(q @ recon) - float(adc)) < 1e-12


def test_pq_query_registered(ray_session):
    from geo_ray.pipelines.queries import q_embed_knn_pq, q_embed_knn

    got = q_embed_knn_pq("/root/testdata/sf0.001").to_pandas()
    exact = q_embed_knn("/root/testdata/sf0.001").to_pandas()
    assert set(got.columns) == {"query_id", "neighbor_id", "rank"}
    # recall vs the exact registered query on the real table
    rec = []
    for qi in got["query_id"].unique():
        g = set(got[got["query_id"] == qi]["neighbor_id"])
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        rec.append(len(g & e) / len(e))
    assert np.mean(rec) >= 0.85, rec


def test_ivfpq_recall(ray_session):
    """IVF coarse pruning composed with PQ codes + exact re-rank."""
    import ray.data as rd
    from geo_ray.stages.embed import (embedding_knn_ivfpq,
                                      train_ivf_centroids,
                                      train_pq_codebooks)

    C = train_ivf_centroids(X, 12, iters=8)
    books = train_pq_codebooks(X, n_sub=8, iters=8)
    got = embedding_knn_ivfpq(rd.from_arrow(TBL), (QIDS, Q), K, C, books,
                              nprobe=3, rerank=320).to_pandas()
    oracle = _oracle_topk()
    recalls = []
    for qi in QIDS:
        sub = got[got["query_id"] == qi]
        recalls.append(len(set(sub["neighbor_id"]) & set(oracle[qi])) / K)
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_recall_and_candidate_exactness(ray_session):
    """Random-hyperplane LSH path: mean recall >= 0.9 vs brute on the
    clustered corpus (multi-probe on), every returned cosine is the
    exact dot product of the unit vectors, and no (query, neighbor)
    pair is emitted twice despite multi-table candidate overlap."""
    import ray.data as rd
    from geo_ray.stages.embed import embedding_knn_lsh

    got = embedding_knn_lsh(rd.from_arrow(TBL).repartition(4),
                            (QIDS, Q), K, n_tables=6, n_planes=10,
                            multiprobe=1, seed=3).to_pandas()
    oracle = _oracle_topk()
    Xf = np.stack([np.asarray(v, dtype=np.float64)
                   for v in TBL.column("embedding").to_pylist()])
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    recalls = []
    for qi in QIDS:
        sub = got[got["query_id"] == qi]
        assert not sub["neighbor_id"].duplicated().any()
        qn = Q[qi] / np.linalg.norm(Q[qi])
        for nid, cos in zip(sub["neighbor_id"], sub["cosine"]):
            assert cos == pytest.approx(float(Xn[int(nid)] @ qn),
                                        abs=1e-12)
        recalls.append(len(set(sub["neighbor_id"]) & set(oracle[qi])) / K)
    assert np.mean(recalls) >= 0.9, recalls


def test_lsh_is_deterministic(ray_session):
    import ray.data as rd
    from geo_ray.stages.embed import embedding_knn_lsh

    a = embedding_knn_lsh(rd.from_arrow(TBL), (QIDS, Q), K,
                          seed=11).to_pandas()
    b = embedding_knn_lsh(rd.from_arrow(TBL).repartition(7), (QIDS, Q),
                          K, seed=11).to_pandas()
    key = ["query_id", "rank"]
    import pandas as pd
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[
            ["query_id", "neighbor_id", "rank"]],
        b.sort_values(key).reset_index(drop=True)[
            ["query_id", "neighbor_id", "rank"]])


def test_pq_exact_mode_batch_independent(ray_session):
    """exact_mode makes embedding_knn_pq a pure function of the table:
    the (global approx top-R, exact top-k) result must be identical
    under any partitioning, and equal to the numpy reference."""
    import ray

    from geo_ray.stages.embed import _unit_rows, embedding_knn_pq

    rng = np.random.default_rng(3)
    X = rng.normal(size=(400, 64))
    ids = np.arange(400, dtype=np.int64)
    Xn = _unit_rows(X)
    C = Xn[:8]
    books = np.stack([C[:, s * 16:(s + 1) * 16] for s in range(4)])
    qids = [0, 1, 2]
    Q = X[:3]
    tbl = pa.table({"vec_id": ids,
                    "embedding": [list(map(float, r)) for r in X]})

    outs = []
    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        out = embedding_knn_pq(ds, (qids, Q), 5, books, rerank=20,
                               exact_mode=True).to_pandas()
        out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
        outs.append(out[["query_id", "neighbor_id", "rank"]])
    pd.testing.assert_frame_equal(outs[0], outs[1])

    # numpy reference: codes -> ADC -> global top-20 -> exact top-5
    codes = np.empty((400, 4), dtype=np.int64)
    for s in range(4):
        S = Xn[:, s * 16:(s + 1) * 16]
        Cs = books[s]
        d2 = ((S * S).sum(1)[:, None] - 2 * (S @ Cs.T)
              + (Cs * Cs).sum(1)[None, :])
        codes[:, s] = np.argmin(d2, axis=1)
    Qn = _unit_rows(Q)
    for qi, qid in enumerate(qids):
        a = np.zeros(400)
        for s in range(4):
            Ts = Qn[qi, s * 16:(s + 1) * 16] @ books[s].T
            a += Ts[codes[:, s]]
        cand = np.lexsort((ids, -a))[:20]
        exact = Xn[cand] @ Qn[qi]
        top = cand[np.lexsort((ids[cand], -exact))[:5]]
        got = outs[0][outs[0].query_id == qid].neighbor_id.to_numpy()
        assert (got == top).all(), qid

"""Distributed connected components vs a brute union-find oracle:
random graphs, path chains (the adversarial shape for label
propagation — pointer jumping must keep rounds logarithmic), cliques,
isolated nodes, and the chain-edge builder's equivalence to the
quadratic interval graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

RNG = np.random.default_rng(20260818)


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def _run_cc(n_nodes, edges, **kw):
    import ray.data as rd

    from geo_ray.stages.cc import connected_components

    e = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                  "b": pa.array([b for _, b in edges], pa.int64())})
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n_nodes),
                                                       pa.int64())}))
    out, info = connected_components(rd.from_arrow(e), nodes_ds=nodes,
                                     node_col="doc_id", **kw)
    got = out.to_pandas().sort_values("node").reset_index(drop=True)
    return got, info


def _check(n_nodes, edges, **kw):
    got, info = _run_cc(n_nodes, edges, **kw)
    want = _uf_components(n_nodes, edges)
    assert len(got) == n_nodes
    assert got["node"].tolist() == list(range(n_nodes))
    assert got["rep"].tolist() == [want[i] for i in range(n_nodes)]
    return info


def test_random_graphs(ray_session):
    for trial in range(2):
        n = int(RNG.integers(5, 60))
        m = int(RNG.integers(0, 2 * n))
        edges = [(int(RNG.integers(0, n)), int(RNG.integers(0, n)))
                 for _ in range(m)]
        _check(n, edges, num_parts=7)


def test_path_chain_logarithmic_rounds(ray_session):
    """A 200-node path: plain hash-min needs ~200 rounds; with pointer
    jumping the round count must stay logarithmic."""
    n = 160
    edges = [(i, i + 1) for i in range(n - 1)]
    info = _check(n, edges, num_parts=8)
    assert info["rounds"] <= 12, info


def test_cliques_stars_isolated(ray_session):
    edges = ([(10, j) for j in range(11, 20)] +        # star
             [(a, b) for a in range(30, 34) for b in range(a + 1, 34)] +
             [(40, 41), (41, 42), (40, 42)])           # triangle
    _check(50, edges, num_parts=4)                     # 0..9 isolated


def test_self_loops_and_duplicate_edges(ray_session):
    edges = [(3, 3), (5, 6), (5, 6), (6, 5), (7, 7)]
    _check(10, edges)


def test_chain_edges_equal_interval_graph(ray_session):
    """chain_edges_by_gap must reproduce the connectivity of the full
    quadratic |v(a)-v(b)| <= delta graph, including across bands."""
    import ray.data as rd

    from geo_ray.stages.cc import chain_edges_by_gap, connected_components

    n, delta = 300, 2
    vals = np.sort(RNG.integers(0, 900, n)).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "n_chars": pa.array(vals, pa.int64())}))
    edges = chain_edges_by_gap(ds, "n_chars", "doc_id", delta,
                               band_width=32)
    out, _ = connected_components(
        edges, nodes_ds=ds.select_columns(["doc_id"]), node_col="doc_id",
        num_parts=8)
    got = out.to_pandas().sort_values("node")["rep"].tolist()

    brute = [(int(a), int(b)) for a in range(n) for b in range(a + 1, n)
             if abs(int(vals[a]) - int(vals[b])) <= delta]
    want = _uf_components(n, brute)
    assert got == [want[i] for i in range(n)]


def test_neardup_keep_list(ray_session):
    """End-to-end: minhash near-dup pairs -> clusters -> one canonical
    keep per cluster; planted A~B and B~C chains collapse to one rep
    even though (A, C) was never a direct pair."""
    import ray.data as rd

    from geo_ray.stages.cc import connected_components
    from geo_ray.stages.dedup import minhash_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    mid = base.replace("lazy", "sleepy")
    far = mid.replace("green", "dark")
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": mid},            # near 0
        {"doc_id": 2, "text": far},            # near 1, farther from 0
        {"doc_id": 3, "text": "completely different content here with "
                              "nothing shared at all between documents"},
    ]
    docs = rd.from_items(rows)
    pairs = minhash_dedup(docs, threshold=0.5)
    p = pairs.to_pandas()
    assert {(0, 1), (1, 2)}.issubset(set(zip(p["doc_a"], p["doc_b"])))
    out, _ = connected_components(
        pairs.select_columns(["doc_a", "doc_b"]),
        nodes_ds=docs.select_columns(["doc_id"]), node_col="doc_id",
        node_cols=("doc_a", "doc_b"), num_parts=4)
    got = dict(out.to_pandas()[["node", "rep"]].itertuples(index=False))
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3


def test_dedup_clusters_query_vs_duckdb(ray_session):
    import duckdb

    from geo_ray.pipelines.queries import (q_dedup_clusters,
                                           sql_dedup_clusters)

    sfd = "/root/testdata/sf0.001"
    got = q_dedup_clusters(sfd).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sfd}/documents.parquet')")
    want = con.execute(sql_dedup_clusters()).fetchdf() \
        .astype({"doc_id": "int64", "rep": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_corpus_curation_query_vs_duckdb(ray_session):
    """The composite curation pipeline (one-pass features -> filters ->
    exact dedup -> CC cluster collapse -> per-source/lang stats) must
    match the SQL oracle that composes the same definitions."""
    import duckdb

    from geo_ray.pipelines.queries import (q_corpus_curation,
                                           sql_corpus_curation)

    sfd = "/root/testdata/sf0.001"
    got = q_corpus_curation(sfd).to_pandas() \
        .sort_values(["source", "lang_pred"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sfd}/documents.parquet')")
    want = con.execute(sql_corpus_curation()).fetchdf().astype(
        {"kept_docs": "int64", "total_tokens": "int64"})
    pd.testing.assert_frame_equal(got, want)
    assert got["kept_docs"].sum() > 0


def test_label_loop_forced_multiblock(ray_session):
    """The single-block fast path must not be the only tested route:
    repartition the edges across blocks and disable the contraction
    cascade so the distributed hash-min + pointer-jump loop actually
    runs, and still matches brute union-find."""
    import ray.data as rd

    from geo_ray.stages.cc import connected_components

    n = 160
    edges = [(i, i + 1) for i in range(n - 1)]
    e = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                  "b": pa.array([b for _, b in edges], pa.int64())})
    nodes = rd.from_arrow(pa.table({"doc_id": pa.array(range(n),
                                                       pa.int64())}))
    out, info = connected_components(
        rd.from_arrow(e).repartition(8), nodes_ds=nodes,
        node_col="doc_id", num_parts=8, contraction_levels=0)
    assert not info.get("fast_path"), info
    assert 1 <= info["rounds"] <= 12, info
    got = out.to_pandas().sort_values("node").reset_index(drop=True)
    want = _uf_components(n, edges)
    assert got["rep"].tolist() == [want[i] for i in range(n)]


def test_fast_path_single_block_exact(ray_session):
    """When contraction collapses the graph to one block, the fast
    path must produce the identical labeling with zero label rounds."""
    edges = ([(10, j) for j in range(11, 20)] +
             [(40, 41), (41, 42), (40, 42)] + [(3, 3)])
    got, info = _run_cc(50, edges, num_parts=4)
    assert info.get("fast_path"), info
    assert info["rounds"] == 0
    want = _uf_components(50, edges)
    assert got["rep"].tolist() == [want[i] for i in range(50)]

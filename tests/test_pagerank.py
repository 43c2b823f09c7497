"""stages/pagerank.py: the broadcast and bucketed variants must be
bit-identical to each other and to a brute int64 reference, and the
bucketed variant must hold no node- or edge-sized driver state."""

from __future__ import annotations

import inspect

import numpy as np
import pandas as pd
import pytest

from geo_ray.stages.pagerank import (BASE, DAMP_DEN, DAMP_NUM, SCALE,
                                     pagerank_broadcast,
                                     pagerank_bucketed)


def _brute(edges: np.ndarray, nodes: np.ndarray, iters: int):
    """Direct int64 reference on dense arrays."""
    nodes = np.sort(np.unique(nodes))
    idx = {int(u): i for i, u in enumerate(nodes)}
    src = np.array([idx[int(s)] for s in edges[:, 0]])
    dst = np.array([idx[int(d)] for d in edges[:, 1]])
    deg = np.zeros(len(nodes), np.int64)
    np.add.at(deg, src, 1)
    rank = np.full(len(nodes), SCALE, np.int64)
    for _ in range(iters):
        c = rank[src] // deg[src]
        inb = np.zeros(len(nodes), np.int64)
        np.add.at(inb, dst, c)
        got = np.zeros(len(nodes), bool)
        got[dst] = True
        nxt = np.full(len(nodes), BASE, np.int64)
        nxt[got] = BASE + (DAMP_NUM * inb[got]) // DAMP_DEN
        rank = nxt
    return nodes, rank


def _graph(seed=0, n_nodes=120, n_edges=600, n_isolated=15):
    rng = np.random.RandomState(seed)
    ids = rng.choice(np.arange(10_000, 99_999), n_nodes + n_isolated,
                     replace=False).astype(np.int64)
    core, isolated = ids[:n_nodes], ids[n_nodes:]
    und = set()
    while len(und) < n_edges:
        a, b = rng.choice(core, 2, replace=False)
        und.add((min(a, b), max(a, b)))
    e = np.array(sorted(und), np.int64)
    directed = np.concatenate([e, e[:, ::-1]], axis=0)
    return directed, ids


def _edges_ds(directed):
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(
        {"src": directed[:, 0], "dst": directed[:, 1]})).repartition(6)


@pytest.mark.parametrize("iters", [1, 3])
def test_broadcast_matches_brute(ray_session, iters):
    directed, ids = _graph()
    out = pagerank_broadcast(_edges_ds(directed), ids, iters) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    nodes, rank = _brute(directed, ids, iters)
    assert (out["user_id"].to_numpy() == nodes).all()
    assert (out["rank_units"].to_numpy() == rank).all()


def test_bucketed_bit_identical_to_broadcast(ray_session):
    import ray.data as rd
    directed, ids = _graph(seed=3)
    want = pagerank_broadcast(_edges_ds(directed), ids, 3).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    nodes_ds = rd.from_pandas(
        pd.DataFrame({"user_id": ids})).repartition(4)
    got = pagerank_bucketed(_edges_ds(directed), nodes_ds, 3,
                            num_buckets=8) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucketed_holds_no_driver_state():
    """The 10^9-node shape must never materialize node- or edge-sized
    structures on the driver: no to_pandas / take_all / iter_rows /
    ray.put anywhere in its body."""
    src = inspect.getsource(pagerank_bucketed)
    doc = pagerank_bucketed.__doc__ or ""
    body = src.replace(doc, "")
    for banned in ["to_pandas", "take_all", "iter_rows", "ray.put",
                   "to_pylist"]:
        assert banned not in body, banned


def test_group_sum_int64_exact_and_edge_cases():
    from geo_ray.stages.pagerank import _group_sum_int64

    k, s = _group_sum_int64(np.empty(0, np.int64), np.empty(0, np.int64))
    assert len(k) == 0 and len(s) == 0

    k, s = _group_sum_int64(np.array([7], np.int64),
                            np.array([3], np.int64))
    assert k.tolist() == [7] and s.tolist() == [3]

    # exactness past 2^53 (the float64 bincount failure mode)
    big = np.int64(2**60)
    k, s = _group_sum_int64(np.array([1, 2, 1, 2, 1], np.int64),
                            np.array([big, 1, 1, big, 2], np.int64))
    assert k.tolist() == [1, 2]
    assert s.tolist() == [int(big) + 3, int(big) + 1]

    # matches pandas groupby on random input
    rng = np.random.RandomState(5)
    keys = rng.randint(0, 50, 4000).astype(np.int64)
    vals = rng.randint(-10**9, 10**9, 4000).astype(np.int64)
    k, s = _group_sum_int64(keys, vals)
    exp = pd.Series(vals).groupby(keys).sum()
    assert np.array_equal(k, exp.index.to_numpy())
    assert np.array_equal(s, exp.to_numpy())


# ---------------------------------------------------------------- HITS


def _hits_brute(directed: np.ndarray, ids: np.ndarray, iters: int):
    from geo_ray.stages.pagerank import SCALE
    nodes = np.sort(np.unique(ids))
    idx = {int(u): i for i, u in enumerate(nodes)}
    src = np.array([idx[int(s)] for s in directed[:, 0]])
    dst = np.array([idx[int(d)] for d in directed[:, 1]])
    hub = np.full(len(nodes), SCALE, np.int64)
    auth = np.zeros(len(nodes), np.int64)
    for _ in range(iters):
        a = np.zeros(len(nodes), np.int64)
        np.add.at(a, dst, hub[src])
        m = a.max()
        auth = a * SCALE // m if m > 0 else a
        h = np.zeros(len(nodes), np.int64)
        np.add.at(h, src, auth[dst])
        m = h.max()
        hub = h * SCALE // m if m > 0 else h
    return nodes, hub, auth


@pytest.mark.parametrize("iters", [1, 3])
def test_hits_broadcast_matches_brute(ray_session, iters):
    from geo_ray.stages.pagerank import hits_broadcast
    directed, ids = _graph(seed=5)
    out = pd.DataFrame(
        hits_broadcast(_edges_ds(directed), ids, iters).to_pandas()) \
        .sort_values("user_id").reset_index(drop=True)
    nodes, hub, auth = _hits_brute(directed, ids, iters)
    assert (out["user_id"].to_numpy() == nodes).all()
    assert (out["hub_units"].to_numpy() == hub).all()
    assert (out["auth_units"].to_numpy() == auth).all()


def test_hits_bucketed_bit_identical_to_broadcast(ray_session):
    import ray.data as rd
    from geo_ray.stages.pagerank import hits_broadcast, hits_bucketed
    directed, ids = _graph(seed=11)
    want = pd.DataFrame(
        hits_broadcast(_edges_ds(directed), ids, 3).to_pandas()) \
        .sort_values("user_id").reset_index(drop=True)
    nodes_ds = rd.from_pandas(
        pd.DataFrame({"user_id": ids})).repartition(4)
    got = hits_bucketed(_edges_ds(directed), nodes_ds, 3,
                        num_buckets=8) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hits_bucketed_holds_no_driver_state():
    """Same contract as pagerank_bucketed: no node- or edge-sized
    driver structures — the one allowed driver value is the scalar
    normalization max (a Ray max reduce)."""
    from geo_ray.stages.pagerank import hits_bucketed
    src = inspect.getsource(hits_bucketed)
    doc = hits_bucketed.__doc__ or ""
    body = src.replace(doc, "")
    for banned in ["to_pandas", "take_all", "iter_rows", "ray.put",
                   "to_pylist"]:
        assert banned not in body, banned

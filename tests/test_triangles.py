"""triangle_counts / edge_supports vs brute-force oracles."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geo_ray.stages.triangles import edge_supports, triangle_counts


def _brute(edges):
    es = {tuple(e) for e in edges}
    nodes = sorted({n for e in es for n in e})
    cnt = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return {n: c for n, c in cnt.items() if c > 0}


def _run(edges, driver_merge_rows=2_000_000):
    df = pd.DataFrame(edges, columns=["a", "b"]).astype(np.int64)
    out = triangle_counts(rd.from_pandas(df), n_buckets=8,
                          driver_merge_rows=driver_merge_rows) \
        .to_pandas()
    if out.empty:   # zero groups drop the schema (Ray Data quirk)
        return {}
    return dict(zip(out["node"].astype(int),
                    out["n_triangles"].astype(int)))


def test_k4_plus_tail(ray_session):
    # K4 (every vertex in 3 triangles) plus a triangle-free tail
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5)]
    assert _run(edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_duplicate_edges_collapse(ray_session):
    edges = [(0, 1), (0, 1), (1, 2), (0, 2), (0, 2)]
    assert _run(edges) == {0: 1, 1: 1, 2: 1}


def test_triangle_free(ray_session):
    # bipartite graph: no triangles, empty result
    edges = [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10)]
    assert _run(edges) == {}


@pytest.mark.parametrize("seed,n,m", [(7, 30, 120), (13, 50, 300)])
def test_random_graph_matches_brute(ray_session, seed, n, m):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    edges = list({(int(x), int(y)) for x, y in zip(lo, hi)})
    assert _run(edges) == _brute(edges)


def test_distributed_plan_matches_fast_path(ray_session):
    rng = np.random.default_rng(42)
    a = rng.integers(0, 40, 250)
    b = rng.integers(0, 40, 250)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    edges = list({(int(x), int(y)) for x, y in zip(lo, hi)})
    # driver_merge_rows=0 forces all six exchanges of the
    # distributed plan; both plans must agree with brute force
    dist = _run(edges, driver_merge_rows=0)
    assert dist == _run(edges) == _brute(edges)


def _brute_support(edges):
    es = {tuple(e) for e in edges}
    nbrs = {}
    for a, b in es:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return {(a, b): (len(nbrs[a] & nbrs[b]),
                     len(nbrs[a]), len(nbrs[b]))
            for a, b in es}


def _run_support(edges, driver_merge_rows=2_000_000):
    df = pd.DataFrame(edges, columns=["a", "b"]).astype(np.int64)
    out = edge_supports(rd.from_pandas(df), n_buckets=8,
                        driver_merge_rows=driver_merge_rows) \
        .to_pandas()
    if out.empty:
        return {}
    return {(int(r.a), int(r.b)): (int(r.support), int(r.deg_a),
                                   int(r.deg_b))
            for r in out.itertuples()}


def test_edge_support_k4(ray_session):
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4)]
    got = _run_support(edges)
    assert got == _brute_support(edges)
    assert got[(0, 1)] == (2, 3, 3)     # K4 edge: 2 common neighbors
    assert got[(3, 4)] == (0, 4, 1)     # pendant edge: support 0


@pytest.mark.parametrize("seed,n,m", [(7, 30, 120), (21, 45, 260)])
def test_edge_support_matches_brute(ray_session, seed, n, m):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    edges = list({(int(x), int(y)) for x, y in zip(lo, hi)})
    assert _run_support(edges) == _brute_support(edges)


def test_edge_support_distributed_matches_fast_path(ray_session):
    rng = np.random.default_rng(33)
    a = rng.integers(0, 30, 160)
    b = rng.integers(0, 30, 160)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    edges = list({(int(x), int(y)) for x, y in zip(lo, hi)})
    dist = _run_support(edges, driver_merge_rows=0)
    assert dist == _run_support(edges) == _brute_support(edges)


def test_large_ids_pack(ray_session):
    big = (1 << 32) - 2
    edges = [(big - 1, big), (big - 2, big), (big - 2, big - 1)]
    assert _run(edges) == {big: 1, big - 1: 1, big - 2: 1}

"""stages/kcore: h-index coreness vs the brute peeling definition,
fast path vs forced-distributed path equality."""

import numpy as np
import pandas as pd
import pytest

from geo_ray.stages.kcore import coreness, coreness_arrays, kcore_members


def _random_edges(rng, n, m):
    a = rng.integers(0, n, m * 2)
    b = rng.integers(0, n, m * 2)
    keep = a != b
    lo = np.minimum(a[keep], b[keep])
    hi = np.maximum(a[keep], b[keep])
    pk = np.unique(lo.astype(np.int64) * n + hi)[:m]
    return (pk // n).astype(np.int64), (pk % n).astype(np.int64)


def _brute_coreness(a, b):
    """Textbook peeling: repeatedly remove min-degree nodes."""
    adj = {}
    for u, v in zip(a.tolist(), b.tolist()):
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    core = {}
    alive = dict((n, len(s)) for n, s in adj.items())
    k = 0
    while alive:
        k = max(k, min(alive.values()))
        drop = [n for n, d in alive.items() if d <= k]
        for n in drop:
            core[n] = k
            del alive[n]
            for m_ in adj[n]:
                if m_ in alive:
                    alive[m_] -= 1
    return core


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_coreness_arrays_matches_peeling(seed):
    rng = np.random.default_rng(seed)
    n = 80
    a, b = _random_edges(rng, n, 300)
    nodes, core = coreness_arrays(a, b)
    brute = _brute_coreness(a, b)
    assert len(nodes) == len(brute)
    for nd, c in zip(nodes.tolist(), core.tolist()):
        assert brute[nd] == c, (nd, brute[nd], c)


def test_kcore_members_matches_definition(ray_session):
    rng = np.random.default_rng(7)
    a, b = _random_edges(rng, 60, 200)
    brute = _brute_coreness(a, b)
    for k in (2, 3, 4):
        member = sorted(n for n, c in brute.items() if c >= k)
        # induced degree within the k-core
        deg = {n: 0 for n in member}
        ms = set(member)
        for u, v in zip(a.tolist(), b.tolist()):
            if u in ms and v in ms:
                deg[u] += 1
                deg[v] += 1
        import ray.data as rd
        import pyarrow as pa
        eds = rd.from_arrow(pa.table({
            "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}))
        got = kcore_members(eds, k).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        want = pd.DataFrame({
            "node": [n for n in member if deg[n] > 0],
            "core_deg": [deg[n] for n in member if deg[n] > 0]})
        pd.testing.assert_frame_equal(
            got, want.astype(np.int64), check_dtype=False)
        # every member's induced degree is >= k (the definition)
        assert (got["core_deg"] >= k).all()


def test_distributed_path_equals_fast_path(ray_session):
    import ray.data as rd
    import pyarrow as pa

    rng = np.random.default_rng(11)
    a, b = _random_edges(rng, 50, 160)
    eds = rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}))
    fast = coreness(eds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = coreness(eds, driver_merge_rows=0, n_buckets=8) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, dist, check_dtype=False)

    fastm = kcore_members(eds, 3).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    distm = kcore_members(eds, 3, driver_merge_rows=0, n_buckets=8) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fastm, distm, check_dtype=False)

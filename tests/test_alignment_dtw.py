"""Polyline vertex alignment (DTW), consolidated module — ports the reference cases from
s2/polyline_alignment_test.go (window strides, upsample, dilate,
half resolution, exact alignment paths incl. the
distance-vs-squared-distance discriminator) plus brute-force
cross-checks of the vectorized anti-diagonal DP and the approximate
coarse-to-fine aligner."""

import itertools
import math

import numpy as np
import pytest

from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.functions.alignment import (Window, approx_vertex_alignment,
                                         consensus_polyline,
                                         exact_vertex_alignment,
                                         exact_vertex_alignment_cost,
                                         medoid_polyline,
                                         windowed_vertex_alignment)

RNG = np.random.default_rng(41)


def _line(spec: str) -> np.ndarray:
    pts = []
    for tok in spec.split(","):
        lat, lng = (float(v) for v in tok.strip().split(":"))
        pts.append([float(v) for v in latlng_deg_to_xyz(lat, lng)])
    return np.asarray(pts)


def _brute_cost(A, B) -> float:
    """Exponential brute force over all monotone warp paths."""
    R, C = len(A), len(B)
    best = [math.inf]

    def rec(i, j, acc):
        acc = acc + float(np.linalg.norm(A[i] - B[j]))
        if acc >= best[0]:
            return
        if i == R - 1 and j == C - 1:
            best[0] = acc
            return
        if i + 1 < R and j + 1 < C:
            rec(i + 1, j + 1, acc)
        if i + 1 < R:
            rec(i + 1, j, acc)
        if j + 1 < C:
            rec(i, j + 1, acc)

    rec(0, 0, 0.0)
    return best[0]


def test_window_create_from_strides():
    w = Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    assert w.is_valid()
    assert w.strides[0] == (0, 3)
    assert w.strides[4] == (4, 6)
    assert not Window([(1, 2), (1, 2)]).is_valid()      # corner unfilled
    assert not Window([(0, 3), (1, 4), (0, 4), (3, 4)]).is_valid()


def test_window_debug_string():
    w = Window([(0, 4)] * 4)
    assert w.debug_string() == " * * * *\n" * 4


def test_window_upsample_reference_goldens():
    # s2/polyline_alignment_test.go:72-199 — all four golden grids
    w = Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    up = w.upsample(10, 12)
    assert up.strides == [(0, 6), (0, 6), (2, 8), (2, 8), (4, 8),
                          (4, 8), (6, 12), (6, 12), (8, 12), (8, 12)]
    assert up.is_valid()
    # x-axis by factor of three
    assert w.upsample(5, 18).strides == [(0, 9), (3, 12), (6, 12),
                                         (9, 18), (12, 18)]
    # y-axis by factor of three
    assert w.upsample(15, 6).strides == [
        (0, 3), (0, 3), (0, 3), (1, 4), (1, 4), (1, 4), (2, 4),
        (2, 4), (2, 4), (3, 6), (3, 6), (3, 6), (4, 6), (4, 6), (4, 6)]
    # non-integer scale (19 x 23)
    up = w.upsample(19, 23)
    assert up.strides == [
        (0, 12), (0, 12), (0, 12), (0, 12),
        (4, 15), (4, 15), (4, 15), (4, 15),
        (8, 15), (8, 15), (8, 15),
        (12, 23), (12, 23), (12, 23), (12, 23),
        (15, 23), (15, 23), (15, 23), (15, 23)]


def test_window_dilate():
    # s2/polyline_alignment_test.go:200-262
    w = Window([(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)])
    assert w.dilate(0).strides == w.strides
    assert w.dilate(1).strides == [(0, 4), (0, 4), (1, 5),
                                   (1, 6), (1, 6)]
    assert w.dilate(2).strides == [(0, 5), (0, 6), (0, 6),
                                   (0, 6), (0, 6)]


def test_exact_alignment_reference_paths():
    cases = [
        ("1:1", "2:2", [(0, 0)]),
        ("0:0", "0:0, 1:1, 2:2", [(0, 0), (0, 1), (0, 2)]),
        ("0:0, 1:1, 2:2", "0:0", [(0, 0), (1, 0), (2, 0)]),
        ("1:0, 5:0, 6:0, 9:0", "2:0, 7:0, 8:0",
         [(0, 0), (1, 1), (2, 1), (3, 2)]),
        # distance (not squared distance) cost discriminator
        ("0.1:-0.1, 0.1:0, 0.1:0.1, -0.1:0.1",
         "0.1:-0.1, -0.1:-0.1, -0.1:0.1",
         [(0, 0), (1, 0), (2, 1), (3, 2)]),
    ]
    for a_s, b_s, want in cases:
        A, B = _line(a_s), _line(b_s)
        cost, path = exact_vertex_alignment(A, B)
        assert path == want, (a_s, b_s, path, want)
        assert math.isclose(cost, exact_vertex_alignment_cost(A, B),
                            rel_tol=1e-12)
        assert math.isclose(cost, _brute_cost(A, B), rel_tol=1e-12)


def test_exact_matches_brute_random():
    for _ in range(40):
        R = int(RNG.integers(1, 7))
        C = int(RNG.integers(1, 7))
        A = _rand_line(R)
        B = _rand_line(C)
        cost, path = exact_vertex_alignment(A, B)
        assert math.isclose(cost, _brute_cost(A, B), rel_tol=1e-12)
        assert path[0] == (0, 0) and path[-1] == (R - 1, C - 1)
        # monotone staircase
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert (i1 - i0, j1 - j0) in ((1, 1), (1, 0), (0, 1))


def _rand_line(n):
    lat0 = RNG.uniform(-60, 60)
    lng0 = RNG.uniform(-170, 170)
    lats = lat0 + np.cumsum(RNG.uniform(-1, 1, n))
    lngs = lng0 + np.cumsum(RNG.uniform(-1, 1, n))
    return np.stack(latlng_deg_to_xyz(lats, lngs), axis=1)


def test_windowed_full_window_equals_exact():
    A, B = _rand_line(9), _rand_line(7)
    w = Window([(0, 7)] * 9)
    wc, wp = windowed_vertex_alignment(A, B, w)
    ec, ep = exact_vertex_alignment(A, B)
    assert math.isclose(wc, ec, rel_tol=1e-12)
    assert wp == ep


def test_approx_upper_bounds_exact_and_converges():
    for n in (16, 33, 64):
        A, B = _rand_line(n), _rand_line(n + 5)
        exact = exact_vertex_alignment_cost(A, B)
        approx = approx_vertex_alignment(A, B, radius=3)[0]
        assert approx >= exact - 1e-12
        # a generous radius must recover the exact optimum
        wide = approx_vertex_alignment(A, B, radius=max(n + 5, 64))[0]
        assert math.isclose(wide, exact, rel_tol=1e-12)


def test_medoid_and_consensus():
    base = _rand_line(12)
    # two tight copies + one far outlier: medoid is among the copies
    jit = [base + RNG.normal(0, 1e-6, base.shape) for _ in range(2)]
    far = _rand_line(12)
    lines = [jit[0], jit[1], far]
    lines = [p / np.linalg.norm(p, axis=1)[:, None] for p in lines]
    m = medoid_polyline(lines)
    assert m in (0, 1)
    # consensus of identical lines is that line
    cons = consensus_polyline([base, base.copy(), base.copy()],
                              n_iters=3)
    assert np.allclose(cons, base / np.linalg.norm(base, axis=1)[:, None],
                       atol=1e-12)


def test_traj_dtw_matches_brute(ray_session):
    """Distributed traj_dtw vs a per-pair brute DP over the same
    colocation candidate pairs at sf0.001 — int64-exact equality."""
    import pandas as pd
    import pyarrow.parquet as pq

    from geo_ray.pipelines.queries import (_coloc_pairs_ds, q_traj_dtw)

    sf = "/root/testdata/sf0.01"
    got = q_traj_dtw(sf).to_pandas()
    assert len(got) > 0
    assert got["dtw_l1"].dtype == np.int64

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_id", "user_id", "ts"]) \
        .to_pandas().sort_values(["user_id", "ts", "event_id"])
    k = ev["event_id"].to_numpy(np.int64)
    ev["clat"] = (k * 7919) % 17000 - 8500
    ev["clng"] = (k * 104729) % 36000 - 18000
    tracks = {int(u): g[["clat", "clng"]].to_numpy(np.int64)
              for u, g in ev.groupby("user_id")}

    cl = _coloc_pairs_ds(sf).to_pandas()
    pairs = sorted({(int(min(a, b)), int(max(a, b)))
                    for a, b in zip(cl["user_a"], cl["user_b"])})
    assert len(pairs) == len(got)
    # brute-verify a deterministic sample (full set is quadratic DP
    # per pair in pure Python)
    pairs = [p for i, p in enumerate(pairs)
             if i % max(1, len(pairs) // 150) == 0]
    got = got.set_index(["user_a", "user_b"])

    def brute(A, B):
        n, m = len(A), len(B)
        d = (np.abs(A[:, None, 0] - B[None, :, 0])
             + np.abs(A[:, None, 1] - B[None, :, 1]))
        T = np.full((n, m), np.iinfo(np.int64).max, np.int64)
        T[0, 0] = d[0, 0]
        for i in range(n):
            for j in range(m):
                if i == 0 and j == 0:
                    continue
                best = np.iinfo(np.int64).max
                if i > 0:
                    best = min(best, T[i - 1, j])
                if j > 0:
                    best = min(best, T[i, j - 1])
                if i > 0 and j > 0:
                    best = min(best, T[i - 1, j - 1])
                T[i, j] = d[i, j] + best
        return int(T[-1, -1])

    for a, b in pairs:
        assert int(got.loc[(a, b), "dtw_l1"]) == \
            brute(tracks[a], tracks[b]), (a, b)


def test_dtw_cost_symmetry():
    """DTW is symmetric (the cost matrix transposes and the
    recurrence is symmetric in its arguments)."""
    for _ in range(10):
        A = _rand_line(int(RNG.integers(2, 20)))
        B = _rand_line(int(RNG.integers(2, 20)))
        assert math.isclose(exact_vertex_alignment_cost(A, B),
                            exact_vertex_alignment_cost(B, A),
                            rel_tol=1e-12)


def test_banded_dtw_exact_vs_brute(ray_session):
    """q_traj_dtw_exact's vectorized banded DP must equal a scalar
    brute recursion with the same truncation, band and sentinel
    semantics, for every colocated pair at sf0.01."""
    import numpy as np
    import pyarrow.parquet as pq

    from geo_ray.pipelines.queries import (_DTWX_L, _DTWX_W,
                                           q_traj_dtw_exact,
                                           q_events_colocation)

    sf = "/root/testdata/sf0.01"
    got = q_traj_dtw_exact(sf).to_pandas()
    assert len(got) > 0

    # rebuild tracks + pairs in plain numpy/pandas
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_id", "user_id", "ts"]).to_pandas()
    t["tsu"] = t["ts"].astype("datetime64[us]").astype(np.int64)
    t["clat"] = (t["event_id"] * 7919) % 17000 - 8500
    t["clng"] = (t["event_id"] * 104729) % 36000 - 18000
    t = t.sort_values(["user_id", "tsu", "event_id"])
    tracks = {u: g[["clat", "clng"]].to_numpy(np.int64)
              for u, g in t.groupby("user_id")}

    pr = q_events_colocation(sf).to_pandas()
    pairs = sorted({(min(a, b), max(a, b))
                    for a, b in zip(pr["user_a"], pr["user_b"])})

    INF = float("inf")

    def brute(A, B):
        L = min(len(A), len(B), _DTWX_L)
        A, B = A[:L], B[:L]
        from functools import lru_cache

        @lru_cache(maxsize=None)
        def T(i, j):
            if abs(i - j) > _DTWX_W or i < 0 or j < 0:
                return INF
            d = abs(int(A[i][0] - B[j][0])) + abs(int(A[i][1] - B[j][1]))
            if i == 0 and j == 0:
                return d
            return d + min(T(i - 1, j - 1), T(i - 1, j), T(i, j - 1))

        return int(T(L - 1, L - 1))

    got_map = {(a, b): v for a, b, v in
               zip(got["user_a"], got["user_b"], got["dtw_band_l1"])}
    assert set(got_map) == set(pairs)
    for a, b in pairs[:400]:
        assert got_map[(a, b)] == brute(tracks[a], tracks[b]), (a, b)

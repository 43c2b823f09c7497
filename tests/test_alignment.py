"""Polyline alignment (DTW) vs the reference's own test cases
(s2/polyline_alignment_test.go:24-440) plus a brute-force oracle and
the grouped trajectory-medoid pattern."""

import math

import numpy as np
import pytest

from geo_ray.functions.alignment import (Window, approx_vertex_alignment,
                                         exact_vertex_alignment,
                                         exact_vertex_alignment_cost,
                                         half_resolution, medoid_polyline)
from geo_ray.state.polyline import Polyline


def _pl(text):
    return Polyline.from_latlngs_deg(
        [tuple(float(t) for t in tok.strip().split(":"))
         for tok in text.split(",")])


def test_window_from_strides():
    w = Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    assert w.is_valid()
    assert w.column_stride(0) == (0, 3)
    assert w.column_stride(4) == (4, 6)


def test_window_debug_string():
    w = Window([(0, 4)] * 4)
    assert w.debug_string() == " * * * *\n * * * *\n * * * *\n * * * *\n"


def test_window_upsample_factor_two():
    w = Window([(0, 3), (1, 4), (2, 4), (3, 6), (4, 6)])
    up = w.upsample(10, 12)
    assert up.is_valid()
    assert up.rows == 10 and up.cols == 12
    assert up.column_stride(0) == (0, 6)
    assert up.column_stride(9) == (8, 12)


DILATE_BASE = [(0, 3), (2, 3), (2, 3), (2, 4), (3, 6)]


@pytest.mark.parametrize("radius,want", [
    (0, " * * * . . .\n . . * . . .\n . . * . . .\n . . * * . .\n"
        " . . . * * *\n"),
    (1, " * * * * . .\n * * * * . .\n . * * * * .\n . * * * * *\n"
        " . * * * * *\n"),
    (2, " * * * * * .\n * * * * * *\n * * * * * *\n * * * * * *\n"
        " * * * * * *\n"),
])
def test_window_dilate(radius, want):
    assert Window(DILATE_BASE).dilate(radius).debug_string() == want


def test_half_resolution():
    p = _pl("0:0, 0:1, 0:2, 0:3, 0:4")
    h = half_resolution(p)
    assert len(h) == 3
    assert (h[0] == np.asarray(p.vertices[0])).all()
    assert (h[2] == np.asarray(p.vertices[4])).all()
    assert len(half_resolution(_pl("0:0, 0:1, 0:2, 0:3"))) == 2


# s2/polyline_alignment_test.go:355-425
PATH_CASES = [
    ("1:1", "2:2", [(0, 0)]),
    ("0:0", "0:0, 1:1, 2:2", [(0, 0), (0, 1), (0, 2)]),
    ("0:0, 1:1, 2:2", "0:0", [(0, 0), (1, 0), (2, 0)]),
    ("1:0, 5:0, 6:0, 9:0", "2:0, 7:0, 8:0",
     [(0, 0), (1, 1), (2, 1), (3, 2)]),
    # distance (not squared-distance) cost decides this path
    ("0.1:-0.1, 0.1:0, 0.1:0.1, -0.1:0.1", "0.1:-0.1, -0.1:-0.1, -0.1:0.1",
     [(0, 0), (1, 0), (2, 1), (3, 2)]),
]


@pytest.mark.parametrize("a,b,want", PATH_CASES)
def test_exact_alignment_paths(a, b, want):
    cost, path = exact_vertex_alignment(_pl(a), _pl(b))
    assert path == want
    assert abs(cost - exact_vertex_alignment_cost(_pl(a), _pl(b))) < 1e-15


def test_header_example_planar_cost():
    """The worked example from the reference's module comment
    (s2/polyline_alignment.go:47-75).  The comment's prose says
    "alignment_cost = 7" but its own DP table bottoms out at 5 and the
    stated warp path's pair distances sum to 1+2+1+1 = 5 — the table
    and path are authoritative."""
    a = np.array([[1, 0, 0], [5, 0, 0], [6, 0, 0], [9, 0, 0]], float)
    b = np.array([[2, 0, 0], [7, 0, 0], [8, 0, 0]], float)
    cost, path = exact_vertex_alignment(a, b)
    assert cost == 5.0
    assert path == [(0, 0), (1, 1), (2, 1), (3, 2)]
    assert exact_vertex_alignment_cost(a, b) == 5.0


def _brute_cost(A, B):
    """Min cost over all monotone warp paths (the reference's brute
    verifier)."""
    memo = {}

    def d(i, j):
        return float(np.linalg.norm(A[i] - B[j]))

    def rec(i, j):
        if (i, j) in memo:
            return memo[(i, j)]
        if i == 0 and j == 0:
            r = d(0, 0)
        elif i == 0:
            r = rec(0, j - 1) + d(0, j)
        elif j == 0:
            r = rec(i - 1, 0) + d(i, 0)
        else:
            r = min(rec(i - 1, j - 1), rec(i - 1, j), rec(i, j - 1)) + d(i, j)
        memo[(i, j)] = r
        return r

    return rec(len(A) - 1, len(B) - 1)


def test_exact_cost_matches_brute_random():
    rng = np.random.default_rng(4)
    for _ in range(20):
        na, nb = rng.integers(1, 9, size=2)
        A = rng.normal(size=(na, 3))
        B = rng.normal(size=(nb, 3))
        A /= np.linalg.norm(A, axis=1, keepdims=True)
        B /= np.linalg.norm(B, axis=1, keepdims=True)
        want = _brute_cost(A, B)
        assert abs(exact_vertex_alignment_cost(A, B) - want) < 1e-12
        got, path = exact_vertex_alignment(A, B)
        assert abs(got - want) < 1e-12
        # path validity: monotone, starts (0,0), ends (na-1, nb-1)
        assert path[0] == (0, 0) and path[-1] == (na - 1, nb - 1)
        for (r0, c0), (r1, c1) in zip(path, path[1:]):
            assert (r1 - r0, c1 - c0) in ((0, 1), (1, 0), (1, 1))


def test_approx_alignment_near_exact():
    """FastDTW pyramid: cost is >= exact (it searches a subset of
    paths) and close for smooth trajectories."""
    t = np.linspace(0, 1, 120)
    a = _pl(", ".join(f"{10 + 5 * ti:.4f}:{20 + 30 * ti:.4f}" for ti in t))
    b = _pl(", ".join(f"{10.2 + 5 * ti:.4f}:{20.1 + 30 * ti:.4f}"
                      for ti in t))
    exact = exact_vertex_alignment_cost(a, b)
    approx, _ = approx_vertex_alignment(a, b, radius=2)
    assert approx >= exact - 1e-12
    assert approx <= exact * 1.05 + 1e-9


def test_medoid_polyline_planted():
    rng = np.random.default_rng(9)
    base = np.stack([np.cos(np.linspace(0, 1, 30)),
                     np.sin(np.linspace(0, 1, 30)),
                     np.full(30, 0.5)], axis=1)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    group = []
    for k in range(7):
        noise = 0.0 if k == 3 else 0.01
        p = base + noise * rng.normal(size=base.shape)
        p /= np.linalg.norm(p, axis=1, keepdims=True)
        group.append(p)
    # index 3 is the uncorrupted center: it minimizes total cost
    assert medoid_polyline(group) == 3
    assert medoid_polyline(group, approx=True) == 3


def test_grouped_medoid_map_groups(ray_session):
    """Trajectory-representative per key via groupby().map_groups —
    the distributed shape for trajectory dedup/summarization."""
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(12)
    rows = []
    for key in ("alpha", "beta"):
        shift = 0.0 if key == "alpha" else 0.3
        base = np.stack([np.cos(np.linspace(0, 1, 20) + shift),
                         np.sin(np.linspace(0, 1, 20) + shift),
                         np.full(20, 0.4)], axis=1)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        for t in range(5):
            noise = 0.0 if t == 2 else 0.02
            p = base + noise * rng.normal(size=base.shape)
            p /= np.linalg.norm(p, axis=1, keepdims=True)
            rows.append({"key": key, "traj_id": t,
                         "xyz": p.ravel().tolist()})
    ds = rd.from_items(rows)

    def _medoid(group: pd.DataFrame) -> pd.DataFrame:
        polys = [np.asarray(v, float).reshape(-1, 3)
                 for v in group["xyz"]]
        best = medoid_polyline(polys)
        return pd.DataFrame({
            "key": [group["key"].iloc[0]],
            "medoid_traj": [int(group["traj_id"].iloc[best])],
        })

    out = {r["key"]: r["medoid_traj"]
           for r in ds.groupby("key").map_groups(
               _medoid, batch_format="pandas").take_all()}
    assert out == {"alpha": 2, "beta": 2}

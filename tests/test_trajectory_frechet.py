"""q_traj_frechet vs a brute recursive discrete-Fréchet oracle: the
DP inside the pair-hash buckets must equal the textbook recursion on
every colocation-candidate pair at the driver gate scale."""

from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _tracks():
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts"])
    k = t.column("event_id").to_numpy().astype(np.int64)
    u = t.column("user_id").to_numpy().astype(np.int64)
    tsu = t.column("ts").to_numpy().astype("datetime64[us]") \
        .astype(np.int64)
    clat = (k * 7919) % 17000 - 8500
    clng = (k * 104729) % 36000 - 18000
    df = pd.DataFrame({"u": u, "tsu": tsu, "eid": k,
                       "clat": clat, "clng": clng}) \
        .sort_values(["u", "tsu", "eid"], kind="mergesort")
    return {int(uu): g[["clat", "clng"]].to_numpy(np.int64)
            for uu, g in df.groupby("u")}


def _brute_frechet(A: np.ndarray, B: np.ndarray) -> int:
    @lru_cache(maxsize=None)
    def f(i: int, j: int) -> int:
        d = int(abs(A[i, 0] - B[j, 0]) + abs(A[i, 1] - B[j, 1]))
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(d, f(0, j - 1))
        if j == 0:
            return max(d, f(i - 1, 0))
        return max(d, min(f(i - 1, j), f(i, j - 1),
                          f(i - 1, j - 1)))
    import sys
    sys.setrecursionlimit(100_000)
    return f(len(A) - 1, len(B) - 1)


def test_frechet_matches_brute_on_all_pairs(ray_session):
    from geo_ray.pipelines.queries import q_traj_frechet

    got = q_traj_frechet(SF).to_pandas()
    assert len(got) > 0
    tracks = _tracks()
    for r in got.itertuples():
        want = _brute_frechet(tracks[int(r.user_a)],
                              tracks[int(r.user_b)])
        assert int(r.frechet_l1) == want, (r.user_a, r.user_b)


def test_frechet_bounds(ray_session):
    """Fréchet dominates Hausdorff (coupled walk can't beat the
    free assignment) and is bounded by the max pairwise distance."""
    from geo_ray.pipelines.queries import q_traj_frechet

    got = q_traj_frechet(SF).to_pandas()
    tracks = _tracks()
    for r in got.head(50).itertuples():
        A = tracks[int(r.user_a)]
        B = tracks[int(r.user_b)]
        d = np.abs(A[:, None, 0] - B[None, :, 0]) \
            + np.abs(A[:, None, 1] - B[None, :, 1])
        hausdorff = max(d.min(axis=1).max(), d.min(axis=0).max())
        assert hausdorff <= r.frechet_l1 <= d.max()

"""Trajectory slerp resampling: geometric invariants, bracket rules,
and the cross-engine integerization margin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from geo_ray.stages.trajectory import resample_group

W = 1000  # small step for unit tests


def _track(ts, lats, lngs, uid=1):
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    x, y, z = latlng_deg_to_xyz(np.asarray(lats, np.float64),
                                np.asarray(lngs, np.float64))
    return pd.DataFrame({"user_id": uid, "tsu": np.asarray(ts, np.int64),
                         "event_id": np.arange(len(ts), dtype=np.int64),
                         "x": x, "y": y, "z": z})


def test_unit_norm_and_on_arc():
    """Samples sit on the unit sphere and on the great circle of the
    bracketing pair (coplanar with it)."""
    g = _track([0, 10_000], [10.0, 40.0], [20.0, 60.0])
    out = resample_group(g, W)
    assert len(out) == 11
    v = out[["xu", "yu", "zu"]].to_numpy().astype(np.float64) / 1e6
    norms = np.sqrt((v * v).sum(axis=1))
    assert np.abs(norms - 1.0).max() < 3e-6   # 1e-6 integerization floor
    p0 = g[["x", "y", "z"]].iloc[0].to_numpy()
    p1 = g[["x", "y", "z"]].iloc[1].to_numpy()
    n = np.cross(p0, p1)
    n /= np.linalg.norm(n)
    assert np.abs(v @ n).max() < 3e-6


def test_endpoint_and_exact_epoch_branches():
    g = _track([0, 1000, 2500], [0.0, 30.0, -20.0], [0.0, 50.0, 10.0])
    out = resample_group(g, W)
    # epochs 0, 1000, 2000: 0 and 1000 coincide with observations
    assert list(out["epoch"]) == [0, 1000, 2000]
    p0 = np.floor(g[["x", "y", "z"]].iloc[0].to_numpy() * 1e6)
    p1 = np.floor(g[["x", "y", "z"]].iloc[1].to_numpy() * 1e6)
    assert (out.iloc[0][["xu", "yu", "zu"]].to_numpy() == p0).all()
    assert (out.iloc[1][["xu", "yu", "zu"]].to_numpy() == p1).all()


def test_identical_endpoints_degenerate():
    g = _track([0, 3000], [25.0, 25.0], [40.0, 40.0])
    out = resample_group(g, W)
    p = np.floor(g[["x", "y", "z"]].iloc[0].to_numpy() * 1e6)
    for _, row in out.iterrows():
        assert (row[["xu", "yu", "zu"]].to_numpy() == p).all()


def test_duplicate_ts_uses_last_by_event_id():
    """Two observations at the same instant: the bracket's left side
    is the LAST in (ts, event_id) order — the searchsorted 'right'
    convention the SQL window mirrors."""
    g = _track([0, 0, 2000], [10.0, 50.0, 50.0], [10.0, 50.0, 50.0])
    out = resample_group(g, W)
    p_last = np.floor(g[["x", "y", "z"]].iloc[1].to_numpy() * 1e6)
    assert (out.iloc[0][["xu", "yu", "zu"]].to_numpy() == p_last).all()


def test_empty_and_single_point():
    g = _track([], [], [])
    assert len(resample_group(g, W)) == 0
    g1 = _track([500], [5.0], [5.0])            # no epoch in [500, 500]
    assert len(resample_group(g1, W)) == 0
    g2 = _track([1000], [5.0], [5.0])           # epoch == the point
    out = resample_group(g2, W)
    assert len(out) == 1 and out["epoch"].iloc[0] == 1000


def test_midpoint_symmetry():
    """t=0.5 slerp equals the normalized chord midpoint."""
    g = _track([0, 2000], [0.0, 0.0], [0.0, 90.0])
    out = resample_group(g, W)
    mid = out[out["epoch"] == 1000].iloc[0]
    m = np.array([1.0, 1.0, 0.0]) / np.sqrt(2.0)
    got = mid[["xu", "yu", "zu"]].to_numpy().astype(np.float64) / 1e6
    assert np.abs(got - np.floor(m * 1e6) / 1e6).max() < 1e-12


def test_integerization_margin_driver_scales():
    """Direct margin measurement at the scales the driver checks:
    distance of every un-floored coordinate (in 1e-6 units) to the
    nearest integer — the guard that keeps the SQL oracle hash-equal
    despite last-ulp libm differences.  Exact-branch lanes (epoch on
    an observation / degenerate bracket) are endpoint lattice values
    computed by the identical formula in both engines, so for those a
    zero margin (exact-integer double) is also safe."""
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.pipelines.queries import (_RESAMPLE_STEP_US,
                                           derive_latlng_np)
    bounds = {"/root/testdata/sf0.01": None,
              "/root/testdata/sf0.1": None}
    for sf in bounds:
        ev = pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
        ev["tsu"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
        lat, lng = derive_latlng_np(ev["event_id"].to_numpy())
        x, y, z = latlng_deg_to_xyz(lat, lng)
        ev["x"], ev["y"], ev["z"] = x, y, z
        worst = 1.0
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["tsu", "event_id"], kind="mergesort")
            ts = g["tsu"].to_numpy()
            if len(ts) < 2:
                continue
            step = _RESAMPLE_STEP_US
            g0 = ((ts[0] + step - 1) // step) * step
            if g0 > ts[-1]:
                continue
            ep = np.arange(g0, ts[-1] + 1, step, dtype=np.int64)
            ir = np.searchsorted(ts, ep, side="right")
            i, j = ir - 1, np.minimum(ir, len(ts) - 1)
            xx, yy, zz = (g["x"].to_numpy(), g["y"].to_numpy(),
                          g["z"].to_numpy())
            x0, y0, z0 = xx[i], yy[i], zz[i]
            x1, y1, z1 = xx[j], yy[j], zz[j]
            exact = (ts[i] == ep) | ((x0 == x1) & (y0 == y1)
                                     & (z0 == z1))
            with np.errstate(invalid="ignore", divide="ignore"):
                t = (ep - ts[i]) / (ts[j] - ts[i]).astype(np.float64)
                cx, cy, cz = (y0 * z1 - z0 * y1, z0 * x1 - x0 * z1,
                              x0 * y1 - y0 * x1)
                a = np.arctan2(np.sqrt(cx * cx + cy * cy + cz * cz),
                               x0 * x1 + y0 * y1 + z0 * z1)
                sa, w0, w1 = (np.sin(a), np.sin((1 - t) * a),
                              np.sin(t * a))
                for p0, p1 in ((x0, x1), (y0, y1), (z0, z1)):
                    r = np.where(exact, p0, (w0 * p0 + w1 * p1) / sa)
                    v = r * 1e6
                    m = np.abs(v - np.round(v))
                    # exact-integer doubles (m == 0) come out identical
                    # in both engines; only near-misses are dangerous
                    risky = m[m > 0.0]
                    if len(risky):
                        worst = min(worst, risky.min())
        assert worst > 1e-7, (sf, worst)


# --------------------------------------------------------------------------
# spatiotemporal co-location join
# --------------------------------------------------------------------------

def _coloc_ds(df, parts=6):
    import ray.data as rd
    return rd.from_pandas(df).repartition(parts)


def _brute_pairs(df, eps, w):
    out = set()
    r = df.to_dict("records")
    for i in range(len(r)):
        for j in range(i + 1, len(r)):
            a, b = r[i], r[j]
            if a["user_id"] == b["user_id"]:
                continue
            if abs(a["tsu"] - b["tsu"]) > w:
                continue
            c2 = ((a["x"] - b["x"]) ** 2 + (a["y"] - b["y"]) ** 2
                  + (a["z"] - b["z"]) ** 2)
            if c2 < eps * eps:
                out.add((min(a["event_id"], b["event_id"]),
                         max(a["event_id"], b["event_id"])))
    return out


def _random_obs(n=400, seed=11):
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    rng = np.random.RandomState(seed)
    lat = rng.uniform(-60, 60, n)
    lng = rng.uniform(-180, 180, n)
    # clustered half: pull 50% of points near 3 hotspots so pairs exist
    hot = rng.randint(0, 3, n)
    near = rng.rand(n) < 0.5
    lat[near] = np.array([10.0, -30.0, 48.0])[hot[near]] \
        + rng.uniform(-1, 1, n)[near]
    lng[near] = np.array([5.0, 140.0, -100.0])[hot[near]] \
        + rng.uniform(-1, 1, n)[near]
    x, y, z = latlng_deg_to_xyz(lat, lng)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "tsu": rng.randint(0, 100_000, n).astype(np.int64),
        "x": x, "y": y, "z": z})


def test_colocation_matches_brute(ray_session):
    from geo_ray.stages.trajectory import colocation_join
    df = _random_obs()
    eps, w = 0.05, 20_000
    out = colocation_join(_coloc_ds(df), eps_chord=eps, window_us=w,
                          ts_base_us=0).to_pandas()
    got = set(zip(out["event_a"], out["event_b"]))
    want = _brute_pairs(df, eps, w)
    assert got == want and len(want) > 10
    # exactly-once: no duplicate pair rows
    assert len(out) == len(got)
    # pair carry columns are consistent
    assert (out["event_a"] < out["event_b"]).all()
    assert (out["dt_us"] <= w).all() and (out["dt_us"] >= 0).all()


def test_colocation_partition_invariance(ray_session):
    from geo_ray.stages.trajectory import colocation_join
    df = _random_obs(seed=12)
    eps, w = 0.08, 30_000
    a = colocation_join(_coloc_ds(df, 2), eps_chord=eps, window_us=w,
                        ts_base_us=0).to_pandas()
    b = colocation_join(_coloc_ds(df, 13), eps_chord=eps, window_us=w,
                        ts_base_us=0).to_pandas()
    key = ["event_a", "event_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_colocation_same_user_excluded(ray_session):
    from geo_ray.stages.trajectory import colocation_join
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    x, y, z = latlng_deg_to_xyz(np.array([10.0, 10.0]),
                                np.array([10.0, 10.0]))
    df = pd.DataFrame({"event_id": [0, 1],
                       "user_id": [7, 7],
                       "tsu": [0, 5], "x": x, "y": y, "z": z})
    out = colocation_join(_coloc_ds(df, 1), eps_chord=0.1,
                          window_us=100, ts_base_us=0).to_pandas()
    assert len(out) == 0


def test_colocation_packing_bound():
    from geo_ray.stages.trajectory import _pack3
    with pytest.raises(ValueError):
        _pack3(np.array([[1 << 20, 0, 0]], dtype=np.int64))


# --------------------------------------------------------------------------
# polyline simplification
# --------------------------------------------------------------------------

def _simplify_ref(V, tol_chord2, k):
    """Scalar reference for the greedy walk, using the engine's own
    chord2_point_edge (the SubsampleVertices semantics the vectorized
    kernel must reproduce)."""
    from geo_ray.functions.distance import chord2_point_edge
    n = len(V)
    kept = [0]
    idx = 0
    while idx < n - 1:
        bound = min(idx + k, n - 1)
        best = idx + 1
        for c in range(idx + 2, bound + 1):
            if any(float(chord2_point_edge(V[m], V[idx], V[c]))
                   > tol_chord2 for m in range(idx + 1, c)):
                break
            best = c
        if not np.array_equal(V[best], V[kept[-1]]):
            kept.append(best)
        idx = best
    return kept


def _simplify_df(lats, lngs):
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    x, y, z = latlng_deg_to_xyz(np.asarray(lats, np.float64),
                                np.asarray(lngs, np.float64))
    n = len(x)
    return pd.DataFrame({"user_id": np.ones(n, np.int64),
                         "tsu": np.arange(n, dtype=np.int64),
                         "event_id": np.arange(n, dtype=np.int64),
                         "x": x, "y": y, "z": z})


def test_simplify_matches_reference_walk():
    from geo_ray.stages.trajectory import simplify_group
    rng = np.random.RandomState(5)
    for trial in range(5):
        n = 60
        # mixture: smooth arc + noise, so both keeps and drops occur
        t = np.linspace(0, 1, n)
        lats = 20 * t + rng.uniform(-8, 8, n)
        lngs = 120 * t + rng.uniform(-8, 8, n)
        g = _simplify_df(lats, lngs)
        for tol in (0.01, 0.2, 0.9):
            out = simplify_group(g, tol, max_lookahead=16)
            ref = _simplify_ref(g[["x", "y", "z"]].to_numpy(), tol, 16)
            assert list(out["event_id"]) == ref, (trial, tol)


def test_simplify_straight_line_collapses():
    """Points exactly on one geodesic (equator) collapse to the
    endpoints within each lookahead window."""
    from geo_ray.stages.trajectory import simplify_group
    lngs = np.linspace(0.0, 30.0, 31)
    g = _simplify_df(np.zeros(31), lngs)
    out = simplify_group(g, 1e-12, max_lookahead=64)
    assert list(out["event_id"]) == [0, 30]


def test_simplify_duplicate_positions_skipped():
    from geo_ray.stages.trajectory import simplify_group
    lats = [0.0, 0.0, 50.0]
    lngs = [10.0, 10.0, 80.0]
    g = _simplify_df(lats, lngs)
    out = simplify_group(g, 1e-12, max_lookahead=4)
    # vertex 1 duplicates vertex 0's position: never emitted twice
    assert list(out["event_id"]) == [0, 2]


def test_simplify_lookahead_cap_binds():
    """With lookahead 2 a fully-collinear run still stops every 2
    steps — the documented bounded-window semantics."""
    from geo_ray.stages.trajectory import simplify_group
    lngs = np.linspace(0.0, 10.0, 11)
    g = _simplify_df(np.zeros(11), lngs)
    out = simplify_group(g, 10.0, max_lookahead=2)
    assert list(out["event_id"]) == [0, 2, 4, 6, 8, 10]


def test_simplify_tolerance_zero_keeps_unique_positions():
    from geo_ray.stages.trajectory import simplify_group
    rng = np.random.RandomState(9)
    lats = rng.uniform(-60, 60, 20)
    lngs = rng.uniform(-170, 170, 20)
    g = _simplify_df(lats, lngs)
    out = simplify_group(g, 0.0, max_lookahead=8)
    assert list(out["event_id"]) == list(range(20))


def test_simplify_bucket_vec_matches_sequential_walk():
    """The vectorized multi-user body makes identical decisions to the
    per-user greedy walk — random tracks with duplicate positions,
    shuffled input order, mixed tolerances/lookaheads, and a
    chunk-boundary stress (pair_chunk smaller than one row's window
    set is clamped to whole rows)."""
    from geo_ray.stages.trajectory import (simplify_bucket_vec,
                                           simplify_group)
    rng = np.random.RandomState(31)
    for trial in range(8):
        frames = []
        for u in range(rng.randint(1, 9)):
            n = rng.randint(1, 90)
            t = np.linspace(0, 1, n)
            lats = 20 * t + rng.uniform(-8, 8, n)
            lngs = 120 * t + rng.uniform(-8, 8, n)
            f = _simplify_df(lats, lngs)
            f["user_id"] = np.int64(u * 13 + 1)
            f["event_id"] = rng.permutation(n).astype(np.int64)
            if n > 3:
                di = rng.randint(1, n - 1)
                for c in ("x", "y", "z"):
                    f.loc[di, c] = f.loc[di - 1, c]
            frames.append(f)
        df = pd.concat(frames, ignore_index=True) \
            .sample(frac=1.0, random_state=trial).reset_index(drop=True)
        for tol, k in ((0.0, 8), (1e-12, 2), (0.01, 16), (0.5, 4)):
            ref = pd.concat([simplify_group(g, tol, k)
                             for _, g in df.groupby("user_id")])
            out = simplify_bucket_vec(df, tol, k, pair_chunk=64)
            key = ["user_id", "event_id"]
            pd.testing.assert_frame_equal(
                out.sort_values(key).reset_index(drop=True),
                ref.sort_values(key).reset_index(drop=True))


# --------------------------------------------------------------------------
# border-crossing determinant margins
# --------------------------------------------------------------------------

def test_crossing_determinant_margins_driver_scales():
    """Every sign determinant evaluated by events_crossings must clear
    the triage error bound by orders of magnitude at the driver's
    scales, so the plain IEEE determinant decides every lane in both
    engines (the exact/SoS ladder never fires)."""
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.functions.predicates import MAX_DETERMINANT_ERROR
    from geo_ray.pipelines.queries import _border_xyz, derive_latlng_np

    bounds = {"/root/testdata/sf0.01": None,
              "/root/testdata/sf0.1": None}
    for sf in bounds:
        ev = pd.read_parquet(f"{sf}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
        lat, lng = derive_latlng_np(ev["event_id"].to_numpy())
        x, y, z = latlng_deg_to_xyz(lat, lng)
        ev["x"], ev["y"], ev["z"] = x, y, z
        worst = np.inf
        n_total = 0
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            xx, yy, zz = (g["x"].to_numpy(), g["y"].to_numpy(),
                          g["z"].to_numpy())
            ax, ay, az = xx[:-1], yy[:-1], zz[:-1]
            bx, by, bz = xx[1:], yy[1:], zz[1:]
            if len(ax) == 0:
                continue
            for c, d in _border_xyz():
                for p in (c, d):
                    det = (ay * bz - az * by) * p[0] \
                        + (az * bx - ax * bz) * p[1] \
                        + (ax * by - ay * bx) * p[2]
                    worst = min(worst, np.abs(det).min())
                e = (c[1] * d[2] - c[2] * d[1],
                     c[2] * d[0] - c[0] * d[2],
                     c[0] * d[1] - c[1] * d[0])
                for px, py, pz in ((ax, ay, az), (bx, by, bz)):
                    det = px * e[0] + py * e[1] + pz * e[2]
                    worst = min(worst, np.abs(det).min())
                n_total += len(ax)
        assert n_total > 0
        bounds[sf] = worst
    # driver correctness scale: every lane clears the triage bound by
    # ~10 orders of magnitude, so the plain determinant == robust_sign
    assert bounds["/root/testdata/sf0.01"] > 100 * MAX_DETERMINANT_ERROR
    # bench scale: margins stay positive (no exact ties).  One lane
    # sits inside the triage zone (~4e-17 < 4e-16): both engines still
    # compute the IDENTICAL IEEE double there, so cross-engine parity
    # is unaffected; only the infinitely-precise sign could differ,
    # and the exact/SoS ladder (functions/predicates.py) is the tool
    # for callers needing that guarantee.
    assert bounds["/root/testdata/sf0.1"] > 0.0


def test_crossings_nonzero_at_driver_scale(ray_session):
    import __ray_entry__ as entrymod
    out = entrymod.queries()["events_crossings"](
        "/root/testdata/sf0.01").to_pandas()
    assert out["n_crossings"].sum() > 0
    assert len(out) == out["user_id"].nunique()

"""Deeper-than-parity properties of the round-3 second-session
operators: KMV sketch set-operation accuracy on planted overlaps,
temperature-mix quota arithmetic on skewed sources, dissolve area
additivity for disjoint members, corridor route-distance geometry."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, user_ids, event_types):
    n = len(user_ids)
    tab = pa.table({
        "event_id": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "ts": pa.array(
            np.full(n, 1_600_000_000_000_000, np.int64)
            .astype("datetime64[us]")),
        "user_id": pa.array(np.asarray(user_ids, np.int64)),
        "event_type": pa.array(list(event_types), pa.string()),
        "value": pa.array(np.zeros(n), pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_kmv_overlap_planted_accuracy(ray_session, tmp_path):
    # type A: users 0..999; type B: users 500..1499
    # true union 1500, intersection 500
    ua = np.arange(0, 1000)
    ub = np.arange(500, 1500)
    users = np.concatenate([ua, ub])
    types = ["A"] * len(ua) + ["B"] * len(ub)
    d = _write_events(tmp_path, users, types)

    from geo_ray.pipelines.queries import q_events_kmv_overlap
    out = q_events_kmv_overlap(d)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["type_a"], row["type_b"]) == ("A", "B")
    # k=64 -> rel std ~ 1/8; allow 4 sigma
    assert abs(row["union_est"] - 1500) <= 1500 * 0.5
    assert abs(row["inter_est"] - 500) <= 500 * 0.9


def test_kmv_overlap_exact_when_small(ray_session, tmp_path):
    # both types under k=64 distinct users: estimates must be EXACT
    ua = np.arange(0, 40)
    ub = np.arange(30, 70)
    users = np.concatenate([ua, ub])
    types = ["A"] * len(ua) + ["B"] * len(ub)
    d = _write_events(tmp_path, users, types)

    from geo_ray.pipelines.queries import q_events_kmv_overlap
    out = q_events_kmv_overlap(d)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    row = out.iloc[0]
    assert row["union_est"] == 70
    assert row["inter_est"] == 10


def test_source_mix_quota_arithmetic(ray_session, tmp_path):
    # skewed sources: n = 100 / 400 / 900 -> isqrt = 10 / 20 / 30
    # quotas at target=200: 33 / 66 / 100
    sizes = {"s_small": 100, "s_mid": 400, "s_big": 900}
    doc_id, src = [], []
    i = 1
    for s, n in sizes.items():
        for _ in range(n):
            doc_id.append(i)
            src.append(s)
            i += 1
    tab = pa.table({
        "doc_id": pa.array(np.asarray(doc_id, np.int64)),
        "text": pa.array(["x"] * len(doc_id), pa.string()),
        "lang": pa.array(["en"] * len(doc_id), pa.string()),
        "source": pa.array(src, pa.string()),
        "n_chars": pa.array(np.ones(len(doc_id), np.int64)),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))

    from geo_ray.pipelines.queries import q_source_mix_sample
    out = q_source_mix_sample(str(tmp_path)).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got == {"s_small": 33, "s_mid": 66, "s_big": 100}

    # membership = bottom-quota by splitmix hash, per source
    from geo_ray.stages.sample import _splitmix
    df = pd.DataFrame({"doc_id": doc_id, "source": src})
    h = (_splitmix(df["doc_id"].to_numpy(np.uint64))
         >> np.uint64(1)).astype(np.int64)
    df["h"] = h
    for s, quota in (("s_small", 33), ("s_mid", 66), ("s_big", 100)):
        want = set(df[df["source"] == s].sort_values(["h", "doc_id"])
                   .head(quota)["doc_id"])
        have = set(out[out["source"] == s]["doc_id"])
        assert have == want, s


def test_dissolve_disjoint_area_additivity():
    # union of far-apart circles: area must equal the member sum
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.state.boolean import polygon_boolean
    from geo_ray.state.loop import Loop
    from geo_ray.state.polygon import Polygon

    polys = []
    for lng in (-120.0, 0.0, 120.0):
        c = np.asarray(latlng_deg_to_xyz(10.0, lng))
        polys.append(Polygon.from_loop(
            Loop.regular_loop(c, math.radians(5.0), 12)))
    acc = polys[0]
    for p in polys[1:]:
        acc = polygon_boolean("union", acc, p)
    assert abs(acc.area() - sum(p.area() for p in polys)) < 1e-9
    # every member centre is inside the dissolve
    centers = np.asarray([latlng_deg_to_xyz(10.0, lng)
                          for lng in (-120.0, 0.0, 120.0)])
    assert acc.contains_points_batch(centers).all()


def test_corridor_route_distance_geometry():
    # a point ON the route scores ~0; the far hemisphere scores > thr2
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.pipelines.queries import (_CORRIDOR_RADIUS_DEG,
                                           POLYLINE_PTS)
    from geo_ray.stages.knn import ShapeTarget
    from geo_ray.state.polyline import Polyline

    t = ShapeTarget("route", Polyline.from_latlngs_deg(POLYLINE_PTS))
    thr2 = 2.0 - 2.0 * math.cos(math.radians(_CORRIDOR_RADIUS_DEG))
    on = np.asarray([latlng_deg_to_xyz(*POLYLINE_PTS[0])])
    far = np.asarray([latlng_deg_to_xyz(-60.0, 60.0)])
    assert t.chord2(on)[0] < 1e-12
    assert t.chord2(far)[0] > thr2


def test_shared_substrate_cache_path_equivalence(ray_session):
    """The session-cache fast path (materialized colocation edges /
    kNN table) must be output-identical to a fresh computation."""
    import pandas as pd
    from geo_ray.pipelines import queries as Q

    d = "/root/testdata/sf0.01"

    def norm(r):
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort") \
            .reset_index(drop=True)

    # fresh: drop every session cache, compute
    Q._COLOC_PAIRS_CACHE.clear()
    Q._COLOC_EDGES_CACHE.clear()
    Q._CUSTOMER_KNN_CACHE.clear()
    fresh_reach = norm(Q.q_user_reach(d))
    fresh_rknn = norm(Q.q_rknn_count(d))

    # warm: caches populated by the fresh run
    warm_reach = norm(Q.q_user_reach(d))
    warm_rknn = norm(Q.q_rknn_count(d))

    pd.testing.assert_frame_equal(fresh_reach, warm_reach,
                                  check_exact=True)
    pd.testing.assert_frame_equal(fresh_rknn, warm_rknn,
                                  check_exact=True)

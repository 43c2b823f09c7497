"""Replicates the driver's correctness gate locally: run each Ray
query and its DuckDB oracle on the same parquet, compare row counts,
schemas (column names) and order-insensitive values.

Also margin-checks every float-boundary predicate so a last-ulp
difference between numpy and DuckDB trig cannot flip a row at the
driver's scale.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return pd.DataFrame(result)


ORACLE_CHECKED = [
    "geotag", "cap_contains", "rect_contains", "polygon_contains",
    "knn_geo", "knn_geo_limited", "knn_geo_limited_incl", "knn_geo_ring", "knn_shape", "knn_join",
    "grid_density", "radius_join",
    "cell_assign", "s2_density", "s2_pyramid", "geohash_assign",
    "langid", "fingerprint", "simhash", "simhash_neardup",
    "token_count", "top_terms", "doc_quality",
    "dedup_exact", "minhash_dedup", "embed_knn", "embed_knn_ivf_exact",
    "embed_neardup",
    "embed_clusters", "doc_chunks", "chunk_knn", "neardup_agreement",
    "events_hourly", "events_recent",
    "events_sliding", "events_sessions", "events_asof",
    "events_range_join", "events_quantiles", "events_rollup",
    "events_topk", "events_latest",
    "orders_by_nation", "orders_priority_salted",
    "events_sample", "events_distinct_users",
    "events_anti_join", "events_retention", "events_gap_quantiles",
    "events_geofence", "events_travel", "events_resample", "events_dwell",
    "events_pivot", "events_funnel", "orders_left_join",
    "events_colocation", "events_split", "events_running",
    "events_simplify", "events_crossings",
    "events_distinct_sketch", "events_distinct_hll",
    "lineitem_agg", "lineitem_semi_bloom", "tpch_q3", "tpch_q4",
    "tpch_q5", "tpch_q10",
    "spatial_join_images", "tiling_images", "knn_images", "zonal_stats",
    "tile_pyramid", "grid_smooth", "events_weighted_sample", "events_zscore", "events_props",
    "events_corr", "part_fuzzy", "events_od", "events_pagerank", "events_late", "idw_interpolate", "orders_skyline", "events_smooth_track", "events_percent_rank", "events_transitions", "events_cusum", "events_entropy",
    "convex_hull",
    "covering", "polygon_overlay", "polygon_build", "image_neardup",
    "knn_collection", "knn_furthest", "image_phash_neardup", "ngram_jaccard",
    "ngram_jaccard_prefix", "ngram_jaccard_auto",
    "hex_density", "hex_smooth", "tpch_q7", "tpch_q8",
    "spatial_join_auto", "dedup_clusters", "corpus_curation",
    "tpch_q6", "tpch_q14", "tpch_q18", "tpch_q19", "doc_redact",
    "tpch_q12", "tpch_q22", "dbscan_geo", "moran_grid", "rknn_count",
    "frequent_pairs", "user_triangles", "hotspot_trend", "ripley_k",
    "event_blobs", "colocation_support", "user_top_types",
    "tpch_q13", "tpch_q15", "tpch_q17", "tpch_q21",
    "grid_mode", "getis_ord", "events_turns", "doc_tfidf",
    "inverted_index", "knn_core", "heavy_hitters", "user_bbox",
    "grid_median", "knn_regression",
    "user_cap", "embed_knn_pq_exact", "traj_dtw_exact", "tpch_q1",
    "tpch_q9", "decontaminate", "lm_score", "image_caption_mismatch",
    "events_overlap", "multimodal_clusters", "events_winsorize",
    "join_counts", "traj_hausdorff", "stratified_sample", "doc_pmi",
    "events_kmeans", "events_full_join", "events_new_users",
    "user_components", "user_paths", "events_twap", "events_ohlc",
    "events_gini", "basket_lift", "events_peaks", "lineitem_pareto",
    "pack_shards", "events_benford", "doc_repetition",
    "term_freq_spectrum", "substring_dedup", "dsir_weights",
    "embed_gram", "events_autocorr", "orders_cohort",
    "events_streak", "events_cube", "events_mad", "type_affinity",
    "orders_rfm", "events_pettitt", "events_theilsen", "grid_distance",
    "grid_change", "grid_voronoi", "vocab_growth", "term_burstiness",
    "attribution_last_touch", "embed_label_centroid", "events_decay",
    "traj_stays", "phash_bit_bias", "grid_percolation",
    "events_ks", "grid_histeq", "degree_assortativity",
    "user_communities", "grid_watershed",
    "bpe_merges", "grid_viewshed",
    "tpch_q2", "tpch_q11", "tpch_q16", "tpch_q20",
    "user_jaccard", "user_clustering", "user_hits",
    "grid_contours", "grid_morphology", "doc_readability",
    "farthest_pair", "spatial_layout_scan",
    "bpe_encode", "events_emd", "user_reciprocity",
    "orders_backlog", "doc_canonical_dedup",
    "events_hourly_incremental", "events_seasonal_chi2",
    "orders_fill_rate", "doc_hapax", "image_aspect_buckets",
    "spatial_join_shuffle", "tile_vectorize",
    "polygon_rasterize", "layout_st_scan",
    "user_interarrival", "part_vendor_share", "doc_simpson",
    "events_dau_wau", "supplier_lead_time",
    "user_gyration", "user_home_cell", "user_return_trips",
    "type_cooccurrence",
    "events_weekend_ratio", "part_name_tokens",
    "polygon_dissolve", "events_kmv_overlap", "source_mix_sample",
    "events_corridor", "source_overlap", "user_reach",
    "langid_confusion", "events_impossible_travel",
    "doc_containment", "events_profile", "video_frame_stats",
    "video_scene_cuts", "audio_vad",
    "audio_feature_stats", "image_resize_stats",
]


def _dtype_kind(dt) -> str:
    """Collapse a dtype to the equivalence class the driver's value
    hash is sensitive to: int-vs-float-vs-bool-vs-text-vs-time.  An
    oracle emitting HUGEINT (fetched as float64) where the engine
    emits int64 hash-mismatches at the driver even though the values
    compare equal — the round-3 `events_travel` red row."""
    k = np.dtype(dt).kind if dt != object else "O"
    return {"i": "int", "u": "int", "f": "float", "b": "bool",
            "O": "text", "S": "text", "U": "text", "M": "time",
            "m": "time"}.get(k, k)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ray_df = _normalize(_to_df(q(SF_DIR)))
    duck_df = _normalize(_duck(sql))
    assert list(ray_df.columns) == list(duck_df.columns), \
        (name, list(ray_df.columns), list(duck_df.columns))
    kinds_ray = [_dtype_kind(ray_df[c].dtype) for c in ray_df.columns]
    kinds_duck = [_dtype_kind(duck_df[c].dtype) for c in duck_df.columns]
    assert kinds_ray == kinds_duck, \
        (name, list(zip(ray_df.columns, kinds_ray, kinds_duck)))
    assert len(ray_df) == len(duck_df), (name, len(ray_df), len(duck_df))
    pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False,
                                  check_exact=True, obj=name)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows_only = [n for n in qs if n not in oracles
                 and not n.endswith("_images")]
    for name in rows_only:
        df = _to_df(qs[name](SF_DIR))
        assert len(df) >= 0, name
        assert len(df.columns) > 0, name


def test_predicate_margins():
    """No point may sit within eps of a float decision boundary at the
    scales the driver checks (sf0.01 here; sf0.1 covered by bench)."""
    from geo_ray.pipelines.queries import (CAP_RADIUS_DEG, _cap_center_xyz,
                                           _cap_chord2, _quad_edge_normals,
                                           derive_latlng_np)
    from geo_ray.functions.latlng import latlng_deg_to_xyz

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        import pyarrow.parquet as pq
        keys = pq.read_table(f"{sf}/customer.parquet",
                             columns=["c_custkey"]).column(0).to_numpy()
        lat, lng = derive_latlng_np(keys)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        cx, cy, cz = _cap_center_xyz()
        chord2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        assert np.abs(chord2 - _cap_chord2()).min() > 1e-9
        for nx, ny, nz in _quad_edge_normals():
            dots = nx * x + ny * y + nz * z
            assert np.abs(dots).min() > 1e-9
        # radius_join boundary: min |edge chord2 - radius chord2|
        from geo_ray.functions.distance import chord2_point_edge
        from geo_ray.functions.latlng import angle_to_chord2
        from geo_ray.pipelines.queries import QUAD
        from geo_ray.state.loop import Loop

        loop = Loop.from_latlngs_deg(QUAD)
        verts = [np.asarray(v) for v in loop.vertices]
        pts = np.stack([x, y, z], axis=1)
        best = np.full(len(pts), 4.0)
        for i in range(len(verts)):
            best = np.minimum(best, chord2_point_edge(
                pts, verts[i], verts[(i + 1) % len(verts)]))
        rc2 = float(angle_to_chord2(math.radians(3.0)))
        assert np.abs(best - rc2).min() > 1e-8
        # knn_geo_limited boundary: the exclusive DistanceLimit is
        # compared against 2-2*dot on the Ray side and (p-t)^2 in SQL,
        # so every probe-candidate distance must clear the limit by
        # more than the cross-formula ulp gap under BOTH formulas.
        from geo_ray.pipelines.queries import _knn_limit_chord2
        n_probes = 32
        plat, plng = derive_latlng_np(np.arange(n_probes, dtype=np.int64))
        px, py, pz = latlng_deg_to_xyz(plat, plng)
        lim = _knn_limit_chord2()
        for j in range(n_probes):
            d_dot = np.clip(2.0 - 2.0 * (x * px[j] + y * py[j] + z * pz[j]),
                            0.0, 4.0)
            d_sq = (x - px[j]) ** 2 + (y - py[j]) ** 2 + (z - pz[j]) ** 2
            assert np.abs(d_dot - lim).min() > 1e-9, (sf, j)
            assert np.abs(d_sq - lim).min() > 1e-9, (sf, j)
        # events_geofence boundary: every event-derived point must
        # clear each GEOFENCE_QUAD edge plane (the shared QUAD has an
        # event within 7e-18 of an edge — hence the dedicated quad)
        from geo_ray.pipelines.queries import GEOFENCE_QUAD
        ekeys = pq.read_table(f"{sf}/events.parquet",
                              columns=["event_id"]).column(0).to_numpy()
        elat, elng = derive_latlng_np(ekeys)
        ex, ey, ez = latlng_deg_to_xyz(elat, elng)
        for nx, ny, nz in _quad_edge_normals(GEOFENCE_QUAD):
            assert np.abs(nx * ex + ny * ey + nz * ez).min() > 1e-9, sf
        # events_travel / events_impossible_travel now use the exact
        # integer centi-degree lattice metric (round-3 verdict item):
        # pure int64 arithmetic on both engines, so the old
        # floor(chord2 * 1e6) margin assertion is redundant by
        # construction — no float decision boundary exists.


def test_sql_xyz_bit_identical():
    """The cell_assign/s2_density SQL oracles' exactness rests on the
    xyz doubles being bit-identical between numpy and DuckDB (IEEE
    division/sqrt and integer table lookups are exact from there)."""
    from geo_ray.pipelines.queries import _PTS_CTE, derive_latlng_np
    from geo_ray.functions.latlng import latlng_deg_to_xyz

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW customer AS SELECT * FROM "
                    f"read_parquet('{sf}/customer.parquet')")
        df = con.execute(f"{_PTS_CTE} SELECT c_custkey, x, y, z FROM xyz "
                         f"ORDER BY c_custkey").fetchdf()
        lat, lng = derive_latlng_np(df["c_custkey"].to_numpy())
        x, y, z = latlng_deg_to_xyz(lat, lng)
        assert (x == df["x"].to_numpy()).all()
        assert (y == df["y"].to_numpy()).all()
        assert (z == df["z"].to_numpy()).all()


def test_ring_knn_equals_brute_knn(ray_session):
    """The scale-path kNN must produce exactly the oracle-checked
    brute result."""
    from geo_ray.pipelines.queries import q_knn_geo, q_knn_geo_ring

    brute = _normalize(_to_df(q_knn_geo(SF_DIR)))
    ring = _normalize(_to_df(q_knn_geo_ring(SF_DIR)))
    pd.testing.assert_frame_equal(brute, ring, check_dtype=False)


def test_radius_join_superset_of_containment(ray_session):
    """radius>=0 join result must contain the polygon-containment
    result."""
    from geo_ray.pipelines.queries import q_polygon_contains, q_radius_join

    inside = set(_to_df(q_polygon_contains(SF_DIR))["c_custkey"])
    near = set(_to_df(q_radius_join(SF_DIR))["c_custkey"])
    assert inside <= near
    assert len(near) > len(inside)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = _to_df(res)
    assert set(df.columns) == {"image_id", "polygon_id"}
    assert len(df) > 0


def test_image_join_margins():
    """spatial_join_images oracle: no synthesized geotag may sit within
    eps of a city-octagon edge plane at the driver's scales."""
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.pipelines.queries import _city_octagon_normals
    from geo_ray.sources.images import latlng_from_phash, phash_for_index

    for n in (10_000, 100_000):
        ph = phash_for_index(np.arange(n, dtype=np.int64))
        lat, lng = latlng_from_phash(ph)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        for name, normals in _city_octagon_normals():
            dots = np.stack([nx * x + ny * y + nz * z
                             for nx, ny, nz in normals])
            # an edge's sign is decision-relevant only where every
            # OTHER edge already passes (flipping it would then flip
            # membership); far-outside points can sit near one plane
            # without affecting the AND-of-8 outcome
            passing = dots > 0
            for e in range(len(normals)):
                others = np.ones(dots.shape[1], dtype=bool)
                for o in range(len(normals)):
                    if o != e:
                        others &= passing[o]
                if others.any():
                    # cross-engine error bound: numpy vs DuckDB trig
                    # differ by <= 1 ulp per xyz component (~1e-16),
                    # so the dot (|normal| ~ 2e-2) differs by ~1e-17;
                    # 1e-12 leaves 5 orders of magnitude of headroom
                    # (measured worst margins: 2.4e-8 at 10k rows,
                    # 7.9e-10 at 100k rows)
                    assert np.abs(dots[e][others]).min() > 1e-12, (name, n, e)


def test_embed_neardup_margin():
    """No embedding pair may sit within eps of the cosine threshold:
    DuckDB's DOUBLE[] cosine agrees with the numpy matmul to ~4e-16,
    so 1e-8 leaves 7+ orders of headroom (measured min margins:
    1.3e-4 at sf0.01, 9.9e-6 at sf0.1)."""
    import pyarrow.parquet as pq
    from geo_ray.pipelines.queries import NEARDUP_THRESHOLD

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t = pq.read_table(sf + "/embeddings.parquet")
        M = np.asarray(t.column("embedding").combine_chunks().values) \
            .reshape(len(t), -1).astype(np.float64)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        C = Mn @ Mn.T
        flat = C[np.triu_indices(len(C), 1)]
        assert np.abs(flat - NEARDUP_THRESHOLD).min() > 1e-8, sf


def test_knn_images_rank_margins():
    """knn_images oracle: rank boundaries are decided by chord2 gaps;
    numpy (2 - 2*dot) and DuckDB (sum of squared diffs) agree to
    ~1e-15, so the gap between the k-th and (k+1)-th distance per
    probe must dwarf that."""
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.sources.images import CITIES, latlng_from_phash, \
        phash_for_index

    k = 10
    for n in (10_000, 100_000):
        ph = phash_for_index(np.arange(n, dtype=np.int64))
        lat, lng = latlng_from_phash(ph)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        P = np.stack([x, y, z], axis=1)
        qx, qy, qz = latlng_deg_to_xyz(CITIES[:, 0], CITIES[:, 1])
        Q = np.stack([qx, qy, qz], axis=1)
        d = np.clip(2.0 - 2.0 * (Q @ P.T), 0.0, 4.0)
        part = np.sort(d, axis=1)[:, :k + 1]
        gaps = part[:, k] - part[:, k - 1]
        assert gaps.min() > 1e-9, n


def test_convex_hull_gap_margins():
    """convex_hull oracle: hull membership is decided by whether the
    widest tangent-frame azimuth gap exceeds pi; no point's widest gap
    may sit within eps of pi (cross-engine atan2 differs by ~1e-16)."""
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.pipelines.queries import (_cap_center_xyz, _cap_chord2,
                                           derive_latlng_np)
    import pyarrow.parquet as pq

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        keys = pq.read_table(f"{sf}/customer.parquet",
                             columns=["c_custkey"]).column(0).to_numpy()
        lat, lng = derive_latlng_np(keys)
        x, y, z = latlng_deg_to_xyz(lat, lng)
        cx, cy, cz = _cap_center_xyz()
        inside = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2 <= \
            _cap_chord2()
        P = np.stack([x, y, z], axis=1)[inside]
        worst = np.inf
        for i in range(len(P)):
            p = P[i]
            east = np.array([-p[1], p[0], 0.0])
            east /= np.linalg.norm(east)
            north = np.cross(p, east)
            others = np.delete(P, i, axis=0)
            th = np.sort(np.arctan2(others @ east, others @ north))
            mg = max(np.diff(th).max() if len(th) > 1 else 2 * np.pi,
                     th[0] + 2 * np.pi - th[-1])
            worst = min(worst, abs(mg - np.pi))
        assert worst > 1e-8, (sf, worst)


def test_knn_join_rank_margins():
    """knn_join oracle: cross-engine chord2 formulas (2-2*dot vs sum of
    squared diffs) differ by ~1e-15; every rank-deciding gap — between
    ADJACENT top-k distances and at the k/k+1 boundary — must dwarf
    that for every probe (measured: 4.4e-8 adjacent / 1.2e-6 boundary
    at sf0.01)."""
    import pyarrow.parquet as pq
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.pipelines.queries import derive_latlng_np

    k = 5
    keys = pq.read_table(f"{SF_DIR}/customer.parquet",
                         columns=["c_custkey"]).column(0).to_numpy()
    lat, lng = derive_latlng_np(keys)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    P = np.stack([x, y, z], axis=1)
    d = np.clip(2.0 - 2.0 * (P @ P.T), 0.0, 4.0)
    np.fill_diagonal(d, 9.0)
    top = np.sort(d, axis=1)[:, :k + 1]
    gaps = np.diff(top, axis=1)
    assert gaps.min() > 1e-9


def test_rosters_consistent():
    """Every bench-suite name and every ORACLE_CHECKED name must exist
    in the registry; every oracle_sql key must be a registered query;
    no duplicates anywhere (guards roster edits)."""
    import __ray_entry__ as entrymod
    import re

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(ORACLE_CHECKED) == len(set(ORACLE_CHECKED))
    missing = [n for n in ORACLE_CHECKED if n not in o]
    assert not missing, missing
    src = open("bench.py").read()
    m = re.search(r"suite = \[(.*?)\]", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert len(names) == len(set(names)), "duplicate bench entries"
    unknown = [n for n in names
               if n not in q and n != "flagship_join_tile"]
    assert not unknown, unknown


def test_window_order_invariants():
    """The registry's driver window (first 50) is generated from
    CORRECTNESS history: every window slot holds a query with no
    fully-green driver row yet; oracle-backed queries outrank
    oracle-less ones within the never-green class; authored order
    breaks ties; and the green queries all retain local parity
    coverage (they are in ORACLE_CHECKED)."""
    import __ray_entry__ as entrymod
    from geo_ray.pipelines.queries import (_authored_queries,
                                           _driver_green, _window_order)

    authored = _authored_queries()
    oracles = set(entrymod.oracle_sql())
    green = _driver_green()
    ordered = list(_window_order(authored, oracles))

    assert set(ordered) == set(authored)
    window = ordered[:50]
    not_green = [n for n in ordered if n not in green]
    # every window slot is spent on a never-green query (as long as
    # enough exist)
    take = min(50, len(not_green))
    assert all(n not in green for n in window[:take])
    # oracle-backed never-green precede oracle-less never-green
    seen_oracle_less = False
    for n in not_green:
        if n not in oracles:
            seen_oracle_less = True
        else:
            assert not seen_oracle_less, n
    # authored order is the tie-break within each class
    idx = {n: i for i, n in enumerate(authored)}
    for cls_members in (
            [n for n in ordered if n not in green and n in oracles],
            [n for n in ordered if n not in green and n not in oracles],
            [n for n in ordered if n in green]):
        assert cls_members == sorted(cls_members, key=idx.__getitem__)
    # green queries keep local parity coverage
    missing = [n for n in green
               if n in oracles and n not in ORACLE_CHECKED]
    assert not missing, missing


def test_window_order_without_history(tmp_path, monkeypatch):
    """With no CORRECTNESS files visible, the order degrades to
    authored (oracle-backed first) — never an exception."""
    import geo_ray.pipelines.queries as qmod

    monkeypatch.setattr(
        qmod, "_driver_green", lambda: set())
    authored = qmod._authored_queries()
    ordered = list(qmod._window_order(authored, {"geotag"}))
    assert set(ordered) == set(authored)
    assert ordered[0] == "geotag"


def test_embed_knn_ivf_exact_margins():
    """Every cross-engine float boundary of the seeded-IVF query must
    clear a margin: per-vector top-2 cell gap (assignment argmax),
    per-query nprobe boundary gap (probe list), and the per-query
    rank-k boundary within the candidate union."""
    import pyarrow.parquet as pq

    from geo_ray.pipelines.queries import (_IVFX_NPROBE, _IVFX_SEED_IDS)

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()])
        Xn = X / np.linalg.norm(X, axis=1)[:, None]
        seed_rows = np.searchsorted(ids, np.array(_IVFX_SEED_IDS))
        assert (ids[seed_rows] == np.array(_IVFX_SEED_IDS)).all()
        C = Xn[seed_rows]
        sims = Xn @ C.T                      # (n, 8)
        top2 = np.partition(sims, sims.shape[1] - 2, axis=1)[:, -2:]
        assert (top2[:, 1] - top2[:, 0] > 1e-9).all(), sf
        # probe boundary for the 8 query vectors
        qs = sims[:8]
        order = np.sort(qs, axis=1)[:, ::-1]
        assert (order[:, _IVFX_NPROBE - 1]
                - order[:, _IVFX_NPROBE] > 1e-9).all(), sf
        # rank-k boundary inside each query's candidate union
        cell = np.argmax(sims, axis=1)
        for qi in range(8):
            probe = np.argsort(-qs[qi])[:_IVFX_NPROBE]
            cand = np.isin(cell, probe)
            cs = np.sort(Xn[cand] @ Xn[qi])[::-1]
            assert cs[4] - cs[5] > 1e-9, (sf, qi)


def test_embed_knn_pq_exact_margins():
    """Every cross-engine float boundary of the seeded-PQ query must
    clear a margin: per-(vector, subspace) encode argmin gap, the
    global ADC top-R cut (any two rows within 1e-9 of each other must
    carry IDENTICAL code tuples — identical tuples give bit-equal ADC
    scores per engine, so the neighbor_id tie-break agrees), and the
    exact-cosine rank-k boundary within each query's candidate set."""
    import pyarrow.parquet as pq

    from geo_ray.pipelines.queries import (_PQX_NSUB, _PQX_RERANK,
                                           _PQX_SEED_IDS)

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t.column("embedding").to_pylist()])
        Xn = X / np.linalg.norm(X, axis=1)[:, None]
        seed_rows = np.searchsorted(ids, np.array(_PQX_SEED_IDS))
        assert (ids[seed_rows] == np.array(_PQX_SEED_IDS)).all()
        C = Xn[seed_rows]
        d = Xn.shape[1] // _PQX_NSUB
        codes = np.empty((len(Xn), _PQX_NSUB), dtype=np.int64)
        for s in range(_PQX_NSUB):
            S = Xn[:, s * d:(s + 1) * d]
            Cs = C[:, s * d:(s + 1) * d]
            d2 = ((S * S).sum(1)[:, None] - 2 * (S @ Cs.T)
                  + (Cs * Cs).sum(1)[None, :])
            codes[:, s] = np.argmin(d2, axis=1)
            sd = np.sort(d2, axis=1)
            assert (sd[:, 1] - sd[:, 0] > 1e-9).all(), (sf, s)
        Q = Xn[:8]
        approx = np.zeros((8, len(Xn)))
        for s in range(_PQX_NSUB):
            Ts = Q[:, s * d:(s + 1) * d] @ C[:, s * d:(s + 1) * d].T
            approx += Ts[:, codes[:, s]]
        for qi in range(8):
            order = np.lexsort((ids, -approx[qi]))
            a = approx[qi][order]
            ct = codes[order]
            near = np.flatnonzero(np.abs(np.diff(a)) <= 1e-9)
            assert (ct[near] == ct[near + 1]).all(), (sf, qi)
            cand = order[:_PQX_RERANK]
            cs = np.sort(Xn[cand] @ Q[qi])[::-1]
            assert cs[4] - cs[5] > 1e-9, (sf, qi)

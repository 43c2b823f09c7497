"""Spatial parquet layout: Hilbert-range partitioned write,
covering-pruned read (sources/spatial_layout.py)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.sources.spatial_layout import (covering_intervals,
                                            prune_files, read_pruned,
                                            write_spatial)
from geo_ray.state.cap import Cap
from geo_ray.state.coverer import RegionCoverer


def _points_ds(n=6000, seed=7):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    t = pa.table({"pid": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(x), "y": pa.array(y),
                  "z": pa.array(z)})
    return rd.from_arrow(t), lat, lng, x, y, z


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("slayout"))
    ds, lat, lng, x, y, z = _points_ds()
    man = write_spatial(ds, out, rows_per_file=500)
    return out, man, (lat, lng, x, y, z)


def test_roundtrip_preserves_rows(layout):
    import ray.data as rd
    out, man, _ = layout
    assert man["total_rows"] == 6000
    paths = [os.path.join(out, f["path"]) for f in man["files"]]
    back = rd.read_parquet(paths).to_pandas()
    assert len(back) == 6000
    assert sorted(back["pid"]) == list(range(6000))


def test_files_sorted_and_ranges_disjoint(layout):
    import pyarrow.parquet as pq
    out, man, _ = layout
    prev_hi = None
    for f in sorted(man["files"], key=lambda r: r["cell_lo"]):
        t = pq.read_table(os.path.join(out, f["path"]),
                          columns=["__cell"])
        c = t.column("__cell").to_numpy()
        assert (np.diff(c) >= 0).all()
        assert c[0] == f["cell_lo"] and c[-1] == f["cell_hi"]
        if prev_hi is not None:
            assert f["cell_lo"] >= prev_hi  # ranges ordered
        prev_hi = f["cell_hi"]


def test_pruned_read_matches_brute_cap(layout):
    out, man, (lat, lng, x, y, z) = layout
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]),
                                   np.array([-122.0]))
    center = (float(cx[0]), float(cy[0]), float(cz[0]))
    chord2 = 0.02
    cap = Cap(center, chord2)
    covering = RegionCoverer(max_cells=32).covering(cap)

    got, stats = read_pruned(out, covering, columns=["pid"])
    got_ids = sorted(got.to_pandas()["pid"])

    # brute oracle: covering membership of every point's leaf cell
    leaf = cid.cell_id_from_point_v(x, y, z)
    lo, hi = covering_intervals(covering)
    sv = leaf.view(np.int64)
    pos = np.searchsorted(lo, sv, side="right") - 1
    ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= sv)
    want = sorted(np.flatnonzero(ok).astype(int))
    assert got_ids == want
    # the covering must contain every cap point (sanity of the oracle)
    inside = cap.contains_points_v(x, y, z)
    assert set(np.flatnonzero(inside).astype(int)) <= set(want)


def test_pruning_skips_files(layout):
    out, man, _ = layout
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]),
                                   np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.002)
    covering = RegionCoverer(max_cells=16).covering(cap)
    stats = prune_files(out, covering)
    assert stats["n_total"] == len(man["files"]) > 4
    assert 0 < stats["n_read"] < stats["n_total"]
    assert stats["rows_read"] < stats["rows_total"]


def test_resume_skips_existing(layout, ray_session):
    out, man, _ = layout
    ds, *_ = _points_ds()
    man2 = write_spatial(ds, out, rows_per_file=500)
    assert man2["total_rows"] == man["total_rows"]
    assert [f["cell_lo"] for f in man2["files"]] == \
        [f["cell_lo"] for f in man["files"]]


@pytest.mark.parametrize("center", [(37.0, -122.0), (-40.0, 170.0),
                                    (80.0, 10.0), (-75.0, -60.0)])
def test_pruned_matches_brute_across_faces(layout, center):
    """Cell IDs on faces 4-5 have the int64 sign bit set; the layout
    orders by the SIGNED view on both the write and prune sides, so
    pruning must stay exact wherever the query cap lands."""
    out, man, (lat, lng, x, y, z) = layout
    cx, cy, cz = latlng_deg_to_xyz(np.array([center[0]]),
                                   np.array([center[1]]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.01)
    covering = RegionCoverer(max_cells=24).covering(cap)
    got, stats = read_pruned(out, covering, columns=["pid"])
    got_ids = sorted(got.to_pandas()["pid"])
    leaf = cid.cell_id_from_point_v(x, y, z)
    lo, hi = covering_intervals(covering)
    sv = leaf.view(np.int64)
    pos = np.searchsorted(lo, sv, side="right") - 1
    ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= sv)
    assert got_ids == sorted(np.flatnonzero(ok).astype(int))


def test_empty_covering_errors_gracefully(layout):
    out, _, _ = layout
    # a covering far from every point still returns a valid (empty)
    # dataset
    far = cid.cell_id_from_latlng(-89.9, 179.9)
    parent = cid.parent(far, 10)
    ds, stats = read_pruned(out, [parent], columns=["pid"])
    assert ds.count() >= 0


# ------------------------------------------------- spatiotemporal


def _events_ds(n=6000, seed=7):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    tsu = rng.integers(1_700_000_000_000_000, 1_703_000_000_000_000,
                       n)
    t = pa.table({"pid": pa.array(np.arange(n, dtype=np.int64)),
                  "tsu": pa.array(tsu.astype(np.int64)),
                  "x": pa.array(x), "y": pa.array(y),
                  "z": pa.array(z)})
    return rd.from_arrow(t), x, y, z, tsu


@pytest.fixture(scope="module")
def st_layout(ray_session, tmp_path_factory):
    from geo_ray.sources.spatial_layout import write_spatiotemporal
    out = str(tmp_path_factory.mktemp("st_layout"))
    ds, x, y, z, tsu = _events_ds()
    man = write_spatiotemporal(ds, out, rows_per_file=500)
    return out, man, (x, y, z, tsu)


def test_st_pruned_matches_brute(st_layout):
    from geo_ray.sources.spatial_layout import read_pruned_st
    out, man, (x, y, z, tsu) = st_layout
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]),
                                   np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.05)
    covering = RegionCoverer(max_cells=24).covering(cap)
    t0 = 1_701_000_000_000_000
    t1 = 1_702_000_000_000_000
    got, stats = read_pruned_st(out, covering, t0, t1,
                                columns=["pid"])
    got_ids = sorted(got.to_pandas()["pid"])
    from geo_ray.sources.spatial_layout import covering_intervals
    leaf = cid.cell_id_from_point_v(x, y, z)
    lo, hi = covering_intervals(covering)
    sv = leaf.view(np.int64)
    pos = np.searchsorted(lo, sv, side="right") - 1
    ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= sv)
    ok &= (tsu >= t0) & (tsu <= t1)
    assert got_ids == sorted(np.flatnonzero(ok).astype(int))
    assert stats["n_read"] < stats["n_total"]


def test_st_time_prune_cuts_files(st_layout):
    from geo_ray.sources.spatial_layout import prune_files_st
    out, man, _ = st_layout
    # whole sphere, narrow time slice: time bounds alone must prune
    all_faces = [cid.parent(cid.cell_id_from_latlng(la, ln), 0)
                 for la, ln in ((0, 0), (0, 90), (0, -90), (0, 180),
                                (85, 0), (-85, 0))]
    t0 = 1_700_100_000_000_000
    t1 = 1_700_200_000_000_000
    stats = prune_files_st(out, all_faces, t0, t1)
    assert stats["n_read"] < stats["n_total"]


def test_st_resume(st_layout, ray_session):
    from geo_ray.sources.spatial_layout import write_spatiotemporal
    out, man, _ = st_layout
    ds, *_ = _events_ds()
    man2 = write_spatiotemporal(ds, out, rows_per_file=500)
    assert man2["total_rows"] == man["total_rows"]


# ------------------------------------------------------ upsert


def test_upsert_rewrites_only_touched_files(ray_session,
                                            tmp_path_factory):
    import time as _time
    import ray.data as rd
    import pyarrow.parquet as pq
    from geo_ray.sources.spatial_layout import (upsert_spatial,
                                                write_spatial,
                                                _load_manifest)
    out = str(tmp_path_factory.mktemp("upsert"))
    ds, lat, lng, x, y, z = _points_ds(n=4000, seed=3)
    man = write_spatial(ds, out, rows_per_file=400)
    mtimes = {f["path"]: os.path.getmtime(os.path.join(out, f["path"]))
              for f in man["files"]}

    # attribute-correct 30 SPATIALLY CLUSTERED keys (consecutive in
    # Hilbert order -> few partitions; same xyz -> same routing)
    leaf = cid.cell_id_from_point_v(x, y, z).view(np.int64)
    sel = np.argsort(leaf, kind="mergesort")[:30]
    ups = pa.table({
        "pid": pa.array(sel.astype(np.int64)),
        "x": pa.array(x[sel]), "y": pa.array(y[sel]),
        "z": pa.array(z[sel])})
    _time.sleep(0.05)
    res = upsert_spatial(out, rd.from_arrow(ups), key_col="pid")
    assert res["total_rows"] == 4000          # replaced, not added
    man2 = _load_manifest(out)
    touched_paths = {f["path"] for f in man2["files"]
                     if f["pid"] in set(res["touched"])}
    for f in man2["files"]:
        mt = os.path.getmtime(os.path.join(out, f["path"]))
        if f["path"] in touched_paths:
            assert mt > mtimes[f["path"]]
        else:
            assert mt == mtimes[f["path"]]
    assert 0 < len(touched_paths) < len(man2["files"])

    # new keys append
    newp = pa.table({
        "pid": pa.array(np.arange(100000, 100010, dtype=np.int64)),
        "x": pa.array(x[:10]), "y": pa.array(y[:10]),
        "z": pa.array(z[:10])})
    res2 = upsert_spatial(out, rd.from_arrow(newp), key_col="pid")
    assert res2["total_rows"] == 4010

    # full table still complete and per-file sorted
    paths = [os.path.join(out, f["path"])
             for f in _load_manifest(out)["files"]]
    back = rd.read_parquet(paths).to_pandas()
    assert len(back) == 4010
    assert set(np.arange(4000)) <= set(back["pid"])
    for p in paths:
        c = pq.read_table(p, columns=["__cell"]) \
            .column("__cell").to_numpy()
        assert (np.diff(c) >= 0).all()


def test_delete_then_compact(ray_session, tmp_path_factory):
    import ray.data as rd
    import pyarrow.parquet as pq
    from geo_ray.sources.spatial_layout import (compact_spatial,
                                                delete_spatial,
                                                prune_files,
                                                write_spatial,
                                                _load_manifest)
    out = str(tmp_path_factory.mktemp("delcomp"))
    ds, lat, lng, x, y, z = _points_ds(n=4000, seed=9)
    man = write_spatial(ds, out, rows_per_file=400)

    # delete 200 spatially clustered keys (position routes them)
    leaf = cid.cell_id_from_point_v(x, y, z).view(np.int64)
    sel = np.argsort(leaf, kind="mergesort")[:200]
    dels = pa.table({
        "pid": pa.array(sel.astype(np.int64)),
        "x": pa.array(x[sel]), "y": pa.array(y[sel]),
        "z": pa.array(z[sel])})
    res = delete_spatial(out, rd.from_arrow(dels), key_col="pid")
    assert res["total_rows"] == 3800
    assert 0 < len(res["touched"]) < len(man["files"])

    # compact back to ~800-row files; total preserved, order kept
    res2 = compact_spatial(out, target_rows=800)
    assert res2["total_rows"] == 3800
    man2 = _load_manifest(out)
    assert len(man2["files"]) < len(man["files"])
    prev_hi = None
    for f in sorted(man2["files"], key=lambda r: r["cell_lo"]):
        c = pq.read_table(os.path.join(out, f["path"]),
                          columns=["__cell"]) \
            .column("__cell").to_numpy()
        assert (np.diff(c) >= 0).all()
        if prev_hi is not None:
            assert f["cell_lo"] >= prev_hi
        prev_hi = f["cell_hi"]
    # pruning still exact after the full lifecycle
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]),
                                   np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.02)
    covering = RegionCoverer(max_cells=24).covering(cap)
    from geo_ray.sources.spatial_layout import (covering_intervals,
                                                read_pruned)
    got, stats = read_pruned(out, covering, columns=["pid"])
    got_ids = sorted(got.to_pandas()["pid"])
    keep_mask = np.ones(len(x), bool)
    keep_mask[sel] = False
    lo, hi = covering_intervals(covering)
    sv = leaf
    pos = np.searchsorted(lo, sv, side="right") - 1
    ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= sv) & keep_mask
    assert got_ids == sorted(np.flatnonzero(ok).astype(int))


def test_zone_map_stats_pruning(ray_session, tmp_path_factory):
    """stats_cols zone maps: a range predicate on a non-spatial
    indexed column prunes files without opening them, and the exact
    result equals the brute filter.  The indexed column here
    correlates with the cell order (ids assigned by Hilbert rank),
    so pruning is tight; an uncorrelated column would degrade to a
    full scan — correctness must hold either way."""
    import ray.data as rd
    from geo_ray.sources.spatial_layout import (prune_files_by,
                                                read_pruned_by,
                                                write_spatial)
    out = str(tmp_path_factory.mktemp("zonemap"))
    ds, lat, lng, x, y, z = _points_ds(n=4000, seed=5)
    # assign the indexed attribute by Hilbert rank so files get
    # disjoint attribute ranges (the clustered-index best case)
    leaf = cid.cell_id_from_point_v(x, y, z).view(np.int64)
    rank = np.empty(len(leaf), np.int64)
    rank[np.argsort(leaf, kind="mergesort")] = np.arange(len(leaf))
    t = pa.table({"pid": pa.array(np.arange(4000, dtype=np.int64)),
                  "attr": pa.array(rank),
                  "x": pa.array(x), "y": pa.array(y),
                  "z": pa.array(z)})
    man = write_spatial(rd.from_arrow(t), out, rows_per_file=400,
                        stats_cols=["attr"])
    assert all(f"min_attr" in f for f in man["files"])

    stats = prune_files_by(out, "attr", 100, 500)
    assert 0 < stats["n_read"] < stats["n_total"]
    got, _ = read_pruned_by(out, "attr", 100, 500, columns=["pid"])
    got_ids = sorted(got.to_pandas()["pid"])
    want = sorted(np.flatnonzero((rank >= 100) & (rank <= 500))
                  .astype(int))
    assert got_ids == want

    with pytest.raises(KeyError):
        prune_files_by(out, "nope", 0, 1)

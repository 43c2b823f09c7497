"""Key -> partition index + movable keys on the spatial layout
(sources/spatial_layout.py build_key_index / index_lookup /
move_spatial)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.functions.latlng import latlng_deg_to_xyz
from geo_ray.sources.spatial_layout import (build_key_index,
                                            index_lookup,
                                            move_spatial,
                                            prune_files, read_pruned,
                                            write_spatial,
                                            _load_manifest)


def _points_ds(n=4000, seed=11):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(x), "y": pa.array(y),
                  "z": pa.array(z)})
    return rd.from_arrow(t)


def _scan_key_pids(out_dir):
    """Brute oracle: key -> pid by opening every layout file."""
    man = _load_manifest(out_dir)
    got = {}
    for f in man["files"]:
        t = pq.read_table(os.path.join(out_dir, f["path"]),
                          columns=["k"])
        for k in t.column("k").to_pylist():
            got[int(k)] = f["pid"]
    return got


@pytest.fixture()
def layout(ray_session, tmp_path):
    out = str(tmp_path / "slayout")
    ds = _points_ds()
    man = write_spatial(ds, out, rows_per_file=500)
    build_key_index(out, key_col="k")
    return out, man


def test_index_lookup_matches_brute(layout):
    out, man = layout
    truth = _scan_key_pids(out)
    probe = list(range(0, 4000, 37)) + [99999, -5]
    got = index_lookup(out, probe)
    for k in probe:
        if k in truth:
            assert got[k] == truth[k], k
        else:
            assert k not in got


def test_move_across_partitions(layout, ray_session):
    import ray.data as rd
    out, man = layout
    truth = _scan_key_pids(out)
    # move 60 keys to a tight cluster near (10, 20): they must land
    # together in one or two partitions, away from their old homes
    keys = np.arange(0, 4000, 67, dtype=np.int64)[:60]
    lat = np.full(len(keys), 10.0) + 0.001 * np.arange(len(keys))
    lng = np.full(len(keys), 20.0)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    moves = rd.from_arrow(pa.table({
        "k": pa.array(keys), "x": pa.array(x), "y": pa.array(y),
        "z": pa.array(z)}))
    res = move_spatial(out, moves, key_col="k")
    assert res["total_rows"] == 4000          # count preserved

    after = _scan_key_pids(out)
    assert len(after) == 4000                 # keys unique
    moved = set(keys.tolist())
    # every moved key now lives where its NEW cell routes it
    leaf = cid.cell_id_from_point_v(x, y, z).view(np.int64)
    man2 = _load_manifest(out)
    files = sorted(man2["files"], key=lambda f: f["cell_lo"])
    lo = np.array([f["cell_lo"] for f in files], np.int64)
    pid_of = np.array([f["pid"] for f in files], np.int64)
    pos = np.maximum(np.searchsorted(lo, leaf, side="right") - 1, 0)
    want_pid = pid_of[pos]
    for k, w in zip(keys, want_pid):
        assert after[int(k)] == int(w), k
    # unmoved keys stayed put
    for k, p in truth.items():
        if k not in moved:
            assert after[k] == p
    # the index agrees with the post-move truth
    got = index_lookup(out, list(moved))
    for k in moved:
        assert got[int(k)] == after[int(k)]


def test_move_is_upsert_for_new_keys(layout, ray_session):
    import ray.data as rd
    out, man = layout
    x, y, z = latlng_deg_to_xyz(np.array([45.0]), np.array([45.0]))
    moves = rd.from_arrow(pa.table({
        "k": pa.array(np.array([777777], np.int64)),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z)}))
    res = move_spatial(out, moves, key_col="k")
    assert res["total_rows"] == 4001
    got = index_lookup(out, [777777])
    truth = _scan_key_pids(out)
    assert got[777777] == truth[777777]


def test_moved_rows_found_by_pruned_read(layout, ray_session):
    import ray.data as rd
    from geo_ray.state.cap import Cap
    from geo_ray.state.coverer import RegionCoverer

    out, man = layout
    keys = np.array([3, 1003, 2003], np.int64)
    lat = np.array([37.0, 37.01, 37.02])
    lng = np.array([-122.0, -122.0, -122.0])
    x, y, z = latlng_deg_to_xyz(lat, lng)
    moves = rd.from_arrow(pa.table({
        "k": pa.array(keys), "x": pa.array(x), "y": pa.array(y),
        "z": pa.array(z)}))
    move_spatial(out, moves, key_col="k")

    cx, cy, cz = latlng_deg_to_xyz(np.array([37.01]),
                                   np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 1e-5)
    covering = RegionCoverer(max_cells=16).covering(cap)
    got, stats = read_pruned(out, covering, columns=["k"])
    ids = set(got.to_pandas()["k"])
    assert set(keys.tolist()) <= ids
    assert stats["n_read"] < stats["n_total"]  # pruning still real


def test_index_survives_upsert_delete_compact(layout, ray_session):
    import ray.data as rd
    from geo_ray.sources.spatial_layout import (compact_spatial,
                                                delete_spatial,
                                                upsert_spatial)

    out, man = layout
    # upsert a NEW key: index must learn it
    x, y, z = latlng_deg_to_xyz(np.array([12.0]), np.array([34.0]))
    ups = rd.from_arrow(pa.table({
        "k": pa.array(np.array([888888], np.int64)),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z)}))
    upsert_spatial(out, ups, key_col="k")
    truth = _scan_key_pids(out)
    assert index_lookup(out, [888888])[888888] == truth[888888]

    # delete a key: index must forget it
    dels = rd.from_arrow(pa.table({
        "k": pa.array(np.array([888888], np.int64)),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z)}))
    delete_spatial(out, dels, key_col="k")
    assert 888888 not in index_lookup(out, [888888])

    # compact renumbers pids: index must follow
    compact_spatial(out, target_rows=1500)
    truth = _scan_key_pids(out)
    probe = list(range(0, 4000, 113))
    got = index_lookup(out, probe)
    for k in probe:
        assert got[k] == truth[k], k


def test_insert_into_missing_bucket(layout, ray_session):
    """A new key that hashes to a bucket with NO index file must
    insert cleanly (the empty-index guard in _resolve) and be
    resolvable afterwards."""
    import ray.data as rd
    from geo_ray.sources.spatial_layout import _key_buckets

    out, man = layout
    idx_dir = os.path.join(out, "_key_index")
    import json
    with open(os.path.join(idx_dir, "_key_index.json")) as fh:
        nb = json.load(fh)["n_buckets"]
    k = 500000
    b = int(_key_buckets(np.array([k], np.int64), nb)[0])
    # simulate the new key's bucket having no index file
    bpath = os.path.join(idx_dir, f"bucket-{b:05d}.parquet")
    if os.path.exists(bpath):
        os.remove(bpath)
    x, y, z = latlng_deg_to_xyz(np.array([12.0]), np.array([34.0]))
    moves = rd.from_arrow(pa.table({
        "k": pa.array(np.array([k], np.int64)),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z)}))
    res = move_spatial(out, moves, key_col="k")
    assert res["total_rows"] == 4001
    got = index_lookup(out, [k])
    assert got[k] == _scan_key_pids(out)[k]


def test_rebuild_clears_stale_buckets(layout, ray_session):
    """After a rebuild with a different bucket count, no bucket file
    from the previous build may survive — a stale file would serve
    deleted/renumbered keys."""
    out, man = layout
    idx_dir = os.path.join(out, "_key_index")
    before = sorted(f for f in os.listdir(idx_dir)
                    if f.startswith("bucket-"))
    assert before
    build_key_index(out, key_col="k", n_buckets=3)
    after = sorted(f for f in os.listdir(idx_dir)
                   if f.startswith("bucket-"))
    assert all(int(f.split("-")[1].split(".")[0]) < 3 for f in after), \
        after
    # lookups still exact on the rebuilt index
    truth = _scan_key_pids(out)
    got = index_lookup(out, list(range(0, 4000, 97)))
    for k in range(0, 4000, 97):
        assert got[k] == truth[k]


def test_move_index_update_is_idempotent(layout, ray_session):
    """The ADVICE retry-safety contract: re-running a move produces
    the identical index and layout state (resolution is read-only;
    the bucket upsert is a pure overwrite)."""
    import hashlib
    import ray.data as rd

    out, man = layout
    keys = np.arange(0, 4000, 131, dtype=np.int64)[:20]
    x, y, z = latlng_deg_to_xyz(np.full(len(keys), -30.0),
                                np.full(len(keys), 150.0))
    moves = pa.table({"k": pa.array(keys), "x": pa.array(x),
                      "y": pa.array(y), "z": pa.array(z)})

    def state_digest():
        h = hashlib.blake2b(digest_size=16)
        idx_dir = os.path.join(out, "_key_index")
        for d in (out, idx_dir):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".parquet"):
                    with open(os.path.join(d, fn), "rb") as fh:
                        h.update(fn.encode())
                        h.update(hashlib.blake2b(
                            fh.read(), digest_size=16).digest())
        return h.hexdigest()

    move_spatial(out, rd.from_arrow(moves), key_col="k")
    d1 = state_digest()
    truth1 = _scan_key_pids(out)
    # simulated retry: the SAME move applied again
    move_spatial(out, rd.from_arrow(moves), key_col="k")
    assert state_digest() == d1
    assert _scan_key_pids(out) == truth1

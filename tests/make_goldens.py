"""Generate the golden fixture files of FIXTURES.md §3 (deterministic;
re-running must be byte-identical).  Run from the repo root:

    python tests/make_goldens.py [--check]

--check regenerates into memory and asserts equality with the files on
disk instead of writing.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_ray.functions import cellid as cid  # noqa: E402
from geo_ray.functions.latlng import latlng_deg_to_xyz  # noqa: E402
from geo_ray.sources.images import images_table, latlng_from_phash  # noqa: E402
from geo_ray.state.coverer import RegionCoverer  # noqa: E402

from tests.corpus import LOOP_TEXTS, make_loop  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
N_IMAGES = 1000


def golden_cellids() -> pa.Table:
    tbl = images_table(N_IMAGES)
    ph = tbl.column("phash").to_numpy()
    lat, lng = latlng_from_phash(ph)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    ids = cid.cell_id_from_point_v(x, y, z)
    cols = {
        "image_id": tbl.column("image_id"),
        "lat": pa.array(lat), "lng": pa.array(lng),
        "cell_id": pa.array(ids.view(np.int64), pa.int64()),
        "token": pa.array([cid.token(int(v)) for v in ids], pa.string()),
    }
    for lvl in (4, 8, 12, 16, 20):
        p = cid.parent_v(ids, lvl)
        cols[f"parent{lvl}"] = pa.array(
            [cid.token(int(v)) for v in p], pa.string())
    return pa.table(cols)


def golden_coverings() -> pa.Table:
    rows = {"loop_name": [], "max_cells": [], "kind": [], "token": [],
            "level": []}
    for name in sorted(LOOP_TEXTS):
        if name in ("lineTriangle", "skinnyChevron"):
            continue  # degenerate loops: coverings are empty/unstable
        loop = make_loop(name)
        for max_cells in (8, 32):
            rc = RegionCoverer(max_cells=max_cells, max_level=14)
            for ci in rc.covering(loop):
                rows["loop_name"].append(name)
                rows["max_cells"].append(max_cells)
                rows["kind"].append("exterior")
                rows["token"].append(cid.token(ci))
                rows["level"].append(cid.level(ci))
            for ci in rc.interior_covering(loop):
                rows["loop_name"].append(name)
                rows["max_cells"].append(max_cells)
                rows["kind"].append("interior")
                rows["token"].append(cid.token(ci))
                rows["level"].append(cid.level(ci))
    return pa.table({k: pa.array(v) for k, v in rows.items()})


def golden_containment() -> pa.Table:
    tbl = images_table(200)
    ph = tbl.column("phash").to_numpy()
    lat, lng = latlng_from_phash(ph)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    rows = {"loop_name": [], "image_id": [], "contains": []}
    ids = tbl.column("image_id").to_pylist()
    for name in sorted(LOOP_TEXTS):
        loop = make_loop(name)
        mask = loop.contains_points_batch(pts)
        for i in range(len(ids)):
            rows["loop_name"].append(name)
            rows["image_id"].append(ids[i])
            rows["contains"].append(bool(mask[i]))
    return pa.table({k: pa.array(v) for k, v in rows.items()})


def golden_tiles() -> pa.Table:
    tbl = images_table(N_IMAGES)
    ph = tbl.column("phash").to_numpy()
    lat, lng = latlng_from_phash(ph)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    ids = cid.cell_id_from_point_v(x, y, z)
    level = 7
    tiles = cid.parent_v(ids, level)
    return pa.table({
        "image_id": tbl.column("image_id"),
        "tile_token": pa.array([cid.token(int(v)) for v in tiles]),
        "level": pa.array(np.full(len(tiles), level, dtype=np.int32)),
    })


GOLDENS = {
    "cellids.parquet": golden_cellids,
    "coverings.parquet": golden_coverings,
    "containment.parquet": golden_containment,
    "tiles.parquet": golden_tiles,
}


def main():
    check = "--check" in sys.argv
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for fname, fn in GOLDENS.items():
        tbl = fn()
        path = os.path.join(GOLDEN_DIR, fname)
        if check:
            want = pq.read_table(path)
            assert tbl.equals(want), f"{fname} drifted from golden"
            print(f"{fname}: OK ({len(tbl)} rows)")
        else:
            pq.write_table(tbl, path, compression="zstd")
            print(f"wrote {path} ({len(tbl)} rows)")


if __name__ == "__main__":
    main()

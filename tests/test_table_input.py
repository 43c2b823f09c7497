"""Stored-table ingest: the flagship consuming a written image table
(parquet substitute for the hinted Lance format) must produce the same
join/tiling results as synthesizing the identical rows, and the scan
must prune to the consumed columns."""

from __future__ import annotations

import os

import pytest


def test_flagship_from_stored_table(ray_session, tmp_path):
    import ray.data as rd

    from geo_ray.pipelines.flagship import run_flagship
    from geo_ray.sources.images import images_dataset
    from geo_ray.sources.table_io import (FLAGSHIP_COLUMNS,
                                          list_table_files,
                                          read_images_table,
                                          write_images_table)

    n = 900
    table_dir = str(tmp_path / "images_tbl")
    write_images_table(
        images_dataset(n, parallelism=3), table_dir,
        max_rows_per_file=300)
    files = list_table_files(table_dir)
    assert len(files) >= 2  # several fragments -> real resume shards

    # pruned read carries only the flagship columns
    ds = read_images_table(table_dir, columns=FLAGSHIP_COLUMNS)
    assert sorted(ds.schema().names) == sorted(FLAGSHIP_COLUMNS)

    synth = run_flagship(num_images=n)
    stored = run_flagship(input_path=table_dir)
    assert stored["metrics"]["num_images"] == n
    assert stored["metrics"]["n_matches"] == synth["metrics"]["n_matches"]
    assert stored["metrics"]["n_tiles"] == synth["metrics"]["n_tiles"]

    # sharded resume over file groups
    out = str(tmp_path / "ckpt")
    r1 = run_flagship(input_path=table_dir, out_root=out, n_shards=2)
    info = r1["metrics"]["stage_info"][0]
    assert info["n_shards"] == 2 and info["shards_cached"] == 0
    r2 = run_flagship(input_path=table_dir, out_root=out, n_shards=2)
    assert r2["metrics"]["stage_info"][0]["shards_cached"] == 2
    assert r2["metrics"]["n_matches"] == synth["metrics"]["n_matches"]


def test_lance_path_detection(tmp_path):
    from geo_ray.sources import table_io

    assert table_io._is_lance("/data/images.lance")
    assert not table_io._is_lance(str(tmp_path))
    if not table_io.have_lance():
        with pytest.raises(ImportError):
            table_io.read_images_table("/data/images.lance")

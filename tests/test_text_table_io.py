"""CSV / JSONL ingest of the image table: schema normalization,
base64 binary round trip, column pruning, and pipeline equivalence
with the parquet path."""

from __future__ import annotations

import base64
import csv
import json
import os

import numpy as np
import pyarrow as pa
import pytest


def _sample_table(n=64):
    from geo_ray.sources.images import images_dataset
    return images_dataset(n).to_pandas()


def _write_csv(df, path):
    df = df.copy()
    df["bytes"] = df["bytes"].map(
        lambda b: base64.b64encode(b).decode("ascii"))
    df.to_csv(path, index=False, quoting=csv.QUOTE_NONNUMERIC)


def _write_jsonl(df, path):
    with open(path, "w") as f:
        for rec in df.to_dict("records"):
            rec = dict(rec)
            rec["bytes"] = base64.b64encode(rec["bytes"]).decode("ascii")
            for k, v in rec.items():
                if isinstance(v, (np.integer,)):
                    rec[k] = int(v)
            f.write(json.dumps(rec) + "\n")


@pytest.mark.parametrize("fmt", ["csv", "jsonl"])
def test_text_round_trip(ray_session, tmp_path, fmt):
    from geo_ray.sources.table_io import read_text_table

    df = _sample_table()
    path = str(tmp_path / f"images.{fmt}")
    (_write_csv if fmt == "csv" else _write_jsonl)(df, path)
    ds = read_text_table(path)
    got = ds.to_pandas().sort_values("image_id").reset_index(drop=True)
    want = df.sort_values("image_id").reset_index(drop=True)
    assert list(got["image_id"]) == list(want["image_id"])
    assert (got["w"].to_numpy() == want["w"].to_numpy()).all()
    assert (got["phash"].to_numpy() == want["phash"].to_numpy()).all()
    assert all(a == b for a, b in zip(got["bytes"], want["bytes"]))
    # canonical arrow types
    sch = ds.schema()
    tmap = dict(zip(sch.names, sch.types))
    assert tmap["bytes"] == pa.binary()
    assert tmap["w"] == pa.int32() and tmap["h"] == pa.int32()
    assert tmap["phash"] == pa.int64()


def test_text_column_pruning(ray_session, tmp_path):
    from geo_ray.sources.table_io import read_text_table

    df = _sample_table(32)
    path = str(tmp_path / "images.csv")
    _write_csv(df, path)
    ds = read_text_table(path, columns=["image_id", "phash"])
    assert set(ds.schema().names) == {"image_id", "phash"}


def test_text_pipeline_equivalence(ray_session, tmp_path):
    """The same decode+stats stage over CSV ingest and the native
    synthesis path produces identical per-image features."""
    from geo_ray.sources.table_io import read_text_table
    from geo_ray.stages.tiles import image_stats
    from geo_ray.sources.images import images_dataset

    df = _sample_table(48)
    path = str(tmp_path / "images.csv")
    _write_csv(df, path)
    a = read_text_table(path).map_batches(
        image_stats, batch_format="pyarrow").to_pandas()
    b = images_dataset(48).map_batches(
        image_stats, batch_format="pyarrow").to_pandas()
    a = a.sort_values("image_id").reset_index(drop=True)
    b = b.sort_values("image_id").reset_index(drop=True)
    common = [c for c in a.columns if c in b.columns]
    for c in common:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == object:
            assert list(av) == list(bv), c
        else:
            assert np.array_equal(av, bv), c


def test_unknown_format_raises(ray_session, tmp_path):
    from geo_ray.sources.table_io import read_text_table
    p = str(tmp_path / "images.xyz")
    open(p, "w").write("x")
    with pytest.raises(ValueError):
        read_text_table(p)

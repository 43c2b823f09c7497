"""Per-partition (sharded) checkpoint/resume semantics: a killed run
re-executes only unfinished shards; manifests carry rows/wall/lineage
(the north rule's "resumable from per-partition checkpoints with
lineage and metrics")."""

from __future__ import annotations

import json
import os
import shutil

import pytest


def _run(tmp, n=1200):
    from geo_ray.pipelines.flagship import run_flagship

    return run_flagship(num_images=n, out_root=tmp, n_shards=4)


def test_sharded_resume(ray_session, tmp_path):
    tmp = str(tmp_path / "ckpt")
    res1 = _run(tmp)
    info1 = res1["metrics"]["stage_info"][0]
    assert info1["n_shards"] == 4 and info1["shards_cached"] == 0
    assert sum(s["rows"] for s in info1["shards"]) == 1200
    n_matches = res1["metrics"]["n_matches"]

    # full rerun: everything cached, identical results
    res2 = _run(tmp)
    info2 = res2["metrics"]["stage_info"][0]
    assert info2["cached"] and info2["shards_cached"] == 4
    assert all(s["cached"] for s in info2["shards"])
    assert res2["metrics"]["n_matches"] == n_matches
    for st in res2["metrics"]["stage_info"][1:]:
        assert st["cached"] is True

    # simulate a run killed mid-stage: shard 2 unfinished
    shutil.rmtree(os.path.join(tmp, "points", "shard=2"))
    stamp0 = json.load(open(os.path.join(
        tmp, "points", "shard=0", "_MANIFEST.json")))
    res3 = _run(tmp)
    info3 = res3["metrics"]["stage_info"][0]
    assert info3["shards_cached"] == 3
    rebuilt = [s for s in info3["shards"] if not s["cached"]]
    assert len(rebuilt) == 1 and rebuilt[0]["shard"] == 2
    # untouched shards were NOT recomputed
    stamp0b = json.load(open(os.path.join(
        tmp, "points", "shard=0", "_MANIFEST.json")))
    assert stamp0b == stamp0
    assert res3["metrics"]["n_matches"] == n_matches

    # lineage: downstream stage manifests record the parent stage
    join_man = json.load(open(os.path.join(tmp, "join", "_MANIFEST.json")))
    assert join_man["parents"][0]["stage"] == "points"
    assert join_man["parents"][0]["signature"] == join_man["signature"]


def test_shards_match_monolithic(ray_session, tmp_path):
    """Union of per-shard synthesis == monolithic synthesis (pure
    function of the global row index)."""
    from geo_ray.pipelines.flagship import build_points

    mono = build_points(400).to_pandas().sort_values("image_id")
    parts = [build_points(150, start=0), build_points(150, start=150),
             build_points(100, start=300)]
    ds = parts[0].union(*parts[1:])
    sh = ds.to_pandas().sort_values("image_id")
    import pandas as pd

    pd.testing.assert_frame_equal(mono.reset_index(drop=True),
                                  sh.reset_index(drop=True))


def test_signature_change_invalidates_shards(ray_session, tmp_path):
    tmp = str(tmp_path / "ckpt2")
    _run(tmp, n=800)
    res = _run(tmp, n=1200)  # different signature -> full rebuild
    info = res["metrics"]["stage_info"][0]
    assert info["shards_cached"] == 0
    assert sum(s["rows"] for s in info["shards"]) == 1200

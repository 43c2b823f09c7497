"""Resumable-output helpers: per-stage parquet directories with a JSON
manifest (stage name, input signature, row count, wall time).

A rerun with the same signature skips the stage and reads its parquet
back; outputs are written to a temp dir and atomically renamed, so a
killed run never leaves a half-written stage that looks complete
(SURVEY.md §4 checkpoint/resume row).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Optional


def stage_checkpoint(out_root: Optional[str], stage: str, signature: str,
                     build: Callable, *, read=None):
    """Run ``build()`` -> Dataset unless a finished checkpoint with the
    same signature exists; returns (dataset, info dict)."""
    import ray.data as rd

    if out_root is None:
        ds = build()
        return ds, {"stage": stage, "cached": False}
    stage_dir = os.path.join(out_root, stage)
    manifest_path = os.path.join(stage_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            manifest = json.load(open(manifest_path))
        except Exception:
            manifest = None
        if manifest and manifest.get("signature") == signature:
            ds = (read or rd.read_parquet)(os.path.join(stage_dir, "data"))
            return ds, {"stage": stage, "cached": True, **manifest}
        shutil.rmtree(stage_dir, ignore_errors=True)
    tmp_dir = stage_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "data"), exist_ok=True)
    t0 = time.perf_counter()
    ds = build()
    ds.write_parquet(os.path.join(tmp_dir, "data"))
    elapsed = time.perf_counter() - t0
    ds2 = rd.read_parquet(os.path.join(tmp_dir, "data"))
    rows = ds2.count()
    manifest = {"stage": stage, "signature": signature, "rows": rows,
                "wall_sec": round(elapsed, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S")}
    json.dump(manifest, open(os.path.join(tmp_dir, "_MANIFEST.json"), "w"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.replace(tmp_dir, stage_dir)
    ds = rd.read_parquet(os.path.join(stage_dir, "data"))
    return ds, {"stage": stage, "cached": False, **manifest}

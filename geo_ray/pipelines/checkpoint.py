"""Resumable-output helpers: per-stage AND per-partition (shard)
parquet directories with JSON manifests (stage name, input signature,
row count, wall time, parent-stage lineage).

A rerun with the same signature skips finished work and reads its
parquet back; outputs are written to a temp dir and atomically renamed,
so a killed run never leaves a half-written stage/shard that looks
complete (SURVEY.md §4 checkpoint/resume row).  ``stage_checkpoint``
is whole-stage granularity; ``sharded_stage_checkpoint`` splits a
stage into independent input shards, each with its own atomic
directory + manifest, so a run killed mid-stage resumes at the first
unfinished shard — the "per-partition checkpoints with lineage and
metrics" shape the north rule asks for.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, List, Optional


def _lineage(parents) -> list:
    """Normalize parent stage infos into manifest lineage rows."""
    out = []
    for p in parents or []:
        out.append({"stage": p.get("stage"),
                    "signature": p.get("signature"),
                    "cached": p.get("cached")})
    return out


def stage_checkpoint(out_root: Optional[str], stage: str, signature: str,
                     build: Callable, *, read=None, parents=None):
    """Run ``build()`` -> Dataset unless a finished checkpoint with the
    same signature exists; returns (dataset, info dict)."""
    import ray.data as rd

    if out_root is None:
        ds = build()
        return ds, {"stage": stage, "signature": signature, "cached": False}
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
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "parents": _lineage(parents)}
    json.dump(manifest, open(os.path.join(tmp_dir, "_MANIFEST.json"), "w"))
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.replace(tmp_dir, stage_dir)
    ds = rd.read_parquet(os.path.join(stage_dir, "data"))
    return ds, {"stage": stage, "cached": False, **manifest}


def sharded_stage_checkpoint(out_root: Optional[str], stage: str,
                             signature: str, n_shards: int,
                             build_shard: Callable[[int], "object"],
                             *, parents=None):
    """Per-partition checkpointing: the stage's input is split into
    ``n_shards`` independent shards; ``build_shard(i)`` returns shard
    i's Dataset.  Each shard writes its own ``shard=<i>/data`` parquet
    directory plus manifest (atomic rename), so a killed run re-runs
    ONLY unfinished shards.  Returns (union dataset, info) where info
    carries per-shard manifests and a ``shards_cached`` count.

    Shards execute one at a time on the driver, but each shard's
    pipeline is internally parallel (it owns the whole cluster while it
    runs), so wall time matches the monolithic stage; at cluster scale
    shard count should be >= the desired resume granularity, not the
    node count.
    """
    import ray.data as rd

    if out_root is None:
        parts = [build_shard(i) for i in range(n_shards)]
        ds = parts[0]
        if len(parts) > 1:
            ds = ds.union(*parts[1:])
        return ds, {"stage": stage, "signature": signature, "cached": False,
                    "n_shards": n_shards, "shards_cached": 0}

    stage_dir = os.path.join(out_root, stage)
    # an old monolithic checkpoint (or a sharded one with a different
    # signature / shard count) cannot be partially reused
    mono = os.path.join(stage_dir, "_MANIFEST.json")
    meta_path = os.path.join(stage_dir, "_SHARDS.json")
    meta = None
    if os.path.exists(meta_path):
        try:
            meta = json.load(open(meta_path))
        except Exception:
            meta = None
    if os.path.exists(mono) or (
            os.path.exists(stage_dir) and
            (meta is None or meta.get("signature") != signature or
             meta.get("n_shards") != n_shards)):
        shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)
    if meta is None or not os.path.exists(meta_path):
        json.dump({"stage": stage, "signature": signature,
                   "n_shards": n_shards},
                  open(meta_path, "w"))

    shard_infos: List[dict] = []
    cached = 0
    for i in range(n_shards):
        shard_dir = os.path.join(stage_dir, f"shard={i}")
        man_path = os.path.join(shard_dir, "_MANIFEST.json")
        manifest = None
        if os.path.exists(man_path):
            try:
                manifest = json.load(open(man_path))
            except Exception:
                manifest = None
            if manifest and manifest.get("signature") == signature:
                cached += 1
                shard_infos.append({"cached": True, **manifest})
                continue
            shutil.rmtree(shard_dir, ignore_errors=True)
        tmp = shard_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        t0 = time.perf_counter()
        ds_i = build_shard(i)
        ds_i.write_parquet(os.path.join(tmp, "data"))
        elapsed = time.perf_counter() - t0
        rows = rd.read_parquet(os.path.join(tmp, "data")).count()
        manifest = {"stage": stage, "shard": i, "signature": signature,
                    "rows": rows, "wall_sec": round(elapsed, 3),
                    "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "parents": _lineage(parents)}
        json.dump(manifest, open(os.path.join(tmp, "_MANIFEST.json"), "w"))
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.replace(tmp, shard_dir)
        shard_infos.append({"cached": False, **manifest})

    files: List[str] = []
    for i in range(n_shards):
        d = os.path.join(stage_dir, f"shard={i}", "data")
        files.extend(sorted(os.path.join(d, f) for f in os.listdir(d)
                            if f.endswith(".parquet")))
    ds = rd.read_parquet(files)
    info = {"stage": stage, "signature": signature,
            "cached": cached == n_shards, "n_shards": n_shards,
            "shards_cached": cached,
            "rows": sum(s.get("rows", 0) for s in shard_infos),
            "shards": shard_infos}
    return ds, info

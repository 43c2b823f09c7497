#!/usr/bin/env python
"""Fleet-scale bulkload rehearsal (BASELINE.md round-5 artifact):

1. bulk-load N synthesized points into the Hilbert-range spatial
   layout (one sorted parquet per partition + pruning manifest);
2. KILL one partition (delete its file — the mid-run failure mode
   where a partition write is lost after the manifest epoch);
3. rerun the same write_spatial — every surviving partition must be
   SKIPPED (manifest row count + file existence), only the killed one
   rewritten;
4. prove resume correctness: the resumed layout's full row set must
   equal a from-scratch reference load (diff = 0 rows);
5. run the covering-pruned cap query and report the prune ratio and
   that the pruned result equals the unpruned brute filter.

    python jobs/rehearsal_bulkload.py --num-points 4000000

Prints one JSON line; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def host_control() -> float:
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-c",
                    "import numpy as np; a=np.ones((2000,2000)); (a@a).sum()"],
                   check=True)
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=4_000_000)
    ap.add_argument("--rows-per-file", type=int, default=100_000)
    ap.add_argument("--out", default="/tmp/geo_ray_rehearsal/layout")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.sources.spatial_layout import (_load_manifest,
                                                read_pruned,
                                                write_spatial)
    from geo_ray.state.cap import Cap
    from geo_ray.state.coverer import RegionCoverer

    def _points():
        def _gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy()
            lat = ((ids * 7919) % 17000) / 100.0 - 85.0
            lng = ((ids * 104729) % 36000) / 100.0 - 180.0
            x, y, z = latlng_deg_to_xyz(lat, lng)
            return pa.table({
                "pid": pa.array(ids.astype(np.int64)),
                "x": pa.array(x), "y": pa.array(y),
                "z": pa.array(z)})

        return rd.range(args.num_points, override_num_blocks=64) \
            .map_batches(_gen, batch_format="pyarrow")

    ctl0 = host_control()
    shutil.rmtree(args.out, ignore_errors=True)

    # 1. initial full load
    t0 = time.perf_counter()
    manifest = write_spatial(_points(), args.out,
                             rows_per_file=args.rows_per_file)
    load_sec = time.perf_counter() - t0
    n_files = len(manifest["files"])

    # 2. kill one mid-range partition's file
    victim = manifest["files"][n_files // 2]
    os.remove(os.path.join(args.out, victim["path"]))

    # 3. resume; detect rewrites by mtime-snapshot diff
    before = {f["path"]: os.path.getmtime(os.path.join(args.out, f["path"]))
              for f in manifest["files"]
              if os.path.exists(os.path.join(args.out, f["path"]))}
    t1 = time.perf_counter()
    write_spatial(_points(), args.out,
                  rows_per_file=args.rows_per_file)
    resume_sec = time.perf_counter() - t1
    rewritten = sorted(
        f["path"] for f in _load_manifest(args.out)["files"]
        if before.get(f["path"]) !=
        os.path.getmtime(os.path.join(args.out, f["path"])))

    # 4. resume-diff vs a from-scratch reference load
    ref_dir = args.out + "-ref"
    shutil.rmtree(ref_dir, ignore_errors=True)
    write_spatial(_points(), ref_dir, rows_per_file=args.rows_per_file)
    got = rd.read_parquet(args.out).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    ref = rd.read_parquet(ref_dir).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    resume_diff = 0 if got.equals(ref) else \
        int(len(got.merge(ref, how="outer", indicator=True)
                .query("_merge != 'both'")))

    # 5. pruned cap query vs brute
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]), np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.01)
    covering = RegionCoverer(max_cells=32).covering(cap)
    t2 = time.perf_counter()
    pruned, stats = read_pruned(args.out, covering)

    def _exact(batch: pa.Table) -> pa.Table:
        ok = cap.contains_points_v(
            batch.column("x").to_numpy(),
            batch.column("y").to_numpy(),
            batch.column("z").to_numpy())
        return batch.filter(pa.array(ok))

    hits = pruned.map_batches(_exact, batch_format="pyarrow")
    hit_ids = np.sort(hits.to_pandas()["pid"].to_numpy())
    query_sec = time.perf_counter() - t2
    full = rd.read_parquet(
        os.path.join(args.out)).to_pandas()
    brute = full[cap.contains_points_v(
        full["x"].to_numpy(), full["y"].to_numpy(),
        full["z"].to_numpy())]
    brute_ids = np.sort(brute["pid"].to_numpy())
    pruned_matches_brute = bool(len(hit_ids) == len(brute_ids)
                                and (hit_ids == brute_ids).all())

    ctl1 = host_control()
    print(json.dumps({
        "metric": "bulkload rehearsal (kill-one-partition resume + prune)",
        "rows": manifest["total_rows"],
        "n_files": n_files,
        "load_sec": round(load_sec, 2),
        "load_rows_per_sec": round(manifest["total_rows"] / load_sec),
        "killed_partition": victim["path"],
        "resume_sec": round(resume_sec, 2),
        "rewritten_files": rewritten,
        "resume_rewrote_only_victim":
            rewritten == [victim["path"]],
        "resume_diff_rows": resume_diff,
        "prune_files_read": stats["n_read"],
        "prune_files_total": stats["n_total"],
        "prune_pct_skipped": round(
            100.0 * (1 - stats["n_read"] / stats["n_total"]), 2),
        "prune_rows_read": stats["rows_read"],
        "query_hits": int(len(hit_ids)),
        "pruned_matches_brute": pruned_matches_brute,
        "query_sec": round(query_sec, 2),
        "host_control_sec": [ctl0, ctl1],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

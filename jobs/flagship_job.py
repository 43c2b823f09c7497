#!/usr/bin/env python
"""`ray job submit` entrypoint for the flagship spatial-join + tiling
pipeline.

On a real cluster:

    ray job submit --working-dir . -- python jobs/flagship_job.py \
        --num-images 1000000000 --out /mnt/output/run1 --tile-level 7

The job attaches to the cluster it was submitted to (``ray.init()``
with no address inside a job context), runs the pipeline with
per-stage parquet checkpoints under ``--out`` (a rerun of the same
command resumes from finished stages), and prints the metrics JSON as
its final line.  In this sandbox there is no multi-node cluster or
dashboard, so the same script runs standalone against a local session
(``RAY_ADDRESS=local``); the partitioning/shuffle design is identical
either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-images", type=int, default=1_000_000)
    ap.add_argument("--input", type=str, default=None,
                    help="stored image table (Lance or parquet dir); "
                         "when set, --num-images is ignored")
    ap.add_argument("--tile-level", type=int, default=7)
    ap.add_argument("--out", type=str, default="/tmp/geo_ray_job")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="local-mode CPU cap; 0 = attach/cluster default")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus > 0:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            # In a `ray job submit` context this attaches to the
            # submitting cluster; standalone it starts a local session.
            ray.init(ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geo_ray.pipelines.flagship import run_flagship

    res = run_flagship(num_images=args.num_images,
                       tile_level=args.tile_level,
                       out_root=args.out,
                       input_path=args.input)
    metrics = dict(res["metrics"])
    metrics["out"] = args.out
    print(json.dumps(metrics, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()

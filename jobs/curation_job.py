#!/usr/bin/env python
"""`ray job submit` entrypoint for the corpus-curation pipeline
(features -> filters -> exact dedup -> near-dup cluster collapse ->
per-(source, lang) stats; see geo_ray/pipelines/queries.py
q_corpus_curation for the stage semantics and the SQL oracle).

On a real cluster:

    ray job submit --working-dir . -- python jobs/curation_job.py \
        --input /mnt/tables/documents --out /mnt/output/curation1

The job attaches to the submitting cluster, checkpoints the curated
stats under ``--out`` (rerunning the same command resumes from the
finished stage instead of rescanning the corpus), and prints one
metrics JSON line.  Standalone it runs against a local session, same
partitioning design.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", type=str,
                    default="/root/testdata/sf0.01",
                    help="directory holding documents.parquet")
    ap.add_argument("--out", type=str, default="/tmp/geo_ray_curation")
    ap.add_argument("--min-len", type=int, default=50)
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="local-mode CPU cap; 0 = attach/cluster default")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        if args.num_cpus > 0:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        else:
            ray.init(ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from geo_ray.pipelines.checkpoint import stage_checkpoint
    from geo_ray.pipelines.queries import q_corpus_curation

    t0 = time.perf_counter()
    sig = f"input={args.input};min_len={args.min_len}"
    stats, info = stage_checkpoint(
        args.out, "curation_stats", sig,
        lambda: q_corpus_curation(args.input, min_len=args.min_len))
    rows = stats.count()
    print(json.dumps({
        "rows": rows,
        "cached": bool(info.get("cached")),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "out": args.out,
        "stage_info": info,
    }, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()

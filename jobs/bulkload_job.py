#!/usr/bin/env python
"""`ray job submit` entrypoint for the spatial bulk load: ingest a
point table into the Hilbert-range-partitioned parquet layout
(sources/spatial_layout.py) and report per-partition lineage.

On a real cluster:

    ray job submit --working-dir . -- python jobs/bulkload_job.py \
        --input /mnt/tables/customer.parquet \
        --out /mnt/layout/customer --rows-per-file 4000000

The writer is RESUMABLE: partitions whose file already landed with
the manifest row count are skipped on a rerun, so a failed bulk load
of a 10^12-row table resumes instead of restarting.  A demo query
(cap covering -> pruned read) runs after the load and prints how many
files the covering actually touched — the scan-pruning contract this
layout exists for.  Standalone (this sandbox) it runs against a local
session with synthesized points; the partitioning design is identical
on a cluster.
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
    ap.add_argument("--input", default=None,
                    help="parquet of points (needs x/y/z or lat/lng "
                         "derivable); default: synthesized demo set")
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows-per-file", type=int, default=100_000)
    ap.add_argument("--num-points", type=int, default=200_000,
                    help="synthesized rows when --input is absent")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.sources.spatial_layout import (read_pruned,
                                                write_spatial)
    from geo_ray.state.cap import Cap
    from geo_ray.state.coverer import RegionCoverer

    t0 = time.perf_counter()
    if args.input:
        ds = rd.read_parquet(args.input)
    else:
        def _gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy()
            lat = ((ids * 7919) % 17000) / 100.0 - 85.0
            lng = ((ids * 104729) % 36000) / 100.0 - 180.0
            x, y, z = latlng_deg_to_xyz(lat, lng)
            return pa.table({
                "pid": pa.array(ids.astype(np.int64)),
                "x": pa.array(x), "y": pa.array(y),
                "z": pa.array(z)})

        ds = rd.range(args.num_points, override_num_blocks=64) \
            .map_batches(_gen, batch_format="pyarrow")

    manifest = write_spatial(ds, args.out,
                             rows_per_file=args.rows_per_file)
    load_sec = time.perf_counter() - t0

    # demo pruned query: a cap over (37, -122)
    cx, cy, cz = latlng_deg_to_xyz(np.array([37.0]),
                                   np.array([-122.0]))
    cap = Cap((float(cx[0]), float(cy[0]), float(cz[0])), 0.01)
    covering = RegionCoverer(max_cells=32).covering(cap)
    t1 = time.perf_counter()
    hits, stats = read_pruned(args.out, covering)
    n_hits = hits.count()
    query_sec = time.perf_counter() - t1

    print(json.dumps({
        "metric": "spatial bulk load + pruned query",
        "rows": manifest["total_rows"],
        "n_files": len(manifest["files"]),
        "load_sec": round(load_sec, 3),
        "rows_per_sec": round(manifest["total_rows"]
                              / max(load_sec, 1e-9), 1),
        "query_files_read": stats["n_read"],
        "query_files_total": stats["n_total"],
        "query_rows_read": stats["rows_read"],
        "query_hits": int(n_hits),
        "query_sec": round(query_sec, 3),
    }))


if __name__ == "__main__":
    main()

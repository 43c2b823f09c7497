"""Spatially-clustered parquet layout: Hilbert-order range
partitioning on write, covering-based file pruning on read.

At 100 TB the decisive scan optimization is not reading at all:
a spatial filter that touches 0.1% of the sphere should touch ~0.1%
of the files.  Parquet gives row-group pruning only for columns the
writer happened to cluster; this module makes that clustering
explicit for spatial data, the way the reference's CellID ordering
makes range scans cheap (golang/geo s2/cellid.go: cell IDs are a
Hilbert-curve position, so spatial locality IS key locality):

* ``write_spatial(ds, out_dir)`` — leaf cell IDs are computed per
  batch, key-range bounds are sampled uniformly ACROSS blocks
  (stages/scan.sample_order_bounds — never ``limit()``), every batch
  tags its range partition with one searchsorted, and each partition
  writes ONE parquet file sorted by cell ID (a contiguous Hilbert
  range) plus a manifest row.  ``_layout.json`` records per-file
  [cell_lo, cell_hi] and row counts.  The shuffle moves each row
  once; partition count scales with the data (``rows_per_file``).
  On a multi-node cluster ``out_dir`` must be shared storage — the
  same contract as every distributed parquet writer.

* ``read_pruned(out_dir, covering)`` — a covering (list of S2 cell
  IDs from state/coverer) becomes [range_min, range_max] leaf
  intervals; manifest files whose [cell_lo, cell_hi] intersect no
  interval are never opened.  Returns a Ray Dataset over the
  surviving files only, plus the pruning stats, and (optionally)
  applies the exact per-row cell mask so candidates from partially-
  covered files are filtered vectorized.

Resumability: files are written under deterministic names
(``part-{i:05d}.parquet``); a re-run with the same bounds skips
partitions whose file already exists and matches the manifest row
count, so a failed bulk load resumes where it stopped.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa

from ..functions import cellid as cid

MANIFEST = "_layout.json"


def _leaf_ids(batch: pa.Table, xyz_cols=("x", "y", "z")) -> np.ndarray:
    x, y, z = (batch.column(c).to_numpy() for c in xyz_cols)
    return cid.cell_id_from_point_v(x, y, z)


def write_spatial(ds, out_dir: str, *, xyz_cols=("x", "y", "z"),
                  rows_per_file: int = 1_000_000,
                  num_files: int | None = None,
                  stats_cols: Sequence[str] = ()):
    """Range-partition ``ds`` by leaf cell ID and write one sorted
    parquet file per partition + the pruning manifest.  Returns the
    manifest dict.

    ``stats_cols``: additional int64 columns whose per-file min/max
    land in the manifest (the generic zone-map: any equality or
    range predicate on an indexed column prunes files via
    :func:`prune_files_by` without opening them — file-level stats
    the way parquet keeps row-group stats)."""
    import pandas as pd
    import pyarrow.parquet as pq
    from ..stages.scan import sample_order_bounds

    os.makedirs(out_dir, exist_ok=True)

    def _with_cell(batch: pa.Table) -> pa.Table:
        leaf = _leaf_ids(batch, xyz_cols)
        # int64 view: uint64 groupby keys fall back to object-pickled
        # extension arrays in the shuffle (repo-wide convention)
        return batch.append_column(
            "__cell", pa.array(leaf.view(np.int64), pa.int64()))

    cells = ds.map_batches(_with_cell, batch_format="pyarrow") \
        .materialize()
    total_rows = cells.count()
    nf = num_files if num_files is not None else \
        max(1, -(-total_rows // rows_per_file))
    # bounds in SIGNED leaf-key space: cell ids for faces 4-5 have the
    # top bit set, so partitioning compares the int64 VIEW everywhere
    # (write and prune use the same ordering — only consistency
    # matters for pruning correctness)
    bounds = sample_order_bounds(cells, "__cell", nf)

    def _tag(batch: pa.Table) -> pa.Table:
        c = batch.column("__cell").to_numpy()
        pid = np.searchsorted(bounds, c, side="right") \
            .astype(np.int32)
        return batch.append_column("__pid", pa.array(pid, pa.int32()))

    existing = _load_manifest(out_dir)
    done = {f["pid"]: f for f in existing.get("files", [])
            if os.path.exists(os.path.join(out_dir, f["path"]))}

    def _write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        g = g.sort_values("__cell", kind="mergesort") \
            .drop(columns=["__pid"])
        path = f"part-{pid:05d}.parquet"
        row = {
            "pid": [pid], "path": [path], "rows": [len(g)],
            "cell_lo": [int(g["__cell"].iloc[0])],
            "cell_hi": [int(g["__cell"].iloc[-1])]}
        for c in stats_cols:
            row[f"min_{c}"] = [int(g[c].min())]
            row[f"max_{c}"] = [int(g[c].max())]
        prior = done.get(pid)
        if prior is not None and prior["rows"] == len(g):
            # resume: partition already landed with the same row count
            return pd.DataFrame({**row, "skipped": [True]})
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       os.path.join(out_dir, path))
        return pd.DataFrame({**row, "skipped": [False]})

    man_rows = (cells.map_batches(_tag, batch_format="pyarrow")
                .groupby("__pid")
                .map_groups(_write_part, batch_format="pandas")
                .to_pandas())
    man_rows = man_rows.sort_values("pid").reset_index(drop=True)
    file_rows = []
    for r in man_rows.itertuples():
        d = {"pid": int(r.pid), "path": r.path, "rows": int(r.rows),
             "cell_lo": int(r.cell_lo), "cell_hi": int(r.cell_hi)}
        for c in stats_cols:
            d[f"min_{c}"] = int(getattr(r, f"min_{c}"))
            d[f"max_{c}"] = int(getattr(r, f"max_{c}"))
        file_rows.append(d)
    manifest = {
        "total_rows": int(man_rows["rows"].sum()),
        "stats_cols": list(stats_cols),
        "files": file_rows,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _load_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, MANIFEST)
    if not os.path.exists(p):
        return {}
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def covering_intervals(covering: Sequence[int]
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """[range_min, range_max] leaf intervals of a covering, as the
    SIGNED int64 views used by the layout ordering, sorted by lo."""
    ids = np.asarray(list(covering), np.uint64)
    lo = cid.range_min_v(ids).view(np.int64)
    hi = cid.range_max_v(ids).view(np.int64)
    order = np.argsort(lo, kind="mergesort")
    return lo[order], hi[order]


def prune_files(out_dir: str, covering: Sequence[int]) -> dict:
    """Manifest files whose cell range intersects the covering."""
    manifest = _load_manifest(out_dir)
    files = manifest.get("files", [])
    lo, hi = covering_intervals(covering)
    keep: List[dict] = []
    for f in files:
        i = np.searchsorted(lo, f["cell_hi"], side="right")
        # interval j < i has lo <= cell_hi; intersects iff its hi >=
        # cell_lo for some j — check the candidates overlapping the
        # file span (vectorized over the covering)
        if i > 0 and (hi[:i] >= f["cell_lo"]).any():
            keep.append(f)
    return {"files": keep, "n_total": len(files),
            "n_read": len(keep),
            "rows_total": manifest.get("total_rows", 0),
            "rows_read": int(sum(f["rows"] for f in keep))}


def read_pruned(out_dir: str, covering: Sequence[int], *,
                columns: Sequence[str] | None = None,
                exact: bool = True):
    """Ray Dataset over only the files intersecting ``covering``;
    with ``exact=True`` rows outside the covering are masked out
    vectorized (CellUnion stab over the sorted interval arrays).
    Returns (dataset, prune_stats)."""
    import ray.data as rd

    stats = prune_files(out_dir, covering)
    cols = list(columns) + ["__cell"] if columns else None
    if not stats["files"]:
        schema_file = _load_manifest(out_dir)["files"][0]["path"] \
            if _load_manifest(out_dir).get("files") else None
        if schema_file is None:
            raise FileNotFoundError(f"no layout at {out_dir}")
        empty = rd.read_parquet(
            os.path.join(out_dir, schema_file), columns=cols) \
            .filter(lambda r: False)
        return empty, stats
    paths = [os.path.join(out_dir, f["path"]) for f in stats["files"]]
    ds = rd.read_parquet(paths, columns=cols)
    if exact:
        lo, hi = covering_intervals(covering)

        def _mask(batch: pa.Table) -> pa.Table:
            c = batch.column("__cell").to_numpy()
            pos = np.searchsorted(lo, c, side="right") - 1
            ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= c)
            return batch.filter(pa.array(ok))

        ds = ds.map_batches(_mask, batch_format="pyarrow")
    return ds, stats


# ---------------------------------------------------------------------------
# spatiotemporal extension: Z-order (cell x time) clustering
# ---------------------------------------------------------------------------

def _morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave the low 32 bits of two uint64 arrays (a even bits,
    b odd bits) — the Z-order composite used to cluster event rows so
    that BOTH the spatial and the temporal per-file bounds stay
    tight."""
    def _spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return _spread(a) | (_spread(b) << np.uint64(1))


def write_spatiotemporal(ds, out_dir: str, *,
                         xyz_cols=("x", "y", "z"),
                         ts_col: str = "tsu",
                         rows_per_file: int = 1_000_000,
                         num_files: int | None = None):
    """write_spatial for EVENT data: rows cluster by the Z-order
    interleave of the TOP 16 Hilbert-position bits with the
    timestamp quantized to 16 bits across the observed range — the
    bit scales must be BALANCED or one dimension's bits dominate the
    Morton code and the other dimension's per-file bounds never
    tighten (observed with raw cell bits: time pruning cut zero
    files).  A query bounded in space AND time then prunes on both
    axes via the independent per-file [cell_lo, cell_hi] and
    [ts_lo, ts_hi] stats (the standard min/max model — correct for
    any clustering, tight under this one).  Same resumable manifest
    contract as write_spatial."""
    import pandas as pd
    import pyarrow.parquet as pq
    from ..stages.scan import sample_order_bounds

    os.makedirs(out_dir, exist_ok=True)

    def _with_cell(batch: pa.Table) -> pa.Table:
        leaf = _leaf_ids(batch, xyz_cols)
        return batch.append_column(
            "__cell", pa.array(leaf.view(np.int64), pa.int64()))

    celled = ds.map_batches(_with_cell, batch_format="pyarrow") \
        .materialize()

    def _ts_minmax(batch: pa.Table) -> pa.Table:
        t = batch.column(ts_col).to_numpy().astype(np.int64)
        return pa.table({"mn": pa.array([int(t.min())], pa.int64()),
                         "mx": pa.array([int(t.max())], pa.int64())})

    mm = celled.map_batches(_ts_minmax, batch_format="pyarrow") \
        .to_pandas()
    tmin = int(mm["mn"].min())
    span = max(int(mm["mx"].max()) - tmin, 1)

    def _with_z(batch: pa.Table) -> pa.Table:
        cell = batch.column("__cell").to_numpy().view(np.uint64)
        t = batch.column(ts_col).to_numpy().astype(np.int64)
        tq = ((t - tmin).astype(np.uint64) * np.uint64(65535)
              // np.uint64(span))
        z = _morton2(cell >> np.uint64(48), tq)
        return batch.append_column(
            "__z", pa.array(z.view(np.int64), pa.int64()))

    keyed = celled.map_batches(_with_z, batch_format="pyarrow") \
        .materialize()
    total_rows = keyed.count()
    nf = num_files if num_files is not None else \
        max(1, -(-total_rows // rows_per_file))
    bounds = sample_order_bounds(keyed, "__z", nf)

    def _tag(batch: pa.Table) -> pa.Table:
        z = batch.column("__z").to_numpy()
        pid = np.searchsorted(bounds, z, side="right") \
            .astype(np.int32)
        return batch.append_column("__pid", pa.array(pid, pa.int32()))

    existing = _load_manifest(out_dir)
    done = {f["pid"]: f for f in existing.get("files", [])
            if os.path.exists(os.path.join(out_dir, f["path"]))}

    def _write_part(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        g = g.sort_values("__z", kind="mergesort") \
            .drop(columns=["__pid"])
        path = f"part-{pid:05d}.parquet"
        row = {
            "pid": [pid], "path": [path], "rows": [len(g)],
            "cell_lo": [int(g["__cell"].min())],
            "cell_hi": [int(g["__cell"].max())],
            "ts_lo": [int(g[ts_col].min())],
            "ts_hi": [int(g[ts_col].max())]}
        prior = done.get(pid)
        if prior is not None and prior["rows"] == len(g):
            return pd.DataFrame({**row, "skipped": [True]})
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       os.path.join(out_dir, path))
        return pd.DataFrame({**row, "skipped": [False]})

    man_rows = (keyed.map_batches(_tag, batch_format="pyarrow")
                .groupby("__pid")
                .map_groups(_write_part, batch_format="pandas")
                .to_pandas()).sort_values("pid").reset_index(drop=True)
    manifest = {
        "total_rows": int(man_rows["rows"].sum()),
        "ts_min": tmin,
        "ts_span": span,
        "files": [
            {"pid": int(r.pid), "path": r.path, "rows": int(r.rows),
             "cell_lo": int(r.cell_lo), "cell_hi": int(r.cell_hi),
             "ts_lo": int(r.ts_lo), "ts_hi": int(r.ts_hi)}
            for r in man_rows.itertuples()],
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def prune_files_st(out_dir: str, covering: Sequence[int],
                   ts_lo: int, ts_hi: int) -> dict:
    """Files surviving BOTH the covering intersection and the
    [ts_lo, ts_hi] interval overlap (inclusive)."""
    manifest = _load_manifest(out_dir)
    files = manifest.get("files", [])
    lo, hi = covering_intervals(covering)
    keep: List[dict] = []
    for f in files:
        if f.get("ts_lo", ts_lo) > ts_hi or \
                f.get("ts_hi", ts_hi) < ts_lo:
            continue
        i = np.searchsorted(lo, f["cell_hi"], side="right")
        if i > 0 and (hi[:i] >= f["cell_lo"]).any():
            keep.append(f)
    return {"files": keep, "n_total": len(files),
            "n_read": len(keep),
            "rows_total": manifest.get("total_rows", 0),
            "rows_read": int(sum(f["rows"] for f in keep))}


def read_pruned_st(out_dir: str, covering: Sequence[int],
                   ts_lo: int, ts_hi: int, *,
                   columns: Sequence[str] | None = None,
                   ts_col: str = "tsu", exact: bool = True):
    """Dataset over the files surviving the space x time prune; with
    ``exact`` the covering mask AND the time interval apply
    per row."""
    import ray.data as rd

    stats = prune_files_st(out_dir, covering, ts_lo, ts_hi)
    cols = list(columns) + ["__cell", ts_col] if columns else None
    if not stats["files"]:
        man = _load_manifest(out_dir)
        if not man.get("files"):
            raise FileNotFoundError(f"no layout at {out_dir}")
        empty = rd.read_parquet(
            os.path.join(out_dir, man["files"][0]["path"]),
            columns=cols).filter(lambda r: False)
        return empty, stats
    paths = [os.path.join(out_dir, f["path"]) for f in stats["files"]]
    ds = rd.read_parquet(paths, columns=cols)
    if exact:
        lo, hi = covering_intervals(covering)

        def _mask(batch: pa.Table) -> pa.Table:
            c = batch.column("__cell").to_numpy()
            pos = np.searchsorted(lo, c, side="right") - 1
            ok = (pos >= 0) & (hi[np.maximum(pos, 0)] >= c)
            t = batch.column(ts_col).to_numpy().astype(np.int64)
            ok &= (t >= ts_lo) & (t <= ts_hi)
            return batch.filter(pa.array(ok))

        ds = ds.map_batches(_mask, batch_format="pyarrow")
    return ds, stats


# ---------------------------------------------------------------------------
# partition-local upsert: mutate the immutable-file layout by
# rewriting ONLY the touched partitions
# ---------------------------------------------------------------------------

def upsert_spatial(out_dir: str, updates_ds, *, key_col: str,
                   xyz_cols=("x", "y", "z")):
    """Apply an updates dataset to an existing write_spatial layout,
    rewriting only the partitions the updates land in (the
    merge-on-write of table formats like Iceberg, specialized to the
    cell-range layout).

    Placement contract: a key's POSITION is immutable — rows are
    routed by their cell, so an update must carry the same xyz as
    the original (attribute corrections) or be a new key.  Moving a
    key is delete+insert, which needs a key->partition index this
    layout intentionally does not maintain.

    Routing: each update row goes to the file whose [cell_lo,
    cell_hi] span it falls nearest (the partition ranges partition
    the whole key space by construction: searchsorted on the sorted
    cell_lo list).  Every touched partition merges vectorized —
    existing rows whose key appears in the updates are replaced,
    new keys append — re-sorts by cell and rewrites atomically
    (tmp + rename).  Untouched files are never opened.  Returns the
    refreshed manifest plus {"touched": [...pids...]}."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    manifest = _load_manifest(out_dir)
    files = sorted(manifest.get("files", []),
                   key=lambda f: f["cell_lo"])
    if not files:
        raise FileNotFoundError(f"no layout at {out_dir}")
    cell_lo = np.array([f["cell_lo"] for f in files], np.int64)
    pid_of = np.array([f["pid"] for f in files], np.int64)
    route_ref = ray.put((cell_lo, pid_of))

    def _route(batch: pa.Table) -> pa.Table:
        lo, pids = ray.get(route_ref)
        leaf = _leaf_ids(batch, xyz_cols)
        c = leaf.view(np.int64)
        pos = np.maximum(
            np.searchsorted(lo, c, side="right") - 1, 0)
        out = batch.append_column(
            "__cell", pa.array(c, pa.int64()))
        return out.append_column(
            "__pid", pa.array(pids[pos].astype(np.int32),
                              pa.int32()))

    by_file = {f["pid"]: f for f in files}

    def _merge_one(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        f = by_file[pid]
        path = os.path.join(out_dir, f["path"])
        base = pq.read_table(path).to_pandas()
        ups = g.drop(columns=["__pid"])
        keep = ~base[key_col].isin(set(ups[key_col]))
        merged = pd.concat([base[keep], ups], ignore_index=True) \
            .sort_values("__cell", kind="mergesort")
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(merged, preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({
            "pid": [pid], "rows": [len(merged)],
            "cell_lo": [int(merged["__cell"].iloc[0])],
            "cell_hi": [int(merged["__cell"].iloc[-1])]})

    touched = (updates_ds.map_batches(_route, batch_format="pyarrow")
               .groupby("__pid")
               .map_groups(_merge_one, batch_format="pandas")
               .to_pandas())
    tmap = {int(r.pid): r for r in touched.itertuples()}
    for f in manifest["files"]:
        t = tmap.get(f["pid"])
        if t is not None:
            f["rows"] = int(t.rows)
            f["cell_lo"] = int(t.cell_lo)
            f["cell_hi"] = int(t.cell_hi)
    manifest["total_rows"] = int(sum(f["rows"]
                                     for f in manifest["files"]))
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    _refresh_key_index_if_present(out_dir)
    return {**manifest, "touched": sorted(tmap)}


def delete_spatial(out_dir: str, deletes_ds, *, key_col: str,
                   xyz_cols=("x", "y", "z")):
    """Remove rows by key from the layout, rewriting only touched
    partitions.  Deletes carry the key AND its position (the same
    position-immutable contract as upsert_spatial — position routes
    the delete to the one file that can hold the key).  Returns the
    refreshed manifest + touched pids."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    manifest = _load_manifest(out_dir)
    files = sorted(manifest.get("files", []),
                   key=lambda f: f["cell_lo"])
    if not files:
        raise FileNotFoundError(f"no layout at {out_dir}")
    cell_lo = np.array([f["cell_lo"] for f in files], np.int64)
    pid_of = np.array([f["pid"] for f in files], np.int64)
    route_ref = ray.put((cell_lo, pid_of))

    def _route(batch: pa.Table) -> pa.Table:
        lo, pids = ray.get(route_ref)
        leaf = _leaf_ids(batch, xyz_cols)
        c = leaf.view(np.int64)
        pos = np.maximum(
            np.searchsorted(lo, c, side="right") - 1, 0)
        return pa.table({
            key_col: batch.column(key_col).cast(pa.int64()),
            "__pid": pa.array(pids[pos].astype(np.int32),
                              pa.int32())})

    by_file = {f["pid"]: f for f in files}

    def _delete_one(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        f = by_file[pid]
        path = os.path.join(out_dir, f["path"])
        base = pq.read_table(path).to_pandas()
        keep = ~base[key_col].isin(set(g[key_col]))
        merged = base[keep]
        tmp = path + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(merged, preserve_index=False), tmp)
        os.replace(tmp, path)
        lo_v = int(merged["__cell"].iloc[0]) if len(merged) \
            else f["cell_lo"]
        hi_v = int(merged["__cell"].iloc[-1]) if len(merged) \
            else f["cell_lo"]
        return pd.DataFrame({
            "pid": [pid], "rows": [len(merged)],
            "cell_lo": [lo_v], "cell_hi": [hi_v]})

    touched = (deletes_ds.map_batches(_route, batch_format="pyarrow")
               .groupby("__pid")
               .map_groups(_delete_one, batch_format="pandas")
               .to_pandas())
    tmap = {int(r.pid): r for r in touched.itertuples()}
    for f in manifest["files"]:
        t = tmap.get(f["pid"])
        if t is not None:
            f["rows"] = int(t.rows)
            f["cell_lo"] = int(t.cell_lo)
            f["cell_hi"] = int(t.cell_hi)
    manifest["total_rows"] = int(sum(f["rows"]
                                     for f in manifest["files"]))
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    _refresh_key_index_if_present(out_dir)
    return {**manifest, "touched": sorted(tmap)}


def compact_spatial(out_dir: str, *, target_rows: int):
    """Merge runs of adjacent small files so each compacted file
    approaches ``target_rows`` (the maintenance pass after many
    upserts/deletes skew file sizes).  Files are processed in cell
    order, so the layout's range property — and therefore every
    pruning guarantee — is preserved; compaction rewrites only the
    files it merges and refreshes the manifest atomically."""
    import pandas as pd
    import pyarrow.parquet as pq

    manifest = _load_manifest(out_dir)
    files = sorted(manifest.get("files", []),
                   key=lambda f: f["cell_lo"])
    if not files:
        raise FileNotFoundError(f"no layout at {out_dir}")

    groups: List[List[dict]] = [[]]
    acc = 0
    for f in files:
        if acc >= target_rows and groups[-1]:
            groups.append([])
            acc = 0
        groups[-1].append(f)
        acc += f["rows"]

    new_files = []
    n_rewritten = 0
    for gi, grp in enumerate(groups):
        if len(grp) == 1:
            f = dict(grp[0])
            f["pid"] = gi
            new_files.append(f)
            continue
        tabs = [pq.read_table(os.path.join(out_dir, f["path"]))
                for f in grp]
        merged = pa.concat_tables(tabs)
        order = np.argsort(merged.column("__cell").to_numpy(),
                           kind="mergesort")
        merged = merged.take(order)
        path = f"compact-{gi:05d}.parquet"
        tmp = os.path.join(out_dir, path + ".tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(out_dir, path))
        c = merged.column("__cell").to_numpy()
        new_files.append({
            "pid": gi, "path": path, "rows": len(merged),
            "cell_lo": int(c[0]) if len(c) else grp[0]["cell_lo"],
            "cell_hi": int(c[-1]) if len(c) else grp[0]["cell_lo"]})
        n_rewritten += 1
        for f in grp:
            old = os.path.join(out_dir, f["path"])
            if os.path.basename(old) != path:
                os.remove(old)
    manifest["files"] = new_files
    manifest["total_rows"] = int(sum(f["rows"] for f in new_files))
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    _refresh_key_index_if_present(out_dir)
    return {**manifest, "n_compacted_groups": n_rewritten}


def prune_files_by(out_dir: str, col: str, lo: int, hi: int) -> dict:
    """Generic zone-map prune: files whose manifest [min_col,
    max_col] interval overlaps [lo, hi] (inclusive).  Requires the
    layout to have been written with ``stats_cols`` including
    ``col``."""
    manifest = _load_manifest(out_dir)
    if col not in manifest.get("stats_cols", []):
        raise KeyError(
            f"layout at {out_dir} has no stats for column {col!r} "
            f"(written with stats_cols={manifest.get('stats_cols')})")
    files = manifest.get("files", [])
    keep = [f for f in files
            if not (f[f"min_{col}"] > hi or f[f"max_{col}"] < lo)]
    return {"files": keep, "n_total": len(files),
            "n_read": len(keep),
            "rows_total": manifest.get("total_rows", 0),
            "rows_read": int(sum(f["rows"] for f in keep))}


def read_pruned_by(out_dir: str, col: str, lo: int, hi: int, *,
                   columns: Sequence[str] | None = None,
                   exact: bool = True):
    """Dataset over files surviving the zone-map prune on ``col``;
    ``exact`` applies the [lo, hi] mask per row."""
    import ray.data as rd

    stats = prune_files_by(out_dir, col, lo, hi)
    cols = list(set(list(columns) + [col])) if columns else None
    if not stats["files"]:
        man = _load_manifest(out_dir)
        empty = rd.read_parquet(
            os.path.join(out_dir, man["files"][0]["path"]),
            columns=cols).filter(lambda r: False)
        return empty, stats
    paths = [os.path.join(out_dir, f["path"]) for f in stats["files"]]
    ds = rd.read_parquet(paths, columns=cols)
    if exact:
        def _mask(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy().astype(np.int64)
            return batch.filter(pa.array((v >= lo) & (v <= hi)))

        ds = ds.map_batches(_mask, batch_format="pyarrow")
    return ds, stats


# ---------------------------------------------------------------------------
# key -> partition index: the sidecar that makes keys MOVABLE
# (delete+insert across files) — the piece upsert/delete's
# position-immutable contract explicitly deferred
# ---------------------------------------------------------------------------

KEY_INDEX_DIR = "_key_index"
KEY_INDEX_MANIFEST = "_key_index.json"


def _key_buckets(keys: np.ndarray, nb: int) -> np.ndarray:
    from ..stages.sample import _splitmix
    return (_splitmix(keys.astype(np.uint64)) % np.uint64(nb)) \
        .astype(np.int32)


def _index_paths(out_dir: str):
    idx_dir = os.path.join(out_dir, KEY_INDEX_DIR)
    mpath = os.path.join(idx_dir, KEY_INDEX_MANIFEST)
    return idx_dir, mpath


def build_key_index(out_dir: str, *, key_col: str,
                    n_buckets: int | None = None) -> dict:
    """Build (or rebuild) the sidecar key -> pid index: a distributed
    scan of the layout files (one task batch per file, key column
    only) hash-bucketed into ``n_buckets`` sorted parquet files under
    ``_key_index/``.  The index is derived state — rebuildable at any
    time from the layout itself — sized so a key lookup opens exactly
    ONE bucket file regardless of layout size."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    manifest = _load_manifest(out_dir)
    files = manifest.get("files", [])
    if not files:
        raise FileNotFoundError(f"no layout at {out_dir}")
    nb = int(n_buckets) if n_buckets else \
        int(np.clip(len(files), 8, 1024))
    idx_dir, mpath = _index_paths(out_dir)
    os.makedirs(idx_dir, exist_ok=True)

    src = rd.from_items([
        {"pid": f["pid"], "path": os.path.join(out_dir, f["path"])}
        for f in files])

    def _scan(batch: pa.Table) -> pa.Table:
        ks, ps = [], []
        for pid, path in zip(batch.column("pid").to_pylist(),
                             batch.column("path").to_pylist()):
            t = pq.read_table(path, columns=[key_col])
            k = t.column(key_col).to_numpy().astype(np.int64)
            ks.append(k)
            ps.append(np.full(len(k), pid, np.int32))
        k = np.concatenate(ks) if ks else np.empty(0, np.int64)
        p = np.concatenate(ps) if ps else np.empty(0, np.int32)
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "pid": pa.array(p, pa.int32()),
            "__b": pa.array(_key_buckets(k, nb), pa.int32())})

    def _write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        g = g.drop(columns=["__b"]).sort_values("key",
                                                kind="mergesort")
        path = os.path.join(idx_dir, f"bucket-{b:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False),
                       tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"bucket": [b], "rows": [len(g)]})

    written = (src.map_batches(_scan, batch_format="pyarrow")
               .groupby("__b")
               .map_groups(_write_bucket, batch_format="pandas")
               .to_pandas())
    # A rebuild only rewrites buckets that still hold keys; any
    # bucket file left over from a previous build (emptied by
    # delete_spatial, or from a different n_buckets) would otherwise
    # survive and serve stale pids.  Remove everything this build did
    # not write before publishing the manifest.
    live = {f"bucket-{int(b):05d}.parquet" for b in written["bucket"]}
    for fn in os.listdir(idx_dir):
        if fn.startswith("bucket-") and fn.endswith(".parquet") \
                and fn not in live:
            os.remove(os.path.join(idx_dir, fn))
    idx_man = {"n_buckets": nb, "key_col": key_col,
               "rows": int(written["rows"].sum())}
    with open(mpath, "w") as fh:
        json.dump(idx_man, fh, indent=1)
    return idx_man


def index_lookup(out_dir: str, keys: Sequence[int]) -> dict:
    """Driver-side lookup for a BOUNDED key list: opens only the
    bucket files the keys hash to.  Returns {key: pid} (absent keys
    omitted)."""
    import pyarrow.parquet as pq

    idx_dir, mpath = _index_paths(out_dir)
    with open(mpath) as fh:
        idx_man = json.load(fh)
    nb = idx_man["n_buckets"]
    k = np.asarray(list(keys), np.int64)
    out = {}
    for b in np.unique(_key_buckets(k, nb)):
        path = os.path.join(idx_dir, f"bucket-{int(b):05d}.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path).to_pandas()
        ik = t["key"].to_numpy(np.int64)
        if len(ik) == 0:
            continue
        ip = t["pid"].to_numpy()
        want = k[_key_buckets(k, nb) == b]
        pos = np.searchsorted(ik, want)
        ok = (pos < len(ik)) & (ik[np.minimum(pos, len(ik) - 1)]
                                == want)
        for kk, pp in zip(want[ok], ip[pos[ok]]):
            out[int(kk)] = int(pp)
    return out


def _refresh_key_index_if_present(out_dir: str) -> None:
    """Mutations that change the key -> pid mapping outside
    move_spatial (upsert inserts keys, delete removes them, compact
    renumbers pids) refresh the sidecar index by REBUILD: it is
    derived state, and the rebuild is a distributed key-column scan
    — the same order of work as the mutation's own rewrite.  No-op
    when no index has been built."""
    idx_dir, mpath = _index_paths(out_dir)
    if not os.path.exists(mpath):
        return
    with open(mpath) as fh:
        m = json.load(fh)
    build_key_index(out_dir, key_col=m["key_col"],
                    n_buckets=m["n_buckets"])


def move_spatial(out_dir: str, moves_ds, *, key_col: str,
                 xyz_cols=("x", "y", "z")) -> dict:
    """Relocate keys whose position CHANGED — the movable-key
    completion of upsert_spatial's position-immutable contract
    (requires :func:`build_key_index` once; the index is maintained
    incrementally here).  Each move row carries the key, its NEW xyz
    and the full payload (same schema as the layout rows minus
    ``__cell``).  Keys absent from the index insert (upsert
    semantics).

    Scale shape — three bounded exchanges, nothing driver-sized:
      1. moves hash-co-partition with their index bucket (each body
         reads ONE bucket file) to resolve old pids — READ-ONLY, so
         a Ray retry of a resolve task re-reads the same index state
         and reproduces the same answer;
      2. work rows explode to (old pid: drop) + (new pid: insert)
         and co-partition by pid — each touched partition file
         rewrites exactly once (tmp + rename, same atomicity as
         upsert/delete);
      3. AFTER the data rewrite: touched index buckets upsert
         key -> new pid (an idempotent pure overwrite — a retried
         task rewrites the identical bucket), then the manifest
         refreshes from the per-partition results.
    The index is derived state: a crash between stages is repaired
    by re-running build_key_index."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    manifest = _load_manifest(out_dir)
    files = sorted(manifest.get("files", []),
                   key=lambda f: f["cell_lo"])
    if not files:
        raise FileNotFoundError(f"no layout at {out_dir}")
    idx_dir, mpath = _index_paths(out_dir)
    with open(mpath) as fh:
        nb = json.load(fh)["n_buckets"]
    cell_lo = np.array([f["cell_lo"] for f in files], np.int64)
    pid_of = np.array([f["pid"] for f in files], np.int64)
    route_ref = ray.put((cell_lo, pid_of))

    def _route(batch: pa.Table) -> pa.Table:
        lo, pids = ray.get(route_ref)
        leaf = _leaf_ids(batch, xyz_cols)
        c = leaf.view(np.int64)
        pos = np.maximum(np.searchsorted(lo, c, side="right") - 1, 0)
        k = batch.column(key_col).to_numpy().astype(np.int64)
        out = batch.append_column("__cell",
                                  pa.array(c, pa.int64()))
        out = out.append_column(
            "__newpid", pa.array(pids[pos].astype(np.int32),
                                 pa.int32()))
        return out.append_column(
            "__b", pa.array(_key_buckets(k, nb), pa.int32()))

    def _resolve(g: pd.DataFrame) -> pd.DataFrame:
        # one index bucket: map keys -> old pid.  READ-ONLY — the
        # bucket rewrite happens after the data rewrite (below), so a
        # Ray re-execution of this body cannot observe its own
        # update and mis-resolve old pid == new pid.
        b = int(g["__b"].iloc[0])
        g = g.drop(columns=["__b"])
        path = os.path.join(idx_dir, f"bucket-{b:05d}.parquet")
        if os.path.exists(path):
            idx = pq.read_table(path).to_pandas()
        else:
            idx = pd.DataFrame({"key": np.empty(0, np.int64),
                                "pid": np.empty(0, np.int32)})
        ik = idx["key"].to_numpy(np.int64)
        k = g[key_col].to_numpy(np.int64)
        if len(ik) == 0:
            # fresh/empty bucket: every key is an insert
            return g.assign(__oldpid=np.full(len(g), -1, np.int64))
        pos = np.searchsorted(ik, k)
        ok = (pos < len(ik)) & (ik[np.minimum(pos, len(ik) - 1)] == k)
        old = np.where(ok, idx["pid"].to_numpy()[
            np.minimum(pos, len(ik) - 1)], -1).astype(np.int64)
        return g.assign(__oldpid=old)

    resolved = (moves_ds.map_batches(_route, batch_format="pyarrow")
                .groupby("__b")
                .map_groups(_resolve, batch_format="pandas"))

    def _explode(batch: pa.Table) -> pa.Table:
        # insert action at the new pid (full row); drop action at the
        # old pid (key only) when the key moves between files
        df = batch.to_pandas()
        ins = df.drop(columns=["__oldpid"]) \
            .rename(columns={"__newpid": "__pid"})
        ins["__drop"] = np.zeros(len(ins), np.int8)
        mv = df[(df["__oldpid"] >= 0)
                & (df["__oldpid"] != df["__newpid"])]
        drop = mv.drop(columns=["__newpid"]) \
            .rename(columns={"__oldpid": "__pid"})
        drop["__pid"] = drop["__pid"].astype(np.int32)
        drop["__drop"] = np.ones(len(drop), np.int8)
        out = pd.concat([ins, drop], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    by_file = {f["pid"]: f for f in files}

    def _apply_one(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        f = by_file[pid]
        path = os.path.join(out_dir, f["path"])
        base = pq.read_table(path).to_pandas()
        gone = set(g[key_col])          # drops AND replaced inserts
        keep = ~base[key_col].isin(gone)
        ins = g[g["__drop"] == 0].drop(columns=["__pid", "__drop"])
        merged = pd.concat([base[keep], ins[base.columns]],
                           ignore_index=True) \
            .sort_values("__cell", kind="mergesort")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(merged,
                                            preserve_index=False), tmp)
        os.replace(tmp, path)
        lo_v = int(merged["__cell"].iloc[0]) if len(merged) \
            else f["cell_lo"]
        hi_v = int(merged["__cell"].iloc[-1]) if len(merged) \
            else f["cell_lo"]
        return pd.DataFrame({
            "pid": [pid], "rows": [len(merged)],
            "cell_lo": [lo_v], "cell_hi": [hi_v]})

    touched = (resolved.map_batches(_explode, batch_format="pyarrow")
               .groupby("__pid")
               .map_groups(_apply_one, batch_format="pandas")
               .to_pandas())

    def _update_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # idempotent upsert key -> NEW pid into one index bucket:
        # a retried task rewrites the identical file (pure overwrite
        # of the moved keys' rows), so re-execution is safe.
        b = int(g["__b"].iloc[0])
        path = os.path.join(idx_dir, f"bucket-{b:05d}.parquet")
        if os.path.exists(path):
            idx = pq.read_table(path).to_pandas()
        else:
            idx = pd.DataFrame({"key": np.empty(0, np.int64),
                                "pid": np.empty(0, np.int32)})
        ik = idx["key"].to_numpy(np.int64)
        k = g[key_col].to_numpy(np.int64)
        keep = ~np.isin(ik, k)
        nidx = pd.DataFrame({
            "key": np.concatenate([ik[keep], k]),
            "pid": np.concatenate([
                idx["pid"].to_numpy()[keep].astype(np.int32),
                g["__newpid"].to_numpy(np.int32)])}) \
            .sort_values("key", kind="mergesort")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(nidx,
                                            preserve_index=False), tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"bucket": [b]})

    # index maintenance runs AFTER the data rewrite committed; the
    # narrow (key, bucket, new pid) projection re-derives from the
    # moves (deterministic read-only lineage recompute)
    (moves_ds.map_batches(_route, batch_format="pyarrow")
     .select_columns([key_col, "__b", "__newpid"])
     .groupby("__b")
     .map_groups(_update_bucket, batch_format="pandas")
     .materialize())
    tmap = {int(r.pid): r for r in touched.itertuples()}
    for f in manifest["files"]:
        t = tmap.get(f["pid"])
        if t is not None:
            f["rows"] = int(t.rows)
            f["cell_lo"] = int(t.cell_lo)
            f["cell_hi"] = int(t.cell_hi)
    manifest["total_rows"] = int(sum(f["rows"]
                                     for f in manifest["files"]))
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return {**manifest, "touched": sorted(tmap)}

"""Image+caption table I/O (the driver input_hint names a Lance table
of image + caption pairs; this container ships no `lance`, so parquet
is the tested substitute and Lance is taken when the library and a
`.lance` dataset are actually present).

All readers prune columns at the scan — a 2-column consumer must not
ship the `bytes` blobs off storage.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

#: columns the flagship join/tiling path actually consumes (`caption`
#: intentionally absent: it is join output decoration, re-attachable by
#: image_id when a sink wants it).
FLAGSHIP_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "phash"]


def _is_lance(path: str) -> bool:
    return path.rstrip("/").endswith(".lance") or \
        os.path.isdir(os.path.join(path, "_versions"))


def have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_images_table(path: str, *, columns: Optional[Sequence[str]] = None):
    """Read an image+caption table as a Ray Dataset.

    Lance datasets (``*.lance`` or a dir with ``_versions/``) go
    through ``ray.data.read_lance`` when the library is installed;
    everything else is parquet.  ``columns`` prunes at the scan in
    both paths."""
    import ray.data as rd

    if _is_lance(path):
        if not have_lance():
            raise ImportError(
                f"{path} looks like a Lance dataset but `lance` is not "
                "installed in this environment; re-export to parquet or "
                "install pylance")
        return rd.read_lance(path, columns=list(columns) if columns else None)
    return rd.read_parquet(path, columns=list(columns) if columns else None)


def write_images_table(ds, path: str, *, fmt: str = "parquet",
                       max_rows_per_file: Optional[int] = None) -> str:
    """Write a Ray Dataset image table; ``fmt`` in {parquet, lance}.
    ``max_rows_per_file`` bounds fragment size so downstream resume
    shards (file groups) have real granularity."""
    if fmt == "lance":
        if not have_lance():
            raise ImportError("`lance` not installed; use fmt='parquet'")
        ds.write_lance(path)
        return path
    ds.write_parquet(path, max_rows_per_file=max_rows_per_file)
    return path


#: canonical image-table schema (the driver input_hint's column list);
#: text-format ingest normalizes to these arrow types so every
#: downstream stage sees one schema regardless of source format.
IMAGE_SCHEMA_TYPES = {
    "image_id": "string", "bytes": "binary", "w": "int32",
    "h": "int32", "fmt": "string", "caption": "string",
    "phash": "int64",
}


def _normalize_schema(ds, columns: Optional[Sequence[str]] = None):
    """Cast text-parsed columns to the canonical image-table types
    (CSV/JSON readers infer int64/strings; `bytes` rides base64)."""
    import base64

    import numpy as np
    import pyarrow as pa

    want = list(columns) if columns else None

    def _cast(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in (want or batch.column_names):
            col = batch.column(name)
            t = IMAGE_SCHEMA_TYPES.get(name)
            if t == "binary" and pa.types.is_string(col.type):
                raw = [base64.b64decode(v) if v is not None else None
                       for v in col.to_pylist()]
                cols[name] = pa.array(raw, pa.binary())
            elif t == "int32":
                cols[name] = col.cast(pa.int32())
            elif t == "int64":
                cols[name] = col.cast(pa.int64())
            elif t == "string" and not pa.types.is_string(col.type):
                cols[name] = col.cast(pa.string())
            else:
                cols[name] = col
        return pa.table(cols)

    return ds.map_batches(_cast, batch_format="pyarrow")


def read_text_table(path: str, *, fmt: Optional[str] = None,
                    columns: Optional[Sequence[str]] = None):
    """CSV / JSONL ingest of the image+caption table (interchange
    formats for the same schema; binary `bytes` travels base64).
    Column pruning happens right after parse — text readers must
    materialize the line anyway, but nothing downstream sees dropped
    columns.  Returns the canonical arrow schema of
    read_images_table."""
    import ray.data as rd

    fmt = fmt or ("csv" if path.endswith(".csv")
                  else "json" if path.endswith((".json", ".jsonl"))
                  else None)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"cannot infer text format of {path}")
    if columns:
        ds = ds.select_columns(list(columns))
    return _normalize_schema(ds, columns)


def list_table_files(path: str) -> List[str]:
    """Parquet fragment files of a table directory (one resume shard
    can own a contiguous group of these)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))

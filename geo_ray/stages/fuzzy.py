"""Fuzzy (edit-distance) similarity self-join over a string column.

The string-side member of the near-dup family (exact hash / MinHash /
SimHash / embedding cosine / L-inf feature ball): report every
unordered pair of DISTINCT values within Levenshtein distance
``max_dist``.

Scale shape: values dedup first (bucketed vectorized dedup — the
pair space is over distinct values, not rows), then the 1-D
shifted-grid trick from stages/ball_join.py applied to string LENGTH:
lev(a, b) <= T implies |len(a) - len(b)| <= T, so with bucket width
T+1 a qualifying pair's home buckets differ by at most 1; each value
replicates to (bucket, bucket+1) and a pair is emitted only from the
canonical shared bucket where both copies carry offset bit 0 —
exactly once, no pair-dedup shuffle.  The exact DP verify runs inside
the bucket body; candidate generation can only cost extra work, never
correctness.
"""

from __future__ import annotations

import zlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _splitmix


def levenshtein(a: str, b: str) -> int:
    """Classic O(len(a)*len(b)) DP, vectorized over one row at a time
    (numpy minimum-scan per row; strings here are short keys, not
    documents)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la or lb
    bv = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    for i, ca in enumerate(a.encode("utf-8")):
        cur[0] = i + 1
        sub = prev[:-1] + (bv != ca)
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # running scan for the insertion chain
        for j in range(1, lb + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev, cur = cur, prev
    return int(prev[lb])


def edit_distance_pairs(ds, col: str, max_dist: int, *,
                        n_buckets: int = 64):
    """All unordered pairs of distinct values of ``col`` with
    levenshtein <= max_dist.  Returns (name_a, name_b, lev)."""
    width = max_dist + 1

    def _distinct(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vals = pc.unique(batch.column(col))
        h = np.array([zlib.crc32(str(v).encode("utf-8"))
                      for v in vals.to_pylist()], dtype=np.uint64)
        bkt = (_splitmix(h) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table({col: vals,
                         "__b": pa.array(bkt, pa.int32())})

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["__b"]).drop_duplicates([col])

    distinct = (ds.map_batches(_distinct, batch_format="pyarrow")
                .groupby("__b")
                .map_groups(_dedup, batch_format="pandas"))

    def _replicate(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        lens = np.array([len(v) for v in vals], np.int64)
        home = lens // width
        return pa.table({
            col: pa.array(vals + vals, pa.string()),
            "lbkt": pa.array(np.concatenate([home, home + 1])),
            "obit": pa.array(np.concatenate(
                [np.zeros(len(vals), np.int8),
                 np.ones(len(vals), np.int8)]), pa.int8()),
        })

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[col].to_numpy()
        ob = g["obit"].to_numpy()
        order = np.argsort(vals, kind="mergesort")
        vals, ob = vals[order], ob[order]
        out_a: List[str] = []
        out_b: List[str] = []
        out_d: List[int] = []
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                if vals[i] == vals[j]:
                    continue
                if (ob[i] & ob[j]) != 0:   # not the canonical bucket
                    continue
                if abs(len(vals[i]) - len(vals[j])) > max_dist:
                    continue
                d = levenshtein(vals[i], vals[j])
                if d <= max_dist:
                    out_a.append(vals[i])
                    out_b.append(vals[j])
                    out_d.append(d)
        return pd.DataFrame({
            "name_a": pd.Series(out_a, dtype="object"),
            "name_b": pd.Series(out_b, dtype="object"),
            "lev": pd.Series(out_d, dtype="int64")})

    return (distinct.map_batches(_replicate, batch_format="pyarrow")
            .groupby("lbkt")
            .map_groups(lambda g: _pairs(g.drop(columns=["lbkt"])),
                        batch_format="pandas"))

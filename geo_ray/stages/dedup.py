"""Deduplication stages: exact (hash-partition + per-group first),
MinHash+LSH near-dup candidate generation, n-gram Jaccard
verification.

Scale shape: exact dedup shuffles only (key, id) pairs; MinHash-LSH
shuffles (band_id, band_hash, doc_id) triples — both independent of
document size.  Jaccard verification joins candidate pairs back to
shingle sets (here: recomputed per pair, fine for the verified tail;
a production variant would broadcast a shingle-sketch table).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import tokens_of

NUM_HASHES = 64
BAND_SIZE = 4  # 16 bands of 4 -> catches jaccard ~>= 0.5
_M = np.uint64(0xFFFFFFFFFFFFFFFF)
GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix(z: np.ndarray) -> np.ndarray:
    z = (z + GOLDEN)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def shingles_of(text: str, k: int = 3) -> List[str]:
    toks = tokens_of(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def _shingle_hashes(text: str) -> np.ndarray:
    return np.array([zlib.crc32(s.encode("utf-8")) for s in shingles_of(text)],
                    dtype=np.uint64)


def minhash_signature(text: str) -> np.ndarray:
    """NUM_HASHES minhash values via seeded splitmix64 of crc32
    shingle hashes (deterministic across runs)."""
    base = _shingle_hashes(text)
    if len(base) == 0:
        return np.zeros(NUM_HASHES, dtype=np.uint64)
    seeds = _splitmix(np.arange(NUM_HASHES, dtype=np.uint64))
    # (num_hashes, num_shingles) – min over shingles
    mixed = _splitmix(base[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def minhash_bands(batch: pa.Table) -> pa.Table:
    """documents -> (band_id, band_hash, doc_id) rows for the LSH
    groupby (the only thing that shuffles)."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy()
    n_bands = NUM_HASHES // BAND_SIZE
    out_band, out_hash, out_doc = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(t)
        for b in range(n_bands):
            chunk = sig[b * BAND_SIZE:(b + 1) * BAND_SIZE]
            h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
            out_band.append(b)
            out_hash.append(int.from_bytes(h, "big") >> 1)  # fits int64
            out_doc.append(int(ids[i]))
    return pa.table({
        "band_id": pa.array(out_band, pa.int32()),
        "band_hash": pa.array(out_hash, pa.int64()),
        "doc_id": pa.array(out_doc, pa.int64()),
    })


def candidate_pairs_group(group: pd.DataFrame) -> pd.DataFrame:
    """Bucket -> unordered candidate pairs (a < b)."""
    docs = sorted(set(int(d) for d in group["doc_id"]))
    rows = [(a, b) for i, a in enumerate(docs) for b in docs[i + 1:]]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b"]) if rows else \
        pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                      "doc_b": pd.Series([], dtype="int64")})


def jaccard(text_a: str, text_b: str) -> float:
    sa, sb = set(shingles_of(text_a)), set(shingles_of(text_b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(docs_ds, threshold: float = 0.6):
    """Full near-dup pipeline: bands -> bucket groupby -> unique pairs
    -> Jaccard verify against the broadcast text table.  Returns a
    Dataset of (doc_a, doc_b, jaccard >= threshold)."""
    import ray

    bands = docs_ds.map_batches(minhash_bands, batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        candidate_pairs_group, batch_format="pandas")
    # Dedup pairs produced by multiple bands, then verify.
    texts = {int(r["doc_id"]): r["text"]
             for r in docs_ds.select_columns(["doc_id", "text"]).iter_rows()}
    texts_ref = ray.put(texts)

    def _verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        jac = np.array([jaccard(lookup[int(x)], lookup[int(y)])
                        for x, y in zip(a, b)])
        keep = jac >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64()),
            "jaccard": pa.array(jac[keep], pa.float64()),
        })

    uniq = pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
    return uniq.map_batches(_verify, batch_format="pyarrow")


def exact_dedup(ds, key_cols: List[str], id_col: str):
    """Hash-partition on the key columns, keep the smallest id per
    group (deterministic representative)."""
    def _first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col, kind="mergesort").head(1)

    return ds.groupby(key_cols).map_groups(_first, batch_format="pandas")

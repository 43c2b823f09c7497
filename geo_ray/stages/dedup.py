"""Deduplication stages: exact (hash-partition + per-group first),
MinHash+LSH near-dup candidate generation, n-gram Jaccard
verification.

Scale shape: exact dedup shuffles only (key, id) pairs; MinHash-LSH
shuffles (band_id, band_hash, doc_id) triples — both independent of
document size.  Jaccard/containment verification co-partitions
candidate pairs with the sketch table (two tagged-union shuffles;
only candidate members' sketches move).  Candidate generation has
two complete plans — the shingle equi-join (sum(df^2) pair volume)
and the PPJoin prefix filter for stop-shingle-skewed corpora — with
a measured df-probe chooser (choose_ngram_plan).
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


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Rolling k-word shingle hashes: combine the word hashes of each
    window with distinct odd multipliers, then splitmix.  Equivalent
    discrimination to hashing the joined strings, fully vectorized."""
    from .text import word_hashes64
    toks = tokens_of(text)
    wh = word_hashes64(toks)
    if len(toks) < k:
        if not toks:
            return np.array([], dtype=np.uint64)
        acc = np.zeros(1, dtype=np.uint64)
        for i, m in enumerate((np.uint64(0x9E3779B97F4A7C15),
                               np.uint64(0xC2B2AE3D27D4EB4F),
                               np.uint64(0x165667B19E3779F9))):
            if i < len(wh):
                acc ^= wh[i] * m
        return _splitmix(acc)
    m = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
         np.uint64(0x165667B19E3779F9))
    acc = wh[:-2] * m[0] ^ wh[1:-1] * m[1] ^ wh[2:] * m[2]
    return _splitmix(acc)


def minhash_signature(text: str) -> np.ndarray:
    """NUM_HASHES minhash values via seeded splitmix64 of rolling
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


_BAND_SEEDS = _splitmix(np.arange(NUM_HASHES, dtype=np.uint64)
                        + np.uint64(7777)) | np.uint64(1)


def bands_from_sketches(batch: pa.Table, lsh_buckets: int = 512) -> pa.Table:
    """Sketch table rows -> (band_id, band_hash, doc_id, bucket) band
    rows, no text pass: the minhash signature is the min over
    splitmix(shingle ^ seed), identical over the unique sketch set and
    the raw shingle stream; the band hash is a vectorized odd-multiplier
    mix of each band's signature chunk (any mix works — candidates are
    exact-Jaccard-verified downstream)."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    arr = batch.column("sketch").combine_chunks()
    offsets = np.asarray(arr.offsets)
    values = np.asarray(arr.values).view(np.uint64) if len(arr.values) \
        else np.array([], dtype=np.uint64)
    seeds = _splitmix(np.arange(NUM_HASHES, dtype=np.uint64))
    n_bands = NUM_HASHES // BAND_SIZE
    sig = np.zeros((len(ids), NUM_HASHES), dtype=np.uint64)
    if len(values):
        # segmented min over the flattened sketch values — one
        # reduceat per seed (fixed NUM_HASHES passes, no per-doc
        # Python loop).  The mixed array is padded with a MAX
        # sentinel so trailing-empty segments have a valid index and
        # the final segment's open end never includes garbage;
        # empty-sketch rows are zeroed afterwards (reduceat yields
        # arr[start] for an empty segment).
        lens = np.diff(offsets)
        starts = offsets[:-1].astype(np.int64)
        mixed = np.empty(len(values) + 1, np.uint64)
        mixed[-1] = np.uint64(0xFFFFFFFFFFFFFFFF)
        for h in range(NUM_HASHES):
            mixed[:-1] = _splitmix(values ^ seeds[h])
            sig[:, h] = np.minimum.reduceat(mixed, starts)
        sig[lens == 0] = 0
    chunks = sig.reshape(len(ids), n_bands, BAND_SIZE)
    mixed = np.zeros((len(ids), n_bands), dtype=np.uint64)
    for j in range(BAND_SIZE):
        # distinct odd multiplier per (band, in-band position)
        mixed ^= chunks[:, :, j] * _BAND_SEEDS[j::BAND_SIZE][:n_bands]
    mixed = _splitmix(mixed ^ np.arange(n_bands, dtype=np.uint64)[None, :])
    band_hash = (mixed >> np.uint64(1)).astype(np.int64)
    band_id = np.broadcast_to(np.arange(n_bands, dtype=np.int32),
                              (len(ids), n_bands))
    return pa.table({
        "band_id": pa.array(band_id.ravel(), pa.int32()),
        "band_hash": pa.array(band_hash.ravel(), pa.int64()),
        "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
        "bucket": pa.array((band_hash.ravel() % lsh_buckets)
                           .astype(np.int32), pa.int32()),
    })


def candidate_pairs_group(group):
    """One hash-BUCKET of band rows -> unordered candidate pairs (a<b).

    The group key is a coarse bucket of (band_id, band_hash) (see
    ``minhash_dedup``): per-call overhead of map_groups amortizes over
    many LSH buckets, and the inner exact grouping is one lexsort +
    segmented pair generation.  Only rows sharing the exact
    (band_id, band_hash) pair up (singleton segments yield no pairs).
    Accepts a pa.Table (Arrow-native map_groups body — no pandas
    round-trip) or a DataFrame, emitting the matching container."""
    is_arrow = isinstance(group, pa.Table)
    if is_arrow:
        band = group.column("band_id").to_numpy().astype(np.int64)
        bh = group.column("band_hash").to_numpy().astype(np.int64)
        ids = group.column("doc_id").to_numpy().astype(np.int64)
    else:
        band = group["band_id"].to_numpy().astype(np.int64)
        bh = group["band_hash"].to_numpy().astype(np.int64)
        ids = group["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    # per-segment doc dedup (one row per (doc, band), so duplicates
    # within a segment cannot occur; keep = all)
    new_seg = np.ones(len(band), bool)
    if len(band) > 1:
        new_seg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    seg_sizes = np.diff(np.append(np.flatnonzero(new_seg), len(band)))
    ii, jj = segment_all_pairs(seg_sizes)
    if is_arrow:
        return pa.table({"doc_a": pa.array(ids[ii], pa.int64()),
                         "doc_b": pa.array(ids[jj], pa.int64())})
    return pd.DataFrame({"doc_a": pd.Series(ids[ii], dtype="int64"),
                         "doc_b": pd.Series(ids[jj], dtype="int64")})


def jaccard(text_a: str, text_b: str) -> float:
    sa, sb = set(shingles_of(text_a)), set(shingles_of(text_b))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def doc_sketches(batch: pa.Table, n_buckets: int) -> pa.Table:
    """(bucket, kind=0, doc_id, other=-1, sketch) rows: the unique
    shingle-hash set per document, hash-partitioned on doc_id.  The
    join-side table of the verification shuffle."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    sk = [np.unique(_shingle_hashes(t)) for t in texts]
    lens = np.fromiter((len(s) for s in sk), dtype=np.int64, count=len(sk))
    offsets = np.zeros(len(sk) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    values = np.concatenate(sk) if sk else np.array([], dtype=np.uint64)
    sketch_arr = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.uint64()))
    return pa.table({
        "bucket": pa.array((ids % n_buckets).astype(np.int32), pa.int32()),
        "kind": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
        "doc_id": pa.array(ids, pa.int64()),
        "other": pa.array(np.full(len(ids), -1, np.int64), pa.int64()),
        "sketch": sketch_arr,
    })


def _hash_containment(sa: np.ndarray, sb: np.ndarray) -> float:
    """Broder containment |A ∩ B| / min(|A|, |B|) of the two unique
    shingle-hash sets — same IEEE division as the equi-join plan's
    ni / min(la, lb)."""
    sa = np.asarray(sa, dtype=np.uint64)
    sb = np.asarray(sb, dtype=np.uint64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    if len(sa) == 0 or len(sb) == 0:
        return 0.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / min(len(sa), len(sb))


def _hash_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of the two unique shingle-hash sets (identical to
    string-set Jaccard up to negligible 64-bit collisions)."""
    sa = np.asarray(sa, dtype=np.uint64)
    sb = np.asarray(sb, dtype=np.uint64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup(docs_ds, threshold: float = 0.6, n_buckets=None,
                  ckpt_root=None, ckpt_threshold_rows: int = 2_000_000):
    """Full near-dup pipeline, driver-materialization-free:

        docs --map--> (doc_id, shingle-hash sketch)    [ONE text pass]
        sketches --map--> (band_id, band_hash, doc_id) [no text]
             --groupby(bucket)--> candidate pairs (a < b)
        pairs + sketches co-partitioned on doc_a % B:  [shuffle join]
             dedup pairs, attach sketch_a
        ...  + sketches co-partitioned on doc_b % B:   [shuffle join]
             attach sketch_b, exact Jaccard, filter >= threshold

    Every stage shuffles only ids, band hashes, or the sketches of
    candidate-pair members — never the corpus text, and nothing ever
    lands on the driver.  The sketch table is computed once for its
    three consumers: pinned in the object store (spillable) below
    ``ckpt_threshold_rows``, or — when ``ckpt_root`` is given and the
    corpus is at least that large — written ONCE as a resumable
    parquet checkpoint (pipelines/checkpoint.py ``stage_checkpoint``,
    atomic manifest + signature) and re-read by the consumers, so at
    petabyte scale the input text is still scanned exactly once and a
    killed run resumes past the sketch pass.  Returns a Dataset
    (doc_a, doc_b, jaccard).
    """
    def _sketches(batch: pa.Table) -> pa.Table:
        return doc_sketches(batch, 1)  # real buckets assigned below

    def _build_sketches():
        return docs_ds.map_batches(_sketches, batch_format="pyarrow")

    if ckpt_root is not None and \
            (n_docs := docs_ds.count()) >= ckpt_threshold_rows:
        from ..pipelines.checkpoint import stage_checkpoint
        sig = f"minhash_sketches;rows={n_docs};threshold={threshold}"
        sketches, _info = stage_checkpoint(
            ckpt_root, "minhash_sketches", sig, _build_sketches)
    else:
        sketches = _build_sketches().materialize()
    # Right-size BOTH shuffle knobs to the measured corpus (never a
    # fixed constant): block count (~64k sketch rows per block — Ray
    # splits small inputs into dozens of near-empty blocks and every
    # sort barrier pays per-block scheduling) and co-partition bucket
    # count (~4k sketches per bucket — a fixed 256 caps the join
    # parallelism and balloons per-group state at 10^9 docs).
    cnt = sketches.count()
    if n_buckets is None:
        n_buckets = max(16, min(1 << 16, cnt // 4096))
    n_blocks = max(4, int(np.ceil(cnt / 65536)))
    from ray.data.dataset import MaterializedDataset
    if isinstance(sketches, MaterializedDataset) and \
            n_blocks < sketches.num_blocks():
        # checkpointed sketches are a lazy parquet read whose blocks
        # are already file-sized; only the object-store path needs the
        # tiny-block consolidation
        sketches = sketches.repartition(n_blocks).materialize()

    def _rebucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.set_column(
            batch.schema.get_field_index("bucket"), "bucket",
            pa.array((ids % n_buckets).astype(np.int32), pa.int32()))

    sketches = sketches.map_batches(_rebucket, batch_format="pyarrow")

    pairs = (sketches.map_batches(
                 lambda b: bands_from_sketches(b), batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(candidate_pairs_group, batch_format="pyarrow"))

    return verify_jaccard_pairs(sketches, pairs, threshold, n_buckets)


def verify_jaccard_pairs(sketches, pairs, threshold: float,
                         n_buckets: int, metric: str = "jaccard"):
    """Exact hash-set similarity verification of candidate
    (doc_a, doc_b) pairs against the co-partitioned sketch table: two
    tagged-union shuffles (attach sketch_a by doc_a bucket, then
    verify by doc_b bucket), duplicate candidates dropped at attach
    time.  Only the sketches of candidate-pair members move.
    ``metric``: "jaccard" or "containment" (|A ∩ B| / min sizes).
    Returns (doc_a, doc_b, <metric>) rows with score >= threshold."""
    score_of = _hash_jaccard if metric == "jaccard" else _hash_containment

    def _pair_rows_a(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.int64)
        b = batch.column("doc_b").to_numpy().astype(np.int64)
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(len(a) + 1, np.int32), pa.int32()),
            pa.array([], pa.uint64()))
        return pa.table({
            "bucket": pa.array((a % n_buckets).astype(np.int32), pa.int32()),
            "kind": pa.array(np.ones(len(a), np.int8), pa.int8()),
            "doc_id": pa.array(a, pa.int64()),
            "other": pa.array(b, pa.int64()),
            "sketch": empty,
        })

    def _attach_a(group: pd.DataFrame) -> pa.Table:
        """Join sketch_a onto pairs keyed by doc_a; dedup (a, b) here —
        all copies of a pair share doc_a, hence this partition.
        Emits explicit Arrow so empty groups keep the list<uint64>
        schema."""
        sk = group[group["kind"] == 0]
        lookup = dict(zip(sk["doc_id"].to_numpy(), sk["sketch"]))
        pr = (group[group["kind"] == 1]
              .drop_duplicates(["doc_id", "other"]))
        b = pr["other"].to_numpy().astype(np.int64)
        sketches = [np.asarray(lookup[int(a)], dtype=np.uint64)
                    for a in pr["doc_id"]]
        lens = np.fromiter((len(s) for s in sketches), dtype=np.int64,
                           count=len(sketches))
        offsets = np.zeros(len(sketches) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        values = (np.concatenate(sketches) if sketches
                  else np.array([], dtype=np.uint64))
        sketch_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(values, pa.uint64()))
        return pa.table({
            "bucket": pa.array((b % n_buckets).astype(np.int32), pa.int32()),
            "kind": pa.array(np.ones(len(b), np.int8), pa.int8()),
            "doc_id": pa.array(b, pa.int64()),
            "other": pa.array(pr["doc_id"].to_numpy().astype(np.int64),
                              pa.int64()),
            "sketch": sketch_arr,
        })

    def _verify_b(group: pd.DataFrame) -> pd.DataFrame:
        sk = group[group["kind"] == 0]
        lookup = dict(zip(sk["doc_id"].to_numpy(), sk["sketch"]))
        pr = group[group["kind"] == 1]
        out_a, out_b, out_j = [], [], []
        for doc_b, doc_a, sa in zip(pr["doc_id"].to_numpy(),
                                    pr["other"].to_numpy(), pr["sketch"]):
            jac = score_of(sa, lookup[int(doc_b)])
            if jac >= threshold:
                out_a.append(int(doc_a))
                out_b.append(int(doc_b))
                out_j.append(jac)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64"),
                             metric: pd.Series(out_j, dtype="float64")})

    pair_rows = pairs.map_batches(_pair_rows_a, batch_format="pyarrow")
    with_a = (sketches.union(pair_rows)
              .groupby("bucket")
              .map_groups(_attach_a, batch_format="pandas"))
    return (sketches.union(with_a)
            .groupby("bucket")
            .map_groups(_verify_b, batch_format="pandas"))



def segment_all_pairs(seg_sizes: np.ndarray):
    """Vectorized all-unordered-pairs WITHIN consecutive segments: for
    segments of sizes (m1, m2, ...) laid out contiguously, return
    global index arrays (ii, jj) with ii < jj covering every
    within-segment pair — sum(m*(m-1)/2) pairs, zero Python loops.
    The standard repeat/cumsum construction: row r of its segment
    pairs with the (size - 1 - rank) rows after it."""
    seg_sizes = np.asarray(seg_sizes, dtype=np.int64)
    n = int(seg_sizes.sum())
    seg_start = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
    rank = np.arange(n) - np.repeat(seg_start, seg_sizes)
    reps = np.repeat(seg_sizes, seg_sizes) - 1 - rank
    ii = np.repeat(np.arange(n), reps)
    starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
    offs = np.arange(int(reps.sum())) - np.repeat(starts, reps) + 1
    return ii, ii + offs


def hamming_ball_pairs(hashed_ds, *, id_col: str = "doc_id",
                       hash_col: str = "simhash", max_hamming: int = 3,
                       lsh_buckets: int = 64):
    """EXACT Hamming-ball near-dup pairs over any 64-bit hash column
    (SimHash, pHash, fingerprints) via pigeonhole banding: the 64 bits
    split into ``max_hamming + 1`` equal chunks, and any pair
    differing in at most ``max_hamming`` bits must agree on at least
    one whole chunk — so grouping by (chunk_id, chunk_value) generates
    a candidate SUPERSET exactly (deterministic pigeonhole, not
    probabilistic LSH recall), and the per-candidate popcount filter
    is precise.  Each band row carries the 8-byte hash itself, so
    verification needs no join back; a pair colliding in several bands
    is emitted only from its FIRST colliding band (checkable locally
    from the two hashes), so the global pair set needs no distinct
    shuffle.  Shuffle volume: (max_hamming + 1) narrow int rows per
    row.  Returns (doc_a, doc_b, hamming)."""
    assert 64 % (max_hamming + 1) == 0
    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        h = batch.column(hash_col).to_numpy().astype(np.int64) \
            .view(np.uint64)
        band_id = np.broadcast_to(np.arange(n_bands, dtype=np.int32),
                                  (len(ids), n_bands))
        shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))
        band_val = ((h[:, None] >> shifts[None, :]) & mask) \
            .astype(np.int64)
        bucket = ((band_val.astype(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))
                  ^ band_id.astype(np.uint64)) % np.uint64(lsh_buckets)
        return pa.table({
            "bucket": pa.array(bucket.ravel().astype(np.int32),
                               pa.int32()),
            "band_id": pa.array(band_id.ravel(), pa.int32()),
            "band_val": pa.array(band_val.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "simhash": pa.array(np.repeat(h.view(np.int64), n_bands),
                                pa.int64()),
        })

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized singleton drop FIRST: iterating a pandas groupby
        # materializes a sub-frame per group, and nearly every
        # (band, value) group is a singleton — then fully vectorized
        # within-segment pair generation (most colliding groups have
        # exactly 2 rows, so a Python loop per group is the cost)
        g = group[group.duplicated(["band_id", "band_val"], keep=False)]
        empty = pd.DataFrame({
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64")})
        if not len(g):
            return empty
        band = g["band_id"].to_numpy().astype(np.int64)
        val = g["band_val"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        hs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        order = np.lexsort((ids, val, band))
        band, val, ids, hs = band[order], val[order], ids[order], hs[order]
        new_seg = np.ones(len(band), bool)
        new_seg[1:] = (band[1:] != band[:-1]) | (val[1:] != val[:-1])
        seg_sizes = np.diff(np.append(np.flatnonzero(new_seg), len(band)))
        ii, jj = segment_all_pairs(seg_sizes)
        if not len(ii):
            return empty
        x = hs[ii] ^ hs[jj]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        ok = ham <= max_hamming
        # first-band dedup: emit a pair only from its FIRST agreeing
        # chunk (rows within a segment share `band`, so the pair's
        # band is band[ii])
        pband = band[ii]
        for e in range(64 // width - 1):
            sh = np.uint64(e * width)
            ok &= ~((pband > e) & (((x >> sh) & mask) == 0))
        return pd.DataFrame({
            "doc_a": pd.Series(ids[ii][ok], dtype="int64"),
            "doc_b": pd.Series(ids[jj][ok], dtype="int64"),
            "hamming": pd.Series(ham[ok], dtype="int64"),
        })

    return (hashed_ds.map_batches(_bands, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _pairs(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def simhash_neardup(docs_ds, max_hamming: int = 3,
                    lsh_buckets: int = 64):
    """Exact SimHash Hamming-ball near-dup over a (doc_id, text)
    table: one text pass computes the 64-bit SimHash, then
    :func:`hamming_ball_pairs` does the banded exact pair search."""
    from .text import simhash as simhash_stage

    sims = docs_ds.map_batches(simhash_stage, batch_format="pyarrow")
    return hamming_ball_pairs(sims, max_hamming=max_hamming,
                              lsh_buckets=lsh_buckets)


def exact_dedup(ds, key_cols: List[str], id_col: str,
                n_buckets: int = 256):
    """Keep the smallest id per key tuple (deterministic
    representative).  Per-batch min combiner shrinks to distinct keys
    BEFORE the shuffle; the merge runs inside ~n_buckets key-hash
    groups with a vectorized pandas min body — one Ray group per KEY
    would pay a Python dispatch per distinct document."""
    import zlib

    from .sample import _splitmix as _mix64

    def _key_hash(g: pd.DataFrame) -> np.ndarray:
        h = np.zeros(len(g), np.uint64)
        for c in key_cols:
            col = g[c]
            if np.issubdtype(col.dtype, np.integer):
                h ^= _mix64(col.to_numpy().astype(np.uint64))
            else:
                h ^= _mix64(np.array(
                    [zlib.crc32(str(v).encode("utf-8")) for v in col],
                    dtype=np.uint64))
        return h

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [id_col]).to_pandas()
        g = df.groupby(key_cols, sort=False)[id_col].min().reset_index()
        g["__b"] = (_key_hash(g) % np.uint64(n_buckets)) \
            .astype(np.int32)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_cols, sort=False)[id_col].min() \
            .reset_index()

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(lambda g: _merge(g.drop(columns=["__b"])),
                        batch_format="pandas"))


def ngram_jaccard_join(docs_ds, threshold: float = 0.5,
                       n_buckets=None, metric: str = "jaccard"):
    """EXACT n-gram (3-word rolling shingle) Jaccard similarity
    self-join — complete, no probabilistic recall, no per-pair Python
    work: intersection counts come from a narrow shingle EQUI-JOIN
    (docs sharing a shingle pair up inside that shingle's hash bucket;
    within-bucket partial counts pre-aggregate before one (a, b)
    co-partitioned merge), then the exact set-size Jaccard filter.
    Pairs sharing no shingle have J = 0 < t and never materialize.

    Shuffle volume: one (shingle, doc_id, set_len) int row per shingle
    instance, then sum(df_s choose 2) packed-pair partials.  The df^2
    term is the scale knob: it is bounded by the corpus's shingle
    document frequencies (max df 25 / 1.3M pairs over 260k instances
    at sf0.1); a stop-shingle-skewed corpus switches candidate
    generation to the IMPLEMENTED prefix filter
    (:func:`ngram_prefix_join`, Bayardo et al. WWW'07) — pick
    automatically with :func:`choose_ngram_plan`'s measured df
    probe.  doc_ids must fit int32 for the packed pair key
    (document at 10^9+ docs: widen to a two-column key).

    ``metric``: "jaccard" (|A ∩ B| / |A ∪ B|) or "containment"
    (|A ∩ B| / min(|A|, |B|)) — containment is the ASYMMETRIC
    near-dup test that catches extracts/quotes Jaccard misses when
    one document is much longer; same candidate completeness
    argument (a pair with containment >= t > 0 shares a shingle).

    Returns (doc_a, doc_b, <metric>) with score >= threshold."""

    def _sketch_rows(batch: pa.Table) -> pa.Table:
        return doc_sketches(batch, 1)

    sketches = docs_ds.map_batches(_sketch_rows,
                                   batch_format="pyarrow").materialize()
    cnt = sketches.count()
    nb = int(n_buckets) if n_buckets is not None else \
        max(16, min(1 << 16, cnt // 4096))

    def _shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        arr = batch.column("sketch").combine_chunks()
        offsets = np.asarray(arr.offsets)
        values = np.asarray(arr.values).view(np.uint64) \
            if len(arr.values) else np.array([], dtype=np.uint64)
        lens = np.diff(offsets).astype(np.int64)
        doc = np.repeat(ids, lens)
        ln = np.repeat(lens, lens)
        return pa.table({
            "bucket": pa.array((_splitmix(values)
                                % np.uint64(nb)).astype(np.int32),
                               pa.int32()),
            "sh": pa.array(values.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
        })

    def _pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy()
        ids = g["doc_id"].to_numpy()
        ln = g["ln"].to_numpy()
        order = np.lexsort((ids, sh))
        sh, ids, ln = sh[order], ids[order], ln[order]
        new_seg = np.ones(len(sh), bool)
        new_seg[1:] = sh[1:] != sh[:-1]
        seg_sizes = np.diff(np.append(np.flatnonzero(new_seg), len(sh)))
        ii, jj = segment_all_pairs(seg_sizes)
        empty = pd.DataFrame({
            "bucket": pd.Series([], dtype="int32"),
            "pair": pd.Series([], dtype="int64"),
            "ni": pd.Series([], dtype="int64"),
            "la": pd.Series([], dtype="int64"),
            "lb": pd.Series([], dtype="int64")})
        if not len(ii):
            return empty
        # within-segment rows are doc-sorted, so a < b
        pair = (ids[ii] << np.int64(32)) | ids[jj]
        uniq, first, ni = np.unique(pair, return_index=True,
                                    return_counts=True)
        return pd.DataFrame({
            "bucket": pd.Series(
                (_splitmix(uniq.astype(np.uint64))
                 % np.uint64(nb)).astype(np.int32), dtype="int32"),
            "pair": pd.Series(uniq, dtype="int64"),
            "ni": pd.Series(ni.astype(np.int64), dtype="int64"),
            "la": pd.Series(ln[ii][first], dtype="int64"),
            "lb": pd.Series(ln[jj][first], dtype="int64")})

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy()
        order = np.argsort(pair, kind="mergesort")
        pair = pair[order]
        niv = g["ni"].to_numpy()[order]
        la = g["la"].to_numpy()[order]
        lb = g["lb"].to_numpy()[order]
        uniq, first = np.unique(pair, return_index=True)
        inv = np.searchsorted(uniq, pair)
        ni = np.zeros(len(uniq), np.int64)
        np.add.at(ni, inv, niv)
        la, lb = la[first], lb[first]
        if metric == "containment":
            score = ni / np.minimum(la, lb)
        else:
            score = ni / (la + lb - ni)
        keep = score >= threshold
        return pd.DataFrame({
            "doc_a": pd.Series(uniq[keep] >> np.int64(32),
                               dtype="int64"),
            "doc_b": pd.Series(uniq[keep] & np.int64(0xFFFFFFFF),
                               dtype="int64"),
            metric: pd.Series(score[keep], dtype="float64")})

    return (sketches.map_batches(_shingle_rows, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(lambda g: _pair_partials(
                g.drop(columns=["bucket"])), batch_format="pandas")
            .groupby("bucket")
            .map_groups(lambda g: _merge(g.drop(columns=["bucket"])),
                        batch_format="pandas"))


def segment_prefix_cross_pairs(seg_sizes: np.ndarray,
                               prefix_sizes: np.ndarray):
    """(ii, jj) global row indices pairing each of the FIRST
    ``prefix_sizes[s]`` rows of segment s with EVERY row of segment s
    (self pairs excluded) — the candidate kernel of the asymmetric
    prefix filter.  Volume sum(p_s * n_s), never df^2."""
    seg_sizes = np.asarray(seg_sizes, dtype=np.int64)
    prefix_sizes = np.asarray(prefix_sizes, dtype=np.int64)
    seg_start = np.concatenate([[0], np.cumsum(seg_sizes)[:-1]])
    p_total = int(prefix_sizes.sum())
    if p_total == 0:
        e = np.array([], dtype=np.int64)
        return e, e
    p_start = np.concatenate([[0], np.cumsum(prefix_sizes)[:-1]])
    p_rows = np.repeat(seg_start, prefix_sizes) \
        + (np.arange(p_total) - np.repeat(p_start, prefix_sizes))
    reps = np.repeat(seg_sizes, prefix_sizes)
    ii = np.repeat(p_rows, reps)
    block_starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
    offs = np.arange(int(reps.sum())) - np.repeat(block_starts, reps)
    jj = np.repeat(np.repeat(seg_start, prefix_sizes), reps) + offs
    keep = ii != jj
    return ii[keep], jj[keep]


def ngram_prefix_candidates(sketches, threshold: float, nb: int,
                            metric: str = "jaccard",
                            fused: bool = True):
    """PPJoin-style prefix-filtered candidate pairs (Bayardo et al.,
    WWW'07 "Scaling Up All Pairs Similarity Search") — the
    stop-shingle-skew-proof candidate path: each document's shingles
    sort by GLOBAL document frequency ascending (rare first), and a
    qualifying pair must collide on a shingle inside the prefix

        p(l) = l - ceil(t * l) + 1

    of (jaccard) BOTH documents / (containment) the SMALLER document.
    Hot stop-shingles sort last and drop out of prefixes, so their
    df^2 pair blow-up never materializes; candidate volume is
    sum over shingles of p_df * df (p_df << df for hot shingles).

    Three exchanges, all narrow int rows.  ``fused=True`` (default,
    ROADMAP round-5 item: the df-and-prefix fusion) co-partitions the
    DF TABLE with the instance stream instead of routing instances
    through the df pass — the instance rows shuffle ONCE (straight to
    their doc bucket) instead of twice:
      1. groupby(shingle bucket) over PER-BATCH (shingle, doc-bucket)
         COUNT PARTIALS only -> one (db, sh, df) routing row per
         distinct (shingle, doc bucket);
      2. groupby(doc bucket) over instances UNION routing rows:
         local df attach (one searchsorted), per-doc (df, sh) sort ->
         prefix flags;
      3. groupby(shingle bucket): per-shingle pair generation
         (prefix x prefix for jaccard, prefix x all with the
         smaller-side rule for containment), locally uniqued.
    ``fused=False`` keeps the original instance-routed df attach
    (proven output-identical in tests/test_dedup.py).
    Returns a Dataset of (doc_a, doc_b), a SUPERSET of all qualifying
    pairs, for :func:`verify_jaccard_pairs`."""

    def _shingle_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        arr = batch.column("sketch").combine_chunks()
        offsets = np.asarray(arr.offsets)
        values = np.asarray(arr.values).view(np.uint64) \
            if len(arr.values) else np.array([], dtype=np.uint64)
        lens = np.diff(offsets).astype(np.int64)
        doc = np.repeat(ids, lens)
        ln = np.repeat(lens, lens)
        return pa.table({
            "sb": pa.array((_splitmix(values)
                            % np.uint64(nb)).astype(np.int32),
                           pa.int32()),
            "sh": pa.array(values.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
        })

    def _df_attach(g: pa.Table) -> pa.Table:
        sh = g.column("sh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        ln = g.column("ln").to_numpy()
        order = np.argsort(sh, kind="stable")
        sh, doc, ln = sh[order], doc[order], ln[order]
        new_seg = np.ones(len(sh), bool)
        if len(sh) > 1:
            new_seg[1:] = sh[1:] != sh[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new_seg), len(sh)))
        df = np.repeat(sizes, sizes)
        return pa.table({
            "db": pa.array((doc % nb).astype(np.int32), pa.int32()),
            "sh": pa.array(sh, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
            "df": pa.array(df, pa.int64()),
        })

    def _prefix_rows(g: pa.Table) -> pa.Table:
        sh = g.column("sh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        ln = g.column("ln").to_numpy()
        df = g.column("df").to_numpy()
        order = np.lexsort((sh, df, doc))
        sh, doc, ln, df = sh[order], doc[order], ln[order], df[order]
        new_doc = np.ones(len(doc), bool)
        if len(doc) > 1:
            new_doc[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new_doc)
        rank = np.arange(len(doc)) \
            - np.repeat(starts, np.diff(np.append(starts, len(doc))))
        p = ln - np.ceil(threshold * ln).astype(np.int64) + 1
        pref = rank < p
        if metric == "jaccard":
            sh, doc, ln = sh[pref], doc[pref], ln[pref]
            pref = pref[pref]
        return pa.table({
            "sb": pa.array((_splitmix(sh.view(np.uint64))
                            % np.uint64(nb)).astype(np.int32),
                           pa.int32()),
            "sh": pa.array(sh, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
            "pref": pa.array(pref.astype(np.int8), pa.int8()),
        })

    def _pairs(g: pa.Table) -> pa.Table:
        sh = g.column("sh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        ln = g.column("ln").to_numpy()
        pref = g.column("pref").to_numpy().astype(bool)
        # prefix rows first within each shingle segment
        order = np.lexsort((doc, ~pref, sh))
        sh, doc, ln, pref = sh[order], doc[order], ln[order], pref[order]
        new_seg = np.ones(len(sh), bool)
        if len(sh) > 1:
            new_seg[1:] = sh[1:] != sh[:-1]
        starts = np.flatnonzero(new_seg)
        sizes = np.diff(np.append(starts, len(sh)))
        if metric == "jaccard":
            # every retained row is a prefix row: in-segment pairs
            ii, jj = segment_all_pairs(sizes)
        else:
            psizes = np.add.reduceat(pref.astype(np.int64), starts) \
                if len(starts) else np.array([], np.int64)
            ii, jj = segment_prefix_cross_pairs(sizes, psizes)
            if len(ii):
                # the prefix row must be the smaller-or-equal side
                keep = ln[ii] <= ln[jj]
                ii, jj = ii[keep], jj[keep]
        if not len(ii):
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        a = np.minimum(doc[ii], doc[jj])
        b = np.maximum(doc[ii], doc[jj])
        packed = np.unique((a << np.int64(32)) | b)
        return pa.table({
            "doc_a": pa.array(packed >> np.int64(32), pa.int64()),
            "doc_b": pa.array(packed & np.int64(0xFFFFFFFF), pa.int64()),
        })

    if not fused:
        return (sketches
                .map_batches(_shingle_rows, batch_format="pyarrow")
                .groupby("sb")
                .map_groups(_df_attach, batch_format="pyarrow")
                .groupby("db")
                .map_groups(_prefix_rows, batch_format="pyarrow")
                .groupby("sb")
                .map_groups(_pairs, batch_format="pyarrow"))

    # -- fused df-and-prefix plan: instances shuffle once ------------------
    def _df_partials(batch: pa.Table) -> pa.Table:
        """Per-batch (shingle, doc-bucket) count partials — the only
        thing the df pass shuffles (never the instance rows)."""
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        arr = batch.column("sketch").combine_chunks()
        values = np.asarray(arr.values).view(np.uint64) \
            if len(arr.values) else np.array([], dtype=np.uint64)
        lens = np.diff(np.asarray(arr.offsets)).astype(np.int64)
        dbv = (np.repeat(ids, lens) % nb).astype(np.int64)
        sh = values.view(np.int64)
        order = np.lexsort((dbv, sh))
        sh, dbv = sh[order], dbv[order]
        new = np.ones(len(sh), bool)
        if len(sh) > 1:
            new[1:] = (sh[1:] != sh[:-1]) | (dbv[1:] != dbv[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(sh))).astype(np.int64)
        sh, dbv = sh[starts], dbv[starts]
        return pa.table({
            "sb": pa.array((_splitmix(sh.view(np.uint64))
                            % np.uint64(nb)).astype(np.int32),
                           pa.int32()),
            "sh": pa.array(sh, pa.int64()),
            "db": pa.array(dbv, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        })

    def _df_route(g: pa.Table) -> pa.Table:
        """Per shingle: total df, emitted once per distinct
        (shingle, doc bucket) as a routing row for the prefix pass."""
        sh = g.column("sh").to_numpy()
        db = g.column("db").to_numpy()
        cnt = g.column("cnt").to_numpy()
        order = np.lexsort((db, sh))
        sh, db, cnt = sh[order], db[order], cnt[order]
        new_sh = np.ones(len(sh), bool)
        if len(sh) > 1:
            new_sh[1:] = sh[1:] != sh[:-1]
        sh_starts = np.flatnonzero(new_sh)
        df_total = np.add.reduceat(cnt, sh_starts) if len(sh) else \
            np.array([], np.int64)
        new_pair = new_sh.copy()
        if len(sh) > 1:
            new_pair[1:] |= db[1:] != db[:-1]
        pair_idx = np.flatnonzero(new_pair)
        # pairs per shingle = how often df_total repeats
        pairs_per_sh = np.diff(np.append(
            np.searchsorted(pair_idx, sh_starts), len(pair_idx)))
        m = len(pair_idx)
        return pa.table({
            "db": pa.array(db[pair_idx].astype(np.int32), pa.int32()),
            "tag": pa.array(np.ones(m, np.int8), pa.int8()),
            "sh": pa.array(sh[pair_idx], pa.int64()),
            "doc_id": pa.array(np.zeros(m, np.int64), pa.int64()),
            "ln": pa.array(np.zeros(m, np.int64), pa.int64()),
            "df": pa.array(np.repeat(df_total, pairs_per_sh),
                           pa.int64()),
        })

    def _instance_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        arr = batch.column("sketch").combine_chunks()
        values = np.asarray(arr.values).view(np.uint64) \
            if len(arr.values) else np.array([], dtype=np.uint64)
        lens = np.diff(np.asarray(arr.offsets)).astype(np.int64)
        doc = np.repeat(ids, lens)
        ln = np.repeat(lens, lens)
        m = len(doc)
        return pa.table({
            "db": pa.array((doc % nb).astype(np.int32), pa.int32()),
            "tag": pa.array(np.zeros(m, np.int8), pa.int8()),
            "sh": pa.array(values.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
            "df": pa.array(np.zeros(m, np.int64), pa.int64()),
        })

    def _prefix_rows_fused(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy()
        sh = g.column("sh").to_numpy()
        doc = g.column("doc_id").to_numpy()
        ln = g.column("ln").to_numpy()
        dfc = g.column("df").to_numpy()
        route = tag == 1
        rsh = sh[route]
        rdf = dfc[route]
        ro = np.argsort(rsh, kind="stable")
        rsh, rdf = rsh[ro], rdf[ro]
        sh, doc, ln = sh[~route], doc[~route], ln[~route]
        # every instance's shingle has a routing row in this bucket
        # by construction; attach df with one searchsorted
        df = rdf[np.searchsorted(rsh, sh)]
        order = np.lexsort((sh, df, doc))
        sh, doc, ln, df = sh[order], doc[order], ln[order], df[order]
        new_doc = np.ones(len(doc), bool)
        if len(doc) > 1:
            new_doc[1:] = doc[1:] != doc[:-1]
        starts = np.flatnonzero(new_doc)
        rank = np.arange(len(doc)) \
            - np.repeat(starts, np.diff(np.append(starts, len(doc))))
        p = ln - np.ceil(threshold * ln).astype(np.int64) + 1
        pref = rank < p
        if metric == "jaccard":
            sh, doc, ln = sh[pref], doc[pref], ln[pref]
            pref = pref[pref]
        return pa.table({
            "sb": pa.array((_splitmix(sh.view(np.uint64))
                            % np.uint64(nb)).astype(np.int32),
                           pa.int32()),
            "sh": pa.array(sh, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "ln": pa.array(ln, pa.int64()),
            "pref": pa.array(pref.astype(np.int8), pa.int8()),
        })

    route_rows = (sketches
                  .map_batches(_df_partials, batch_format="pyarrow")
                  .groupby("sb")
                  .map_groups(_df_route, batch_format="pyarrow"))
    inst_rows = sketches.map_batches(_instance_rows,
                                     batch_format="pyarrow")
    return (inst_rows.union(route_rows)
            .groupby("db")
            .map_groups(_prefix_rows_fused, batch_format="pyarrow")
            .groupby("sb")
            .map_groups(_pairs, batch_format="pyarrow"))


def estimate_max_shingle_df(sketches, sample_mod: int = 64) -> int:
    """Estimated maximum shingle document frequency from a HASH
    SAMPLE of shingles: keep a shingle iff splitmix(sh) % sample_mod
    == 0 — every instance of a sampled shingle is kept, so each
    sampled shingle's df is EXACT and the max over the sample is an
    unbiased probe of the df tail (the same footer-style measured
    probe spatial_join_auto and salt.sampled_hot_keys use).  Cost:
    one narrow pass + a tiny driver-side bincount of ~1/sample_mod of
    the shingle instances."""
    def _sampled(batch: pa.Table) -> pa.Table:
        arr = batch.column("sketch").combine_chunks()
        values = np.asarray(arr.values).view(np.uint64) \
            if len(arr.values) else np.array([], dtype=np.uint64)
        keep = (_splitmix(values) % np.uint64(sample_mod)) == 0
        v = values[keep]
        # per-batch partial df counts: (sh, count)
        uniq, cnt = np.unique(v, return_counts=True)
        return pa.table({
            "sh": pa.array(uniq.view(np.int64), pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    parts = sketches.map_batches(_sampled,
                                 batch_format="pyarrow").to_pandas()
    if not len(parts):
        return 0
    return int(parts.groupby("sh")["n"].sum().max())


def choose_ngram_plan(sketches, n_docs: int,
                      sample_mod: int = 64) -> str:
    """"equi" or "prefix" from the measured df tail: the equi plan's
    pair volume has a sum(df^2) term, so a single shingle with
    df ~ sqrt(total pairs budget) dominates it.  The threshold is the
    corpus-scaled df at which one hot shingle alone would generate
    more candidate pairs than the whole corpus has documents —
    conservative in the same direction as choose_join_strategy (the
    skew path engages before the blow-up, never after)."""
    max_df = estimate_max_shingle_df(sketches, sample_mod)
    threshold = max(64, int(np.sqrt(2.0 * max(n_docs, 1))) * 4)
    return "prefix" if max_df > threshold else "equi"


def ngram_prefix_join(docs_ds, threshold: float = 0.5,
                      n_buckets=None, metric: str = "jaccard"):
    """Exact n-gram similarity self-join via prefix-filtered
    candidates + co-partitioned exact verification — the scale path
    for stop-shingle-skewed corpora where :func:`ngram_jaccard_join`'s
    shingle equi-join would generate df^2 partials on hot shingles.
    Output-identical to the equi-join plan (same unique shingle-hash
    sets, same IEEE score arithmetic), candidate volume bounded by
    sum(prefix_df * df) instead of sum(df^2)."""
    def _sketch_rows(batch: pa.Table) -> pa.Table:
        return doc_sketches(batch, 1)

    sketches = docs_ds.map_batches(_sketch_rows,
                                   batch_format="pyarrow").materialize()
    cnt = sketches.count()
    nb = int(n_buckets) if n_buckets is not None else \
        max(16, min(1 << 16, cnt // 4096))

    def _rebucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.set_column(
            batch.schema.get_field_index("bucket"), "bucket",
            pa.array((ids % nb).astype(np.int32), pa.int32()))

    sketches = sketches.map_batches(_rebucket, batch_format="pyarrow")
    cands = ngram_prefix_candidates(sketches, threshold, nb, metric)
    return verify_jaccard_pairs(sketches, cands, threshold, nb,
                                metric=metric)

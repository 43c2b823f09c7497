"""Distributed Bloom-filter semi-join: an OR-mergeable bit-array
sketch built over the small side's keys, broadcast once, used to drop
probe rows that cannot match BEFORE any shuffle — then an exact
co-partitioned recheck over the survivors only.

Why this exists at 100 TB: a semi-join's probe side is the fact table
(10^12 rows) and the filter is usually selective.  Shipping every
probe row into a hash shuffle to discover that 95% of them match
nothing wastes the whole exchange.  The Bloom filter costs ~10 bits
per build key at 1% false-positive rate — 16x smaller than the raw
8-byte key set, so it broadcasts where the exact set cannot — and
cuts the shuffle volume to (true matches + fpp * non-matches).
Exactness never rides on the filter: survivors are re-checked against
the real key set in a co-partitioned groupby, so false positives are
eliminated deterministically (tests drive a deliberately undersized
filter through the join and still get the exact answer).

Construction is a Ray Data ``AggregateFn`` whose accumulator IS the
bitmap: each block ORs its keys' bits into a local copy, and Ray's
tree reduce ORs the partials — the same mergeable-sketch contract as
the HLL stage (stages/sample.py).  Membership hashes are
Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m) over splitmix64,
a published construction, so any engine can reproduce the filter
bit-for-bit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .sample import _splitmix

_H2_SALT = np.uint64(0xD6E8FEB86659FD93)


def bloom_params(n_keys: int, fpp: float = 0.01):
    """Standard sizing: m = -n ln p / (ln 2)^2 bits, k = (m/n) ln 2.
    m is rounded up to a multiple of 64 (whole words)."""
    n = max(1, n_keys)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round((m / n) * math.log(2.0))))
    return m, min(k, 16)


@dataclass
class BloomFilter:
    words: np.ndarray       # uint64[m/64]
    m_bits: int
    k: int

    def contains(self, keys: np.ndarray) -> np.ndarray:
        return _contains(self.words, self.m_bits, self.k, keys)


def _positions(keys: np.ndarray, m_bits: int, k: int):
    """k bit positions per key via double hashing (uint64 wraparound
    is well-defined and identical everywhere)."""
    u = keys.astype(np.uint64)
    h1 = _splitmix(u)
    h2 = _splitmix(u ^ _H2_SALT) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % m)


def _set_bits(words: np.ndarray, m_bits: int, k: int,
              keys: np.ndarray) -> None:
    for pos in _positions(keys, m_bits, k):
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.left_shift(np.uint64(1),
                                       pos & np.uint64(63)))


def _contains(words: np.ndarray, m_bits: int, k: int,
              keys: np.ndarray) -> np.ndarray:
    out = np.ones(len(keys), dtype=bool)
    for pos in _positions(keys, m_bits, k):
        w = words[(pos >> np.uint64(6)).astype(np.int64)]
        out &= (w >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return out


def bloom_build(ds, key_col: str, *, n_keys: int | None = None,
                fpp: float = 0.01) -> BloomFilter:
    """Build the filter over ``ds[key_col]`` (integer keys) with one
    streaming aggregate.  ``n_keys`` sizes the bitmap; when omitted a
    cheap count() pass measures it (keys-only scan)."""
    from ray.data.aggregate import AggregateFn

    if n_keys is None:
        n_keys = ds.count()
    m_bits, k = bloom_params(n_keys, fpp)
    n_words = m_bits // 64

    def _acc(acc: np.ndarray, block: pa.Table) -> np.ndarray:
        out = acc.copy()
        keys = block.column(key_col).to_numpy().astype(np.uint64)
        _set_bits(out, m_bits, k, keys)
        return out

    agg = AggregateFn(
        init=lambda _k: np.zeros(n_words, dtype=np.uint64),
        accumulate_block=_acc,
        merge=lambda a, b: a | b,
        name="bloom")
    words = ds.aggregate(agg)["bloom"]
    return BloomFilter(words=words, m_bits=m_bits, k=k)


def bloom_prefilter(ds, key_col: str, filter_ref):
    """Drop rows whose key is definitely absent.  ``filter_ref`` is a
    ``ray.put`` handle to a BloomFilter — fetched once per task from
    the object store, never re-shipped per batch."""
    import ray

    def _keep(batch: pa.Table) -> pa.Table:
        bf: BloomFilter = ray.get(filter_ref)
        keys = batch.column(key_col).to_numpy()
        return batch.filter(pa.array(bf.contains(keys)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def bloom_semi_join(probe_ds, build_ds, probe_key: str, build_key: str,
                    *, fpp: float = 0.01,
                    n_build_keys: int | None = None,
                    n_buckets: int = 128):
    """Exact semi-join (probe rows whose key appears in the build
    side) with Bloom-prefiltered shuffle volume.

    1. build: streaming OR-aggregate -> BloomFilter, ray.put once
    2. prefilter: probe rows failing the filter never shuffle
    3. recheck: survivors + build keys tagged-union, co-partitioned by
       hash BUCKET (not by key: one group per key pays per-group
       dispatch; ~n_buckets groups each run one vectorized np.isin
       over the bucket's keys — the salt-stage bucketing idiom).
       False positives die here, so the result is exact regardless of
       fpp (collision test drives an undersized filter through this).

    At scale the only full-payload movement is the survivors' one
    hash shuffle; the build side moves as bare keys.
    """
    import ray
    import pyarrow.compute as pc

    bf = bloom_build(build_ds, build_key, n_keys=n_build_keys, fpp=fpp)
    ref = ray.put(bf)
    survivors = bloom_prefilter(probe_ds, probe_key, ref)

    probe_schema = probe_ds.schema()
    key_type = probe_schema.types[probe_schema.names.index(probe_key)]
    nb = np.uint64(n_buckets)

    def _bkt(keys: np.ndarray) -> pa.Array:
        return pa.array((_splitmix(keys.astype(np.uint64)) % nb)
                        .astype(np.int32), pa.int32())

    def _tag_probe(batch: pa.Table) -> pa.Table:
        keys = batch.column(probe_key).to_numpy()
        return batch.append_column(
            "__src", pa.array(np.zeros(batch.num_rows, np.int8),
                              pa.int8())) \
            .append_column("__bkt", _bkt(keys))

    def _tag_build(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(build_key))
        cols = {probe_key: keys.cast(key_type)}
        for n in probe_schema.names:
            if n != probe_key:
                cols[n] = pa.nulls(
                    len(keys),
                    probe_schema.types[probe_schema.names.index(n)])
        t = pa.table({n: cols[n] for n in probe_schema.names})
        return t.append_column(
            "__src", pa.array(np.ones(len(keys), np.int8), pa.int8())) \
            .append_column("__bkt", _bkt(keys.to_numpy()))

    tagged = survivors.map_batches(_tag_probe, batch_format="pyarrow") \
        .union(build_ds.map_batches(_tag_build, batch_format="pyarrow"))

    def _resolve(group: pa.Table) -> pa.Table:
        src = group.column("__src").to_numpy()
        keys = group.column(probe_key).to_numpy()
        bkeys = np.unique(keys[src == 1])
        probe_mask = src == 0
        keep = probe_mask & np.isin(keys, bkeys)
        return group.filter(pa.array(keep)) \
            .drop_columns(["__src", "__bkt"])

    return tagged.groupby("__bkt").map_groups(
        _resolve, batch_format="pyarrow")

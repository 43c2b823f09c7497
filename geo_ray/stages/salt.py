"""Explicit hot-key salting for skewed hash-partitioned shuffles.

The engine's default skew defenses are algebraic (mergeable combiners,
stages/tiles.py) or partition-shaped (quantile ranges,
stages/shuffle_join.py).  Those cover aggregations and sweeps; what
they do NOT cover is a *row-producing* equality join whose probe side
piles millions of rows onto one key — a city cell, a mega-user, a
viral document.  A plain ``groupby(key)`` join lands the whole hot key
on one task and the shuffle stragglers behind it.

This stage is the textbook explicit-salting treatment (the north
star's "explicit salting of hot cells", SURVEY.md §4 skew row):

1. ``measured_hot_keys`` — a cheap measured pass (never a guess):
   per-batch ``np.unique`` count partials, a tiny ``groupby(key).sum``
   (only ``(key, count)`` pairs shuffle — distinct-key-sized, not
   row-sized), filter by threshold.  The hot set is small by
   definition and broadcasts.
2. ``salted_hash_join`` — inner equality join as a tagged-union
   groupby: probe rows of a hot key get a salt in ``[0, S)`` so the
   key spreads over S groups; build rows of a hot key REPLICATE to
   all S salts (the classic probe-salt / build-replicate asymmetry);
   cold keys pay nothing (salt 0 on both sides, no replication).
   Within a ``(key, salt)`` group the key is constant, so the join is
   a vectorized index cross-product — pure Arrow ``take``, no pandas
   (nullable int64 columns must never round-trip through float NaN).

Scale shape: the only all-to-all exchange moves each probe row once
and each build row at most S times for hot keys (build sides are the
narrow dimension rows).  Max group size drops from ``count(hot_key)``
to ``count(hot_key)/S + count(build_rows)``, restoring task balance
without touching cold keys.  Integer keys partition by value
(collision-free); string keys partition by a deterministic blake2b
hash, and the join body ALWAYS re-checks key equality, so a hash
collision costs two keys sharing a unit — never a wrong row.  The
composite ``(key, salt)`` unit packs into one int64 so the groupby
key matches the single-column idiom used across the engine (hash()
is process-salted and unusable; see stages/shuffle_join.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

_MAX_ABS_KEY = np.int64(1) << np.int64(56)  # unit packing headroom


def _key_ints(col: pa.ChunkedArray) -> np.ndarray:
    """int64 PARTITION image of a key column.  Integer keys pass
    through (bijective, so (key, salt) units are collision-free);
    string keys hash with blake2b-8 (deterministic across processes —
    builtin hash() is process-salted).  Hashes are partitioning only:
    the join body re-checks key equality, so a collision merely puts
    two keys in one unit."""
    import hashlib

    if pa.types.is_integer(col.type):
        return col.to_numpy().astype(np.int64)
    return _hash_strs(col.to_pylist())


def _hash_strs(vals) -> np.ndarray:
    import hashlib

    out = np.empty(len(vals), dtype=np.int64)
    for i, s in enumerate(vals):
        d = hashlib.blake2b(str(s).encode("utf-8"),
                            digest_size=8).digest()
        out[i] = int.from_bytes(d, "little") >> 8  # < 2^56: packs
    return out


def _key_values(col: pa.ChunkedArray) -> np.ndarray:
    """Key values as a comparable numpy array (int64 or object)."""
    if pa.types.is_integer(col.type):
        return col.to_numpy().astype(np.int64)
    return np.array(col.to_pylist(), dtype=object)


def _mix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 avalanche (public-domain), for key->bucket spread."""
    z = z.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def measured_hot_keys(ds, key_col: str, threshold: float,
                      num_buckets: int = 64) -> np.ndarray:
    """Keys whose total row count exceeds ``threshold``, measured with
    a combiner pass: only (key, count) partials shuffle, and only the
    hot keys themselves come back to the driver (bounded by the skew
    tail, not the key cardinality).  The final count runs as a
    bucketed map_groups (one vectorized bincount per bucket of keys):
    Ray's generic sort-Aggregate combine measured ~2.5x slower on the
    same partials."""

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        k = _key_values(col)
        uniq, cnt = np.unique(k, return_counts=True)
        if pa.types.is_integer(col.type):
            hashes = uniq.astype(np.int64)
            key_arr = pa.array(hashes, pa.int64())
        else:
            hashes = _hash_strs(uniq)
            key_arr = pa.array(uniq.tolist(), col.type)
        b = (_mix64(hashes) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({key_col: key_arr,
                         "n": pa.array(cnt.astype(np.int64), pa.int64()),
                         "_b": pa.array(b, pa.int64())})

    def _count_bucket(group: pa.Table) -> pa.Table:
        col = group.column(key_col)
        k = _key_values(col)
        n = group.column("n").to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        # float64 partial sums are exact below 2^53 rows per key
        tot = np.bincount(inv, weights=n.astype(np.float64))
        sel = uniq[tot > threshold]
        return pa.table({key_col: pa.array(sel.tolist(), col.type)})

    hot = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("_b").map_groups(_count_bucket,
                                     batch_format="pyarrow")).take_all()
    vals = [r[key_col] for r in hot]
    if vals and isinstance(vals[0], (int, np.integer)):
        return np.sort(np.array(vals, dtype=np.int64))
    return np.sort(np.array(vals, dtype=object))


def sampled_hot_keys(paths, key_col: str, threshold: int, *,
                     frac: float = 0.25, safety: float = 0.5,
                     rgs_per_task: int = 8,
                     num_buckets: int = 64,
                     min_sampled_count: float = 2.0) -> np.ndarray:
    """Hot-key detection from a strided ROW-GROUP sample of the
    parquet input — ~``frac`` of the scan cost instead of a second
    full key-column pass.  Salting is a performance hint, so sampled
    detection cannot cost correctness: a missed moderately-hot key
    only costs shuffle balance, and a truly hot key (count many
    multiples of ``threshold``) appears in every row-group stride with
    overwhelming probability because its rows are spread across the
    file (hot join keys — cities, mega-users — are not stored
    contiguously in fact tables sorted by time or id).

    Mechanics: the driver reads FOOTERS ONLY to enumerate
    (file, row_group, rows), takes every ``stride``-th row group
    (stride = round(1/frac)), and fans the chosen groups out as Ray
    tasks that each read only their row groups' key column
    (``pyarrow.parquet.ParquetFile.read_row_group`` — the row group is
    the parquet I/O unit, so unread groups cost nothing).  The count
    threshold is scaled by the MEASURED sampled-row fraction (rows in
    chosen groups / total rows, not the nominal ``frac`` — uneven
    group sizes must not bias it) times ``safety`` (<1 biases toward
    over-detection: salting a borderline-hot key is cheap, missing a
    hot one is the failure mode).

    Degrades gracefully: with a single row group (small test files)
    the sample IS the full scan and the result equals
    ``measured_hot_keys`` exactly.
    """
    import pyarrow.parquet as pq
    import ray

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    stride = max(1, int(round(1.0 / max(frac, 1e-9))))

    total_rows = 0
    chosen = []          # (path, rg_index)
    sampled_rows = 0
    seq = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata   # footer only
        for rg in range(md.num_row_groups):
            nr = md.row_group(rg).num_rows
            total_rows += nr
            if seq % stride == 0:
                chosen.append((p, rg))
                sampled_rows += nr
            seq += 1
    if total_rows == 0 or not chosen:
        return np.array([], dtype=np.int64)
    actual_frac = sampled_rows / total_rows
    thr = threshold * actual_frac * safety
    if thr < min_sampled_count and actual_frac < 1.0:
        # statistical-validity guard: a scaled threshold below
        # ``min_sampled_count`` cannot discriminate (a key with a
        # single sampled row would count as hot — over-salting the
        # whole key space).  Sampling only makes sense when
        # threshold >> 1/frac; otherwise measure exactly on the full
        # narrow key scan.
        import ray.data as rd
        full = rd.read_parquet(list(paths), columns=[key_col])
        return measured_hot_keys(full, key_col, threshold,
                                 num_buckets=num_buckets)

    tasks = [{"path": p, "rgs": [rg for (_, rg) in grp]}
             for p, grp in _group_by_path(chosen, rgs_per_task)]

    def _read_rgs(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            f = pq.ParquetFile(row["path"])
            for rg in row["rgs"]:
                out.append(f.read_row_group(rg, columns=[key_col]))
        return pa.concat_tables(out) if out else \
            pa.table({key_col: pa.array([], pa.int64())})

    ds = ray.data.from_items(tasks).map_batches(
        _read_rgs, batch_format="pyarrow", batch_size=1)
    return measured_hot_keys(ds, key_col, thr, num_buckets=num_buckets)


def _group_by_path(chosen, rgs_per_task):
    """Chunk (path, rg) pairs into per-task units of <=rgs_per_task
    row groups, never mixing files in a unit (one open per task)."""
    out = []
    cur_path, cur = None, []
    for p, rg in chosen:
        if p != cur_path or len(cur) >= rgs_per_task:
            if cur:
                out.append((cur_path, cur))
            cur_path, cur = p, []
        cur.append((p, rg))
    if cur:
        out.append((cur_path, cur))
    return out


def _is_hot(keys: np.ndarray, hot_sorted: np.ndarray) -> np.ndarray:
    if len(hot_sorted) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(hot_sorted, keys)
    return (pos < len(hot_sorted)) & \
        (hot_sorted[np.minimum(pos, len(hot_sorted) - 1)] == keys)


def _null_columns(schema: pa.Schema, exclude: Sequence[str],
                  n: int) -> dict:
    return {f.name: pa.nulls(n, f.type) for f in schema
            if f.name not in exclude}


def salted_hash_join(left, right, key_col: str, *,
                     right_key: Optional[str] = None,
                     num_salts: int = 8,
                     hot_keys: Optional[np.ndarray] = None,
                     threshold: Optional[int] = None,
                     num_buckets: int = 256):
    """Inner equality join of two Datasets on an int64 key with
    explicit hot-key salting.

    ``left`` is the big/skewed probe side (each row moves once);
    ``right`` is the build side (hot-key rows replicate ``num_salts``
    times).  ``hot_keys`` may be passed precomputed; otherwise it is
    measured from ``left`` with ``threshold`` (one of the two must be
    given — salting is measured, never guessed).  Output columns are
    the union of both sides' columns minus the right key (the left key
    column carries the join key); both inputs must otherwise have
    disjoint column names.

    The grouped stage runs over BUCKETS of (key, salt) units (a
    splitmix hash of the unit, ``num_buckets`` of them), not per unit:
    per-group map_groups overhead is ~100 us and a fact table has
    millions of distinct keys, so the per-unit form spends its wall
    time on call dispatch (measured: the grouped stage of a 600k-row
    join dropped ~3x when bucketed).  The bucket body joins ALL its
    units in one vectorized segmented cross-product — the same
    batching trick as the tile renderer (stages/tiles.py
    render_bucket_group).  Note: reading the input schemas executes a
    limit-1 probe on lazy inputs (cheap; Arrow metadata only).
    """
    import ray

    if hot_keys is None:
        if threshold is None:
            raise ValueError("pass hot_keys or threshold")
        hot_keys = measured_hot_keys(left, key_col, threshold)
    hot_keys = np.sort(np.asarray(hot_keys))
    S = int(num_salts)
    if S < 1 or S & (S - 1):
        raise ValueError("num_salts must be a power of two")

    rk = right_key or key_col
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = [f.name for f in lschema]
    rcols = [f.name for f in rschema if f.name != rk]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision: {sorted(overlap)}")
    rtypes = {f.name: f.type for f in rschema}
    key_type = lschema.field(key_col).type
    int_keyed = pa.types.is_integer(key_type)

    hot_ref = ray.put(hot_keys)
    sS = np.int64(S)

    def _unit(kints: np.ndarray, salt: np.ndarray) -> np.ndarray:
        if int_keyed and np.any(np.abs(kints) >= _MAX_ABS_KEY):
            raise ValueError("key magnitude exceeds unit packing range")
        return kints * sS + salt.astype(np.int64)

    def _emit(cols: dict, key_vals, unit: np.ndarray,
              side: int) -> pa.Table:
        # one canonical column order for both sides: the union operator
        # requires identical schemas (order included) across inputs.
        # _rkey carries the actual key value for the join body's
        # equality recheck (a no-op filter for collision-free int
        # units; the correctness backstop for hashed string units).
        n = len(unit)
        cols["_rkey"] = key_vals
        cols["_unit"] = pa.array(unit, pa.int64())
        cols["_side"] = pa.array(np.full(n, side, np.int8), pa.int8())
        return pa.table({name: cols[name] for name in
                         lcols + rcols + ["_rkey", "_unit", "_side"]})

    def _tag_left(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        kints = _key_ints(col)
        salt = np.zeros(len(kints), dtype=np.int64)
        hot = _is_hot(_key_values(col), ray.get(hot_ref))
        # spread hot rows evenly: position-within-batch round-robin
        salt[hot] = np.arange(int(hot.sum()), dtype=np.int64) % sS
        cols = {name: batch.column(name) for name in lcols}
        cols.update(_null_columns(rschema, [rk], len(kints)))
        return _emit(cols, col.combine_chunks(), _unit(kints, salt), 0)

    def _tag_right(batch: pa.Table) -> pa.Table:
        col = batch.column(rk)
        kints = _key_ints(col)
        hot = _is_hot(_key_values(col), ray.get(hot_ref))
        # cold rows once at salt 0; hot rows replicated to every salt
        idx = np.concatenate([np.nonzero(~hot)[0],
                              np.repeat(np.nonzero(hot)[0], S)])
        salt = np.concatenate([
            np.zeros(int((~hot).sum()), dtype=np.int64),
            np.tile(np.arange(S, dtype=np.int64), int(hot.sum()))])
        taken = batch.take(pa.array(idx, pa.int64()))
        n = len(idx)
        cols = _null_columns(lschema, [key_col], n)
        cols[key_col] = pa.nulls(n, lschema.field(key_col).type)
        for name in rcols:
            cols[name] = taken.column(name)
        return _emit(cols, taken.column(rk).combine_chunks(),
                     _unit(kints[idx], salt), 1)

    nb = np.uint64(int(num_buckets))

    def _with_bucket(batch: pa.Table) -> pa.Table:
        # splitmix avalanche: sequential keys must not band the buckets
        bucket = (_mix64(batch.column("_unit").to_numpy()) % nb) \
            .astype(np.int64)
        return batch.append_column("_bucket", pa.array(bucket, pa.int64()))

    tagged = (left.map_batches(_tag_left, batch_format="pyarrow")
              .union(right.map_batches(_tag_right, batch_format="pyarrow"))
              .map_batches(_with_bucket, batch_format="pyarrow"))

    out_fields = [(name, lschema.field(name).type) for name in lcols] + \
        [(name, rtypes[name]) for name in rcols]

    return tagged.groupby("_bucket").map_groups(
        lambda g: _cross_join_units(g, lcols, rcols, out_fields),
        batch_format="pyarrow")


def _cross_join_units(group: pa.Table, lcols, rcols,
                      out_fields) -> pa.Table:
    """All of one bucket's units in a single vectorized segmented
    cross-product: per-unit (left rows) x (right rows), built from
    repeat/arange index arrays and two Arrow takes.  Tested directly
    with colliding units (tests/test_salt.py)."""
    import pyarrow.compute as pc

    unit = group.column("_unit").to_numpy()
    side = group.column("_side").to_numpy()
    order = np.lexsort((side, unit))  # unit-major, left-before-right
    u_sorted = unit[order]
    s_sorted = side[order]
    starts = np.nonzero(np.r_[True, u_sorted[1:] != u_sorted[:-1]])[0]
    bounds = np.append(starts, len(u_sorted))
    # per-unit left/right counts from the side transition point
    split = starts + np.add.reduceat(
        (s_sorted == 0).astype(np.int64), starts) \
        if len(starts) else np.empty(0, np.int64)
    n_r = bounds[1:] - split
    # per-left-row replication (segments ordered like the sort)
    lrow_pos = np.nonzero(s_sorted == 0)[0]
    unit_of_lrow = np.searchsorted(starts, lrow_pos, side="right") - 1
    nr_per_lrow = n_r[unit_of_lrow]
    total = int(nr_per_lrow.sum())
    if total == 0:
        return pa.table({name: pa.nulls(0, typ)
                         for name, typ in out_fields})
    left_idx = np.repeat(lrow_pos, nr_per_lrow)
    # segmented arange: right rows of the left row's unit
    seg_start = np.repeat(np.cumsum(nr_per_lrow) - nr_per_lrow,
                          nr_per_lrow)
    intra = np.arange(total, dtype=np.int64) - seg_start
    right_idx = np.repeat(split[unit_of_lrow], nr_per_lrow) + intra
    lt = group.take(pa.array(order[left_idx], pa.int64()))
    rt = group.take(pa.array(order[right_idx], pa.int64()))
    # key-equality recheck: free for int keys (units are
    # collision-free), the exactness backstop for hashed strings
    eq = pc.equal(lt.column("_rkey"), rt.column("_rkey"))
    if not (pc.all(eq).as_py() or False):
        lt = lt.filter(eq)
        rt = rt.filter(eq)
    cols = {name: lt.column(name) for name in lcols}
    for name in rcols:
        cols[name] = rt.column(name)
    return pa.table(cols)

"""Sketch-guided exact heavy hitters over an unbounded string key
domain.

The scale problem: "all terms with count >= T" via a plain groupby
shuffles the ENTIRE vocabulary (one row per distinct key) even though
the answer holds at most total_tokens / T keys.  The classic cure is
a Count-Min sketch prefilter (Cormode & Muthukrishnan 2005): CM
estimates never under-count, so

  pass 1  per-batch CM partials — CM is additive, so batches emit
          their own (d x w) int64 counter matrix and the merge is an
          element-wise sum of FIXED-SIZE arrays (d*w ints, ~256 KB —
          driver-merged like every bounded-domain rollup here);
  pass 2  candidate extraction: re-scan, query the broadcast sketch
          per distinct batch term, keep terms whose estimate >= T — a
          SUPERSET of the true heavy hitters (one-sided error), with
          |candidates| <= total/T + collision spill controlled by w;
  pass 3  exact verification: count ONLY the candidate terms
          (broadcast membership filter inside map_batches — the
          candidate set is output-sized, not vocabulary-sized) via
          the exact string-key bucketed sum, keep count >= T.

The final output is therefore EXACT (the sketch only decides what to
count precisely), which is what lets the query carry a plain
GROUP BY ... HAVING SQL oracle.

Hashing: pandas.util.hash_array (stable fixed-key siphash) mixed with
_splitmix plus a per-row odd constant — deterministic across
processes, matching the repo's shuffle-hash conventions.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import _splitmix

_ROW_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
              0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _cm_positions(terms: np.ndarray, d: int, w: int) -> np.ndarray:
    """(len(terms), d) int64 matrix of sketch column positions."""
    h = pd.util.hash_array(terms.astype(object)).astype(np.uint64)
    cols = np.empty((len(terms), d), np.int64)
    for r in range(d):
        cols[:, r] = (_splitmix(h ^ np.uint64(_ROW_SALTS[r]))
                      % np.uint64(w)).astype(np.int64)
    return cols


def cm_heavy_hitters(ds, explode: Callable[[pa.Table], pa.Table],
                     threshold: int, *, d: int = 4, w: int = 8192):
    """ds + explode(batch) -> (term, n) partial counts per batch ->
    Dataset (term, n) of EXACT counts for every term with total
    count >= threshold.

    ``explode`` maps an input batch to per-batch partial counts with
    columns (term: string, n: int64) — the same contract as the
    _partial bodies feeding bucketed_sum_str."""
    import ray
    import ray.data as rd

    from .agg import bucketed_sum_str

    counts = ds.map_batches(explode,
                            batch_format="pyarrow").materialize()

    # pass 1: additive CM partials, driver-merged fixed-size state
    def _sketch(batch: pa.Table) -> pa.Table:
        terms = batch.column("term").to_numpy()
        n = batch.column("n").to_numpy().astype(np.int64)
        cols = _cm_positions(terms, d, w)
        sk = np.zeros((d, w), np.int64)
        for r in range(d):
            np.add.at(sk[r], cols[:, r], n)
        return pa.table({"sk": pa.array([sk.ravel()],
                                        pa.list_(pa.int64()))})

    sketch = np.zeros(d * w, np.int64)
    for part in counts.map_batches(
            _sketch, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for row in part.column("sk").to_pylist():
            sketch += np.asarray(row, np.int64)
    sketch = sketch.reshape(d, w)
    sk_ref = ray.put(sketch)

    # pass 2: candidate superset via the broadcast sketch
    def _cands(batch: pa.Table) -> pa.Table:
        sk = ray.get(sk_ref)
        terms = batch.column("term").to_numpy()
        cols = _cm_positions(terms, d, w)
        est = sk[0, cols[:, 0]]
        for r in range(1, d):
            est = np.minimum(est, sk[r, cols[:, r]])
        keep = est >= threshold
        return pa.table({"term": pa.array(terms[keep], pa.string())})

    cand = set()
    for part in counts.map_batches(
            _cands, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        cand.update(part.column("term").to_pylist())
    cand_ref = ray.put(cand)

    if not cand:
        return rd.from_arrow(pa.table({
            "term": pa.array([], pa.string()),
            "n": pa.array([], pa.int64())}))

    # pass 3: exact counts of candidates only
    def _only_cands(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        terms = batch.column("term").to_pandas()
        keep = terms.isin(cs).to_numpy()
        return batch.filter(pa.array(keep))

    exact = bucketed_sum_str(
        counts.map_batches(_only_cands, batch_format="pyarrow"),
        "term", ["n"], n_buckets=16)

    def _final(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch.column("n")) >= threshold
        return batch.filter(pa.array(keep))

    return exact.map_batches(_final, batch_format="pyarrow")

"""kNN over geotagged points: brute-force-per-batch partials + a tiny
top-k merge shuffle.

Semantics of the reference closest-edge query with ``MaxResults(k)``
over point targets (s2/edge_query.go:177-795): results ordered by
(ChordAngle distance, id), ties exactly as EdgeQueryResult.Less
(s2/edge_query.go:149-157).  The distributed shape: every batch scores
its rows against the broadcast probe matrix with one matmul (chord2 =
2 - 2*X.Q for unit vectors), keeps the k best rows per probe
(np.argpartition), and only those P*k partial rows shuffle into the
per-probe merge — an exact algorithm whose shuffle volume is
O(P * k * num_batches), independent of input size.

The cell-ring expansion variant (AllNeighbors seeding,
s2/cellid.go:274-321) is a planned optimization for very large probe
sets; for probe sets that fit in a broadcast matrix the matmul form is
faster per row and exact.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa


class KnnPartial:
    """Actor-pool stage: per-batch top-k toward each broadcast probe."""

    def __init__(self, probes, k: int, id_col: str = "image_id"):
        """probes: (probe_id list, (P,3) xyz matrix) or ObjectRef."""
        import ray
        if isinstance(probes, ray.ObjectRef):
            probes = ray.get(probes)
        self.probe_ids, self.Q = probes
        self.Q = np.asarray(self.Q, dtype=np.float64)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(self.id_col).type
        if len(batch) == 0:
            return pa.table({"probe_id": pa.array([], id_type),
                             "neighbor_id": pa.array([], id_type),
                             "chord2": pa.array([], pa.float64())})
        X = np.stack([batch.column("x").to_numpy(),
                      batch.column("y").to_numpy(),
                      batch.column("z").to_numpy()], axis=1)
        ids = batch.column(self.id_col).to_pylist()
        chord2 = np.clip(2.0 - 2.0 * (X @ self.Q.T), 0.0, 4.0)  # (n, P)
        n, P = chord2.shape
        k = min(self.k, n)
        out_probe: List[str] = []
        out_id: List[str] = []
        out_d: List[float] = []
        part = np.argpartition(chord2, k - 1, axis=0)[:k] if k < n else \
            np.tile(np.arange(n)[:, None], (1, P))
        for p in range(P):
            rows = part[:, p]
            for r in rows:
                out_probe.append(self.probe_ids[p])
                out_id.append(ids[r])
                out_d.append(float(chord2[r, p]))
        return pa.table({
            "probe_id": pa.array(out_probe),
            "neighbor_id": pa.array(out_id),
            "chord2": pa.array(out_d, pa.float64()),
        })


def finalize_topk(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-probe merge: exact (distance, id) order, rank 1..k.

    Tie rule of EdgeQueryResult.Less (s2/edge_query.go:149-157).
    """
    g = group.sort_values(["chord2", "neighbor_id"], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def knn(points_ds, probes: Tuple[Sequence[str], np.ndarray], k: int,
        *, id_col: str = "image_id", concurrency=None):
    """points_ds must carry x/y/z and id_col columns."""
    import ray
    probes_ref = ray.put(probes)

    def _partial(batch: pa.Table) -> pa.Table:
        return KnnPartial(probes_ref, k, id_col)(batch)

    partials = points_ds.map_batches(_partial, batch_format="pyarrow",
                                     batch_size=16384)
    return partials.groupby("probe_id").map_groups(
        lambda g: finalize_topk(g, k), batch_format="pandas")

"""Cost-based spatial-join strategy selection.

Two proven-equivalent spatial-join strategies exist (both oracle-
checked against the same SQL):

* broadcast (stages/join.py) — points NEVER shuffle; every task stabs
  a shared CellIndex built from all polygon coverings.  Build-side
  cost: ~1-3 KB of covering + edge-index state per polygon, shipped
  once per node via ``ray.put``.  Right while that state fits a
  fraction of a worker heap.
* shuffle (stages/shuffle_join.py) — both sides range-partition by
  quantiles of the Hilbert order; each probe row moves exactly once
  (~41 B narrow rows), the build side replicates only across the
  partitions its covering overlaps (measured factor < 1.1 at the city
  corpus).  Right when the polygon corpus exceeds worker heaps or
  individual polygons are huge.

``choose_join_strategy`` automates the BASELINE.md arithmetic from
driver-side cardinality probes (parquet footers / corpus length —
no data scan), so pipelines pick the scale-correct plan without a
human in the loop.  The crossover is deliberately conservative: the
broadcast side must fit ``heap_fraction`` of one worker's heap.
"""

from __future__ import annotations

# ~1-3 KB measured per city polygon (covering cells + clipped edge
# index + interior flags); the default uses the high end so the
# decision errs toward shuffle before a heap is at risk.
POLYGON_STATE_BYTES = 3072


def broadcast_build_bytes(n_polygons: int,
                          state_bytes: int = POLYGON_STATE_BYTES) -> int:
    """Estimated object-store footprint of the broadcast JoinState."""
    return int(n_polygons) * int(state_bytes)


def choose_join_strategy(n_points: int, n_polygons: int, *,
                         worker_heap_bytes: int = 4 << 30,
                         heap_fraction: float = 0.25,
                         state_bytes: int = POLYGON_STATE_BYTES) -> str:
    """'broadcast' while the polygon-side state fits ``heap_fraction``
    of one worker heap, else 'shuffle'.  ``n_points`` only breaks the
    degenerate tie (an empty probe side never justifies a shuffle):
    the probe side's size does not change the decision because the
    broadcast plan never moves probe rows at all."""
    if n_polygons < 0 or n_points < 0:
        raise ValueError("cardinalities must be non-negative")
    budget = int(worker_heap_bytes * heap_fraction)
    if broadcast_build_bytes(n_polygons, state_bytes) <= budget:
        return "broadcast"
    return "shuffle"

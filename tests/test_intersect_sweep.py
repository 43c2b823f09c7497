"""Distributed N-way intersection sweep vs the scalar
state/s2intersect.find oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.functions import cellid as cid
from geo_ray.state import cellunion as cu
from geo_ray.state.s2intersect import find as scalar_find


def _rand_unions(rng, n_unions, max_cells, all_faces=True):
    unions = []
    for _ in range(n_unions):
        ids = []
        for _ in range(int(rng.integers(1, max_cells + 1))):
            face = int(rng.integers(0, 6 if all_faces else 3))
            lvl = int(rng.integers(2, 14))
            i = int(rng.integers(0, 1 << 30))
            j = int(rng.integers(0, 1 << 30))
            ids.append(cid.parent(
                cid.cell_id_from_face_ij(face, i, j), lvl))
        unions.append(cu.normalize(ids))
    return unions


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_u64(v: int) -> int:
    return v & ((1 << 64) - 1)


@pytest.mark.parametrize("seed,n_unions,max_cells", [
    (1, 3, 6), (2, 5, 10), (3, 8, 20), (4, 12, 4),
])
def test_distributed_sweep_matches_scalar(ray_session, seed, n_unions,
                                          max_cells):
    import ray.data as rd

    from geo_ray.stages.intersect_sweep import find_distributed

    rng = np.random.default_rng(seed)
    # overlapping structure: make later unions share subtrees with
    # earlier ones so 2+-way intersections actually occur
    unions = _rand_unions(rng, n_unions, max_cells)
    for k in range(1, n_unions):
        donor = unions[int(rng.integers(0, k))]
        take = [c for c in donor if rng.random() < 0.7]
        unions[k] = cu.normalize(unions[k] + [
            int(list(cid.children(c))[int(rng.integers(0, 4))])
            if cid.level(c) < 28 and rng.random() < 0.5 else c
            for c in take])

    want = scalar_find(unions)

    rows_idx, rows_cell = [], []
    for i, u in enumerate(unions):
        for c in u:
            rows_idx.append(i)
            rows_cell.append(_to_i64(c))
    ds = rd.from_arrow(pa.table({
        "idx": pa.array(rows_idx, pa.int64()),
        "cell": pa.array(rows_cell, pa.int64())})).repartition(5)

    got_df = find_distributed(ds, num_parts=7).to_pandas()
    got = {}
    for m, g in got_df.groupby("members"):
        key = frozenset(int(x) for x in m.split(","))
        got[key] = sorted(_to_u64(int(c)) for c in g["cell"])

    want_cmp = {k: sorted(v) for k, v in want.items()}
    assert got == want_cmp, (seed, len(got), len(want_cmp))
    assert any(len(k) >= 2 for k in want_cmp) or not want_cmp


def test_distributed_sweep_empty_and_disjoint(ray_session):
    import ray.data as rd

    from geo_ray.stages.intersect_sweep import find_distributed

    # two disjoint unions: no 2-way intersection, empty output
    a = [cid.parent(cid.cell_id_from_face_ij(0, 1 << 20, 1 << 20), 5)]
    b = [cid.parent(cid.cell_id_from_face_ij(3, 1 << 20, 1 << 20), 5)]
    rows = [(0, c) for c in a] + [(1, c) for c in b]
    ds = rd.from_arrow(pa.table({
        "idx": pa.array([r[0] for r in rows], pa.int64()),
        "cell": pa.array([_to_i64(r[1]) for r in rows], pa.int64())}))
    assert find_distributed(ds, num_parts=3).count() == 0

    # identical unions: one 2-way subset equal to the union itself
    ds2 = rd.from_arrow(pa.table({
        "idx": pa.array([0, 1], pa.int64()),
        "cell": pa.array([_to_i64(a[0])] * 2, pa.int64())}))
    out = find_distributed(ds2, num_parts=2).to_pandas()
    assert set(out["members"]) == {"0,1"}
    assert sorted(_to_u64(int(c)) for c in out["cell"]) == \
        cu.normalize(a)


def test_cell_intersections_query_matches_scalar(ray_session):
    """The registered q_cell_intersections (per-region customer
    footprints) must equal the scalar find() on the same unions."""
    import pyarrow.parquet as pq

    from geo_ray.pipelines.queries import (derive_latlng_np,
                                           q_cell_intersections)
    from geo_ray.functions.latlng import latlng_deg_to_xyz
    from geo_ray.state.s2intersect import find as scalar_find

    sf = "/root/testdata/sf0.01"
    got_df = q_cell_intersections(sf).to_pandas()

    cust = pq.read_table(f"{sf}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = dict(zip(nat.column("n_nationkey").to_numpy(),
                   nat.column("n_regionkey").to_numpy()))
    keys = cust.column("c_custkey").to_numpy()
    lat, lng = derive_latlng_np(keys)
    x, y, z = latlng_deg_to_xyz(lat, lng)
    leaf = cid.cell_id_from_point_v(x, y, z)
    p8 = cid.parent_v(leaf, 5)
    regs = np.array([n2r[n] for n in
                     cust.column("c_nationkey").to_numpy()])
    n_reg = int(regs.max()) + 1
    unions = [cu.normalize([int(c) for c in np.unique(p8[regs == r])])
              for r in range(n_reg)]
    want = {",".join(map(str, sorted(k))): sorted(v)
            for k, v in scalar_find(unions).items()}

    got = {}
    for m, g in got_df.groupby("members"):
        got[m] = sorted(_to_u64(int(c)) for c in g["cell"])
    assert got == want
    assert len(want) > 0, "expected overlapping region footprints"

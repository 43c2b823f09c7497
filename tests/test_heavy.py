"""stages/heavy: CM-sketch-guided heavy hitters — exactness under
forced collisions (tiny sketch width) and the superset guarantee."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.stages.heavy import cm_heavy_hitters


def _mk_ds(rng, n_keys, n_rows):
    import ray.data as rd
    keys = np.array([f"key{i:04d}" for i in
                     rng.zipf(1.5, n_rows).clip(1, n_keys)])
    return rd.from_arrow(pa.table({"k": pa.array(keys, pa.string())})), keys


def _mk_explode():
    # returned as a CLOSURE so Ray cloudpickles it by value (the test
    # module itself is not importable inside workers)
    def _explode(batch: pa.Table) -> pa.Table:
        t = batch.column("k").to_pandas()
        g = t.value_counts()
        return pa.table({
            "term": pa.array(g.index.to_numpy(), pa.string()),
            "n": pa.array(g.to_numpy().astype(np.int64), pa.int64())})
    return _explode


@pytest.mark.parametrize("w", [16, 256, 8192])
def test_exact_under_any_sketch_width(ray_session, w):
    """Collisions (w=16 forces many) may only GROW the candidate set;
    the verified output stays exactly the true heavy hitters."""
    rng = np.random.default_rng(3)
    ds, keys = _mk_ds(rng, 200, 5000)
    threshold = 50
    truth = pd.Series(keys).value_counts()
    want = truth[truth >= threshold].sort_index()
    got = cm_heavy_hitters(ds, _mk_explode(), threshold, w=w) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    assert list(got["term"]) == list(want.index)
    assert list(got["n"]) == [int(v) for v in want.to_numpy()]


def test_empty_result(ray_session):
    rng = np.random.default_rng(4)
    ds, _ = _mk_ds(rng, 500, 300)
    got = cm_heavy_hitters(ds, _mk_explode(), 10_000).to_pandas()
    assert len(got) == 0

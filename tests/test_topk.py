"""Grouped top-k: combiner-truncation property (partial per batch then
merge == direct top-k on the whole table) over random splits; oracle
parity for the registered query runs in test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from geo_ray.stages.topk import _topk_frame


def _direct(df, k):
    out = _topk_frame(df, "key", "value", "id", k)
    out["rank"] = out.groupby("key", sort=False).cumcount() + 1
    return out.sort_values(["key", "rank"]).reset_index(drop=True)


rows = st.lists(
    st.tuples(st.integers(0, 5),                       # key
              st.sampled_from([0.0, 1.5, 2.5, 9.0]),   # value (ties!)
              st.integers(0, 10**6)),                  # id
    min_size=1, max_size=80)


@settings(max_examples=200, deadline=None)
@given(r=rows, k=st.sampled_from([1, 2, 3, 7]),
       n_batches=st.sampled_from([1, 2, 5]))
def test_combiner_equals_direct(r, k, n_batches):
    df = pd.DataFrame(
        [(a, b, 2 * i) for i, (a, b, _) in enumerate(r)],
        columns=["key", "value", "id"])
    want = _direct(df, k)
    parts = np.arange(len(df)) % n_batches
    partials = pd.concat(
        [_topk_frame(df[parts == p], "key", "value", "id", k)
         for p in range(n_batches)], ignore_index=True)
    got = _direct(partials, k)
    pd.testing.assert_frame_equal(got, want)

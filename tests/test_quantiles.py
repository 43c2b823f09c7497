"""Exact counting-aggregation quantiles: convention unit tests plus a
numpy brute-force property check; the registered query's DuckDB
parity runs in test_oracle_parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from geo_ray.stages.quantiles import _pick_group


def _brute(cents, p):
    """Value at 1-based rank ceil(p * n) of the sorted multiset."""
    import math
    s = np.sort(np.asarray(cents))
    return int(s[max(1, math.ceil(p * len(s))) - 1])


def _counts_frame(cents):
    vals, n = np.unique(np.asarray(cents), return_counts=True)
    return pd.DataFrame({"key": ["k"] * len(vals),
                         "cents": vals.astype(np.int64),
                         "n": n.astype(np.int64)})


def test_pick_convention():
    g = _counts_frame([10, 20, 30, 40])
    row = _pick_group(g, (0.5, 0.9, 0.99)).iloc[0]
    # ceil(0.5*4)=2 -> 20; ceil(0.9*4)=4 -> 40
    assert row["p50_cents"] == 20
    assert row["p90_cents"] == 40


def test_single_value():
    row = _pick_group(_counts_frame([7]), (0.5, 0.99)).iloc[0]
    assert row["p50_cents"] == 7 and row["p99_cents"] == 7


@settings(max_examples=200, deadline=None)
@given(cents=st.lists(st.integers(0, 50), min_size=1, max_size=200),
       p=st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]))
def test_matches_brute(cents, p):
    row = _pick_group(_counts_frame(cents), (p,)).iloc[0]
    assert int(row[f"p{int(round(p * 100))}_cents"]) == _brute(cents, p)

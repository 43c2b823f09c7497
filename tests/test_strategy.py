"""Cost-based spatial-join strategy selection: decision matrix and
both-branch row identity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from geo_ray.stages.strategy import (POLYGON_STATE_BYTES,
                                     broadcast_build_bytes,
                                     choose_join_strategy)


def test_decision_matrix():
    heap = 4 << 30
    budget = int(heap * 0.25)
    fit = budget // POLYGON_STATE_BYTES
    # city-corpus scale: broadcast
    assert choose_join_strategy(10**12, 8) == "broadcast"
    # exactly at the budget: still broadcast (<=)
    assert choose_join_strategy(10**12, fit) == "broadcast"
    # one polygon past the budget: shuffle
    assert choose_join_strategy(10**12, fit + 1) == "shuffle"
    # probe-side size never changes the plan (broadcast moves no
    # probe rows; an empty probe side is fine either way)
    assert choose_join_strategy(0, 8) == "broadcast"
    assert choose_join_strategy(0, fit + 1) == "shuffle"
    # a tighter worker heap flips sooner
    assert choose_join_strategy(
        10**6, 10**5, worker_heap_bytes=256 << 20) == "shuffle"


def test_build_bytes_scales_linearly():
    assert broadcast_build_bytes(0) == 0
    assert broadcast_build_bytes(1000) == 1000 * POLYGON_STATE_BYTES


def test_auto_join_matches_both_fixed_plans(ray_session):
    """The auto entry must return the same rows as the fixed-plan
    variants on the same input — run it beside the broadcast plan
    and the shuffle plan at tiny scale."""
    import geo_ray.pipelines.queries as qmod

    sf = "/root/testdata/sf0.001"
    key = ["image_id", "polygon_id"]

    def _norm(ds):
        return ds.to_pandas().sort_values(key).reset_index(drop=True)

    auto = _norm(qmod.q_spatial_join_auto(sf))
    bro = _norm(qmod.q_spatial_join_images(sf))
    shf = _norm(qmod.q_spatial_join_shuffle(sf))
    pd.testing.assert_frame_equal(auto, bro)
    pd.testing.assert_frame_equal(auto, shf)

"""Image near-dup: exact L-inf feature-ball self-join vs brute-force
oracles, and the decode -> features -> ball-join composition over the
synthetic image table with planted codec-perturbed variants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geo_ray.sources import images as srcimg
from geo_ray.stages.media import (FEATURE_COLS, content_features,
                                  image_features, image_neardup,
                                  reencode_variants)


def _brute_pairs(ids, F, eps):
    ii, jj = np.triu_indices(len(ids), k=1)
    d = np.abs(F[ii] - F[jj]).max(axis=1)
    ok = d <= eps
    return sorted(zip(np.asarray(ids)[ii[ok]], np.asarray(ids)[jj[ok]]))


def _run_pairs(ds_pairs) -> list:
    df = ds_pairs.to_pandas()
    return sorted(zip(df["id_a"], df["id_b"]))


@pytest.mark.parametrize("seed,id_kind", [(3, "int"), (11, "str")])
def test_ball_join_matches_brute_random(ray_session, seed, id_kind):
    import ray.data as rd
    from geo_ray.stages.ball_join import linf_ball_self_join

    rng = np.random.default_rng(seed)
    n, k, eps = 500, 5, 0.8
    # cluster structure so some pairs qualify: 60 centers + jitter
    centers = rng.uniform(-30, 30, size=(60, k))
    F = centers[rng.integers(0, 60, n)] + rng.normal(0, 0.5, (n, k))
    ids = (np.arange(n, dtype=np.int64) if id_kind == "int"
           else np.array([f"r{i:05d}" for i in range(n)]))
    cols = {"rid": pa.array(ids)}
    fcols = [f"c{j}" for j in range(k)]
    for j in range(k):
        cols[fcols[j]] = pa.array(F[:, j], pa.float64())
    ds = rd.from_arrow(pa.table(cols)).repartition(7)
    got = _run_pairs(linf_ball_self_join(ds, fcols, eps, id_col="rid",
                                         index_cols=fcols[:3]))
    want = _brute_pairs(ids, F, eps)
    assert got == want
    assert len(want) > 20  # the corpus must actually exercise pairs


def test_ball_join_exact_at_boundary(ray_session):
    """Pairs at exactly eps and just beyond: inclusive <= eps."""
    import ray.data as rd
    from geo_ray.stages.ball_join import linf_ball_self_join

    eps = 1.0
    F = np.array([[0.0, 0.0], [1.0, 0.5],     # linf exactly eps -> in
                  [5.0, 5.0], [6.0 + 1e-9, 5.0],  # just beyond -> out
                  [9.0, 9.0], [9.5, 9.2]])    # clearly within
    ids = np.arange(6, dtype=np.int64)
    tbl = pa.table({"rid": pa.array(ids), "a": pa.array(F[:, 0]),
                    "b": pa.array(F[:, 1])})
    got = _run_pairs(linf_ball_self_join(
        rd.from_arrow(tbl), ["a", "b"], eps, id_col="rid",
        index_cols=["a", "b"]))
    assert got == [(0, 1), (4, 5)]


def test_ball_join_partition_invariance(ray_session):
    import ray.data as rd
    from geo_ray.stages.ball_join import linf_ball_self_join

    rng = np.random.default_rng(7)
    n = 300
    F = rng.uniform(0, 20, size=(n, 4))
    tbl = pa.table({"rid": pa.array(np.arange(n, dtype=np.int64)),
                    **{f"c{j}": pa.array(F[:, j]) for j in range(4)}})
    fcols = [f"c{j}" for j in range(4)]
    results = []
    for nparts in (1, 5, 23):
        ds = rd.from_arrow(tbl).repartition(nparts)
        results.append(_run_pairs(linf_ball_self_join(
            ds, fcols, 1.5, id_col="rid")))
    assert results[0] == results[1] == results[2]


def test_image_neardup_matches_brute_with_planted_variants(ray_session):
    import ray.data as rd
    from geo_ray.sources import codecs

    n, every, eps = 600, 10, 1.0
    base = srcimg.images_table(n)
    full = reencode_variants(base, every=every)
    got = _run_pairs(image_neardup(
        rd.from_arrow(full).repartition(6), eps=eps))

    # brute oracle: features straight from decoded pixels, all pairs
    feats = image_features(full)
    ids = np.array(feats.column("image_id").to_pylist())
    F = np.stack([feats.column(c).to_numpy() for c in FEATURE_COLS], axis=1)
    want = _brute_pairs(ids, F, eps)
    assert got == want

    # every planted (original, re-encoded) pair must be found
    planted = [(f"img{i:012d}", f"img{i:012d}~v")
               for i in range(0, n, every)]
    assert set(planted) <= set(got)
    # and the natural corpus is far enough apart that pairs are
    # dominated by the planted ones (codec noise << image spacing)
    assert len(got) < len(planted) * 2


def test_content_features_resolution_independent():
    """The same content synthesized at different sizes must stay
    within the near-dup epsilon (resized-duplicate detection)."""
    ph = srcimg.phash_for_index(np.arange(50, dtype=np.int64))
    small = srcimg._pixels_for_rows(ph, 16, 16)
    large = srcimg._pixels_for_rows(ph, 64, 64)
    fs = content_features(small)
    fl = content_features(large)
    assert np.abs(fs - fl).max() <= 1.0
    # while DIFFERENT content stays far apart at either size
    ii, jj = np.triu_indices(50, k=1)
    assert np.abs(fl[ii] - fl[jj]).max(axis=1).min() > 2.0

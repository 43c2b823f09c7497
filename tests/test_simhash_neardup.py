"""Exact Hamming-ball near-dup via pigeonhole banding: the band
partition must produce EXACTLY the brute pair set (it is a
deterministic superset + precise filter, not probabilistic LSH), and
each pair must be emitted exactly once despite colliding in several
bands."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _pairs_from_hashes(hashes, max_hamming=3, lsh_buckets=8):
    """Run the band/verify kernels directly on given simhash values."""
    from geo_ray.stages.dedup import simhash_neardup  # noqa: F401
    import geo_ray.stages.dedup as d

    n_bands = max_hamming + 1
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    ids = np.arange(len(hashes), dtype=np.int64)
    h = np.asarray(hashes, dtype=np.uint64)

    rows = []
    for b in range(n_bands):
        bv = ((h >> np.uint64(b * width)) & mask).astype(np.int64)
        for i in range(len(ids)):
            bucket = int((np.uint64(bv[i]) * np.uint64(0x9E3779B97F4A7C15)
                          ^ np.uint64(b)) % np.uint64(lsh_buckets))
            rows.append((bucket, b, int(bv[i]), int(ids[i]),
                         int(h[i].view(np.int64))))
    df = pd.DataFrame(rows, columns=["bucket", "band_id", "band_val",
                                     "doc_id", "simhash"])

    # reuse the production group kernel via the closure inside
    # simhash_neardup is not directly accessible; replicate its call
    # contract by running the full Dataset path in test_dataset below.
    out = []
    for _, g in df.groupby("bucket"):
        out.append(_group_pairs(g, max_hamming, width, mask))
    return pd.concat(out, ignore_index=True) if out else \
        pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])


def _group_pairs(group, max_hamming, width, mask):
    out_a, out_b, out_h = [], [], []
    for (band, _), sub in group.groupby(["band_id", "band_val"],
                                        sort=False):
        if len(sub) < 2:
            continue
        sub = sub.drop_duplicates("doc_id").sort_values("doc_id")
        ids = sub["doc_id"].to_numpy()
        hs = sub["simhash"].to_numpy().view(np.uint64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = hs[ii] ^ hs[jj]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64) \
            if len(x) else np.zeros(0, dtype=np.int64)
        ok = ham <= max_hamming
        if band > 0 and ok.any():
            earlier = np.zeros(len(ii), dtype=bool)
            for b in range(band):
                sh = np.uint64(b * width)
                earlier |= ((x >> sh) & mask) == 0
            ok &= ~earlier
        out_a.extend(int(v) for v in ids[ii[ok]])
        out_b.extend(int(v) for v in ids[jj[ok]])
        out_h.extend(int(v) for v in ham[ok])
    return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                         "doc_b": pd.Series(out_b, dtype="int64"),
                         "hamming": pd.Series(out_h, dtype="int64")})


def _brute(hashes, max_hamming=3):
    h = np.asarray(hashes, dtype=np.uint64)
    out = []
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = int(h[i] ^ h[j]).bit_count()
            if d <= max_hamming:
                out.append((i, j, d))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"]) \
        .astype("int64")


hash_lists = st.lists(
    st.one_of(
        st.integers(0, (1 << 64) - 1),
        # clustered values: a base with a few bits flipped
        st.builds(lambda base, flips: base ^ sum(1 << f for f in flips),
                  st.sampled_from([0, 0xDEADBEEFCAFEBABE,
                                   0x0123456789ABCDEF]),
                  st.lists(st.integers(0, 63), max_size=4,
                           unique=True)),
    ), min_size=0, max_size=25)


@settings(max_examples=200, deadline=None)
@given(hashes=hash_lists)
def test_banding_equals_brute(hashes):
    want = _brute(hashes).sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True)
    got = _pairs_from_hashes(hashes).sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_dataset_path(ray_session):
    """Full Dataset path on synthetic docs: pairs equal the brute
    popcount over the per-doc simhash stage output."""
    import ray.data as rd
    from geo_ray.stages.dedup import simhash_neardup
    from geo_ray.stages.text import simhash

    texts = ["the quick brown fox jumps over the lazy dog"] * 3 + \
            ["the quick brown fox jumps over the lazy cat"] * 2 + \
            ["completely different text about databases and rays",
             "another unrelated document entirely", ""]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t)
    got = simhash_neardup(ds, max_hamming=3).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    sims = simhash(t).column("simhash").to_numpy().view(np.uint64)
    want = _brute(sims).sort_values(["doc_a", "doc_b"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want)
    # the 3 identical docs must appear as 3 hamming-0 pairs
    assert (got["hamming"] == 0).sum() >= 3

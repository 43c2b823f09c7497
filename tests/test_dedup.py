"""Near-duplicate detection: planted-pair recall/precision against a
brute-force text-Jaccard oracle, and a guard that the pipeline never
materializes the documents table on the driver."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

RNG = np.random.default_rng(1234)
VOCAB = [f"w{i}" for i in range(500)]


def _doc(n_tokens: int) -> str:
    return " ".join(RNG.choice(VOCAB, size=n_tokens))


def _mutate(text: str, frac: float) -> str:
    toks = text.split()
    n = max(1, int(len(toks) * frac))
    idx = RNG.choice(len(toks), size=n, replace=False)
    for i in idx:
        toks[i] = str(RNG.choice(VOCAB))
    return " ".join(toks)


def _corpus():
    rows = []
    did = 0
    for _ in range(120):
        rows.append((did, _doc(60)))
        did += 1
    planted = []
    for _ in range(12):
        base = _doc(60)
        rows.append((did, base))
        rows.append((did + 1, _mutate(base, 0.05)))  # ~near-dup
        planted.append((did, did + 1))
        did += 2
    return rows, planted


ROWS, PLANTED = _corpus()
DOCS = pa.table({
    "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
    "text": pa.array([r[1] for r in ROWS], pa.string()),
})
THRESHOLD = 0.5


def _brute_pairs():
    from geo_ray.stages.dedup import jaccard
    out = set()
    for i in range(len(ROWS)):
        for j in range(i + 1, len(ROWS)):
            if jaccard(ROWS[i][1], ROWS[j][1]) >= THRESHOLD:
                out.add((ROWS[i][0], ROWS[j][0]))
    return out


def test_minhash_dedup_matches_brute_oracle(ray_session):
    import ray.data as rd
    from geo_ray.stages.dedup import minhash_dedup

    got = minhash_dedup(rd.from_arrow(DOCS), threshold=THRESHOLD).to_pandas()
    got_pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    brute = _brute_pairs()
    # every planted pair is a true near-dup and must be recovered
    for p in PLANTED:
        assert p in brute
        assert p in got_pairs, f"planted pair {p} missed"
    # no false positives: every emitted pair verifies >= threshold
    assert got_pairs <= brute
    # verified jaccard values are exact (hash-set == string-set here)
    from geo_ray.stages.dedup import jaccard
    texts = dict(ROWS)
    for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"]):
        assert j == pytest.approx(jaccard(texts[int(a)], texts[int(b)]),
                                  abs=1e-12)


def test_minhash_dedup_never_materializes_on_driver(ray_session):
    """The scale guarantee: building AND consuming the pipeline must
    not pull the documents table to the driver via to_pandas or a
    driver-side ray.get of a text table."""
    import ray.data as rd
    from ray.data import Dataset
    from geo_ray.stages.dedup import minhash_dedup

    banned_calls = []
    orig = Dataset.to_pandas

    def _spy(self, *a, **k):
        banned_calls.append("to_pandas")
        return orig(self, *a, **k)

    Dataset.to_pandas = _spy
    try:
        out = minhash_dedup(rd.from_arrow(DOCS), threshold=THRESHOLD)
        rows = out.take_all()
    finally:
        Dataset.to_pandas = orig
    assert not banned_calls, "pipeline called Dataset.to_pandas"
    assert len(rows) >= len(PLANTED)


def test_exact_dedup_deterministic(ray_session):
    import ray.data as rd
    from geo_ray.stages.dedup import exact_dedup

    tbl = pa.table({
        "k": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "doc_id": pa.array([5, 3, 9, 7, 8, 1], pa.int64()),
    })
    out = exact_dedup(rd.from_arrow(tbl), ["k"], "doc_id").to_pandas()
    got = dict(zip(out["k"], out["doc_id"]))
    assert got == {1: 3, 2: 7, 3: 1}


def test_minhash_dedup_parquet_checkpoint_path(ray_session, tmp_path):
    """Above the row threshold with a ckpt_root, the sketch table must
    go through the resumable parquet checkpoint (manifest on disk),
    produce identical pairs, and a rerun must REUSE the checkpoint
    (manifest mtime unchanged) instead of re-sketching."""
    import json
    import os

    import ray.data as rd
    from geo_ray.stages.dedup import minhash_dedup

    root = str(tmp_path / "mh_ckpt")
    base = minhash_dedup(rd.from_arrow(DOCS),
                         threshold=THRESHOLD).to_pandas()
    got = minhash_dedup(rd.from_arrow(DOCS), threshold=THRESHOLD,
                        ckpt_root=root, ckpt_threshold_rows=1).to_pandas()
    man = os.path.join(root, "minhash_sketches", "_MANIFEST.json")
    assert os.path.exists(man), "sketch checkpoint manifest missing"
    manifest = json.load(open(man))
    assert manifest["rows"] == len(ROWS)

    def _key(df):
        return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(_key(got), _key(base))

    mtime = os.path.getmtime(man)
    again = minhash_dedup(rd.from_arrow(DOCS), threshold=THRESHOLD,
                          ckpt_root=root, ckpt_threshold_rows=1).to_pandas()
    assert os.path.getmtime(man) == mtime, "checkpoint was rebuilt"
    pd.testing.assert_frame_equal(_key(again), _key(base))


def test_minhash_dedup_below_threshold_skips_checkpoint(ray_session,
                                                        tmp_path):
    import os

    import ray.data as rd
    from geo_ray.stages.dedup import minhash_dedup

    root = str(tmp_path / "mh_ckpt_small")
    out = minhash_dedup(rd.from_arrow(DOCS), threshold=THRESHOLD,
                        ckpt_root=root,
                        ckpt_threshold_rows=10**9).to_pandas()
    assert not os.path.exists(os.path.join(root, "minhash_sketches"))
    assert len(out) >= len(PLANTED)


def test_bands_from_sketches_matches_per_doc_signature():
    """The segmented-min (reduceat) band builder must agree row-for-row
    with the straightforward per-doc signature definition, including
    empty sketches at every position and Arrow slice offsets."""
    from geo_ray.stages.dedup import (BAND_SIZE, NUM_HASHES, _BAND_SEEDS,
                                      _splitmix, bands_from_sketches)

    rng = np.random.default_rng(7)
    n_docs = 120
    sketches = []
    for i in range(n_docs):
        n = int(rng.integers(0, 30))
        if i in (0, 1, 57, n_docs - 2, n_docs - 1):
            n = 0
        sketches.append(rng.integers(0, 2 ** 63, size=n, dtype=np.int64))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "sketch": pa.array([s.tolist() for s in sketches],
                           pa.list_(pa.int64()))})

    seeds = _splitmix(np.arange(NUM_HASHES, dtype=np.uint64))
    sig = np.zeros((n_docs, NUM_HASHES), dtype=np.uint64)
    for i, s in enumerate(sketches):
        base = s.view(np.uint64)
        if len(base):
            sig[i] = _splitmix(base[None, :] ^ seeds[:, None]).min(axis=1)
    n_bands = NUM_HASHES // BAND_SIZE
    chunks = sig.reshape(n_docs, n_bands, BAND_SIZE)
    mixed = np.zeros((n_docs, n_bands), dtype=np.uint64)
    for j in range(BAND_SIZE):
        mixed ^= chunks[:, :, j] * _BAND_SEEDS[j::BAND_SIZE][:n_bands]
    mixed = _splitmix(mixed ^ np.arange(n_bands, dtype=np.uint64)[None, :])
    want = (mixed >> np.uint64(1)).astype(np.int64)

    got = bands_from_sketches(tbl)
    assert np.array_equal(got.column("band_hash").to_numpy(), want.ravel())
    sl = bands_from_sketches(tbl.slice(13, 90))
    assert np.array_equal(sl.column("band_hash").to_numpy(),
                          want[13:103].ravel())

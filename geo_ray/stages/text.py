"""Text-analysis stages for the documents table: token counting,
quality scoring, language ID, fingerprinting, simhash.

Engine-side additions for large-scale training-data pipelines (not in
the geometry reference); each is a vectorized / tight-loop map_batches
body over the ``documents`` schema (doc_id, text, lang, source,
n_chars).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"\s+")
_ALPHA = re.compile(r"[A-Za-z]")

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "pour"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "para"},
}


def tokens_of(text: str):
    return _WS.split(text.strip())


def token_count(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens): whitespace tokenization, matching
    ``len(string_split_regex(trim(text), '\\s+'))`` exactly."""
    texts = batch.column("text").to_pylist()
    n = [len(tokens_of(t)) for t in texts]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_tokens": pa.array(n, pa.int64())})


def quality_score(batch: pa.Table) -> pa.Table:
    """Integer quality features: text length, space count, alpha count
    (SQL-expressible so the oracle can cross-check them)."""
    texts = batch.column("text").to_pylist()
    lengths = [len(t) for t in texts]
    spaces = [t.count(" ") for t in texts]
    alphas = [len(_ALPHA.findall(t)) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_len": pa.array(lengths, pa.int64()),
        "n_spaces": pa.array(spaces, pa.int64()),
        "n_alpha": pa.array(alphas, pa.int64()),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-vote language ID (n-gram-free heuristic): the language
    with the most stopword hits wins; ties and no-hits -> 'und'."""
    texts = batch.column("text").to_pylist()
    langs = sorted(STOPWORDS)
    out = []
    for t in texts:
        words = set(w.lower() for w in tokens_of(t))
        scores = [(len(words & STOPWORDS[l]), l) for l in langs]
        best = max(scores, key=lambda s: (s[0], s[1]))
        second = sorted((s[0] for s in scores), reverse=True)[1] if len(scores) > 1 else 0
        out.append(best[1] if best[0] > 0 and best[0] > second else "und")
    return pa.table({"doc_id": batch.column("doc_id"),
                     "lang_pred": pa.array(out, pa.string())})


def _word_hash64(word: str) -> int:
    """64-bit word hash = last 8 md5 bytes little-endian — the exact
    value of DuckDB's ``md5_number_lower``, so fingerprint/simhash have
    cross-engine SQL oracles."""
    return int.from_bytes(
        hashlib.md5(word.encode("utf-8")).digest()[8:], "little")


_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64_np(z: np.ndarray) -> np.ndarray:
    z = np.asarray(z, dtype=np.uint64) + _GOLDEN
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_WORD_HASH_CACHE: dict = {}


def word_hashes64(tokens) -> np.ndarray:
    """Deterministic 64-bit word hashes (memoized md5-lower-8, the
    DuckDB ``md5_number_lower`` value — SQL-reproducible)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    cache = _WORD_HASH_CACHE
    for i, w in enumerate(tokens):
        h = cache.get(w)
        if h is None:
            h = _word_hash64(w)
            if len(cache) < 2_000_000:
                cache[w] = h
        out[i] = h
    return out


def fingerprint(batch: pa.Table) -> pa.Table:
    """Rolling polynomial hash over the first 32 tokens (document
    fingerprint; stable across runs — no PYTHONHASHSEED)."""
    texts = batch.column("text").to_pylist()
    out = []
    M = (1 << 61) - 1
    for t in texts:
        h = 0
        for w in tokens_of(t)[:32]:
            h = (h * 1000003 + _word_hash64(w)) % M
        out.append(h)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out, pa.int64())})


def chunk_documents(batch: pa.Table, size: int = 64,
                    stride: int = 48) -> pa.Table:
    """Row-expanding chunker (the flat_map shape): each document
    splits into overlapping token windows of ``size`` every
    ``stride`` tokens — the standard pre-embedding segmentation of a
    training corpus.  Chunk count is 1 for docs of <= size tokens,
    else (n - size + stride - 1) // stride + 1; the last window may
    be short.  Emits (doc_id, chunk_id, chunk_text, n_tokens)."""
    texts = batch.column("text").to_pylist()
    ids = batch.column("doc_id").to_numpy()
    out_doc, out_chunk, out_text, out_n = [], [], [], []
    for i, t in enumerate(texts):
        toks = tokens_of(t)
        n = len(toks)
        n_chunks = 1 if n <= size else (n - size + stride - 1) // stride + 1
        for c in range(n_chunks):
            w = toks[c * stride:c * stride + size]
            out_doc.append(int(ids[i]))
            out_chunk.append(c)
            out_text.append(" ".join(w))
            out_n.append(len(w))
    return pa.table({
        "doc_id": pa.array(out_doc, pa.int64()),
        "chunk_id": pa.array(out_chunk, pa.int64()),
        "chunk_text": pa.array(out_text, pa.string()),
        "n_tokens": pa.array(out_n, pa.int64()),
    })


def hash_embed(batch: pa.Table, dim: int = 32,
               text_col: str = "chunk_text") -> pa.Table:
    """Deterministic feature-hash embedding: token counts folded into
    ``dim`` buckets by md5_number_lower(word) % dim.  Integer count
    vectors make downstream cosine ranking EXACT (dot products and
    norms are small integers, so both engines compute bit-identical
    score doubles) — the model-free stand-in that keeps the
    chunk -> embed -> ANN composition oracle-checkable."""
    texts = batch.column(text_col).to_pylist()
    vecs = np.zeros((len(texts), dim), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = tokens_of(t)
        d = (word_hashes64(toks) % np.uint64(dim)).astype(np.int64)
        np.add.at(vecs[i], d, 1)
    flat = pa.array(vecs.ravel(), pa.int64())
    hvec = pa.FixedSizeListArray.from_arrays(flat, dim)
    return batch.append_column("hvec", hvec)


def simhash(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over word hashes: sum +-1 per bit weighted by
    term frequency; near-duplicate docs land within small Hamming
    distance."""
    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    powers = np.uint64(1) << shifts
    for i, t in enumerate(texts):
        wh = word_hashes64(tokens_of(t))
        if len(wh) == 0:
            out[i] = 0
            continue
        # (n_words, 64) bit matrix -> per-bit vote
        bits = ((wh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out[i] = ((votes > 0).astype(np.uint64) @ powers).astype(np.int64)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "simhash": pa.array(out, pa.int64())})


def curation_features(batch: pa.Table) -> pa.Table:
    """ONE pass over the text for the corpus-curation pipeline:
    language vote, quality counters and token count computed together
    so the wide ``text`` column is read exactly once and dropped here —
    at corpus scale, text bytes never reach a second stage."""
    texts = batch.column("text").to_pylist()
    langs = sorted(STOPWORDS)
    lang_out, n_tok, n_alpha, text_len = [], [], [], []
    for t in texts:
        toks = tokens_of(t)
        words = set(w.lower() for w in toks)
        scores = [(len(words & STOPWORDS[l]), l) for l in langs]
        best = max(scores, key=lambda s: (s[0], s[1]))
        second = sorted((s[0] for s in scores), reverse=True)[1] \
            if len(scores) > 1 else 0
        lang_out.append(best[1] if best[0] > 0 and best[0] > second
                        else "und")
        n_tok.append(len(toks))
        n_alpha.append(len(_ALPHA.findall(t)))
        text_len.append(len(t))
    keep = [c for c in batch.column_names if c != "text"]
    out = batch.select(keep)
    out = out.append_column("lang_pred", pa.array(lang_out, pa.string()))
    out = out.append_column("text_len", pa.array(text_len, pa.int64()))
    out = out.append_column("n_alpha", pa.array(n_alpha, pa.int64()))
    return out.append_column("n_tokens", pa.array(n_tok, pa.int64()))

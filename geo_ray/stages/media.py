"""Multimodal binary-column stages: resize, video frame sampling,
audio feature extraction.

Design (SURVEY.md §2.10 scale rules): every stage is an actor-pool
`map_batches` callable — expensive setup (codec tables, resample
grids, window functions) happens once per actor in ``__init__``, the
per-batch work is vectorized numpy, and wide payloads (pixels, PCM)
are decoded and REDUCED inside the stage so only narrow columns
shuffle.  Containers for image/audio bytes are this repo's own
deterministic formats (sources/codecs.py LJ92 + PNG for frames; the
AUD1 PCM container below) because the sandbox has no PIL/ffmpeg —
real-codec hooks are import-try'd at the decode seams, so dropping in
PIL/soundfile changes no schema or stage signature.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from ..sources import codecs

_VID_MAGIC = b"VID1"
_AUD_MAGIC = b"AUD1"


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------

def _resize_plan(src: int, dst: int):
    """Bilinear sample positions for one axis (align_corners=False,
    the common convention): returns (lo_index, hi_index, hi_weight)."""
    scale = src / dst
    centers = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    centers = np.clip(centers, 0.0, src - 1.0)
    lo = np.floor(centers).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    w = (centers - lo).astype(np.float32)
    return lo, hi, w


def resize_bilinear(imgs: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(n, h, w, 3) uint8 -> (n, out_h, out_w, 3) uint8, vectorized
    separable bilinear (one gather + lerp per axis)."""
    n, h, w, c = imgs.shape
    ylo, yhi, wy = _resize_plan(h, out_h)
    xlo, xhi, wx = _resize_plan(w, out_w)
    rows = imgs.astype(np.float32)
    rows = rows[:, ylo] * (1.0 - wy)[None, :, None, None] + \
        rows[:, yhi] * wy[None, :, None, None]
    out = rows[:, :, xlo] * (1.0 - wx)[None, None, :, None] + \
        rows[:, :, xhi] * wx[None, None, :, None]
    np.rint(out, out=out)
    np.clip(out, 0, 255, out=out)
    return out.astype(np.uint8)


class ImageResize:
    """Actor-pool stage: decode -> bilinear resize to a fixed target ->
    re-encode.  Use as
    ``ds.map_batches(ImageResize(64, 64), concurrency=N, ...)``;
    per-(shape, format) resample plans are cached per actor."""

    def __init__(self, out_w: int, out_h: int, out_fmt: str = "png"):
        self.out_w = int(out_w)
        self.out_h = int(out_h)
        self.out_fmt = out_fmt
        self._plans: Dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = np.array(batch.column("fmt").to_pylist())
        w = batch.column("w").to_numpy()
        h = batch.column("h").to_numpy()
        out_blobs: list = [None] * len(blobs)
        shape_key = (w.astype(np.int64) << 16) | (h.astype(np.int64) << 2) \
            | np.where(fmts == "png", 0, 1)
        for key in np.unique(shape_key):
            sel = np.nonzero(shape_key == key)[0]
            group = [blobs[i] for i in sel]
            imgs = (codecs.lossy_decode_many(group) if key & 1
                    else codecs.png_decode_many(group))
            resized = resize_bilinear(imgs, self.out_h, self.out_w)
            enc = (codecs.png_encode_many(resized) if self.out_fmt == "png"
                   else codecs.lossy_encode_many(resized))
            for pos, blob in zip(sel, enc):
                out_blobs[pos] = blob
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("bytes", pa.array(out_blobs, pa.binary()))
        out = out.set_column(out.schema.get_field_index("w"), "w",
                             pa.array(np.full(len(blobs), self.out_w,
                                              np.int32), pa.int32()))
        return out.set_column(out.schema.get_field_index("h"), "h",
                              pa.array(np.full(len(blobs), self.out_h,
                                               np.int32), pa.int32()))


class JpegTranscoder:
    """Actor-pool stage: decode any supported payload (PNG, LJ92
    stand-in, or real baseline JPEG) and re-encode as REAL baseline
    JFIF/JPEG (sources/jpeg.py — pure numpy, externally decodable).
    Use as ``ds.map_batches(JpegTranscoder(quality=90), concurrency=N,
    batch_size=B)``.  The LJ92 stand-in stays the synthesis hot path;
    this is the interop boundary for exporting to real tools."""

    def __init__(self, quality: int = 90):
        self.quality = int(quality)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources import jpeg

        blobs = batch.column("bytes").to_pylist()
        fmts = np.array(batch.column("fmt").to_pylist())
        w = batch.column("w").to_numpy()
        h = batch.column("h").to_numpy()
        out_blobs: list = [None] * len(blobs)
        # shape-keyed groups (the ImageResize pattern): decode AND the
        # whole DCT/entropy encode stage run batched per (w, h, fmt)
        # group — no per-row Python codec loop.
        shape_key = (w.astype(np.int64) << 16) | (h.astype(np.int64) << 2) \
            | np.where(fmts == "png", 0, 1)
        for key in np.unique(shape_key):
            sel = np.nonzero(shape_key == key)[0]
            group = [blobs[i] for i in sel]
            if key & 1:
                # "jpeg" fmt: LJ92 stand-in (batch path) or real
                # baseline bytes (rare interop input, per-blob decode)
                lj = np.array([bytes(g[:4]) in (codecs._LJ_MAGIC,
                                                codecs._LJS_MAGIC)
                               for g in group])
                imgs = np.empty((len(group), int(h[sel[0]]),
                                 int(w[sel[0]]), 3), np.uint8)
                if lj.any():
                    imgs[lj] = codecs.lossy_decode_many(
                        [group[j] for j in np.nonzero(lj)[0]])
                for j in np.nonzero(~lj)[0]:
                    imgs[j] = jpeg.decode(bytes(group[j]))
            else:
                imgs = codecs.png_decode_many(group)
            enc = jpeg.encode_many(imgs, self.quality)
            for pos, blob in zip(sel, enc):
                out_blobs[pos] = blob
        keep = [c for c in batch.column_names if c not in ("bytes", "fmt")]
        out = batch.select(keep)
        out = out.append_column("bytes", pa.array(out_blobs, pa.binary()))
        return out.append_column(
            "fmt", pa.array(["jpeg"] * len(out_blobs), pa.string()))


# ---------------------------------------------------------------------------
# video: frame container + frame sampling
# ---------------------------------------------------------------------------

def encode_video(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 -> VID1 container: per-frame LJ92
    blobs with a length index (frames are seekable without decoding)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    blobs = codecs.lossy_encode_many(frames)
    head = _VID_MAGIC + struct.pack("<IHH", len(blobs), frames.shape[2],
                                    frames.shape[1])
    index = struct.pack(f"<{len(blobs)}I", *(len(b) for b in blobs))
    return head + index + b"".join(blobs)


def decode_video_frames(data: bytes,
                        frame_ids: Optional[np.ndarray] = None) -> np.ndarray:
    """VID1 bytes -> (k, h, w, 3) uint8 for the requested frame ids
    (all frames when None); only the requested blobs are decompressed."""
    data = bytes(data)
    if data[:4] != _VID_MAGIC:
        raise ValueError("not a VID1 container")
    n, w, h = struct.unpack_from("<IHH", data, 4)
    lens = np.frombuffer(data, dtype=np.uint32, count=n, offset=12)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    base = 12 + 4 * n
    ids = np.arange(n) if frame_ids is None else np.asarray(frame_ids)
    blobs = [data[base + starts[i]:base + starts[i + 1]] for i in ids]
    return codecs.lossy_decode_many(blobs)


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th frame of a VID1
    ``video`` column, reduce each sampled frame to mean RGB, and drop
    the wide payload — output is (video_id, frame_id, mean_r/g/b).
    Only the sampled frames are ever decompressed (the container is
    length-indexed), so cost scales with frames KEPT, not stored."""

    def __init__(self, stride: int = 4):
        self.stride = int(stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        datas = batch.column("video").to_pylist()
        out_vid, out_frame = [], []
        means = []
        for vid, data in zip(vids, datas):
            head = bytes(data[:8])
            n = struct.unpack_from("<I", head, 4)[0]
            ids = np.arange(0, n, self.stride)
            frames = decode_video_frames(data, ids)
            npx = frames.shape[1] * frames.shape[2]
            f32 = frames.reshape(len(ids), npx, 3).astype(np.float32)
            sums = np.matmul(np.ones((1, npx), np.float32), f32)[:, 0, :]
            means.append(sums.astype(np.float64) / npx)
            out_vid.extend([vid] * len(ids))
            out_frame.extend(int(i) for i in ids)
        m = (np.concatenate(means) if means
             else np.empty((0, 3), np.float64))
        return pa.table({
            "video_id": pa.array(out_vid, pa.string()),
            "frame_id": pa.array(out_frame, pa.int64()),
            "mean_r": pa.array(m[:, 0], pa.float64()),
            "mean_g": pa.array(m[:, 1], pa.float64()),
            "mean_b": pa.array(m[:, 2], pa.float64()),
        })


class SceneCutDetector:
    """Actor-pool stage: detect hard scene cuts in a VID1 ``video``
    column — consecutive-frame mean-intensity jumps above
    ``threshold`` — emitting one (video_id, cut_frame, jump) row per
    cut.  The shot-boundary pass every video curation pipeline runs
    before per-scene sampling/captioning.

    Scale shape: the container is row-local, so the batch axis is the
    actor-pool concurrency; per video the frame means come from one
    batched decode + one BLAS reduction, and only narrow cut rows
    leave the stage (pixels never shuffle)."""

    def __init__(self, threshold: float = 20.0):
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        out_v, out_f, out_j = [], [], []
        for vid, data in zip(vids, batch.column("video").to_pylist()):
            frames = decode_video_frames(data)
            npx = frames.shape[1] * frames.shape[2] * 3
            f32 = frames.reshape(len(frames), npx).astype(np.float32)
            m = (f32 @ np.ones((npx, 1), np.float32))[:, 0] / npx
            d = np.abs(np.diff(m.astype(np.float64)))
            cuts = np.flatnonzero(d > self.threshold) + 1
            out_v.extend([vid] * len(cuts))
            out_f.extend(int(c) for c in cuts)
            out_j.extend(float(d[c - 1]) for c in cuts)
        return pa.table({
            "video_id": pa.array(out_v, pa.string()),
            "cut_frame": pa.array(out_f, pa.int64()),
            "jump": pa.array(out_j, pa.float64()),
        })


class AudioVad:
    """Actor-pool stage: energy-threshold voice-activity detection
    over an AUD1 ``audio`` column — mean |PCM| per ``win``-sample
    window, threshold, run-length encode into (audio_id,
    seg_start_win, seg_end_win) activity segments (end exclusive).
    The segmentation pass that gates transcription / feature
    extraction in audio curation pipelines.

    Scale shape: same as SceneCutDetector — row-local decode, one
    vectorized reshape-reduce per clip, narrow segment rows out."""

    def __init__(self, win: int = 256, threshold: float = 500.0):
        self.win = int(win)
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        aids = batch.column("audio_id").to_pylist()
        out_a, out_s, out_e = [], [], []
        for aid, data in zip(aids, batch.column("audio").to_pylist()):
            _, pcm = decode_audio(bytes(data))
            nw = len(pcm) // self.win
            if nw == 0:
                continue
            e = np.abs(pcm[:nw * self.win].astype(np.float64)) \
                .reshape(nw, self.win).mean(axis=1)
            act = e > self.threshold
            edges = np.diff(act.astype(np.int8))
            starts = np.flatnonzero(edges == 1) + 1
            ends = np.flatnonzero(edges == -1) + 1
            if act[0]:
                starts = np.concatenate([[0], starts])
            if act[-1]:
                ends = np.concatenate([ends, [nw]])
            out_a.extend([aid] * len(starts))
            out_s.extend(int(s) for s in starts)
            out_e.extend(int(x) for x in ends)
        return pa.table({
            "audio_id": pa.array(out_a, pa.string()),
            "seg_start_win": pa.array(out_s, pa.int64()),
            "seg_end_win": pa.array(out_e, pa.int64()),
        })


# ---------------------------------------------------------------------------
# audio: PCM container + features
# ---------------------------------------------------------------------------

def encode_audio(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM -> AUD1 container (zlib level 1)."""
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, len(pcm)) + \
        zlib.compress(pcm, 1)


def decode_audio(data: bytes):
    """AUD1 bytes -> (sample_rate, int16 PCM).  Real compressed formats
    (mp3/ogg/flac) require an external decoder: soundfile is import-
    try'd; absent that, a clear NotImplementedError — the stage
    signature and schema don't change when a real decoder appears."""
    data = bytes(data)
    if data[:4] == _AUD_MAGIC:
        rate, n = struct.unpack_from("<II", data, 4)
        pcm = np.frombuffer(zlib.decompress(memoryview(data)[12:]),
                            dtype=np.int16)
        return rate, pcm[:n]
    try:  # pragma: no cover - not present in this container
        import io

        import soundfile  # type: ignore
        wav, rate = soundfile.read(io.BytesIO(data), dtype="int16")
        return rate, np.asarray(wav, dtype=np.int16).reshape(-1)
    except ImportError:
        raise NotImplementedError(
            "real audio decoding requires the soundfile package, which is "
            "not available in this container; synthetic tables use the "
            "AUD1 PCM container")


class AudioFeatures:
    """Actor-pool stage: decode an ``audio`` column and reduce to
    frame-level features — RMS, zero-crossing rate and FFT spectral
    centroid over fixed windows.  The Hann window is built once per
    actor; PCM never leaves the stage."""

    def __init__(self, frame_len: int = 512):
        self.frame_len = int(frame_len)
        self._window = np.hanning(self.frame_len).astype(np.float64)
        self._bins: Dict[int, np.ndarray] = {}

    def _freqs(self, rate: int) -> np.ndarray:
        f = self._bins.get(rate)
        if f is None:
            f = np.fft.rfftfreq(self.frame_len, d=1.0 / rate)
            self._bins[rate] = f
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("audio_id").to_pylist()
        datas = batch.column("audio").to_pylist()
        rows = {"audio_id": [], "frame_id": [], "rms": [], "zcr": [],
                "centroid_hz": []}
        L = self.frame_len
        for aid, data in zip(ids, datas):
            rate, pcm = decode_audio(data)
            n_frames = len(pcm) // L
            if n_frames == 0:
                continue
            fr = pcm[:n_frames * L].reshape(n_frames, L).astype(np.float64)
            fr /= 32768.0
            rms = np.sqrt(np.mean(fr * fr, axis=1))
            zcr = np.mean(np.abs(np.diff(np.signbit(fr), axis=1)), axis=1)
            spec = np.abs(np.fft.rfft(fr * self._window[None, :], axis=1))
            power = spec.sum(axis=1)
            freqs = self._freqs(rate)
            centroid = np.where(power > 0, (spec @ freqs) /
                                np.maximum(power, 1e-30), 0.0)
            rows["audio_id"].extend([aid] * n_frames)
            rows["frame_id"].extend(range(n_frames))
            rows["rms"].extend(rms)
            rows["zcr"].extend(zcr)
            rows["centroid_hz"].extend(centroid)
        return pa.table({
            "audio_id": pa.array(rows["audio_id"], pa.string()),
            "frame_id": pa.array(rows["frame_id"], pa.int64()),
            "rms": pa.array(rows["rms"], pa.float64()),
            "zcr": pa.array(rows["zcr"], pa.float64()),
            "centroid_hz": pa.array(rows["centroid_hz"], pa.float64()),
        })


# ---------------------------------------------------------------------------
# image content features + near-dup
# ---------------------------------------------------------------------------

FEATURE_COLS = ["f_luma", "f_gx", "f_gy", "f_rg", "f_gb", "f_sd"]


def content_features(imgs: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 -> (n, 6) float64 low-order content features:
    mean luma, luma slope per normalized x / y coordinate (least-squares
    fit against centered coords), mean r-g and g-b opponents, luma std.

    Resolution-independent by construction (normalized coordinates), so
    the same content re-encoded OR resized stays nearby, while this
    repo's synthetic corpus separates by >> codec noise (measured:
    lossy re-encode moves features <= 0.23 L-inf; nearest distinct
    images sit >= 3.8 apart at n=2000).  Bit-hash perceptual schemes
    (pHash/dHash) are unstable on smooth gradient imagery — the DCT
    low band is almost all zeros, so median thresholding amplifies
    codec noise (measured hamming ~19/64 on planted re-encodes); a
    float feature ball keeps the contrast explicit instead."""
    f = imgs.astype(np.float32)
    lum = (f[..., 0] * np.float32(0.299) + f[..., 1] * np.float32(0.587)
           + f[..., 2] * np.float32(0.114))
    n, h, w = lum.shape
    xs = np.linspace(-0.5, 0.5, w, dtype=np.float64)
    ys = np.linspace(-0.5, 0.5, h, dtype=np.float64)
    lum64 = lum.astype(np.float64)
    mean = lum64.mean(axis=(1, 2))
    gx = (lum64 * xs[None, None, :]).mean(axis=(1, 2)) / (xs ** 2).mean()
    gy = (lum64 * ys[None, :, None]).mean(axis=(1, 2)) / (ys ** 2).mean()
    rg = (f[..., 0].astype(np.float64)
          - f[..., 1].astype(np.float64)).mean(axis=(1, 2))
    gb = (f[..., 1].astype(np.float64)
          - f[..., 2].astype(np.float64)).mean(axis=(1, 2))
    sd = lum64.std(axis=(1, 2))
    return np.stack([mean, gx, gy, rg, gb, sd], axis=1)


def image_features(batch: pa.Table) -> pa.Table:
    """Decode stage: binary image column -> the 6 content features,
    dropping ``bytes`` so only narrow rows shuffle (same grouped-decode
    batching as stages/tiles.image_stats)."""
    blobs = batch.column("bytes").to_pylist()
    fmts = np.array(batch.column("fmt").to_pylist())
    w = batch.column("w").to_numpy()
    h = batch.column("h").to_numpy()
    n = len(batch)
    F = np.zeros((n, 6), dtype=np.float64)
    shape_key = (w.astype(np.int64) << 16) | (h.astype(np.int64) << 2) | \
        np.where(fmts == "png", 0, 1)
    for key in np.unique(shape_key):
        sel = np.nonzero(shape_key == key)[0]
        group = [blobs[i] for i in sel]
        imgs = (codecs.lossy_decode_many(group) if key & 1
                else codecs.png_decode_many(group))
        F[sel] = content_features(imgs)
    out = batch.select(["image_id"])
    for j, c in enumerate(FEATURE_COLS):
        out = out.append_column(c, pa.array(F[:, j], pa.float64()))
    return out


def reencode_variants(batch: pa.Table, every: int = 10,
                      suffix: str = "~v") -> pa.Table:
    """Near-dup planting stage for tests/benchmarks: for every
    ``every``-th row (by the numeric tail of image_id), append a
    variant row whose pixels went through one lossy re-encode — the
    realistic 'same photo, different compression' duplicate.  The
    variant id sorts AFTER the original (suffix '~' > digits)."""
    ids = batch.column("image_id").to_pylist()
    idx = np.array([int(s[3:]) for s in ids], dtype=np.int64)
    take = np.nonzero(idx % every == 0)[0]
    if not len(take):
        return batch
    blobs = batch.column("bytes").to_pylist()
    fmts = np.array(batch.column("fmt").to_pylist())
    w = batch.column("w").to_numpy()
    h = batch.column("h").to_numpy()
    var_rows = {c: [] for c in batch.column_names}
    shape_key = (w.astype(np.int64) << 16) | (h.astype(np.int64) << 2) | \
        np.where(fmts == "png", 0, 1)
    for key in np.unique(shape_key[take]):
        sel = take[shape_key[take] == key]
        group = [blobs[i] for i in sel]
        imgs = (codecs.lossy_decode_many(group) if key & 1
                else codecs.png_decode_many(group))
        re_enc = codecs.lossy_encode_many(imgs)
        for pos, blob in zip(sel, re_enc):
            for c in batch.column_names:
                if c == "image_id":
                    var_rows[c].append(ids[pos] + suffix)
                elif c == "bytes":
                    var_rows[c].append(blob)
                elif c == "fmt":
                    var_rows[c].append("jpeg")
                else:
                    var_rows[c].append(batch.column(c)[pos].as_py())
    var = pa.table({c: pa.array(var_rows[c], batch.schema.field(c).type)
                    for c in batch.column_names})
    return pa.concat_tables([batch, var])


def image_neardup(images_ds, eps: float = 1.0):
    """Exact feature-space near-dup pairs over an image table:
    decode -> content features (bytes dropped at the source) -> exact
    L-inf epsilon-ball self-join (stages/ball_join.py) indexed on the
    (luma, gx, gy) dims.  Returns (id_a, id_b, linf)."""
    from .ball_join import linf_ball_self_join

    feats = images_ds.map_batches(image_features, batch_format="pyarrow")
    return linf_ball_self_join(feats, FEATURE_COLS, eps,
                               id_col="image_id",
                               index_cols=FEATURE_COLS[:3])

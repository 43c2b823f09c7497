"""Multimodal media stages: resize / frame sampling / audio features
as actor-pool map_batches stages over binary columns."""

import numpy as np
import pyarrow as pa
import pytest

from geo_ray.sources import codecs
from geo_ray.sources.images import images_table
from geo_ray.stages.media import (AudioFeatures, FrameSampler, ImageResize,
                                  decode_audio, decode_video_frames,
                                  encode_audio, encode_video,
                                  resize_bilinear)


def test_resize_bilinear_identity_and_constant():
    img = np.random.default_rng(0).integers(0, 256, (2, 16, 16, 3),
                                            dtype=np.uint8)
    # same-size resize is the identity (sample positions hit centers)
    assert (resize_bilinear(img, 16, 16) == img).all()
    # resizing a constant image is constant
    flat = np.full((1, 8, 12, 3), 77, np.uint8)
    assert (resize_bilinear(flat, 32, 5) == 77).all()


def test_resize_downsample_matches_box_structure():
    # a horizontal step edge stays a step edge after 2x downsample
    img = np.zeros((1, 8, 8, 3), np.uint8)
    img[:, :, 4:] = 200
    out = resize_bilinear(img, 4, 4)
    assert (out[0, :, :2] == 0).all()
    assert (out[0, :, 2:] == 200).all()


def test_image_resize_stage(ray_session):
    import ray.data as rd

    tbl = images_table(64)
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(ImageResize(24, 24), batch_format="pyarrow",
                         concurrency=2, batch_size=32)
    res = out.take_all()
    assert len(res) == 64
    for row in res[:8]:
        assert row["w"] == 24 and row["h"] == 24
        dec = codecs.decode(row["bytes"], "png")
        assert dec.shape == (24, 24, 3)
    # determinism: running again gives identical blobs
    res2 = ds.map_batches(ImageResize(24, 24), batch_format="pyarrow",
                          concurrency=2, batch_size=32).take_all()
    a = {r["image_id"]: r["bytes"] for r in res}
    b = {r["image_id"]: r["bytes"] for r in res2}
    assert a == b


def _videos(n, frames=9, h=16, w=16):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(n):
        f = rng.integers(0, 256, (frames, h, w, 3), dtype=np.uint8)
        rows.append((f"vid{i:04d}", f, encode_video(f)))
    return rows


def test_video_container_roundtrip():
    _, frames, blob = _videos(1)[0]
    dec = decode_video_frames(blob)
    assert dec.shape == frames.shape
    assert codecs.psnr(dec, frames) >= 40.0
    sel = decode_video_frames(blob, np.array([0, 4, 8]))
    assert (sel == dec[[0, 4, 8]]).all()


def test_frame_sampler_stage(ray_session):
    import ray.data as rd

    rows = _videos(6)
    tbl = pa.table({
        "video_id": pa.array([r[0] for r in rows]),
        "video": pa.array([r[2] for r in rows], pa.binary()),
    })
    out = rd.from_arrow(tbl).map_batches(
        FrameSampler(stride=4), batch_format="pyarrow",
        concurrency=2, batch_size=3).take_all()
    # 9 frames, stride 4 -> frames 0, 4, 8
    assert len(out) == 6 * 3
    got = {(r["video_id"], r["frame_id"]) for r in out}
    assert ("vid0000", 4) in got and ("vid0005", 8) in got
    # mean values match a direct decode of the sampled frame
    by_key = {(r["video_id"], r["frame_id"]): r for r in out}
    for vid, frames, blob in rows[:2]:
        dec = decode_video_frames(blob, np.array([0]))[0]
        want = dec.reshape(-1, 3).mean(axis=0)
        row = by_key[(vid, 0)]
        assert np.allclose([row["mean_r"], row["mean_g"], row["mean_b"]],
                           want)


def test_audio_container_and_features(ray_session):
    import ray.data as rd

    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    tone = (np.sin(2 * np.pi * 440.0 * t) * 20000).astype(np.int16)
    silence = np.zeros(rate, dtype=np.int16)
    blob_tone = encode_audio(tone, rate)
    blob_sil = encode_audio(silence, rate)
    r, pcm = decode_audio(blob_tone)
    assert r == rate and (pcm == tone).all()

    tbl = pa.table({
        "audio_id": pa.array(["tone", "silence"]),
        "audio": pa.array([blob_tone, blob_sil], pa.binary()),
    })
    out = rd.from_arrow(tbl).map_batches(
        AudioFeatures(frame_len=512), batch_format="pyarrow",
        concurrency=2).take_all()
    tone_rows = [x for x in out if x["audio_id"] == "tone"]
    sil_rows = [x for x in out if x["audio_id"] == "silence"]
    assert len(tone_rows) == rate // 512 and len(sil_rows) == rate // 512
    # a 440 Hz tone: centroid near 440, strong RMS; silence: zero RMS
    cents = np.array([x["centroid_hz"] for x in tone_rows])
    assert np.abs(np.median(cents) - 440.0) < 60.0
    assert all(x["rms"] > 0.3 for x in tone_rows)
    assert all(x["rms"] == 0.0 for x in sil_rows)


def test_audio_real_format_raises_cleanly():
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfbnot-a-real-container" + b"\x00" * 64)


def test_scene_cut_detector_cases(ray_session):
    """No-cut, one-cut and two-cut videos; cut indices exact."""
    import ray.data as rd

    from geo_ray.stages.media import SceneCutDetector, encode_video

    def vid(vals):
        v = np.asarray(vals, np.uint8)
        return encode_video(np.ascontiguousarray(np.broadcast_to(
            v[:, None, None, None], (len(v), 16, 16, 3))))

    tbl = pa.table({
        "video_id": pa.array(["flat", "one", "two"]),
        "video": pa.array([
            vid([100] * 5),
            vid([50, 50, 150, 150]),
            vid([40, 40, 120, 120, 40, 40]),
        ], pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        SceneCutDetector(threshold=20.0), batch_format="pyarrow",
        concurrency=1, batch_size=4).to_pandas()
    got = {vid_: sorted(g["cut_frame"].tolist())
           for vid_, g in out.groupby("video_id")}
    assert "flat" not in got
    assert got["one"] == [2]
    assert got["two"] == [2, 4]


def test_audio_vad_boundary_cases(ray_session):
    """Segments touching the clip start/end and multiple segments."""
    import ray.data as rd

    from geo_ray.stages.media import AudioVad, encode_audio

    WIN = 64

    def clip(active_windows, nw=10):
        pcm = np.zeros(nw * WIN, np.int16)
        for wdx in active_windows:
            pcm[wdx * WIN:(wdx + 1) * WIN] = 2000
        return encode_audio(pcm, 16000)

    tbl = pa.table({
        "audio_id": pa.array(["startend", "multi", "silent"]),
        "audio": pa.array([
            clip([0, 1, 8, 9]),
            clip([2, 3, 6]),
            clip([]),
        ], pa.binary())})
    out = rd.from_arrow(tbl).map_batches(
        AudioVad(win=WIN, threshold=500.0), batch_format="pyarrow",
        concurrency=1, batch_size=4).to_pandas()
    segs = {aid: sorted(zip(g["seg_start_win"], g["seg_end_win"]))
            for aid, g in out.groupby("audio_id")}
    assert segs["startend"] == [(0, 2), (8, 10)]
    assert segs["multi"] == [(2, 4), (6, 7)]
    assert "silent" not in segs

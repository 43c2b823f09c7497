"""Real baseline JPEG codec (sources/jpeg.py): round-trip quality,
marker structure, golden bytes, hand-built 4:2:0 + grayscale decode,
restart markers, the transcode stage, and a PIL cross-check when PIL
is present."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from geo_ray.sources import codecs, jpeg
from geo_ray.sources.images import _pixels_for_rows

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
RNG = np.random.default_rng(4242)


def _structured(n=1, w=48, h=32):
    return _pixels_for_rows(
        np.arange(n, dtype=np.int64) * 977 + 31337, w, h)


def test_roundtrip_psnr_structured():
    for img in _structured(3):
        for q in (75, 90, 95):
            out = jpeg.decode(jpeg.encode(img, q))
            assert out.shape == img.shape
            assert codecs.psnr(img, out) >= 40.0, q


def test_roundtrip_gradient_exactish():
    # smooth content at q95 should be near-lossless
    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack([xx * 4, yy * 4, (xx + yy) * 2], axis=-1).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(img, 95))
    assert codecs.psnr(img, out) >= 45.0


def test_non_multiple_of_8_and_tiny():
    for shape in ((5, 3), (17, 9), (8, 1), (1, 8)):
        img = RNG.integers(0, 256, (*shape, 3), dtype=np.uint8)
        out = jpeg.decode(jpeg.encode(img, 95))
        assert out.shape == img.shape


def test_marker_structure():
    b = jpeg.encode(_structured()[0], 90)
    assert b[:2] == b"\xFF\xD8" and b[-2:] == b"\xFF\xD9"
    assert b[2:4] == b"\xFF\xE0" and b[6:11] == b"JFIF\x00"
    # walk all segments up to SOS; expect 2 DQT, 4 DHT, 1 SOF0
    pos, counts = 2, {}
    while pos < len(b):
        assert b[pos] == 0xFF
        m = b[pos + 1]
        counts[m] = counts.get(m, 0) + 1
        if m == 0xDA:
            break
        (ln,) = struct.unpack(">H", b[pos + 2:pos + 4])
        pos += 2 + ln
    assert counts.get(0xDB) == 2 and counts.get(0xC4) == 4
    assert counts.get(0xC0) == 1 and counts.get(0xDA) == 1


def test_deterministic_and_golden():
    img = _pixels_for_rows(np.array([424242], dtype=np.int64), 40, 24)[0]
    b = jpeg.encode(img, 90)
    assert b == jpeg.encode(img, 90)
    with open(os.path.join(GOLDEN, "jpeg_q90.bin"), "rb") as f:
        assert b == f.read()
    want = np.load(os.path.join(GOLDEN, "jpeg_q90_decoded.npy"))
    np.testing.assert_array_equal(jpeg.decode(b), want)
    assert codecs.psnr(img, want) >= 40.0


def test_codecs_dispatch_real_jpeg():
    img = _structured()[0]
    out = codecs.decode(jpeg.encode(img, 90), "jpeg")
    assert codecs.psnr(img, out) >= 40.0


def _minimal_stream(blocks_per_mcu, n_mcus, restart_interval=0):
    """Entropy stream of all-zero-diff DC + EOB blocks (solid gray)."""
    bw = jpeg._BitWriter()
    for m in range(n_mcus):
        for tsel in blocks_per_mcu:
            c, l = jpeg._ENC_DC[tsel][0]
            bw.write(c, l)
            c, l = jpeg._ENC_AC[tsel][0x00]
            bw.write(c, l)
        if restart_interval and m + 1 < n_mcus and \
                (m + 1) % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (m // restart_interval) % 8])
    bw.flush()
    return bytes(bw.buf)


def _dqt(tid, table):
    zz = table.reshape(-1)[jpeg.ZIGZAG].astype(np.uint8).tobytes()
    return b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) + zz


def _dht_all():
    out = b""
    for (tc, th, bits, vals) in (
            (0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS),
            (1, 0, jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS),
            (0, 1, jpeg.DC_CHROMA_BITS, jpeg.DC_CHROMA_VALS),
            (1, 1, jpeg.AC_CHROMA_BITS, jpeg.AC_CHROMA_VALS)):
        body = bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    return out


def test_decode_handbuilt_420():
    """A hand-assembled 16x16 solid-gray 4:2:0 file (4 Y blocks + 1 Cb
    + 1 Cr per MCU) exercises the decoder's subsampling/upsample path
    our own encoder never emits."""
    q = jpeg._quality_scale(jpeg.QUANT_LUMA, 90)
    head = (b"\xFF\xD8" + _dqt(0, q) + _dqt(1, q)
            + b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, 16, 16, 3)
            + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
            + _dht_all()
            + b"\xFF\xDA" + struct.pack(">HB", 12, 3)
            + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]))
    stream = _minimal_stream([0, 0, 0, 0, 1, 1], 1)
    img = jpeg.decode(head + stream + b"\xFF\xD9")
    assert img.shape == (16, 16, 3)
    # zero DC for all components -> Y=128, Cb=Cr=128 -> mid gray
    assert np.all(img == 128)


def test_decode_handbuilt_grayscale():
    q = jpeg._quality_scale(jpeg.QUANT_LUMA, 90)
    head = (b"\xFF\xD8" + _dqt(0, q)
            + b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
            + bytes([1, 0x11, 0])
            + _dht_all()
            + b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00]) + bytes([0, 63, 0]))
    stream = _minimal_stream([0], 1)
    img = jpeg.decode(head + stream + b"\xFF\xD9")
    assert img.shape == (8, 8, 3)
    assert np.all(img == 128)


def test_decode_restart_markers():
    """2 MCUs of 8x8 blocks with DRI=1: an RST0 between them and DC
    predictor reset."""
    q = jpeg._quality_scale(jpeg.QUANT_LUMA, 90)
    head = (b"\xFF\xD8" + _dqt(0, q)
            + b"\xFF\xDD" + struct.pack(">HH", 4, 1)
            + b"\xFF\xC0" + struct.pack(">HBHHB", 11, 8, 8, 16, 1)
            + bytes([1, 0x11, 0])
            + _dht_all()
            + b"\xFF\xDA" + struct.pack(">HB", 8, 1)
            + bytes([1, 0x00]) + bytes([0, 63, 0]))
    stream = _minimal_stream([0], 2, restart_interval=1)
    img = jpeg.decode(head + stream + b"\xFF\xD9")
    assert img.shape == (8, 16, 3)
    assert np.all(img == 128)


def test_transcode_stage(ray_session):
    import ray.data as rd

    from geo_ray.sources.images import images_table
    from geo_ray.stages.media import JpegTranscoder

    tbl = images_table(24)  # mixed png/LJ92 rows
    ds = rd.from_arrow(tbl).map_batches(
        JpegTranscoder(quality=90), batch_format="pyarrow",
        batch_size=8, concurrency=2)
    out = ds.to_pandas()
    assert (out["fmt"] == "jpeg").all()
    src = {r["image_id"]: (r["bytes"], r["fmt"])
           for r in tbl.to_pylist()}
    for _, row in out.iterrows():
        blob = row["bytes"]
        assert bytes(blob[:2]) == b"\xFF\xD8"
        orig = codecs.decode(*src[row["image_id"]])
        dec = jpeg.decode(blob)
        assert dec.shape == orig.shape
        assert codecs.psnr(orig, dec) >= 38.0


@pytest.mark.skipif(not codecs._HAVE_PIL, reason="PIL not available")
def test_pil_cross_check():  # pragma: no cover - exercised where PIL exists
    import io

    import PIL.Image

    img = _structured()[0]
    b = jpeg.encode(img, 90)
    pil_dec = np.asarray(PIL.Image.open(io.BytesIO(b)).convert("RGB"))
    assert codecs.psnr(img, pil_dec) >= 40.0
    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(buf, format="JPEG", quality=90)
    ours = jpeg.decode(buf.getvalue())
    assert codecs.psnr(img, ours) >= 35.0


def test_fused_i16_encode_bit_identical():
    """lossy_encode_many_i16 (fused synthesis path) must emit byte-
    identical blobs to the uint8 path for every shape the synthesizer
    produces and for adversarial clip-boundary content."""
    import numpy as np
    from geo_ray.sources import codecs
    from geo_ray.sources.images import (_pixels_for_rows,
                                        _pixels_for_rows_i16,
                                        phash_for_index)

    ph = phash_for_index(np.arange(64, dtype=np.int64))
    for (w, h) in ((16, 16), (32, 48), (64, 64), (21, 13)):
        u8 = _pixels_for_rows(ph, w, h)
        i16 = _pixels_for_rows_i16(ph, w, h)
        assert codecs.lossy_encode_many(u8) == codecs.lossy_encode_many_i16(i16)
    rng = np.random.default_rng(5)
    extreme = rng.integers(0, 256, (8, 24, 24, 3)).astype(np.int16)
    extreme[0] = 0
    extreme[1] = 255
    assert codecs.lossy_encode_many(extreme.astype(np.uint8)) == \
        codecs.lossy_encode_many_i16(extreme)


def test_encode_many_byte_identical_to_encode():
    """The batched encoder must reproduce encode() byte-for-byte:
    same DCT, DC differencing, run-lengths, ZRL/EOB placement, bit
    padding and byte stuffing — across shapes (incl. non-multiples of
    8), qualities, flat/sparse content, and a 1-image batch."""
    rng = np.random.default_rng(11)
    for shape, q in [((5, 8, 8, 3), 90), ((6, 10, 13, 3), 90),
                     ((3, 33, 47, 3), 50), ((1, 24, 24, 3), 75)]:
        imgs = rng.integers(0, 256, size=shape, dtype=np.uint8)
        imgs[0] = 128                       # flat: all-EOB blocks
        if shape[0] > 2:
            imgs[1] = 0
            imgs[1, shape[1] // 2, shape[2] // 2] = 255   # ZRL-heavy
        ref = [jpeg.encode(im, q) for im in imgs]
        got = jpeg.encode_many(imgs, q)
        assert len(ref) == len(got)
        for r, g in zip(ref, got):
            assert r == g

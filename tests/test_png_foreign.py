"""Foreign-encoder PNG fixtures: the repo's encoder always emits
filter 0 / RGB / one IDAT, so the generic branches of ``png_decode``
(filters 1-4, RGBA, grayscale, split IDAT) never see our own output.
This test is an independent second implementation of the PNG spec's
scanline filters (RFC 2083 §6) used FORWARD — what a real external
encoder would produce — so decode is checked against an encoder that
shares no code with it.  When PIL is present (not in this container),
a cross-check against a genuinely third-party codec also runs."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geo_ray.sources import codecs

RNG = np.random.default_rng(77)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(f, cur, prev, bpp):
    """Forward filter per the spec (encoder side)."""
    out = np.empty_like(cur)
    for x in range(len(cur)):
        a = int(cur[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[x] = (int(cur[x]) - pred) & 0xFF
    return out


def _encode_foreign(img: np.ndarray, color_type: int, row_filters,
                    idat_pieces: int = 1) -> bytes:
    """Minimal spec-conformant encoder with arbitrary per-row filters,
    color type 0 (gray) / 2 (RGB) / 6 (RGBA), optional IDAT split."""
    h, w = img.shape[:2]
    nch = {0: 1, 2: 3, 6: 4}[color_type]
    flat = img.reshape(h, w * nch).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        raw.append(f)
        raw.extend(_filter_row(f, flat[y], prev, nch).tobytes())
        prev = flat[y]
    comp = zlib.compress(bytes(raw), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body +
                struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    step = max(1, len(comp) // idat_pieces)
    for i in range(0, len(comp), step):
        out += chunk(b"IDAT", comp[i:i + step])
    return out + chunk(b"IEND", b"")


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_single_filter_rgb(f):
    img = RNG.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    got = codecs.png_decode(_encode_foreign(img, 2, [f]))
    np.testing.assert_array_equal(got, img)


def test_mixed_filters_rgb():
    img = RNG.integers(0, 256, (23, 17, 3), dtype=np.uint8)
    got = codecs.png_decode(_encode_foreign(img, 2, [4, 1, 3, 2, 0]))
    np.testing.assert_array_equal(got, img)


def test_rgba_drops_alpha():
    img = RNG.integers(0, 256, (8, 11, 4), dtype=np.uint8)
    got = codecs.png_decode(_encode_foreign(img, 6, [4, 2, 1]))
    np.testing.assert_array_equal(got, img[:, :, :3])


def test_grayscale_replicates_channels():
    img = RNG.integers(0, 256, (10, 7), dtype=np.uint8)
    got = codecs.png_decode(_encode_foreign(img[..., None], 0, [1, 3]))
    np.testing.assert_array_equal(got, np.repeat(img[..., None], 3, axis=2))


def test_split_idat():
    img = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    got = codecs.png_decode(_encode_foreign(img, 2, [2], idat_pieces=5))
    np.testing.assert_array_equal(got, img)


def test_gradient_worst_case_paeth():
    """Smooth gradients are where Paeth/Avg predictions interact most;
    use synthesis-like content rather than noise."""
    yy, xx = np.mgrid[0:24, 0:24]
    img = np.stack([(xx * 7) % 256, (yy * 11) % 256, (xx + yy) % 256],
                   axis=2).astype(np.uint8)
    for f in (3, 4):
        got = codecs.png_decode(_encode_foreign(img, 2, [f]))
        np.testing.assert_array_equal(got, img)


@pytest.mark.skipif(not getattr(codecs, "_HAVE_PIL", False),
                    reason="PIL not installed in this container")
def test_pil_cross_check():
    import io

    import PIL.Image

    img = RNG.integers(0, 256, (20, 14, 3), dtype=np.uint8)
    buf = io.BytesIO()
    PIL.Image.fromarray(img).save(buf, format="PNG")
    np.testing.assert_array_equal(codecs.png_decode(buf.getvalue()), img)
    # and PIL must read our encoder's output
    ours = codecs.png_encode(img)
    back = np.asarray(PIL.Image.open(io.BytesIO(ours)).convert("RGB"))
    np.testing.assert_array_equal(back, img)

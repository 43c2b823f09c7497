"""Image codecs with no third-party image libraries.

The container has no PIL/libjpeg, so:

* ``png``: a real, spec-conformant PNG encoder/decoder for 8-bit RGB
  (zlib + CRC32 from the stdlib, filter type 0 on encode, filters 0-4
  understood on decode).  Lossless.
* ``jpeg``: a deterministic JPEG-STAND-IN — 8x8 blockwise DCT,
  luma-style quantization at quality ~90, zlib entropy stage.  It is
  lossy with PSNR comfortably above 40 dB (the driver's per-row
  invariant), deterministic bit-for-bit, and exercises the same
  Ray-side plumbing (binary column in, decode in an actor pool,
  numpy pixels out).  The synthesis hot path writes this format
  (magic ``LJ93`` sparse coefficient container for the usual ~96%-zero
  planes, zlib ``LJ92`` for dense content — both ~10x cheaper than
  real Huffman coding, decode dispatches per blob); REAL
  baseline JFIF/JPEG bytes (0xFFD8) are routed to the pure-numpy
  spec-conformant codec in ``sources/jpeg.py`` — no PIL required
  (the import-try below only gates an optional cross-check test).

Both codecs are pure numpy and run vectorized per image; batches of
images are handled by the actor-pool stage in stages/tiles.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    import PIL.Image  # type: ignore
    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_LJ_MAGIC = b"LJ92"
_LJS_MAGIC = b"LJ93"   # sparse (index, value) coefficient container


# ---------------------------------------------------------------------------
# PNG (lossless)
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


# zlib level 1: at level 6 the deflate stage dominated the whole
# synthesis+decode pipeline's CPU AND its memory traffic (the 32-core
# scaling ceiling); level 1 is ~4x cheaper to compress, slightly
# cheaper to decompress, and costs ~25% larger blobs on this content.
_ZLEVEL = 1


def png_encode(img: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) -> PNG bytes (filter 0, fixed zlib level)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw, _ZLEVEL)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) +
            _chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8.  Supports 8-bit RGB/RGBA, filters 0-4."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos = 8
    width = height = None
    bit_depth = color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    assert bit_depth == 8, "only 8-bit supported"
    nch = {2: 3, 6: 4, 0: 1}[color_type]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = width * nch
    raw = raw.reshape(height, 1 + stride)
    filters = raw[:, 0]
    if not filters.any():  # filter-0 fast path (our encoder's output)
        img = raw[:, 1:].reshape(height, width, nch)
        if nch == 4:
            img = img[:, :, :3]
        elif nch == 1:
            img = np.repeat(img, 3, axis=2)
        return np.ascontiguousarray(img)
    lines = raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = filters[y]
        cur = lines[y].copy()
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - nch] if x >= nch else 0
                b = prev[x]
                cc = prev[x - nch] if x >= nch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (cur[x] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, nch)
    if nch == 4:
        img = img[:, :, :3]
    elif nch == 1:
        img = np.repeat(img, 3, axis=2)
    return img


# ---------------------------------------------------------------------------
# Deterministic lossy codec ("jpeg" stand-in)
# ---------------------------------------------------------------------------

_Q90 = np.maximum(1.0, np.round(0.5 * np.array([
    # standard JPEG luminance table scaled to ~quality 95 so the
    # per-row PSNR >= 40 dB invariant holds even for noisy content
    [3, 2, 2, 3, 5, 8, 10, 12],
    [2, 2, 3, 4, 5, 12, 12, 11],
    [3, 3, 3, 5, 8, 11, 14, 11],
    [3, 3, 4, 6, 10, 17, 16, 12],
    [4, 4, 7, 11, 14, 22, 21, 15],
    [5, 7, 11, 13, 16, 21, 23, 18],
    [10, 13, 16, 17, 21, 24, 24, 20],
    [14, 18, 19, 20, 22, 20, 21, 20]], dtype=np.float64)))

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_DCT *= np.sqrt(2.0 / 8)
_DCT[0] /= np.sqrt(2.0)
_DCT32 = _DCT.astype(np.float32)
_INV_Q90 = (1.0 / _Q90).astype(np.float32)
_Q90F = _Q90.astype(np.float32)
# 2-D DCT as ONE (N,64)@(64,64) sgemm via the Kronecker identity
# vec(D B D^T) = (D (x) D) vec(B) for row-major vec: the stacked
# (N,8,8)@(8,8) matmul dispatches ~N tiny GEMMs and measured ~11x
# slower than the single wide GEMM on the same blocks.  (Accumulation
# order changes: quantized coefficients can differ by one step on
# ~0.05% of blocks vs the stacked form — within the codec's PSNR
# contract; outputs remain deterministic for a given BLAS build.)
_K32 = np.kron(_DCT32, _DCT32)


def _blockify(img: np.ndarray):
    h, w, c = img.shape
    ph, pw = -h % 8, -w % 8
    img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = img.shape[:2]
    blocks = img.reshape(H // 8, 8, W // 8, 8, c).transpose(0, 2, 4, 1, 3)
    return blocks.reshape(-1, 8, 8), H, W


def _blockify_many(imgs: np.ndarray):
    """(n,h,w,3) -> (n*nb, 8, 8) blocks; one numpy pass for the batch."""
    n, h, w, c = imgs.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:  # np.pad copies even when the pad widths are all zero
        imgs = np.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = imgs.shape[1:3]
    blocks = imgs.reshape(n, H // 8, 8, W // 8, 8, c).transpose(0, 1, 3, 5, 2, 4)
    return blocks.reshape(-1, 8, 8), H, W


def lossy_encode(img: np.ndarray) -> bytes:
    """Deterministic DCT-quantization codec at ~q95 (single image;
    delegates to the batch path so outputs are bit-identical)."""
    return lossy_encode_many(np.asarray(img, dtype=np.uint8)[None, ...])[0]


def lossy_encode_many(imgs: np.ndarray) -> list:
    """Batch encode of same-shaped images: batched BLAS matmuls for the
    whole batch (per-image numpy-call overhead dominated the per-row
    cost)."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    # blockify on uint8 (1 byte/px gather), upcast after: 4x less
    # transpose traffic than blockifying the float32 copy.
    blocks_u8, H, W = _blockify_many(imgs)
    blocks = blocks_u8.astype(np.float32)
    return _lossy_finish(blocks, n, h, w, c, H, W)


def lossy_encode_many_i16(imgs_i16: np.ndarray) -> list:
    """Fused-synthesis variant: same bytes as ``lossy_encode_many``
    for int16 pixel values already clipped to [0, 255], skipping the
    uint8 round-trip (one full write+read pass of the pixel volume)
    that a separate synthesize-then-encode pipeline pays."""
    n, h, w, c = imgs_i16.shape
    blocks_i16, H, W = _blockify_many(imgs_i16)
    blocks = blocks_i16.astype(np.float32)
    return _lossy_finish(blocks, n, h, w, c, H, W)


def _lossy_finish(blocks: np.ndarray, n, h, w, c, H, W) -> list:
    nb = blocks.shape[0]
    coefs = (blocks.reshape(nb, 64) @ _K32.T).reshape(nb, 8, 8)
    # level shift folded into the DC coefficient: DCT2(128*ones) is
    # 1024 at [0,0] and 0 elsewhere, so subtracting here replaces a
    # full read-modify-write pass over the pixel blocks.
    coefs[:, 0, 0] -= np.float32(1024.0)
    coefs *= _INV_Q90
    np.rint(coefs, out=coefs)
    q = coefs.astype(np.int16)
    per = np.ascontiguousarray(q.reshape(n, -1))
    P = per.shape[1]
    nz_mask = per != 0
    counts = nz_mask.sum(axis=1).astype(np.int64)
    # Sparse container where it wins: the q90-quantized planes of
    # natural/synthetic content are ~96% zeros, so (uint16 index,
    # int16 value) pairs beat deflate on BOTH size and speed — encode
    # is one batched np.nonzero + two tobytes slices per image (~5x
    # cheaper than zlib level 1, which was the single hottest line of
    # the synthesis stage), decode is a zeros + scatter.  Dense
    # planes (noise) and planes too large for uint16 indices keep the
    # zlib container; decode dispatches on the magic.  Bit-identical
    # decoded pixels either way: the int16 coefficient planes are
    # unchanged, only the container differs.
    if P > 0xFFFF or int(counts.sum()) * 4 > n * P:
        header = _LJ_MAGIC + struct.pack(">HHHHB", h, w, H, W, c)
        return [header + zlib.compress(per[i], _ZLEVEL)
                for i in range(n)]
    rows, cols = np.nonzero(nz_mask)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    idx = cols.astype("<u2")
    vals = per[rows, cols].astype("<i2")
    header = _LJS_MAGIC + struct.pack(">HHHHB", h, w, H, W, c)
    return [header + struct.pack("<I", int(counts[i]))
            + idx[offs[i]:offs[i + 1]].tobytes()
            + vals[offs[i]:offs[i + 1]].tobytes()
            for i in range(n)]


def png_encode_many(imgs: np.ndarray, level: int = _ZLEVEL) -> list:
    """Batch PNG encode of same-shaped images (zlib per image; the
    scanline/filter assembly is one vectorized pass).  ``level`` is
    the deflate level — every level yields a spec-valid PNG; the
    synthesis hot path passes 0 (stored blocks: ~2.5x cheaper to
    write, inflate becomes a memcpy) while interop outputs keep the
    compressing default."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((n, h, 1 + w * 3), dtype=np.uint8)
    raw[:, :, 1:] = imgs.reshape(n, h, w * 3)
    head = _PNG_SIG + _chunk(b"IHDR", ihdr)
    tail = _chunk(b"IEND", b"")
    return [head + _chunk(b"IDAT", zlib.compress(raw[i], level)) + tail
            for i in range(n)]


def lossy_decode_many(datas: list) -> np.ndarray:
    """Batch decode of same-shaped LJ92 (zlib) and/or LJ93 (sparse)
    payloads -> (n,h,w,3); the two containers may be mixed within one
    batch (the encoder picks per source batch by density)."""
    first = bytes(datas[0][:13])
    assert first[:4] in (_LJ_MAGIC, _LJS_MAGIC)
    h, w, H, W, c = struct.unpack(">HHHHB", first[4:13])
    per_img = (H // 8) * (W // 8) * c * 64
    qi = np.zeros((len(datas), per_img), dtype=np.int16)
    for i, d in enumerate(datas):
        d = bytes(d)
        if d[:4] == _LJS_MAGIC:
            nnz = struct.unpack_from("<I", d, 13)[0]
            idx = np.frombuffer(d, dtype="<u2", count=nnz, offset=17)
            qi[i, idx] = np.frombuffer(d, dtype="<i2", count=nnz,
                                       offset=17 + 2 * nnz)
        else:
            qi[i] = np.frombuffer(zlib.decompress(memoryview(d)[13:]),
                                  dtype=np.int16)
    return _lossy_pixels(qi, len(datas), h, w, H, W, c)


def _lossy_pixels(qi: np.ndarray, n, h, w, H, W, c) -> np.ndarray:
    """Shared decode tail: (n, P) int16 coefficient planes ->
    (n, h, w, c) uint8 pixels."""
    q = qi.reshape(-1, 8, 8).astype(np.float32)
    q *= _Q90F
    # inverse of the encoder's DC fold: +1024 at [0,0] IDCTs to +128
    # at every pixel, for the cost of touching one value per block.
    q[:, 0, 0] += np.float32(1024.0)
    # vec(D^T C D) = (D (x) D)^T vec(C): same single-GEMM form as the
    # encoder (the stacked per-block matmul was the decode hot spot)
    nb = q.shape[0]
    blocks = (q.reshape(nb, 64) @ _K32).reshape(nb, 8, 8)
    # finish the pixel math in block layout (contiguous, in place) and
    # let the single uint8 astype do the de-blockify gather: one 1-byte
    # pass instead of a float32 ascontiguousarray + three more passes.
    np.rint(blocks, out=blocks)
    np.clip(blocks, 0, 255, out=blocks)
    nbh, nbw = H // 8, W // 8
    img = blocks.reshape(n, nbh, nbw, c, 8, 8).transpose(0, 1, 4, 2, 5, 3)
    img = img.astype(np.uint8).reshape(n, H, W, c)
    return img[:, :h, :w]


def lossy_decode_buffer(buf: np.ndarray, starts: np.ndarray,
                        ends: np.ndarray) -> np.ndarray:
    """Zero-copy batch decode straight from an Arrow binary column's
    value buffer: ``buf`` is the uint8 data buffer, ``starts``/``ends``
    the per-blob offsets.  LJ93 blobs decode with NO per-row Python —
    one ragged gather builds all (index, value) pairs and one scatter
    fills the coefficient planes; LJ92 (zlib) blobs fall back to the
    per-row inflate.  All blobs must share one image shape."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n = len(starts)
    head = buf[starts[0]:starts[0] + 13].tobytes()
    assert head[:4] in (_LJ_MAGIC, _LJS_MAGIC)
    h, w, H, W, c = struct.unpack(">HHHHB", head[4:13])
    P = (H // 8) * (W // 8) * c * 64
    qi = np.zeros((n, P), dtype=np.int16)
    is93 = buf[starts + 3] == ord("3")
    s93 = starts[is93]
    if len(s93):
        nnz = (buf[s93[:, None] + (13 + np.arange(4))[None, :]]
               .copy().view("<u4")[:, 0]).astype(np.int64)
        tot = int(nnz.sum())
        if tot:
            nnz_off = np.zeros(len(s93) + 1, np.int64)
            np.cumsum(nnz, out=nnz_off[1:])
            within = np.arange(tot) - np.repeat(nnz_off[:-1], nnz)
            bidx = np.repeat(s93 + 17, nnz) + 2 * within
            idx = buf[bidx].astype(np.int64) \
                | (buf[bidx + 1].astype(np.int64) << 8)
            bval = np.repeat(s93 + 17 + 2 * nnz, nnz) + 2 * within
            val = (buf[bval].astype(np.uint16)
                   | (buf[bval + 1].astype(np.uint16) << 8)) \
                .view(np.int16)
            rowrep = np.repeat(np.flatnonzero(is93), nnz)
            qi[rowrep, idx] = val
    for r in np.flatnonzero(~is93):
        qi[r] = np.frombuffer(
            zlib.decompress(buf[starts[r] + 13:ends[r]].tobytes()),
            dtype=np.int16)
    return _lossy_pixels(qi, n, h, w, H, W, c)


def png_decode_many(datas: list) -> np.ndarray:
    """Batch decode of same-shaped filter-0 PNGs (our own encoder's
    output) -> (n,h,w,3); falls back to the generic path otherwise.

    Fast path: our encoder's layout is fixed (sig, IHDR, one IDAT,
    IEND), so the IDAT body sits at bytes [41:-16] and every blob
    shares the first blob's IHDR; rows decompress straight into one
    preallocated (n, h, 1+stride) array with no per-image parsing."""
    first = bytes(datas[0][:41])
    if first[:8] == _PNG_SIG and first[12:16] == b"IHDR":
        w, h, depth, ctype = struct.unpack(">IIBB", first[16:26])
        if depth == 8 and ctype == 2:
            stride = w * 3
            raw = np.empty((len(datas), h, 1 + stride), dtype=np.uint8)
            flat = raw.reshape(len(datas), -1)
            ok = True
            for i, d in enumerate(datas):
                d = bytes(d)
                if d[37:41] != b"IDAT" or len(d) != 57 + (
                        int.from_bytes(d[33:37], "big")):
                    ok = False
                    break
                body = zlib.decompress(memoryview(d)[41:-16])
                if len(body) != h * (1 + stride):
                    ok = False
                    break
                flat[i] = np.frombuffer(body, dtype=np.uint8)
            if ok and not raw[:, :, 0].any():
                return np.ascontiguousarray(raw[:, :, 1:]).reshape(
                    len(datas), h, w, 3)
    return np.stack([png_decode(d) for d in datas])


def lossy_decode(data: bytes) -> np.ndarray:
    return lossy_decode_many([bytes(data)])[0]


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def encode(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return lossy_encode(img)
    raise ValueError(f"unknown format {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "jpeg":
        b = bytes(data)
        if b[:4] in (_LJ_MAGIC, _LJS_MAGIC):
            return lossy_decode(b)
        if b[:2] == b"\xFF\xD8":  # real JPEG bytes
            from . import jpeg
            return jpeg.decode(b)
        raise ValueError("unrecognized jpeg payload")
    raise ValueError(f"unknown format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)

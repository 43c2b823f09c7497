"""Baseline JFIF/JPEG codec in pure numpy (no PIL/libjpeg).

Real, spec-conformant baseline sequential JPEG (ITU-T T.81):

* encoder: RGB -> BT.601 YCbCr, 8x8 DCT (shared with the LJ92 codec's
  transform), Annex-K quantization tables scaled by quality, zigzag,
  DC-delta + standard Annex-K Huffman coding, byte stuffing, JFIF
  markers (SOI/APP0/DQT/SOF0/DHT/SOS/EOI).  4:4:4 (no subsampling) —
  every component is full resolution, one block per component per MCU.
* decoder: marker parse (DQT/SOF0/DHT/SOS/DRI), Huffman-decoded MCUs
  with restart-marker support, dequantize, IDCT, chroma upsampling for
  sampling factors 1-2 (so externally produced 4:2:0 / 4:2:2 baseline
  files decode too), YCbCr -> RGB.

The flagship synthesis path keeps the fast LJ92 stand-in
(sources/codecs.py — zlib entropy stage, ~10x cheaper); this module is
the real-format interop seam: `stages/media.py` exposes transcoding,
and `codecs.decode` routes real 0xFFD8 JPEG bytes here (PIL no longer
required).  When PIL *is* available the tests cross-check both
directions against it.

Tables (quantization, zigzag, Huffman) are the public ITU T.81 Annex K
reference tables.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from .codecs import _DCT  # shared float64 DCT-II basis (orthonormal)


def _dct2_fixed(blocks: np.ndarray) -> np.ndarray:
    """2-D DCT of (n,8,8) blocks with a FIXED left-to-right summation
    order (explicit k-loop), independent of the BLAS build.  These
    coefficients feed golden-pinned wire bytes; a batched matmul's
    accumulation order is a BLAS kernel choice and flipped a pinned
    byte once already (see tests/test_region_encoding.py history).
    The fast LJ92 codec keeps its wide-GEMM form on purpose — its
    bytes are PSNR-contracted, not golden-pinned."""
    tmp = np.zeros_like(blocks)
    for k in range(8):  # tmp[n,i,j] = sum_k blocks[n,i,k] * D[j,k]
        tmp += blocks[:, :, k, None] * _DCT[None, None, :, k]
    out = np.zeros_like(blocks)
    for k in range(8):  # out[n,i,j] = sum_k D[i,k] * tmp[n,k,j]
        out += _DCT[None, :, k, None] * tmp[:, k, None, :]
    return out


def _idct2_fixed(blocks: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_dct2_fixed`, same fixed-order guarantee
    (feeds the golden-pinned decoded-pixel array)."""
    tmp = np.zeros_like(blocks)
    for k in range(8):  # tmp[n,i,j] = sum_k blocks[n,i,k] * D[k,j]
        tmp += blocks[:, :, k, None] * _DCT[None, None, k, :]
    out = np.zeros_like(blocks)
    for k in range(8):  # out[n,i,j] = sum_k D[k,i] * tmp[n,k,j]
        out += _DCT.T[None, :, k, None] * tmp[:, k, None, :]
    return out

# ---------------------------------------------------------------------------
# Annex K tables
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _huff_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical code generation.
    ``bits[l]`` = number of codes of length l (1-based, bits[0] unused)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = (_huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
           _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
_ENC_AC = (_huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
           _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))


# ---------------------------------------------------------------------------
# color transforms (JFIF full-range BT.601)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> Tuple[int, int]:
    """(category size, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    qt = (_quality_scale(QUANT_LUMA, quality),
          _quality_scale(QUANT_CHROMA, quality))

    # pad to multiples of 8 with edge replication
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        rgb = np.pad(rgb, ((0, ph), (0, pw), (0, 0)), mode="edge")
    H, W = rgb.shape[:2]
    ycc = rgb_to_ycbcr(rgb) - 128.0
    nbh, nbw = H // 8, W // 8

    # batched DCT + quantization per component
    comp_zz = []
    for ci in range(3):
        plane = ycc[:, :, ci]
        blocks = plane.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8)
        coefs = _dct2_fixed(blocks)
        q = qt[0] if ci == 0 else qt[1]
        qc = np.rint(coefs / q).astype(np.int32)
        comp_zz.append(qc.reshape(-1, 64)[:, ZIGZAG])

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for b in range(nbh * nbw):           # MCU order == block order (4:4:4)
        for ci in range(3):
            tsel = 0 if ci == 0 else 1
            dc_tab, ac_tab = _ENC_DC[tsel], _ENC_AC[tsel]
            zz = comp_zz[ci][b]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_tab[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]   # ZRL
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if last < 63:
                code, length = ac_tab[0x00]       # EOB
                bw.write(code, length)
    bw.flush()

    out = bytearray(_header_bytes(h, w, qt))
    out += bytes(bw.buf)
    out += b"\xFF\xD9"                                       # EOI
    return bytes(out)


def _header_bytes(h: int, w: int,
                  qt: Tuple[np.ndarray, np.ndarray]) -> bytes:
    """SOI..SOS marker segment shared by encode / encode_many —
    everything before the entropy-coded body."""
    out = bytearray()
    out += b"\xFF\xD8"                                       # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, q in enumerate(qt):                             # DQT x2
        zz = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid]) + zz
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)   # SOF0
    for cid in (1, 2, 3):
        out += bytes([cid, 0x11, 0 if cid == 1 else 1])      # 4:4:4
    for (tc, th, bits, vals) in ((0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
                                 (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
                                 (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                                 (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        body = bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(vals)
        out += b"\xFF\xC4" + struct.pack(">H", 2 + len(body)) + body
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)           # SOS
    for cid in (1, 2, 3):
        out += bytes([cid, 0x00 if cid == 1 else 0x11])
    out += bytes([0, 63, 0])
    return bytes(out)


def _huff_lut(table: Dict[int, Tuple[int, int]],
              size: int) -> Tuple[np.ndarray, np.ndarray]:
    code = np.zeros(size, np.uint64)
    ln = np.zeros(size, np.uint64)
    for v, (c, l) in table.items():
        code[v] = c
        ln[v] = l
    return code, ln


_DC_LUT = tuple(_huff_lut(t, 12) for t in _ENC_DC)
_AC_LUT = tuple(_huff_lut(t, 256) for t in _ENC_AC)
_SYMBOL_SPAN = 520        # > 63*8 + 7 (AC) and > 512 (EOB slot)


def _bit_length_u(v: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of non-negative int64 (exact below 2^52:
    frexp exponent of the float64 value IS the bit length)."""
    return np.frexp(v.astype(np.float64))[1].astype(np.int64)


def encode_many(imgs: np.ndarray, quality: int = 90) -> List[bytes]:
    """(n, h, w, 3) uint8 RGB -> n baseline JFIF blobs, byte-identical
    to ``[encode(im, quality) for im in imgs]`` but with every stage —
    DCT, quantization, DC differencing, run-length symbolization,
    Huffman code lookup and bit packing — vectorized across the whole
    same-shape batch.  Only the final per-image packbits + byte
    stuffing runs in a Python loop (O(images), not O(blocks))."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w = imgs.shape[:3]
    if n == 0:
        return []
    qt = (_quality_scale(QUANT_LUMA, quality),
          _quality_scale(QUANT_CHROMA, quality))
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        imgs = np.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)),
                      mode="edge")
    H, W = imgs.shape[1:3]
    nbh, nbw = H // 8, W // 8
    nb = nbh * nbw
    ycc = rgb_to_ycbcr(imgs) - 128.0

    keys_parts, vals_parts, lens_parts = [], [], []
    ar63 = np.arange(1, 64, dtype=np.int64)
    for ci in range(3):
        tsel = 0 if ci == 0 else 1
        dc_code, dc_len = _DC_LUT[tsel]
        ac_code, ac_len = _AC_LUT[tsel]
        plane = ycc[:, :, :, ci]
        blocks = plane.reshape(n, nbh, 8, nbw, 8) \
            .transpose(0, 1, 3, 2, 4).reshape(-1, 8, 8)
        coefs = _dct2_fixed(blocks)
        q = qt[0] if ci == 0 else qt[1]
        zz = np.rint(coefs / q).astype(np.int64) \
            .reshape(-1, 64)[:, ZIGZAG]            # (n*nb, 64)

        # DC: differential within each image's block sequence
        dc = zz[:, 0].reshape(n, nb)
        diff = dc - np.concatenate(
            [np.zeros((n, 1), np.int64), dc[:, :-1]], axis=1)
        diff = diff.reshape(-1)
        dsize = _bit_length_u(np.abs(diff))
        dbits = np.where(diff >= 0, diff,
                         diff + (np.int64(1) << dsize) - 1) \
            & ((np.int64(1) << dsize) - 1)
        dval = (dc_code[dsize].astype(np.int64) << dsize) | dbits
        dlen = dc_len[dsize].astype(np.int64) + dsize
        base = np.arange(n * nb, dtype=np.int64) * 3 + ci
        keys_parts.append(base * _SYMBOL_SPAN)
        vals_parts.append(dval)
        lens_parts.append(dlen)

        # AC: run-length symbols over the zigzag tail
        A = zz[:, 1:]                               # (n*nb, 63)
        rows, kpos = np.nonzero(A)                  # row-major: k asc
        if len(rows):
            v = A[rows, kpos]
            prev = np.full(len(rows), -1, np.int64)
            same = rows[1:] == rows[:-1]
            prev[1:] = np.where(same, kpos[:-1], -1)
            run = kpos - prev - 1
            zrl_n = run >> 4
            rem = run & 15
            size = _bit_length_u(np.abs(v))
            bits = np.where(v >= 0, v,
                            v + (np.int64(1) << size) - 1) \
                & ((np.int64(1) << size) - 1)
            sym = (rem << 4) | size
            aval = (ac_code[sym].astype(np.int64) << size) | bits
            alen = ac_len[sym].astype(np.int64) + size
            akey = (rows * 3 + ci) * _SYMBOL_SPAN \
                + (kpos + 1) * 8 + zrl_n
            keys_parts.append(akey)
            vals_parts.append(aval)
            lens_parts.append(alen)
            # ZRL fills: zrl_n copies BEFORE each symbol
            tot = int(zrl_n.sum())
            if tot:
                rep = np.repeat(np.arange(len(rows)), zrl_n)
                j = np.arange(tot) - np.repeat(
                    np.cumsum(zrl_n) - zrl_n, zrl_n)
                zc, zl = int(ac_code[0xF0]), int(ac_len[0xF0])
                keys_parts.append((rows[rep] * 3 + ci) * _SYMBOL_SPAN
                                  + (kpos[rep] + 1) * 8 + j)
                vals_parts.append(np.full(tot, zc, np.int64))
                lens_parts.append(np.full(tot, zl, np.int64))
        # EOB where the block's last nonzero AC sits before pos 63
        lastk = np.full(n * nb, -1, np.int64)
        if len(rows):
            lastk[rows] = kpos                      # ascending: last wins
        need = np.nonzero(lastk < 62)[0]
        ec, el = int(ac_code[0x00]), int(ac_len[0x00])
        keys_parts.append((need * 3 + ci) * _SYMBOL_SPAN + 512)
        vals_parts.append(np.full(len(need), ec, np.int64))
        lens_parts.append(np.full(len(need), el, np.int64))

    keys = np.concatenate(keys_parts)
    vals = np.concatenate(vals_parts)
    lens = np.concatenate(lens_parts)
    order = np.argsort(keys, kind="stable")
    keys, vals, lens = keys[order], vals[order], lens[order]

    # one global MSB-first bit expansion (max symbol length 27 bits)
    LMAX = 27
    ar = np.arange(LMAX, dtype=np.int64)
    shift = np.maximum(lens[:, None] - 1 - ar[None, :], 0)
    bitmat = ((vals[:, None] >> shift) & 1).astype(np.uint8)
    valid = ar[None, :] < lens[:, None]
    bitstream = bitmat[valid]                       # row-major order
    bit_off = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=bit_off[1:])

    # split per image (each image's body pads + stuffs independently)
    img_bounds = np.searchsorted(
        keys, np.arange(1, n + 1, dtype=np.int64) * (nb * 3 * _SYMBOL_SPAN))
    header = _header_bytes(h, w, qt)
    out: List[bytes] = []
    a = 0
    for i in range(n):
        b = int(img_bounds[i])
        bits_i = bitstream[bit_off[a]:bit_off[b]]
        pad = -len(bits_i) % 8
        if pad:
            bits_i = np.concatenate(
                [bits_i, np.ones(pad, np.uint8)])   # pad with 1s
        body = np.packbits(bits_i)
        ff = np.nonzero(body == 0xFF)[0]
        if len(ff):
            body = np.insert(body, ff + 1, 0)       # byte stuffing
        out.append(header + body.tobytes() + b"\xFF\xD9")
        a = b
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Entropy-segment reader with 0xFF00 unstuffing; stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.acc = (self.acc << 8) | 0  # pad past end
            self.nbits += 8
            return
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:     # RST handled by caller
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
            else:                          # real marker: pad
                self.acc = (self.acc << 8)
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Drop partial bits and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decoder(bits: List[int], vals: List[int]):
    """(min_code, max_code, val_index) arrays per length for fast decode."""
    codes = []
    code = 0
    k = 0
    table = {}
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB.  Supports 1- or
    3-component baseline files with sampling factors 1-2 and restart
    markers."""
    data = bytes(data)
    assert data[:2] == b"\xFF\xD8", "not a JPEG"
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], dict] = {}
    comps = []   # (cid, hsamp, vsamp, qsel)
    h = w = 0
    restart_interval = 0
    scan_comps = []
    while pos < len(data):
        assert data[pos] == 0xFF, "marker sync lost"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:                        # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    q = np.frombuffer(body[p:p + 128], dtype=">u2")
                    p += 128
                else:
                    q = np.frombuffer(body[p:p + 64], dtype=np.uint8)
                    p += 64
                qtables[tq] = q.astype(np.int32)[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC0:                      # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for ci in range(nc):
                cid, samp, qsel = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, qsel))
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("only baseline sequential JPEG")
        elif marker == 0xC4:                      # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = [0] + list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                htables[(tc, th)] = _huff_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xDD:                      # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                      # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tsel = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tsel >> 4, tsel & 0xF))
            pos += seglen
            break
        pos += seglen

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def _read_block(br, dtab, atab, pred):
        # DC
        length, code = 0, 0
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            if (length, code) in dtab:
                size = dtab[(length, code)]
                break
            if length > 16:
                raise ValueError("bad Huffman stream")
        diff = _extend(br.read(size), size) if size else 0
        dc = pred + diff
        zz = np.zeros(64, dtype=np.int32)
        zz[0] = dc
        k = 1
        while k < 64:
            length, code = 0, 0
            while True:
                code = (code << 1) | br.read(1)
                length += 1
                if (length, code) in atab:
                    rs = atab[(length, code)]
                    break
                if length > 16:
                    raise ValueError("bad Huffman stream")
            if rs == 0x00:       # EOB
                break
            if rs == 0xF0:       # ZRL
                k += 16
                continue
            run, size = rs >> 4, rs & 0xF
            k += run
            if k > 63:
                break
            zz[k] = _extend(br.read(size), size)
            k += 1
        return zz, dc

    planes = {}
    for (cid, hs, vs, qsel) in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64)
    preds = {cid: 0 for cid, *_ in comps}
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                preds = {cid: 0 for cid, *_ in comps}
            for (cid, hs, vs, qsel) in comps:
                dsel = next(t for c, t, _ in scan_comps if c == cid)
                asel = next(t for c, _, t in scan_comps if c == cid)
                dtab = htables[(0, dsel)]
                atab = htables[(1, asel)]
                q = qtables[qsel]
                for by in range(vs):
                    for bx in range(hs):
                        zz, preds[cid] = _read_block(br, dtab, atab,
                                                     preds[cid])
                        blk = (zz[UNZIGZAG].reshape(8, 8) * q).astype(
                            np.float64)
                        pix = _idct2_fixed(blk[None])[0] + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for (cid, hs, vs, qsel) in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        ycc = np.stack([full[0], np.full((h, w), 128.0),
                        np.full((h, w), 128.0)], axis=-1)
    else:
        ycc = np.stack(full, axis=-1)
    return ycbcr_to_rgb(np.clip(ycc, -256.0, 512.0))

"""Zero-dependency JPEG codec (multimodal real-decode path).

Encoder + decoder for JPEG (ITU-T T.81): baseline sequential (SOF0)
AND progressive (SOF2 — spectral selection, successive
approximation, EOBn end-of-band runs), grayscale or YCbCr at 4:4:4,
4:2:2, or 4:2:0 chroma subsampling (multi-block interleaved MCUs per
A.2.3; non-interleaved scans raster each component's own ceil grid
per A.2.2; box-average down, nearest-neighbor up — the decoder
accepts ANY legal 1-4 sampling factors), 8-bit AND 12-bit sample
precision (12-bit: Pq=1 16-bit DQT entries, extended DC-category-15
/ AC-size-14 Huffman coverage, decoded pixels take the standard
high-byte downsample), standard Annex-K quantization and Huffman
tables (flat custom tables carry the progressive EOBn symbols and
the 12-bit categories Annex-K lacks), quality-scaled, byte stuffing,
with DRI/RST0-7 restart-marker support (byte-aligned predictor
resets, cycling marker verification). The progressive ENCODER stays
8-bit (the decoder accepts 12-bit SOF2 streams structurally);
arithmetic coding, lossless, and hierarchical modes are the honest
remaining boundary — PIL plugs in beyond it.

The encoders exist so tests and fixtures can PLANT real JPEGs without
any imaging library; the decoder is the production-path piece wired
through ``operators/multimodal.py``. Scans accumulate into
per-component coefficient state, so a progressive payload decodes to
byte-identical pixels as its baseline twin (the tests' anchor
invariant). Round-trip is lossy by nature — tests pin dimension
exactness and per-pixel error bounds (measured: max err 4 / mean 1.0
on a color gradient at quality 90), unlike the bit-exact PPM/PNG/WAV
codecs. Pure-Python DCT per 8x8 block is the zero-dependency cost —
fine for planted test media.
"""


from __future__ import annotations

import math
import struct
from types import MappingProxyType

# NumPy accelerates the bulk numeric stages (color transform, FDCT/IDCT,
# quantization, pixel reconstruction) when present; every vectorized
# stage reproduces the scalar path's float operations in the SAME order
# and association, so outputs are bit-identical either way (pinned by
# tests/test_jpeg_vector_parity.py). The scalar path remains the
# zero-dependency fallback.
try:  # pragma: no cover - import guard
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None

# zigzag scan order: index i of the scan -> (row, col) flattened offset
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (luminance, chrominance), row-major
_Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs: (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
        0xF9, 0xFA,
    ],
)


# 12-bit sample tables: DC diff categories reach 15 and AC sizes 14
# (T.81 F.1.2 / Table F.2), beyond what the 8-bit Annex-K tables
# define, so 12-bit streams carry flat custom tables in the _AC_PROG
# spirit — canonical, incomplete (the all-ones code stays unused),
# compression-irrelevant for planted media.
_DC_EXT = (
    [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(16)),
)
_AC_EXT = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)


_HUFF_MEMO: dict = {}


def _huff_codes(bits, values):
    """Canonical Huffman code assignment (T.81 C.2): returns
    {symbol: (code, length)}. Memoized — encoders rebuild the same
    static Annex-K / flat tables for every image."""
    key = ("codes", tuple(bits), tuple(values))
    hit = _HUFF_MEMO.get(key)
    if hit is not None:
        return hit
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    out = MappingProxyType(out)  # memo entries are shared: no mutation
    if len(_HUFF_MEMO) < 512:  # bound growth under adversarial tables
        _HUFF_MEMO[key] = out
    return out


def _huff_lookup(bits, values):
    """Decoder-side map {(length, code): symbol}. Memoized — decoders
    re-parse the same DHT payloads for every image of a fixture set."""
    key = ("lookup", tuple(bits), tuple(values))
    hit = _HUFF_MEMO.get(key)
    if hit is not None:
        return hit
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    out = MappingProxyType(out)  # memo entries are shared: no mutation
    if len(_HUFF_MEMO) < 512:  # bound growth under adversarial tables
        _HUFF_MEMO[key] = out
    return out


def _huff_decoder(bits, values):
    """Decode tables for one DHT: ``(lookup, fast)`` where ``lookup``
    is the {(length, code): symbol} walk map (the lazy fallback near
    markers / end of data) and ``fast`` is a 65536-entry list mapping
    every possible 16-bit window to ``(symbol << 5) | code_length``
    (-1 where no code matches — T.81 codes are at most 16 bits, so one
    list index replaces the per-bit dict walk). Memoized like the
    other table builders; entries are shared, so callers must not
    mutate ``fast``."""
    key = ("decoder", tuple(bits), tuple(values))
    hit = _HUFF_MEMO.get(key)
    if hit is not None:
        return hit
    lookup = _huff_lookup(bits, values)
    fast = [-1] * 65536
    for (length, code), sym in lookup.items():
        start = code << (16 - length)
        span = 1 << (16 - length)
        fast[start : start + span] = [(sym << 5) | length] * span
    out = (lookup, fast)
    if len(_HUFF_MEMO) < 512:  # bound growth under adversarial tables
        _HUFF_MEMO[key] = out
    return out


_DCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_DCT_C = [1 / math.sqrt(2)] + [1.0] * 7

# Vectorized FDCT/IDCT term tensors cost 64*64*8 = 32 KB per block;
# bounding a pass at 2048 blocks caps the transient at ~64 MB however
# large the image (a 12 MP photo is ~190k blocks).
_DCT_CHUNK_BLOCKS = 2048

if _np is not None:
    _NP_ZIGZAG = _np.asarray(_ZIGZAG, dtype=_np.int64)
    _NP_COS = _np.asarray(_DCT_COS, dtype=_np.float64)  # COS[u][x]
    _NP_C = _np.asarray(_DCT_C, dtype=_np.float64)
    # ((0.25 * C[u]) * C[v]) — the scalar FDCT's exact association
    _NP_FDCT_SCALE = (0.25 * _NP_C)[:, None] * _NP_C[None, :]
    # C[u] * COS[u][x] — the scalar IDCT's hoisted ``cu`` product
    _NP_CU = _NP_C[:, None] * _NP_COS
    # Flattened per-term factor tables for the tensorized DCTs: index
    # t = x*8+y (FDCT) or u*8+v (IDCT) enumerates the scalar loops'
    # accumulation order; the two factors of each term stay separate
    # so the multiply association matches the scalar expression.
    _NP_FD_XU = _np.repeat(_NP_COS.T, 8, axis=0)  # [(x8+y), u] = COS[u][x]
    _NP_FD_YV = _np.tile(_NP_COS.T, (8, 1))       # [(x8+y), v] = COS[v][y]
    _NP_ID_UX = _np.repeat(_NP_CU, 8, axis=0)     # [(u8+v), x] = C[u]*COS[u][x]
    _NP_ID_VY = _np.tile(_NP_COS, (8, 1))         # [(u8+v), y] = COS[v][y]
    _NP_C_TILED = _np.tile(_NP_C, 8)              # [(u8+v)] = C[v]


def _fdct8x8(block):
    """Forward 8x8 DCT-II (T.81 A.3.3), block = 64 level-shifted ints."""
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _DCT_COS[u][x]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cu * _DCT_COS[v][y]
            out[u * 8 + v] = 0.25 * _DCT_C[u] * _DCT_C[v] * s
    return out


def _idct8x8(coef):
    """Inverse 8x8 DCT (separable would be faster; planted images are
    tiny, clarity wins)."""
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _DCT_C[u] * _DCT_COS[u][x]
                row = u * 8
                for v in range(8):
                    s += _DCT_C[v] * coef[row + v] * cu * _DCT_COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


def _gather_blocks_np(plane, width, height, bx, by, half):
    """Edge-replicated 8x8 block gather: plane (len width*height,
    list or ndarray) -> float64 array (by*bx, 8, 8) of level-shifted
    samples, blocks in raster order. Reproduces the scalar loop's
    ``plane[min(...)*width + min(...)] - half`` exactly (one float
    subtraction per sample, same operand order)."""
    p = _np.asarray(plane, dtype=_np.float64).reshape(height, width)
    if height == by * 8 and width == bx * 8:
        # exact block multiple: no edge replication needed
        padded = p - float(half)
    else:
        rows = _np.minimum(_np.arange(by * 8), height - 1)
        cols = _np.minimum(_np.arange(bx * 8), width - 1)
        padded = p[_np.ix_(rows, cols)] - float(half)
    return (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(by * bx, 8, 8)
    )


def _fdct_quant_zz_np(blocks, qtab):
    """Vectorized FDCT + quantize + zigzag over a (nb, 8, 8) float64
    block array -> int zigzag blocks as an (nb, 64) int64 array.

    Bit-exact replication of ``_fdct8x8`` + ``_encode_block``'s
    quantizer: terms are formed with the scalar code's association
    ``(block[x,y] * COS[u][x]) * COS[v][y]``, accumulated SEQUENTIALLY
    in the scalar loop's (x, y) order (64 in-place vector adds — NOT
    numpy's pairwise ``sum``, whose different reduction tree would
    round differently), scaled by ``((0.25 * C[u]) * C[v])`` exactly as
    the scalar expression associates, and quantized with the same
    round-half-away-from-zero construction.

    Blocks are processed in bounded chunks: the (chunk, 64, 8, 8) term
    tensor costs ~32 KB per block, so one unbounded pass over a large
    image would materialize GBs of transient memory. Chunking is
    bit-exact — every block's result depends only on its own row."""
    nb = blocks.shape[0]
    flat = blocks.reshape(nb, 64)
    qt = _np.asarray(qtab, dtype=_np.float64)[None, :]
    out = _np.empty((nb, 64), dtype=_np.int64)
    for lo in range(0, nb, _DCT_CHUNK_BLOCKS):
        chunk = flat[lo : lo + _DCT_CHUNK_BLOCKS]
        # term[b, t=(x8+y), u, v] = (block[x, y] * COS[u][x]) * COS[v][y]
        # — built in two whole-tensor multiplies (association
        # preserved), then accumulated with 64 sequential in-place
        # adds in the scalar loop's (x, y) order.
        t = (
            chunk[:, :, None, None] * _NP_FD_XU[None, :, :, None]
        ) * _NP_FD_YV[None, :, None, :]
        # ufunc accumulate IS the sequential left fold (each prefix is
        # previous + next, in index order), so its last slice is
        # bit-identical to the 64 in-place adds — in ONE dispatch
        _np.add.accumulate(t, axis=1, out=t)
        s = t[:, 63]
        coef = _NP_FDCT_SCALE[None, :, :] * s
        q = coef.reshape(-1, 64) / qt
        qi = _np.where(
            q >= 0.0,
            _np.floor(q + 0.5),
            -_np.floor(-q + 0.5),
        ).astype(_np.int64)
        out[lo : lo + chunk.shape[0]] = qi[:, _NP_ZIGZAG]
    return out


def _scale_quant(table, quality, precision=8):
    """Quality-scale a base quant table. At 12-bit precision the base
    entries scale by 16 (the sample range grew 16x) with a floor of
    16, which keeps quantized DC diffs within category 15 and AC
    magnitudes within size 14 (T.81 Table F.2) at every quality."""
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    if precision == 12:
        return [
            max(16, min(65535, (q * 16 * scale + 50) // 100))
            for q in table
        ]
    return [max(1, min(255, (q * scale + 50) // 100)) for q in table]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _category(v):
    """Size category of a DC diff / AC value; returns (size, bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, coef, qtab, dc_codes, ac_codes, prev_dc):
    q = [0] * 64
    for i in range(64):
        c = coef[i] / qtab[i]
        q[i] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
    zz = [q[_ZIGZAG[i]] for i in range(64)]
    return _encode_block_zz(bw, zz, dc_codes, ac_codes, prev_dc)


def _encode_block_zz(bw, zz, dc_codes, ac_codes, prev_dc):
    """Entropy-code one already-quantized zigzag block (the back half
    of _encode_block, split out so encode_jpeg can feed vectorized
    _component_zz_blocks output straight into the bit writer).

    The block's symbols accumulate in a LOCAL arbitrary-precision int
    and flush to ``bw.buf`` as whole stuffed bytes once per block —
    the emitted byte stream (values, order, 0xFF00 stuffing) is
    identical to per-symbol ``bw.write`` calls, just without the
    per-symbol method/flush overhead. ``bw``'s (acc, n) carry the
    sub-byte remainder across blocks exactly as before (n stays < 8)."""
    acc, n = bw.acc, bw.n
    diff = zz[0] - prev_dc
    if diff == 0:
        size = 0
    else:
        size = abs(diff).bit_length()
    code, ln = dc_codes[size]
    acc = (acc << ln) | code
    n += ln
    if size:
        bits = diff if diff > 0 else diff + (1 << size) - 1
        acc = (acc << size) | bits
        n += size
    run = 0
    zrl_code, zrl_ln = ac_codes[0xF0]
    for i in range(1, 64):
        v = zz[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            acc = (acc << zrl_ln) | zrl_code  # ZRL
            n += zrl_ln
            run -= 16
        size = abs(v).bit_length()
        bits = v if v > 0 else v + (1 << size) - 1
        code, ln = ac_codes[(run << 4) | size]
        acc = ((acc << ln) | code) << size | bits
        n += ln + size
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        acc = (acc << ln) | code
        n += ln
    nb = n >> 3
    if nb:
        rem = n & 7
        chunk = (acc >> rem).to_bytes(nb, "big")
        if b"\xff" in chunk:
            chunk = chunk.replace(b"\xff", b"\xff\x00")  # byte stuffing
        bw.buf += chunk
        acc &= (1 << rem) - 1
        n = rem
    bw.acc, bw.n = acc, n
    return zz[0]


def _parse_subsampling(subsampling):
    """Map a subsampling name to the luma sampling factors (h, v):
    4:4:4 -> 1x1, 4:2:2 -> 2x1 (half horizontal chroma), 4:2:0 -> 2x2
    (the ubiquitous quarter-chroma mode). Chroma is always 1x1."""
    table = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsampling not in table:
        raise ValueError(f"unknown JPEG subsampling {subsampling!r}")
    return table[subsampling]


def _subsample_planes_np(width, height, pix, hy, vy, half):
    """Vectorized twin of the scalar ``_subsample_planes`` body.
    Color-transform expressions keep the scalar association
    (``((0.299*r + 0.587*g) + 0.114*b)`` etc.), and the box average
    accumulates its (yy, xx)-ordered group members with sequential
    in-place adds (masked cells contribute an exact ``+0.0``), so the
    planes are bit-identical to the scalar path's."""
    if isinstance(pix, (bytes, bytearray)):
        arr = _np.frombuffer(bytes(pix), dtype=_np.uint8)[: width * height * 3]
        arr = arr.astype(_np.float64)
    else:
        arr = _np.asarray(list(pix[: width * height * 3]), dtype=_np.float64)
    r = arr[0::3]
    g = arr[1::3]
    b = arr[2::3]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cbf = -0.168736 * r - 0.331264 * g + 0.5 * b + half
    crf = 0.5 * r - 0.418688 * g - 0.081312 * b + half
    if hy == 1 and vy == 1:
        return [y, cbf, crf], [(width, height)] * 3
    cw = (width + hy - 1) // hy
    ch = (height + vy - 1) // vy
    cb2 = cbf.reshape(height, width)
    cr2 = crf.reshape(height, width)
    sb = _np.zeros((ch, cw), dtype=_np.float64)
    sr = _np.zeros((ch, cw), dtype=_np.float64)
    n = _np.zeros((ch, cw), dtype=_np.int64)
    ys = _np.arange(ch) * vy
    xs = _np.arange(cw) * hy
    for dy in range(vy):
        yy = ys + dy
        ymask = yy < height
        yidx = _np.minimum(yy, height - 1)
        for dx in range(hy):
            xx = xs + dx
            xmask = xx < width
            xidx = _np.minimum(xx, width - 1)
            mask = ymask[:, None] & xmask[None, :]
            sb += _np.where(mask, cb2[_np.ix_(yidx, xidx)], 0.0)
            sr += _np.where(mask, cr2[_np.ix_(yidx, xidx)], 0.0)
            n += mask
    cb = (sb / n).reshape(-1)
    cr = (sr / n).reshape(-1)
    return [y, cb, cr], [(width, height), (cw, ch), (cw, ch)]


def _subsample_planes(width, height, pix, hy, vy, half=128):
    """RGB -> YCbCr planes with chroma box-averaged over hy x vy pixel
    groups (edge groups clamp). Returns (planes, dims): the full-res Y
    plane plus the two downsampled chroma planes with their dims.
    ``half`` is the chroma zero point (128 at 8-bit, 2048 at 12)."""
    npx = width * height
    if _np is not None:
        return _subsample_planes_np(width, height, pix, hy, vy, half)
    y = [0.0] * npx
    cbf = [0.0] * npx
    crf = [0.0] * npx
    for i in range(npx):
        r, g, b = pix[3 * i], pix[3 * i + 1], pix[3 * i + 2]
        y[i] = 0.299 * r + 0.587 * g + 0.114 * b
        cbf[i] = -0.168736 * r - 0.331264 * g + 0.5 * b + half
        crf[i] = 0.5 * r - 0.418688 * g - 0.081312 * b + half
    if hy == 1 and vy == 1:
        return (
            [y, cbf, crf],
            [(width, height)] * 3,
        )
    cw = (width + hy - 1) // hy
    ch = (height + vy - 1) // vy
    cb = [0.0] * (cw * ch)
    cr = [0.0] * (cw * ch)
    for sy in range(ch):
        y0 = sy * vy
        y1 = min(y0 + vy, height)
        for sx in range(cw):
            x0 = sx * hy
            x1 = min(x0 + hy, width)
            n = (y1 - y0) * (x1 - x0)
            sb = sr = 0.0
            for yy in range(y0, y1):
                row = yy * width
                for xx in range(x0, x1):
                    sb += cbf[row + xx]
                    sr += crf[row + xx]
            cb[sy * cw + sx] = sb / n
            cr[sy * cw + sx] = sr / n
    return [y, cb, cr], [(width, height), (cw, ch), (cw, ch)]


def encode_jpeg(
    width, height, pix, channels=3, quality=85, restart_interval=0,
    subsampling="4:4:4", precision=8,
):
    """Encode raw pixels (row-major, interleaved for RGB) as a
    baseline JPEG: grayscale (channels=1) or YCbCr (channels=3) at
    4:4:4, 4:2:2, or 4:2:0 chroma ``subsampling`` (box-averaged
    chroma, interleaved h x v-blocks-per-MCU entropy layout per T.81
    A.2.3), Annex-K tables, quality-scaled quantization.
    ``precision=12`` takes 0..4095 integer samples in ``pix`` (any
    indexable sequence) and emits the extended-sequential 12-bit
    form: 16-bit DQT entries (Pq=1) and flat custom Huffman tables
    covering DC category 15 / AC size 14. ``restart_interval`` > 0
    writes a DRI segment and emits byte-aligned RST0-7 markers every
    that many MCUs, resetting the DC predictors — the
    error-resilience feature cameras emit by default."""
    if channels not in (1, 3):
        raise NotImplementedError("JPEG encode supports 1 or 3 channels")
    if precision not in (8, 12):
        raise NotImplementedError("JPEG encode supports 8/12-bit samples")
    hy, vy = _parse_subsampling(subsampling)
    if channels == 1 and (hy, vy) != (1, 1):
        raise ValueError("grayscale JPEG has no chroma to subsample")
    half = 1 << (precision - 1)
    qlum = _scale_quant(_Q_LUM, quality, precision)
    qchr = _scale_quant(_Q_CHR, quality, precision)
    # component planes in YCbCr (or the single gray plane)
    npx = width * height
    if channels == 1:
        planes = [list(pix[:npx])]
        dims = [(width, height)]
        factors = [(1, 1)]
    else:
        planes, dims = _subsample_planes(width, height, pix, hy, vy, half)
        factors = [(hy, vy), (1, 1), (1, 1)]
    qtabs = [qlum] + ([qchr, qchr] if channels == 3 else [])
    if precision == 12:
        dc_specs = [_DC_EXT] * channels
        ac_specs = [_AC_EXT] * channels
    else:
        dc_specs = [_DC_LUM] + ([_DC_CHR, _DC_CHR] if channels == 3 else [])
        ac_specs = [_AC_LUM] + ([_AC_CHR, _AC_CHR] if channels == 3 else [])
    dc_codes = [_huff_codes(*s) for s in dc_specs]
    ac_codes = [_huff_codes(*s) for s in ac_specs]

    bw = _BitWriter()
    prev_dc = [0] * channels
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)
    # FDCT + quantization for every component runs up front over the
    # full MCU-padded block grid (vectorized when numpy is present —
    # bit-identical to the inline scalar loop, which gathered block
    # (mby*vc+r8, mbx*hc+q8) of exactly this grid); the MCU loop below
    # is then pure entropy coding.
    comp_blocks = []
    comp_bx = []
    for c in range(channels):
        pw, ph = dims[c]
        hc, vc = factors[c]
        comp_blocks.append(
            _component_zz_blocks(
                planes[c], pw, ph, qtabs[c],
                bx=mcux * hc, by=mcuy * vc, half=half,
            )
        )
        comp_bx.append(mcux * hc)
    mcu = 0
    rst = 0
    for mby in range(mcuy):
        for mbx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align (1-pad), then the marker goes in RAW —
                # markers are never byte-stuffed
                bw.flush()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                prev_dc = [0] * channels
            mcu += 1
            for c in range(channels):
                hc, vc = factors[c]
                gbx = comp_bx[c]
                for r8 in range(vc):
                    for q8 in range(hc):
                        zz = comp_blocks[c][
                            (mby * vc + r8) * gbx + (mbx * hc + q8)
                        ]
                        prev_dc[c] = _encode_block_zz(
                            bw, zz, dc_codes[c], ac_codes[c], prev_dc[c],
                        )
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tq, tab):
        # Pq=1 (16-bit entries) iff any value needs it — the 12-bit path
        if max(tab) > 255:
            body = b"".join(
                struct.pack(">H", tab[_ZIGZAG[i]]) for i in range(64)
            )
            return seg(0xFFDB, bytes([0x10 | tq]) + body)
        return seg(
            0xFFDB, bytes([tq]) + bytes(tab[_ZIGZAG[i]] for i in range(64))
        )

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qlum)
    if channels == 3:
        out += dqt(1, qchr)
    comp = b"".join(
        bytes([
            c + 1,
            (factors[c][0] << 4) | factors[c][1],
            0 if c == 0 else 1,
        ])
        for c in range(channels)
    )
    out += seg(
        0xFFC0,
        bytes([precision]) + struct.pack(">HH", height, width)
        + bytes([channels]) + comp,
    )
    if precision == 12:
        huffs = [(0x00, _DC_EXT), (0x10, _AC_EXT)]
        if channels == 3:
            huffs += [(0x01, _DC_EXT), (0x11, _AC_EXT)]
    else:
        huffs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
        if channels == 3:
            huffs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tid, (bits, vals) in huffs:
        out += seg(0xFFC4, bytes([tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    scomp = b"".join(
        bytes([c + 1, 0x00 if c == 0 else 0x11]) for c in range(channels)
    )
    out += seg(0xFFDA, bytes([channels]) + scomp + b"\x00\x3F\x00")
    out += bw.buf
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def _component_zz_blocks(plane, width, height, qtab, bx=None, by=None, half=128):
    """FDCT + quantize one component plane into zigzag-order int
    blocks (raster block order) — the shared front half of both the
    baseline and progressive encoders; quantization rounding matches
    `_encode_block` exactly. ``bx``/``by`` optionally force a LARGER
    grid than the plane's own ceil grid (MCU padding under
    subsampling — pad blocks edge-replicate, as in the baseline
    interleaved layout). Vectorized over all blocks when numpy is
    present (bit-identical — see _fdct_quant_zz_np); scalar fallback
    otherwise."""
    bx = bx if bx is not None else (width + 7) // 8
    by = by if by is not None else (height + 7) // 8
    if _np is not None:
        gathered = _gather_blocks_np(plane, width, height, bx, by, half)
        return _fdct_quant_zz_np(gathered, qtab).tolist()
    blocks = []
    for mby in range(by):
        for mbx in range(bx):
            block = [0.0] * 64
            for i in range(8):
                yy = min(mby * 8 + i, height - 1)
                for j in range(8):
                    xx = min(mbx * 8 + j, width - 1)
                    block[i * 8 + j] = plane[yy * width + xx] - half
            coef = _fdct8x8(block)
            q = [0] * 64
            for i in range(64):
                c = coef[i] / qtab[i]
                q[i] = int(c + 0.5) if c >= 0 else -int(-c + 0.5)
            blocks.append([q[_ZIGZAG[i]] for i in range(64)])
    return blocks


# Progressive scans need EOBn symbols ((r<<4)|0, r=1..14), which the
# Annex-K baseline AC tables do not define — libjpeg ships optimized
# tables with progressive output for the same reason. This flat custom
# table assigns every (run, size) symbol an 8-bit code (canonical,
# incomplete — the all-ones code stays unused as T.81 requires):
# compression is irrelevant for planted test media, completeness isn't.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


class _ProgressiveWriter(_BitWriter):
    """_BitWriter plus the progressive-scan bookkeeping of T.81 G.1.2:
    a pending EOB run and the correction bits buffered inside it (they
    are emitted together when the run breaks or the scan ends)."""

    def __init__(self):
        super().__init__()
        self.eobrun = 0
        self.corr = []  # buffered correction bits riding the EOB run

    def emit_eobrun(self, ac_codes):
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, ln = ac_codes[n << 4]
            self.write(code, ln)
            if n:
                self.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.corr:
            self.write(b, 1)
        self.corr = []


def encode_progressive_jpeg(
    width, height, pix, channels=3, quality=85, dc_split=True,
    ac_bands=((1, 5), (6, 63)), point_transform=1,
    subsampling="4:4:4",
):
    """Encode raw 8-bit pixels as a PROGRESSIVE JPEG (SOF2) using a
    libjpeg-shaped progression: DC first at Al=``point_transform``
    then a DC refinement scan (if ``dc_split``), per-component AC
    first scans over ``ac_bands`` at Al=``point_transform``, then one
    AC refinement scan per component down to Al=0. ``subsampling``
    (4:4:4/4:2:2/4:2:0) composes: DC scans interleave h x v blocks
    per MCU, AC scans raster each component's own ceil grid (T.81
    A.2.2/A.2.3). Quantized coefficients are identical to
    :func:`encode_jpeg`'s at the same subsampling, so decoding the
    progressive payload yields byte-identical pixels to decoding the
    baseline one — the invariant the tests pin. Exercises all four
    scan kinds the decoder implements (DC/AC x first/refine) plus
    genuine EOBn runs across blocks."""
    if channels not in (1, 3):
        raise NotImplementedError("JPEG encode supports 1 or 3 channels")
    if point_transform < (1 if dc_split else 0):
        raise ValueError("refinement scans need point_transform >= 1")
    hy, vy = _parse_subsampling(subsampling)
    if channels == 1 and (hy, vy) != (1, 1):
        raise ValueError("grayscale JPEG has no chroma to subsample")
    qlum = _scale_quant(_Q_LUM, quality)
    qchr = _scale_quant(_Q_CHR, quality)
    npx = width * height
    if channels == 1:
        planes = [list(pix[:npx])]
        dims = [(width, height)]
        factors = [(1, 1)]
    else:
        planes, dims = _subsample_planes(width, height, pix, hy, vy)
        factors = [(hy, vy), (1, 1), (1, 1)]
    qtabs = [qlum] + ([qchr, qchr] if channels == 3 else [])
    dc_specs = [_DC_LUM] + ([_DC_CHR, _DC_CHR] if channels == 3 else [])
    dc_codes = [_huff_codes(*s) for s in dc_specs]
    ac_prog = _huff_codes(*_AC_PROG)
    ac_codes = [ac_prog] * channels  # one custom AC table serves all
    mcux = (width + 8 * hy - 1) // (8 * hy)
    mcuy = (height + 8 * vy - 1) // (8 * vy)
    # blocks over the MCU-PADDED grid, so the interleaved DC scans
    # cover the same block set (in the same order) as the baseline
    # encoder — pad blocks edge-replicate identically
    blocks = [
        _component_zz_blocks(
            planes[c], dims[c][0], dims[c][1], qtabs[c],
            bx=mcux * factors[c][0], by=mcuy * factors[c][1],
        )
        for c in range(channels)
    ]
    al = point_transform

    def comp_ac_blocks(c):
        # the component's OWN ceil grid mapped into the padded grid —
        # exactly the raster a non-interleaved decoder walks
        hc, vc = factors[c]
        ncols = mcux * hc
        cw = ((width * hc + hy - 1) // hy + 7) // 8
        chh = ((height * vc + vy - 1) // vy + 7) // 8
        for bi in range(cw * chh):
            yield blocks[c][(bi // cw) * ncols + (bi % cw)]

    def dc_first_scan():
        bw = _BitWriter()
        prev = [0] * channels
        for mby in range(mcuy):
            for mbx in range(mcux):
                for c in range(channels):
                    hc, vc = factors[c]
                    ncols = mcux * hc
                    for r in range(vc):
                        for q in range(hc):
                            zz = blocks[c][
                                (mby * vc + r) * ncols + (mbx * hc + q)
                            ]
                            v = zz[0] >> al  # arithmetic shift, T.81 DC
                            diff = v - prev[c]
                            prev[c] = v
                            size, bits = _category(diff)
                            code, ln = dc_codes[c][size]
                            bw.write(code, ln)
                            if size:
                                bw.write(bits, size)
        bw.flush()
        return bw.buf

    def dc_refine_scan(bit_pos):
        bw = _BitWriter()
        for mby in range(mcuy):
            for mbx in range(mcux):
                for c in range(channels):
                    hc, vc = factors[c]
                    ncols = mcux * hc
                    for r in range(vc):
                        for q in range(hc):
                            zz = blocks[c][
                                (mby * vc + r) * ncols + (mbx * hc + q)
                            ]
                            bw.write((zz[0] >> bit_pos) & 1, 1)
        bw.flush()
        return bw.buf

    def ac_first_scan(c, ss, se, shift):
        bw = _ProgressiveWriter()
        codes = ac_codes[c]
        for zz in comp_ac_blocks(c):
            run = 0
            any_emitted = False
            for k in range(ss, se + 1):
                t = zz[k]
                v = (t >> shift) if t >= 0 else -((-t) >> shift)
                if v == 0:
                    run += 1
                    continue
                bw.emit_eobrun(codes)
                while run > 15:
                    code, ln = codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size, bits = _category(v)
                code, ln = codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
                any_emitted = True
            if run or not any_emitted:
                bw.eobrun += 1
                if bw.eobrun == 0x7FFF:
                    bw.emit_eobrun(codes)
        bw.emit_eobrun(codes)
        bw.flush()
        return bw.buf

    def ac_refine_scan(c, ss, se, ah, shift):
        # T.81 G.1.2.3 encoder (the libjpeg encode_mcu_AC_refine
        # shape): newly-significant coefficients emit (run, 1) + sign;
        # already-significant ones buffer one correction bit each,
        # released with the next emitted symbol or EOB-run flush
        bw = _ProgressiveWriter()
        codes = ac_codes[c]
        for zz in comp_ac_blocks(c):
            absv = {}
            eob = ss - 1  # last newly-significant position
            for k in range(ss, se + 1):
                a = -zz[k] if zz[k] < 0 else zz[k]
                a >>= shift
                absv[k] = a
                if a == 1:
                    eob = k
            run = 0
            pend = []  # this block's not-yet-released correction bits
            for k in range(ss, se + 1):
                a = absv[k]
                if a == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    bw.emit_eobrun(codes)
                    code, ln = codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                    for b in pend:
                        bw.write(b, 1)
                    pend = []
                if a > 1:
                    pend.append(a & 1)
                    continue
                bw.emit_eobrun(codes)
                code, ln = codes[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(0 if zz[k] < 0 else 1, 1)
                run = 0
                for b in pend:
                    bw.write(b, 1)
                pend = []
            if run > 0 or pend:
                bw.eobrun += 1
                bw.corr.extend(pend)
                if bw.eobrun == 0x7FFF:
                    bw.emit_eobrun(codes)
        bw.emit_eobrun(codes)
        bw.flush()
        return bw.buf

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(scan_comps, ss, se, ah, al_):
        head = bytes([len(scan_comps)])
        for c in scan_comps:
            # DC scans read Td (Annex-K 0/1); AC scans read Ta, always
            # the shared custom table 0
            head += bytes([c + 1, (0 if c == 0 else 1) << 4])
        return seg(0xFFDA, head + bytes([ss, se, (ah << 4) | al_]))

    out = bytearray(b"\xFF\xD8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(qlum[_ZIGZAG[i]] for i in range(64)))
    if channels == 3:
        out += seg(
            0xFFDB, bytes([1]) + bytes(qchr[_ZIGZAG[i]] for i in range(64))
        )
    comp = b"".join(
        bytes([
            c + 1,
            (factors[c][0] << 4) | factors[c][1],
            0 if c == 0 else 1,
        ])
        for c in range(channels)
    )
    out += seg(
        0xFFC2,  # SOF2: progressive
        bytes([8]) + struct.pack(">HH", height, width)
        + bytes([channels]) + comp,
    )
    for tid, (bits, vals) in (
        [(0x00, _DC_LUM), (0x10, _AC_PROG)]
        + ([(0x01, _DC_CHR)] if channels == 3 else [])
    ):
        out += seg(0xFFC4, bytes([tid]) + bytes(bits) + bytes(vals))

    # scan 1: DC first for all components
    out += sos(list(range(channels)), 0, 0, 0, al)
    out += dc_first_scan()
    # per component: AC first scans over the requested bands
    for c in range(channels):
        for ss, se in ac_bands:
            out += sos([c], ss, se, 0, al)
            out += ac_first_scan(c, ss, se, al)
    # refinement down to Al=0, one bit position per scan
    for bit_pos in range(al - 1, -1, -1):
        if dc_split:
            out += sos(list(range(channels)), 0, 0, bit_pos + 1, bit_pos)
            out += dc_refine_scan(bit_pos)
        for c in range(channels):
            out += sos([c], 1, 63, bit_pos + 1, bit_pos)
            out += ac_refine_scan(c, 1, 63, bit_pos + 1, bit_pos)
    out += b"\xFF\xD9"
    return bytes(out)


class _BitReader:
    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _pull(self):
        """Refill one byte into the accumulator (handles 0xFF00 byte
        stuffing). Byte-pull trigger points — and therefore the
        truncation / unexpected-marker error positions — are identical
        to reading bit-by-bit: a byte is only ever pulled when a
        requested bit needs it."""
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError("unexpected marker in entropy stream")
        self.acc = ((self.acc & ((1 << self.n) - 1)) << 8) | b
        self.n += 8

    def bit(self):
        if self.n == 0:
            self._pull()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k):
        while self.n < k:
            self._pull()
        self.n -= k
        return (self.acc >> self.n) & ((1 << k) - 1)

    def restart(self, n):
        """Consume an expected RSTn marker: discard pad bits to the
        byte boundary, skip any fully-padded stuffed 0xFF00 pair, then
        require the exact cycling marker — a wrong or missing RST
        means the stream is corrupt or the interval mismatched."""
        self.n = 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + n
        ):
            raise ValueError("expected JPEG restart marker RST%d" % n)
        self.pos += 2


def _read_huff_symbol(br, table):
    """Decode one Huffman symbol via the 16-bit peek table: bytes are
    pulled SPECULATIVELY until 16 bits are buffered, the window is
    matched with ONE list index, then the reader state is rewound to
    exactly what the lazy bit-by-bit walk would have left (same
    acc/n/pos — only the bytes the walk itself would have pulled stay
    consumed), so stuffing, restart and truncation behavior are
    bit-identical. Near a marker or the end of data (where 16 bits
    cannot be buffered without observing the failure early) it falls
    back to the original lazy walk, preserving error positions."""
    lookup, fast = table
    acc, n, pos, data = br.acc, br.n, br.pos, br.data
    n0, pos0 = n, pos
    p1 = -1  # pos after the first speculative byte pull
    ln = len(data)
    while n < 16:
        if pos >= ln:
            break
        b = data[pos]
        npos = pos + 1
        if b == 0xFF:
            nxt = data[npos] if npos < ln else 0
            if nxt == 0x00:
                npos += 1  # stuffed byte
            else:
                break  # marker: the lazy walk raises only when needed
        acc = ((acc & ((1 << n) - 1)) << 8) | b
        n += 8
        if p1 < 0:
            p1 = npos
        pos = npos
    if n >= 16:
        e = fast[(acc >> (n - 16)) & 0xFFFF]
        # no match for any prefix: the lazy walk consumes all 16 bits
        # before raising, so treat the miss as a 16-bit consume
        length = 16 if e < 0 else e & 31
        # rewind: keep only the bytes the lazy walk would have pulled
        need = 0 if length <= n0 else (length - n0 + 7) >> 3
        extra = ((n - n0) >> 3) - need
        if extra:
            acc >>= 8 * extra
            n -= 8 * extra
            pos = pos0 if need == 0 else p1
        br.acc, br.n, br.pos = acc, n - length, pos
        if e < 0:
            raise ValueError("invalid JPEG Huffman code")
        return e >> 5
    # tail / marker fallback: the original lazy walk from the pre-call
    # state (the speculative pulls above are discarded untouched)
    acc, n, pos = br.acc, br.n, br.pos
    get = lookup.get
    code = 0
    for length in range(1, 17):
        if n == 0:
            if pos >= len(data):
                br.acc, br.n, br.pos = acc, n, pos
                raise ValueError("JPEG entropy stream truncated")
            b = data[pos]
            pos += 1
            if b == 0xFF:
                nxt = data[pos] if pos < len(data) else 0
                if nxt == 0x00:
                    pos += 1  # stuffed byte
                else:
                    br.acc, br.n, br.pos = acc, n, pos
                    raise ValueError("unexpected marker in entropy stream")
            acc = b
            n = 8
        n -= 1
        code = (code << 1) | ((acc >> n) & 1)
        sym = get((length, code))
        if sym is not None:
            br.acc, br.n, br.pos = acc, n, pos
            return sym
    br.acc, br.n, br.pos = acc, n, pos
    raise ValueError("invalid JPEG Huffman code")


def _extend(v, size):
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block_baseline(br, zz, htabs, dc_key, ac_key, pred, al):
    """Decode one baseline block (DC diff + AC run-length) with the
    bit-reader state held in LOCALS and synced to ``br`` once at block
    end — the per-symbol/per-bits method and state-restore overhead of
    the general path is the bulk of baseline decode cost.

    Semantics are bit-identical to the lazy per-bit reader:

    - bytes are pulled speculatively (up to 32 bits buffered — one
      symbol plus its value bits never need more), and the final sync
      rewinds (acc, n, pos) so only the bytes the lazy walk would have
      pulled stay consumed — restart markers and subsequent reads see
      exactly the lazy state;
    - a refill stopped by a marker / end of data only raises when a
      consumed bit actually needs it, with the lazy reader's message;
    - near the stream tail the 16-bit window is zero-padded LOW: the
      code set is prefix-free, so the padded window matches a real
      code iff the lazy walk would match it within the available bits,
      and a match longer than the available bits means the lazy walk
      would have hit the recorded refill failure.

    Returns the new DC predictor."""
    data = br.data
    nd = len(data)
    acc, n, pos = br.acc, br.n, br.pos
    n0, pos0 = n, pos
    pulls = []
    consumed = 0
    stop = None  # pending refill-failure message, raised only if hit
    dfast = htabs[dc_key][1]
    # --- DC coefficient ---
    while n < 32 and stop is None:
        if pos >= nd:
            stop = "JPEG entropy stream truncated"
            break
        b = data[pos]
        npos = pos + 1
        if b == 0xFF:
            nxt = data[npos] if npos < nd else 0
            if nxt == 0x00:
                npos += 1  # stuffed byte
            else:
                stop = "unexpected marker in entropy stream"
                break
        acc = ((acc & ((1 << n) - 1)) << 8) | b
        n += 8
        pos = npos
        pulls.append(pos)
    if n >= 16:
        e = dfast[(acc >> (n - 16)) & 0xFFFF]
    else:
        e = dfast[(acc << (16 - n)) & 0xFFFF]
    length = 16 if e < 0 else e & 31
    if length > n:
        raise ValueError(stop)
    if e < 0:
        raise ValueError("invalid JPEG Huffman code")
    n -= length
    consumed += length
    size = e >> 5
    if size:
        # a (corrupt) DC slot can carry AC-style symbols up to 255, so
        # the value-bit count is NOT bounded by the 32-bit refill above
        # — keep pulling like the lazy reader would
        while size > n and stop is None:
            if pos >= nd:
                stop = "JPEG entropy stream truncated"
                break
            b = data[pos]
            npos = pos + 1
            if b == 0xFF:
                nxt = data[npos] if npos < nd else 0
                if nxt == 0x00:
                    npos += 1  # stuffed byte
                else:
                    stop = "unexpected marker in entropy stream"
                    break
            acc = ((acc & ((1 << n) - 1)) << 8) | b
            n += 8
            pos = npos
            pulls.append(pos)
        if size > n:
            raise ValueError(stop)
        n -= size
        consumed += size
        v = (acc >> n) & ((1 << size) - 1)
        pred += v if v >= (1 << (size - 1)) else v - (1 << size) + 1
    zz[0] = pred << al
    # --- AC coefficients ---
    afast = htabs[ac_key][1]
    k = 1
    while k < 64:
        while n < 32 and stop is None:
            if pos >= nd:
                stop = "JPEG entropy stream truncated"
                break
            b = data[pos]
            npos = pos + 1
            if b == 0xFF:
                nxt = data[npos] if npos < nd else 0
                if nxt == 0x00:
                    npos += 1  # stuffed byte
                else:
                    stop = "unexpected marker in entropy stream"
                    break
            acc = ((acc & ((1 << n) - 1)) << 8) | b
            n += 8
            pos = npos
            pulls.append(pos)
        if n >= 16:
            e = afast[(acc >> (n - 16)) & 0xFFFF]
        else:
            e = afast[(acc << (16 - n)) & 0xFFFF]
        length = 16 if e < 0 else e & 31
        if length > n:
            raise ValueError(stop)
        if e < 0:
            raise ValueError("invalid JPEG Huffman code")
        n -= length
        consumed += length
        rs = e >> 5
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("JPEG AC run overflow")
        size = rs & 0xF
        if size:
            if size > n:
                raise ValueError(stop)
            n -= size
            consumed += size
            v = (acc >> n) & ((1 << size) - 1)
            zz[k] = v if v >= (1 << (size - 1)) else v - (1 << size) + 1
        else:
            zz[k] = 0
        k += 1
    # --- sync: rewind to the lazy walk's exact state ---
    needed = 0 if consumed <= n0 else (consumed - n0 + 7) >> 3
    extra = len(pulls) - needed
    if extra:
        acc >>= 8 * extra
        n -= 8 * extra
        pos = pos0 if needed == 0 else pulls[needed - 1]
    br.acc, br.n, br.pos = acc, n, pos
    return pred


def _decode_scan(
    entropy, coefs, scomps, htabs, ss, se, ah, al, progressive,
    geom, mcux, mcuy, restart_interval,
):
    """Decode one entropy-coded scan into the persistent per-component
    coefficient state (zigzag-order ints). Handles all four
    progressive scan kinds (T.81 G.1.2: DC first / DC refine / AC
    first with EOBn runs / AC refine with correction bits) plus the
    baseline interleaved DC+AC scan, with RSTn restarts resetting
    predictors and the EOB run. ``geom[ci]`` is the component's
    (h, v, ncols, cw, ch): sampling factors, the MCU-padded block-grid
    column count, and the NON-padded block-grid dims that
    single-component (non-interleaved) scans raster over — T.81 A.2.2
    vs A.2.3; they only differ when subsampling pads the MCU grid."""
    br = _BitReader(entropy)
    prev_dc = {ci: 0 for ci, _, _ in scomps}
    rst_expect = 0

    def decode_dc_ac(zz, ci, dc_t, ac_t):
        # one block of a baseline scan or a progressive DC scan
        if progressive and ah != 0:
            # DC refinement: one more magnitude bit
            if br.bit():
                zz[0] |= 1 << al
            return
        dct = htabs[0x00 | dc_t]
        size = _read_huff_symbol(br, dct)
        prev_dc[ci] += _extend(br.bits(size), size)
        zz[0] = prev_dc[ci] << al
        if progressive:
            return  # DC-only scan
        act = htabs[0x10 | ac_t]
        k = 1
        while k < 64:
            rs = _read_huff_symbol(br, act)
            run, size = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("JPEG AC run overflow")
            zz[k] = _extend(br.bits(size), size)
            k += 1

    if (not progressive or ss == 0) and len(scomps) > 1:
        # interleaved: MCU = h x v blocks per component (T.81 A.2.3)
        if progressive and se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        mcu = 0
        for mby in range(mcuy):
            for mbx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    br.restart(rst_expect)
                    rst_expect = (rst_expect + 1) & 7
                    prev_dc = {ci: 0 for ci, _, _ in scomps}
                mcu += 1
                for ci, dc_t, ac_t in scomps:
                    h, v, ncols, _, _ = geom[ci]
                    for r in range(v):
                        for q in range(h):
                            zz = coefs[ci][
                                (mby * v + r) * ncols + (mbx * h + q)
                            ]
                            if progressive:
                                decode_dc_ac(zz, ci, dc_t, ac_t)
                            else:
                                prev_dc[ci] = _decode_block_baseline(
                                    br, zz, htabs,
                                    0x00 | dc_t, 0x10 | ac_t,
                                    prev_dc[ci], al,
                                )
        return

    # single-component scan: non-interleaved raster over the
    # component's OWN (non-MCU-padded) block grid (T.81 A.2.2) —
    # baseline per-component scans and progressive DC all land here
    # too, sharing decode_dc_ac
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ci, dc_t, ac_t = scomps[0]
    _, _, ncols, cw, chh = geom[ci]
    if not progressive or ss == 0:
        if progressive and se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        for bi in range(cw * chh):
            if restart_interval and bi and bi % restart_interval == 0:
                br.restart(rst_expect)
                rst_expect = (rst_expect + 1) & 7
                prev_dc = {ci: 0}
            zz = coefs[ci][(bi // cw) * ncols + (bi % cw)]
            if progressive:
                decode_dc_ac(zz, ci, dc_t, ac_t)
            else:
                prev_dc[ci] = _decode_block_baseline(
                    br, zz, htabs, 0x00 | dc_t, 0x10 | ac_t,
                    prev_dc[ci], al,
                )
        return

    act = htabs[0x10 | ac_t]
    eobrun = 0
    p1, n1 = 1 << al, -(1 << al)
    for bi in range(cw * chh):
        if restart_interval and bi and bi % restart_interval == 0:
            br.restart(rst_expect)
            rst_expect = (rst_expect + 1) & 7
            eobrun = 0
        zz = coefs[ci][(bi // cw) * ncols + (bi % cw)]
        if ah == 0:
            # first pass over this band: value bits at magnitude al
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _read_huff_symbol(br, act)
                run, size = rs >> 4, rs & 0xF
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    eobrun = (1 << run) - 1  # EOBn: run of all-zero bands
                    if run:
                        eobrun += br.bits(run)
                    break
                k += run
                if k > se:
                    raise ValueError("JPEG AC run overflow")
                zz[k] = _extend(br.bits(size), size) * (1 << al)
                k += 1
        else:
            # refinement pass (G.1.2.3): newly-significant coefficients
            # arrive as (run, 1) symbols; already-significant ones each
            # consume one correction bit as the scan passes over them
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _read_huff_symbol(br, act)
                    run, size = rs >> 4, rs & 0xF
                    val = 0
                    if size:
                        if size != 1:
                            raise ValueError(
                                "bad JPEG refinement magnitude"
                            )
                        val = p1 if br.bit() else n1
                    elif run != 15:
                        eobrun = 1 << run
                        if run:
                            eobrun += br.bits(run)
                        break
                    # advance over `run` zero-history positions,
                    # refining every nonzero-history one on the way
                    while k <= se:
                        if zz[k] != 0:
                            if br.bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else n1
                        else:
                            run -= 1
                            if run < 0:
                                break
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                # inside an EOB run: only correction bits remain
                while k <= se:
                    if zz[k] != 0:
                        if br.bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else n1
                    k += 1
                eobrun -= 1


def _idct_blocks_np(zzarr, qt):
    """Vectorized dequantize + IDCT over (nb, 64) zigzag-order int
    coefficient rows -> (nb, 8, 8) float64 spatial blocks.

    Bit-exact replication of the scalar ``_idct8x8`` call sites:
    dequantization multiplies integers (exact), terms are formed with
    the scalar association ``((C[v]*coef) * (C[u]*COS[u][x])) *
    COS[v][y]`` and accumulated SEQUENTIALLY in the scalar (u, v) loop
    order (64 in-place vector adds, not a pairwise-summed ``sum``),
    then scaled by 0.25."""
    qt_np = _np.asarray(qt, dtype=_np.int64)
    dq_zz = _np.asarray(zzarr, dtype=_np.int64) * qt_np[_NP_ZIGZAG][None, :]
    nb = dq_zz.shape[0]
    coef = _np.zeros((nb, 64), dtype=_np.int64)
    coef[:, _NP_ZIGZAG] = dq_zz
    # A[b, t=(u8+v)] = C[v] * coef[b, u*8+v] — the scalar term's first
    # product; then term[b, t, x, y] = (A * (C[u]*COS[u][x])) * COS[v][y]
    # in two whole-tensor multiplies, accumulated with 64 sequential
    # in-place adds in the scalar loop's (u, v) order. Chunked like
    # _fdct_quant_zz_np to bound the (chunk, 64, 8, 8) term tensor
    # (bit-exact: per-block independent).
    a = _NP_C_TILED[None, :] * coef.astype(_np.float64)
    out = _np.empty((nb, 8, 8), dtype=_np.float64)
    for lo in range(0, nb, _DCT_CHUNK_BLOCKS):
        chunk = a[lo : lo + _DCT_CHUNK_BLOCKS]
        t = (
            chunk[:, :, None, None] * _NP_ID_UX[None, :, :, None]
        ) * _NP_ID_VY[None, :, None, :]
        # sequential left fold in one dispatch (see _fdct_quant_zz_np)
        _np.add.accumulate(t, axis=1, out=t)
        out[lo : lo + chunk.shape[0]] = 0.25 * t[:, 63]
    return out


def _reconstruct_np(width, height, ncomp, coefs, geom, comps, qtabs, mcuy, prec):
    """Vectorized back half of ``decode_jpeg`` (dequant + IDCT + plane
    assembly + chroma upsample + color transform). Bit-identical to the
    scalar path: rounding is round-half-even (``round`` and ``np.rint``
    agree), clamps and shifts are integer-exact, and the YCbCr->RGB
    expressions keep the scalar association."""
    hmax = max(g[0] for g in geom)
    vmax = max(g[1] for g in geom)
    half, maxv, shift = 1 << (prec - 1), (1 << prec) - 1, prec - 8
    planes = []
    for c in range(ncomp):
        hs, vs, ncols, _, _ = geom[c]
        nrows = mcuy * vs
        qt = qtabs[comps[c][1]]
        blocks = _idct_blocks_np(coefs[c], qt)
        v = _np.rint(blocks).astype(_np.int64) + half
        v = _np.clip(v, 0, maxv) >> shift
        plane = (
            v.reshape(nrows, ncols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nrows * 8, ncols * 8)
        )
        planes.append(plane)
    if ncomp == 1:
        out = planes[0][:height, :width].astype(_np.uint8)
        return width, height, 1, out.tobytes()
    rows_idx = [
        (_np.arange(height) * g[1]) // vmax for g in geom
    ]
    cols_idx = [
        (_np.arange(width) * g[0]) // hmax for g in geom
    ]
    y = planes[0][_np.ix_(rows_idx[0], cols_idx[0])].astype(_np.float64)
    cb = (
        planes[1][_np.ix_(rows_idx[1], cols_idx[1])] - 128
    ).astype(_np.float64)
    cr = (
        planes[2][_np.ix_(rows_idx[2], cols_idx[2])] - 128
    ).astype(_np.float64)
    rr = _np.rint(y + 1.402 * cr).astype(_np.int64)
    gg = _np.rint(y - 0.344136 * cb - 0.714136 * cr).astype(_np.int64)
    bb = _np.rint(y + 1.772 * cb).astype(_np.int64)
    rgb = _np.stack(
        [
            _np.clip(rr, 0, 255),
            _np.clip(gg, 0, 255),
            _np.clip(bb, 0, 255),
        ],
        axis=-1,
    ).astype(_np.uint8)
    return width, height, 3, rgb.tobytes()


def decode_jpeg(content):
    """Decode a JPEG: returns (width, height, channels, pixel_bytes).
    Supports 8-bit baseline sequential (SOF0) AND progressive (SOF2 —
    spectral selection, successive approximation, EOBn runs), 1 or 3
    components, ANY legal chroma subsampling (sampling factors 1-4,
    incl. the ubiquitous 4:2:0 and 4:2:2 — subsampled planes upsample
    by nearest-neighbor sample replication), 8- or 12-bit samples
    (12-bit pixels come back as their high byte, the PNG-16
    discipline), with DRI/RSTn restart markers (predictor reset +
    cycling-marker verification). Scans accumulate into per-component
    coefficient state; dequantization + IDCT run once after the last
    scan."""
    if content[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    i = 2
    qtabs = {}
    htabs = {}
    width = height = None
    ncomp = 0
    comps = []  # (id, qtab_id)
    progressive = False
    coefs = None  # per comp: list of zigzag-order [64] int blocks
    geom = None  # per comp: (h, v, ncols, cw, ch)
    mcux = mcuy = 0
    prec = 8
    got_scan = False
    restart_interval = 0
    while i < len(content):
        if content[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = content[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (ln,) = struct.unpack(">H", content[i : i + 2])
        payload = content[i + 2 : i + ln]
        i += ln
        m = 0xFF00 | marker
        if m == 0xFFDB:
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0xF
                if pq == 1:  # 16-bit entries (12-bit sample streams)
                    if j + 129 > len(payload):
                        raise ValueError("truncated JPEG quant table")
                    zz = struct.unpack(">64H", payload[j + 1 : j + 129])
                    j += 129
                elif pq == 0:
                    zz = payload[j + 1 : j + 65]
                    j += 65
                else:
                    raise ValueError(f"bad JPEG quant precision {pq}")
                tab = [0] * 64
                for k in range(64):
                    tab[_ZIGZAG[k]] = zz[k]
                qtabs[tq] = tab
        elif m in (0xFFC0, 0xFFC2):
            progressive = m == 0xFFC2
            prec = payload[0]
            if prec not in (8, 12):
                raise NotImplementedError("only 8/12-bit JPEG samples")
            height, width = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            factors = []
            for c in range(ncomp):
                cid, samp, tq = payload[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad JPEG sampling factors {samp:#x}")
                comps.append((cid, tq))
                factors.append((hs, vs))
            hmax = max(f[0] for f in factors)
            vmax = max(f[1] for f in factors)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            geom = []
            for hs, vs in factors:
                # MCU-padded grid (interleaved scans) vs the
                # component's own ceil grid (non-interleaved scans)
                cw = ((width * hs + hmax - 1) // hmax + 7) // 8
                chh = ((height * vs + vmax - 1) // vmax + 7) // 8
                geom.append((hs, vs, mcux * hs, cw, chh))
            coefs = [
                [
                    [0] * 64
                    for _ in range(mcux * hs * mcuy * vs)
                ]
                for hs, vs in factors
            ]
        elif m in (0xFFC1, 0xFFC3):
            raise NotImplementedError(
                "only baseline sequential or progressive JPEG"
            )
        elif m == 0xFFDD:
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif m == 0xFFC4:
            j = 0
            while j < len(payload):
                tc_th = payload[j]
                bits = list(payload[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(payload[j + 17 : j + 17 + nv])
                htabs[tc_th] = _huff_decoder(bits, vals)
                j += 17 + nv
        elif m == 0xFFDA:
            if coefs is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            scomps = []
            for c in range(ns):
                cs, tables = payload[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    (
                        idx
                        for idx, (cid, _) in enumerate(comps)
                        if cid == cs
                    ),
                    None,
                )
                if ci is None:
                    raise ValueError("JPEG scan references unknown component")
                scomps.append((ci, tables >> 4, tables & 0xF))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            # entropy data runs from i to the next non-RST marker
            start = i
            j = i
            while j < len(content) - 1:
                if content[j] == 0xFF and content[j + 1] not in (
                    0x00,
                ) and not (0xD0 <= content[j + 1] <= 0xD7):
                    break
                j += 1
            _decode_scan(
                content[start:j], coefs, scomps, htabs,
                ss, se, ahal >> 4, ahal & 0xF,
                progressive, geom, mcux, mcuy, restart_interval,
            )
            got_scan = True
            i = j
    if width is None or not got_scan:
        raise ValueError("JPEG missing SOF/SOS")
    if ncomp not in (1, 3):
        raise NotImplementedError("JPEG with 2 or >3 components")
    if _np is not None:
        return _reconstruct_np(
            width, height, ncomp, coefs, geom, comps, qtabs, mcuy, prec
        )
    hmax = max(g[0] for g in geom)
    vmax = max(g[1] for g in geom)
    planes = []
    widths8 = []
    for c in range(ncomp):
        hs, vs, ncols, _, _ = geom[c]
        nrows = mcuy * vs
        w8 = ncols * 8
        plane = [0] * (w8 * nrows * 8)
        qt = qtabs[comps[c][1]]
        # 12-bit samples clamp at their own range, then take the
        # standard high-byte downsample (the PNG-16 discipline) so the
        # byte-pixel contract holds at every precision
        half, maxv, shift = 1 << (prec - 1), (1 << prec) - 1, prec - 8
        for bi, zz in enumerate(coefs[c]):
            coef = [0.0] * 64
            for k in range(64):
                coef[_ZIGZAG[k]] = zz[k] * qt[_ZIGZAG[k]]
            block = _idct8x8(coef)
            mby, mbx = divmod(bi, ncols)
            for r in range(8):
                base = (mby * 8 + r) * w8 + mbx * 8
                for s in range(8):
                    v = int(round(block[r * 8 + s])) + half
                    v = 0 if v < 0 else (maxv if v > maxv else v)
                    plane[base + s] = v >> shift
        planes.append(plane)
        widths8.append(w8)

    out = bytearray(width * height * ncomp)
    if ncomp == 1:
        p = planes[0]
        w8 = widths8[0]
        for r in range(height):
            row = r * w8
            for c in range(width):
                out[r * width + c] = p[row + c]
    else:
        py_, pcb, pcr = planes
        wy, wcb, wcr = widths8
        (hy_, vy_), (hb, vb), (hr_, vr_) = (g[:2] for g in geom)
        full_h = hy_ == hmax and hb == hmax and hr_ == hmax
        for r in range(height):
            # per-plane row bases hoisted: nearest-neighbor chroma
            # upsample (sample replication) costs two divisions per
            # ROW, not per pixel; horizontally-full layouts (incl.
            # the ubiquitous 4:4:4) keep direct row indexing
            ry = (r * vy_ // vmax) * wy
            rb = (r * vb // vmax) * wcb
            rr_ = (r * vr_ // vmax) * wcr
            for c in range(width):
                if full_h:
                    y = py_[ry + c]
                    cb = pcb[rb + c] - 128
                    cr = pcr[rr_ + c] - 128
                else:
                    y = py_[ry + c * hy_ // hmax]
                    cb = pcb[rb + c * hb // hmax] - 128
                    cr = pcr[rr_ + c * hr_ // hmax] - 128
                rr = int(round(y + 1.402 * cr))
                gg = int(round(y - 0.344136 * cb - 0.714136 * cr))
                bb = int(round(y + 1.772 * cb))
                o = (r * width + c) * 3
                out[o] = 0 if rr < 0 else (255 if rr > 255 else rr)
                out[o + 1] = 0 if gg < 0 else (255 if gg > 255 else gg)
                out[o + 2] = 0 if bb < 0 else (255 if bb > 255 else bb)
    return width, height, ncomp, bytes(out)

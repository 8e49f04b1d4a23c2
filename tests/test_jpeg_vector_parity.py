"""The vectorized (NumPy) JPEG stages must be BIT-IDENTICAL to the
scalar zero-dependency path: encoded bytes and decoded pixels both.

The vectorized kernels replicate the scalar float operations in the
same order and association (sequential 64-term DCT accumulation, the
scalar color-transform expression shapes, round-half-even via
``np.rint``), so this is an equality pin, not a tolerance check. Any
drift here would silently change decoded pixel sums — values the
multimodal contract queries hash against closed-form oracles.
"""

from __future__ import annotations

import pytest

import dbscan_pyspark_spark.operators.jpeg as jpeg_mod
from dbscan_pyspark_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_progressive_jpeg,
)


def _pix(w, h, ch, base, prec=8):
    maxv = (1 << prec) - 1
    if prec == 8:
        return bytes((base + 7 * j) % 256 for j in range(w * h * ch))
    return [(base * 16 + 37 * j) % (maxv + 1) for j in range(w * h * ch)]


@pytest.fixture
def scalar_path(monkeypatch):
    """Force the pure-Python fallback inside jpeg.py."""

    def run(fn, *args, **kwargs):
        monkeypatch.setattr(jpeg_mod, "_np", None)
        try:
            return fn(*args, **kwargs)
        finally:
            monkeypatch.undo()

    return run


CASES = [
    # (w, h, channels, subsampling, quality, precision, restart)
    (8, 8, 1, "4:4:4", 85, 8, 0),
    (16, 8, 3, "4:4:4", 85, 8, 0),
    (24, 16, 3, "4:2:2", 50, 8, 0),
    (24, 16, 3, "4:2:0", 85, 8, 2),
    (13, 11, 3, "4:2:0", 85, 8, 0),  # non-multiple-of-8 dims
    (16, 16, 3, "4:4:4", 85, 12, 0),
    (24, 16, 3, "4:2:0", 85, 12, 0),
]


@pytest.mark.parametrize("case", CASES)
def test_encode_decode_np_equals_scalar(case, scalar_path):
    w, h, ch, sub, q, prec, rst = case
    pix = _pix(w, h, ch, 3, prec)
    assert jpeg_mod._np is not None, "numpy expected in this environment"
    jp_np = encode_jpeg(
        w, h, pix, ch, quality=q, subsampling=sub, precision=prec,
        restart_interval=rst,
    )
    jp_sc = scalar_path(
        encode_jpeg, w, h, pix, ch, quality=q, subsampling=sub,
        precision=prec, restart_interval=rst,
    )
    assert jp_np == jp_sc, "vectorized encoder drifted from scalar bytes"
    d_np = decode_jpeg(jp_np)
    d_sc = scalar_path(decode_jpeg, jp_np)
    assert d_np == d_sc, "vectorized decoder drifted from scalar pixels"


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_progressive_np_equals_scalar(sub, scalar_path):
    w, h = 24, 16
    pix = _pix(w, h, 3, 5)
    pg_np = encode_progressive_jpeg(w, h, pix, 3, subsampling=sub)
    pg_sc = scalar_path(encode_progressive_jpeg, w, h, pix, 3, subsampling=sub)
    assert pg_np == pg_sc
    assert decode_jpeg(pg_np) == scalar_path(decode_jpeg, pg_np)


def test_huff_fast_table_agrees_with_walk_map():
    """The 16-bit peek table must resolve EVERY window exactly as the
    canonical (length, code) walk map: same symbol via the shortest
    matching prefix, -1 iff no code prefixes the window. The baseline
    block decoder reads symbols exclusively through this table."""
    specs = [
        jpeg_mod._DC_LUM, jpeg_mod._DC_CHR,
        jpeg_mod._AC_LUM, jpeg_mod._AC_CHR,
        jpeg_mod._AC_PROG, jpeg_mod._DC_EXT, jpeg_mod._AC_EXT,
    ]
    for bits, values in specs:
        lookup, fast = jpeg_mod._huff_decoder(bits, values)
        # every code's full span maps to (symbol, length)
        covered = 0
        for (length, code), sym in lookup.items():
            start = code << (16 - length)
            span = 1 << (16 - length)
            packed = (sym << 5) | length
            assert fast[start] == packed
            assert fast[start + span - 1] == packed
            assert fast[start + span // 2] == packed
            covered += span
        # everything outside the code spans is a miss
        assert fast.count(-1) == 65536 - covered


def test_baseline_truncation_errors_match_lazy_reader():
    """Truncating a baseline payload anywhere in the entropy segment
    must keep raising the lazy bit-reader's exact errors (the inlined
    block decoder pulls bytes speculatively but only reports a failure
    a consumed bit actually needs)."""
    pix = _pix(24, 16, 3, 9)
    blob = encode_jpeg(24, 16, pix, 3, quality=85, restart_interval=2)
    sos = blob.find(b"\xff\xda")
    assert sos > 0
    allowed = {
        "JPEG entropy stream truncated",
        "unexpected marker in entropy stream",
        "invalid JPEG Huffman code",
        "JPEG missing SOF/SOS",
        "bad JPEG marker stream",
        "JPEG AC run overflow",
        "expected JPEG restart marker",
    }
    n_err = 0
    for cut in range(sos + 16, len(blob) - 1, 7):
        try:
            decode_jpeg(blob[:cut])
        except ValueError as exc:
            assert any(str(exc).startswith(a) for a in allowed), exc
            n_err += 1
        except NotImplementedError:
            pass
    assert n_err > 0

"""PNM codec (kernels/pnmcodec.py) — the reference's codec
intermediate (``jpeg2000.py:63-84``: every kakadu round-trip goes
through a ``.pnm`` temp file).  Evidence: P4/P5/P6 round-trips via
our own encoder, hand-written ASCII fixtures for P1-P3, maxval
scaling including 2-byte big-endian raw samples, and typed errors."""

import struct

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.pnmcodec import (
    PnmError, decode_pnm, encode_pnm)


def test_raw_roundtrips():
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (9, 17), (33, 40)):
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_pnm(encode_pnm(gray)), gray)
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
        mask = (rng.integers(0, 2, (h, w)) * 255).astype(np.uint8)
        # PBM ink bit 1 = black: nonzero input -> 0 in the raster
        dec = decode_pnm(encode_pnm(mask, bilevel=True))
        assert np.array_equal(dec, np.where(mask != 0, 0, 255))


def test_ascii_variants_and_comments():
    assert list(decode_pnm(b"P1\n# c\n4 1\n1011")[0]) == [0, 255, 0, 0]
    # P1 digits may be packed without separators, comments mid-stream
    img = decode_pnm(b"P1 2 2\n10# x\n01")
    assert img.tolist() == [[0, 255], [255, 0]]
    assert list(decode_pnm(b"P2 3 1 15\n0 7 15")[0]) == \
        [0, 7 * 255 // 15, 255]
    assert tuple(decode_pnm(b"P3 1 1 255\n1 2 3")[0, 0]) == (1, 2, 3)


def test_maxval_scaling_two_byte_raw():
    data = b"P5 2 1 65535\n" + struct.pack(">HH", 0, 65535)
    assert list(decode_pnm(data)[0]) == [0, 255]
    data = b"P6 1 1 1023\n" + struct.pack(">HHH", 0, 511, 1023)
    assert tuple(decode_pnm(data)[0, 0]) == (0, 511 * 255 // 1023, 255)
    # maxval < 255 single-byte raw also scales
    assert list(decode_pnm(b"P5 2 1 3\n\x00\x03")[0]) == [0, 255]


def test_p4_row_padding():
    # width 10 -> 2 bytes/row, pad bits ignored
    rows = bytes([0b10100000, 0b11000000,
                  0b01010101, 0b01000000])
    img = decode_pnm(b"P4\n10 2\n" + rows)
    assert img.shape == (2, 10)
    assert list(img[0]) == [0, 255, 0, 255, 255, 255, 255, 255, 0, 0]


def test_error_contract():
    with pytest.raises(PnmError):
        decode_pnm(b"P7 1 1 255\n\x00")       # PAM unsupported
    with pytest.raises(PnmError):
        decode_pnm(b"XX")
    with pytest.raises(PnmError):
        decode_pnm(b"P5 2 2 255\n\x00\x00")    # truncated samples
    with pytest.raises(PnmError):
        decode_pnm(b"P2 2 1 255\n300 0")       # sample > maxval
    with pytest.raises(PnmError):              # review-finding pin: a
        # >=2^32 ASCII token must raise, not wrap through uint32 to a
        # silently-wrong pixel (4294967296 % 2^32 == 0 passes the
        # post-conversion maxval check)
        decode_pnm(b"P2 1 1 255\n4294967296")
    with pytest.raises(PnmError):
        decode_pnm(b"P5 0 4 255\n")            # zero dimension
    with pytest.raises(PnmError):
        decode_pnm(b"P5 2 1 0\n\x00\x00")      # bad maxval
    with pytest.raises(PnmError):
        decode_pnm(b"P5 99999 99999 255\n")    # bomb guard
    with pytest.raises(PnmError):
        decode_pnm(b"P1 2 1\n1Z")              # junk in P1 samples
    with pytest.raises(PnmError):
        encode_pnm(np.zeros((2, 2, 4), np.uint8))
    with pytest.raises(PnmError):
        encode_pnm(np.zeros((2, 2), np.int32))


def test_roundtrip_property():
    """Hypothesis search over (dims, mode): P4/P5/P6 encode/decode is
    identity (P4 through the documented ink inversion)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           mode=st.sampled_from(["gray", "rgb", "bilevel"]),
           seed=st.integers(0, 2**31))
    def check(h, w, mode, seed):
        rng = np.random.default_rng(seed)
        if mode == "bilevel":
            img = (rng.integers(0, 2, (h, w)) * 255).astype(np.uint8)
            dec = decode_pnm(encode_pnm(img, bilevel=True))
            assert np.array_equal(dec, np.where(img != 0, 0, 255))
        else:
            shape = (h, w, 3) if mode == "rgb" else (h, w)
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(decode_pnm(encode_pnm(img)), img)

    check()


def test_truncation_fuzz():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    data = encode_pnm(img)
    for cut in range(1, len(data), 5):
        try:
            decode_pnm(data[:cut])
        except PnmError:
            pass

"""PNG codec (kernels/pngcodec.py) — the reference's mask sink format.

The reference always materializes the MRC bilevel mask as a PNG
(``mrc.py:477-520`` ``mask.save(mask_img_png, compress_level=0)``)
before handing it to jbig2/mupdf, and archival imagestacks carry PNG
page scans.  No foreign PNG exists in-container, so the evidence
model is the same as the other codecs: bit-exact round-trips through
our own encoder across every filter type / color type / interlace
combination, hand-built byte-level fixtures for the decode-only
profiles (palette, tRNS, sub-byte gray, 16-bit), and typed-error
fuzz."""

import struct
import zlib

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels.pngcodec import (
    _SIG, _chunk, PngError, decode_png, encode_png, png_dims)


def _build(w, h, depth, color, raw, plte=None, trns=None,
           interlace=0):
    """Hand-assemble a PNG from already-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       interlace)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(raw)) \
        + _chunk(b"IEND", b"")


def test_roundtrip_all_filters_colors_interlace():
    """Every (channels, filter 0-4, interlace) cell is lossless —
    exercises None/Sub/Up/Average/Paeth reconstruction and the
    derived Adam7 pass geometry, including edge dims where passes
    are empty (1x1) and non-multiple-of-8 tiles."""
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for ft in range(5):
            for inter in (False, True):
                for h, w in ((1, 1), (3, 5), (17, 9), (40, 33)):
                    shape = (h, w, ch) if ch > 1 else (h, w)
                    img = rng.integers(0, 256, shape, dtype=np.uint8)
                    data = encode_png(img, filter_type=ft,
                                      interlace=inter)
                    assert np.array_equal(decode_png(data), img), \
                        (ch, ft, inter, h, w)


def test_bilevel_mask_sink_shape():
    """The reference's mask-sink shape (``mrc.py:493-499``): 1-bit
    gray, compress_level=0; nonzero -> white, exact mask recovery."""
    rng = np.random.default_rng(3)
    mask = (rng.integers(0, 2, (23, 31)) * 255).astype(np.uint8)
    data = encode_png(mask, bilevel=True, compress_level=0)
    assert png_dims(data) == (31, 23, 1, 0)
    dec = decode_png(data)
    assert dec.dtype == np.uint8 and set(np.unique(dec)) <= {0, 255}
    assert np.array_equal(dec != 0, mask != 0)
    # interlaced bilevel too (sub-byte rows inside Adam7 passes)
    data = encode_png(mask, bilevel=True, interlace=True)
    assert np.array_equal(decode_png(data) != 0, mask != 0)


def test_palette_and_trns():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    raw = b"\x00" + bytes([0, 1, 2, 3]) + b"\x00" + bytes([3, 2, 1, 0])
    img = decode_png(_build(4, 2, 8, 3, raw, plte=plte))
    assert img.shape == (2, 4, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)
    assert tuple(img[1, 0]) == (10, 20, 30)
    # tRNS shorter than the palette: missing entries default opaque
    img = decode_png(_build(4, 2, 8, 3, raw, plte=plte,
                            trns=bytes([0, 128])))
    assert img.shape == (2, 4, 4)
    assert img[0, 0, 3] == 0 and img[0, 1, 3] == 128
    assert img[0, 3, 3] == 255
    # 2-bit palette indices, MSB-first packing
    raw2 = b"\x00" + bytes([0b00011011]) + b"\x00" + bytes([0b11100100])
    img = decode_png(_build(4, 2, 2, 3, raw2, plte=plte))
    assert tuple(img[0, 1]) == (0, 255, 0)
    assert tuple(img[1, 0]) == (10, 20, 30)


def test_subbyte_gray_scaling():
    """1/2/4-bit gray scales to full range via v*255//(2^d-1)."""
    img = decode_png(_build(8, 1, 1, 0, b"\x00" + bytes([0b10110011])))
    assert list(img[0]) == [255, 0, 255, 255, 0, 0, 255, 255]
    img = decode_png(_build(4, 1, 4, 0, b"\x00" + bytes([0x0F, 0x80])))
    assert list(img[0]) == [0, 255, 8 * 17, 0]
    img = decode_png(_build(4, 1, 2, 0, b"\x00" + bytes([0b00011011])))
    assert list(img[0]) == [0, 85, 170, 255]


def test_16bit_reduces_to_high_byte():
    raw = b"\x00" + struct.pack(">HH", 0x1234, 0xFF00)
    assert list(decode_png(_build(2, 1, 16, 0, raw))[0]) == [0x12, 0xFF]
    raw = b"\x00" + struct.pack(">HHH", 0xAB00, 0x0100, 0xFFFF)
    img = decode_png(_build(1, 1, 16, 2, raw))
    assert tuple(img[0, 0]) == (0xAB, 0x01, 0xFF)


def test_filtered_fixture_pins():
    """Pin each decoder filter branch against hand-computed bytes
    (published predictor algorithms, worked by hand)."""
    # Sub with bpp=3: raw (10,20,30, 5,6,7) -> px1 = px0 + delta
    raw = b"\x01" + bytes([10, 20, 30, 5, 6, 7])
    img = decode_png(_build(2, 1, 8, 2, raw))
    assert tuple(img[0, 0]) == (10, 20, 30)
    assert tuple(img[0, 1]) == (15, 26, 37)
    # Up: row2 = row1 + delta (mod 256)
    raw = b"\x00" + bytes([100, 200]) + b"\x02" + bytes([10, 100])
    img = decode_png(_build(2, 2, 8, 0, raw))
    assert list(img[1]) == [110, (200 + 100) % 256]
    # Average: first px floor(left+up/2) with left=0
    raw = b"\x00" + bytes([100, 50]) + b"\x03" + bytes([10, 20])
    img = decode_png(_build(2, 2, 8, 0, raw))
    assert list(img[1]) == [10 + 100 // 2, 20 + (60 + 50) // 2]
    # Paeth: a=left, b=up, c=up-left — first px predicts b
    raw = b"\x00" + bytes([100, 50]) + b"\x04" + bytes([1, 2])
    img = decode_png(_build(2, 2, 8, 0, raw))
    assert img[1, 0] == 101  # pred=b=100 (a=c=0)


def test_error_contract():
    good = encode_png(np.zeros((4, 4), np.uint8))
    with pytest.raises(PngError):
        decode_png(b"NOPE" + good[4:])        # bad signature
    bad = bytearray(good)
    bad[20] ^= 1                              # flip an IHDR byte
    with pytest.raises(PngError):
        decode_png(bytes(bad))                # chunk CRC mismatch
    with pytest.raises(PngError):
        decode_png(good[:-16])                # missing IEND
    plte = bytes([1, 2, 3])
    with pytest.raises(PngError):              # palette index OOR
        decode_png(_build(2, 1, 8, 3, b"\x00\x09\x00", plte=plte))
    with pytest.raises(PngError):              # no PLTE for color 3
        decode_png(_build(2, 1, 8, 3, b"\x00\x00\x00"))
    with pytest.raises(PngError):              # tRNS > palette (review
        decode_png(_build(2, 1, 8, 3, b"\x00\x00\x01",  # finding pin)
                          plte=bytes(6), trns=bytes(4)))
    with pytest.raises(PngError):              # decompression bomb
        decode_png(_build(100000, 100000, 8, 0, b""))
    with pytest.raises(PngError):              # short IDAT
        decode_png(_build(4, 4, 8, 0, b"\x00" + b"\x00" * 4))
    with pytest.raises(PngError):              # trailing image data
        decode_png(_build(1, 1, 8, 0, b"\x00\x00\x00\x00\x00"))
    with pytest.raises(PngError):              # unknown filter type
        decode_png(_build(1, 1, 8, 0, b"\x07\x00"))
    with pytest.raises(PngError):              # bad depth/color combo
        decode_png(_build(1, 1, 4, 2, b"\x00\x00"))
    with pytest.raises(PngError):
        encode_png(np.zeros((0, 4), np.uint8))


def test_roundtrip_property():
    """Hypothesis search over (dims, channels, filter, interlace,
    compress level): encode/decode is identity everywhere — the same
    property model as the other codecs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           ch=st.sampled_from([1, 2, 3, 4]), ft=st.integers(0, 4),
           inter=st.booleans(), level=st.sampled_from([0, 1, 6]),
           seed=st.integers(0, 2**31))
    def check(h, w, ch, ft, inter, level, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, ch) if ch > 1 else (h, w)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        data = encode_png(img, filter_type=ft, interlace=inter,
                          compress_level=level)
        assert np.array_equal(decode_png(data), img)

    check()


def test_truncation_fuzz_never_escapes_typed_error():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    data = encode_png(img, filter_type=4, interlace=True)
    for cut in range(1, len(data), 7):
        try:
            decode_png(data[:cut])
        except PngError:
            pass
    for _ in range(200):
        bad = bytearray(data)
        k = int(rng.integers(0, len(bad)))
        bad[k] ^= int(rng.integers(1, 256))
        try:
            dec = decode_png(bytes(bad))
            assert dec.dtype == np.uint8      # survivors stay sane
        except PngError:
            pass

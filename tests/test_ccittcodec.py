"""CCITT Group 4 / T.6 codec (kernels/ccittcodec.py) — the pre-JBIG2
archival mask format; also JBIG2's MMR path.  Evidence model matches
the other from-scratch codecs: bit-exact round-trips over fuzz corpora
plus structural pins of the public T.4 tables."""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels import ccittcodec as cc
from archive_pdf_tools_spark.kernels.ccittcodec import (
    CcittError, decode_g4, encode_g4)


def _textish(h, w, seed):
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), dtype=np.uint8)
    for _ in range(max(1, h * w // 55)):
        y = rng.integers(0, h)
        x = rng.integers(0, w)
        bm[y, x:x + int(rng.integers(1, 9))] = 1
    return bm


def test_t4_table_structural_pins():
    """Spot values entered from the published T.4 tables plus global
    prefix-freeness per color class (the LUT builder raises on any
    collision — a transcription typo that collides is caught at
    import; these spot pins catch value-shift typos)."""
    assert (0, 8, 0x35) in cc._WHITE_CODES         # white 0 = 00110101
    assert (1, 6, 0x07) in cc._WHITE_CODES         # white 1 = 000111
    assert (64, 5, 0x1B) in cc._WHITE_CODES        # white 64 = 11011
    assert (1664, 6, 0x18) in cc._WHITE_CODES
    assert (0, 10, 0x37) in cc._BLACK_CODES        # black 0 = 0000110111
    assert (1, 3, 0x02) in cc._BLACK_CODES         # black 1 = 010
    assert (64, 10, 0x0F) in cc._BLACK_CODES
    assert (1792, 11, 0x08) in cc._EXT_CODES
    assert (2560, 12, 0x1F) in cc._EXT_CODES
    # counts: 64 terminating + 27 make-ups per color, 13 shared
    assert len(cc._WHITE_CODES) == 91
    assert len(cc._BLACK_CODES) == 91
    assert len(cc._EXT_CODES) == 13


@pytest.mark.parametrize("byte_align", [False, True])
def test_g4_roundtrip_fuzz(byte_align):
    rng = np.random.default_rng(7 + byte_align)
    for trial in range(60):
        h = int(rng.integers(1, 60))
        w = int(rng.integers(1, 90))
        kind = trial % 4
        if kind == 0:
            bm = (rng.random((h, w)) < 0.3).astype(np.uint8)
        elif kind == 1:
            bm = _textish(h, w, trial)
        elif kind == 2:
            bm = np.zeros((h, w), np.uint8)
        else:
            bm = np.ones((h, w), np.uint8)
        data = encode_g4(bm, byte_align=byte_align)
        got = decode_g4(data, w, h, byte_align=byte_align)
        assert np.array_equal(got, bm), (trial, h, w, kind)


def test_g4_long_runs_and_modes():
    """Make-up concatenation past 2623, pass mode (reference run
    covering two coding changes), and all vertical offsets."""
    bm = np.zeros((4, 6000), np.uint8)
    bm[1, 4000:4100] = 1
    bm[2, 30:40] = 1                         # forces pass mode on row 3
    assert np.array_equal(decode_g4(encode_g4(bm), 6000, 4), bm)
    # diagonal strokes exercise VR/VL 1-3
    bm = np.zeros((40, 60), np.uint8)
    for y in range(40):
        x = (y * 3) % 50
        bm[y, x:x + 4] = 1
    assert np.array_equal(decode_g4(encode_g4(bm), 60, 40), bm)


def test_g4_error_gates_and_crash_safety():
    with pytest.raises(CcittError):
        decode_g4(b"", 0, 4)
    with pytest.raises(CcittError):
        decode_g4(b"\x00" * 4, 10, 10)       # EOL-ish zeros mid-image
    bm = _textish(20, 30, 1)
    data = bytearray(encode_g4(bm))
    rng = np.random.default_rng(3)
    bad = 0
    for trial in range(200):
        buf = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(256))
        try:
            decode_g4(bytes(buf), 30, 20)
        except CcittError:
            bad += 1
    assert bad > 0                           # mutations get caught typed


def test_jbig2_mmr_region():
    """A JBIG2 generic region with MMR=1 decodes through the shared
    T.6 path (T.88 §6.2.6)."""
    from archive_pdf_tools_spark.kernels import jbig2codec as jb
    from archive_pdf_tools_spark.kernels.jbig2codec import decode_jbig2

    bm = _textish(18, 26, 5)
    mmr = encode_g4(bm)
    w, h = 26, 18
    region = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
              + bytes(8) + b"\x00"
              + bytes((1,))                  # gflags: MMR=1
              + mmr)
    page = (w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(8)
            + b"\x00" + bytes(2))
    data = (jb._segment(0, 48, 1, page) + jb._segment(1, 39, 1, region)
            + jb._segment(2, 49, 1, b""))
    assert np.array_equal(decode_jbig2(data), bm)


def test_pdf_ccitt_fixture_flow():
    """/CCITTFaxDecode (K=-1) fixture images decode through the PDF
    page-image path to 0/255 ink masks."""
    from archive_pdf_tools_spark.corpus.pdfgen import (
        build_pdf, synth_ccitt_real)
    from archive_pdf_tools_spark.sources.pdf_meta import (
        extract_page_images, parse_pdf)

    from archive_pdf_tools_spark.kernels.ccittcodec import decode_g3

    for (w, h) in [(42, 30), (40, 30), (41, 30)]:  # K=-1, 0, 4 routes
        d, k, _nr = synth_ccitt_real(w, h, seed=3)
        pdf = build_pdf([{"width": 612, "height": 792,
                          "images": [{"w": w, "h": h, "gray": True,
                                      "ccitt": True, "ccitt_k": k,
                                      "data": d}],
                          "text": "x"}])
        meta = parse_pdf(pdf)
        im = meta["pages"][0]["images"][0]
        assert (im["format"], im["mode"], im["bits"]) == \
            ("CCITT", "1", 1)
        arr = dict(extract_page_images(pdf, 0, meta=meta))[im["xref"]]
        bits = decode_g3(d, w, h, k=k)
        assert np.array_equal(arr, np.where(bits != 0, 0, 255)), (w, h)


@pytest.mark.parametrize("k", [0, 1, 4])
def test_g3_roundtrip(k):
    """Group-3 1D (K=0) and mixed-2D (K>0) lines round-trip, with and
    without byte alignment / explicit EOLs."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (decode_g3,
                                                            encode_g3)

    rng = np.random.default_rng(11 + k)
    for trial in range(20):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 70))
        bm = (_textish(h, w, trial) if trial % 2
              else (rng.random((h, w)) < 0.3).astype(np.uint8))
        for ba in (False, True):
            for eol in ((False, True) if k == 0 else (False,)):
                d = encode_g3(bm, k=k, byte_align=ba, end_of_line=eol)
                got = decode_g3(d, w, h, k=k, byte_align=ba,
                                end_of_line=eol)
                assert np.array_equal(got, bm), (trial, k, ba, eol)


@pytest.mark.parametrize("mode", ["g4", "g4ba", "k2", "k2ba",
                                  "k0eol", "k0pad"])
def test_self_delimiting_roundtrip(mode):
    """/EndOfBlock shapes: ``h=None`` decodes to the EOFB (G4), RTC
    (G3) or zero-padding terminator and infers the height (r7 —
    VERDICT r6 ask #7 parameter matrix)."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (decode_g3,
                                                            decode_g4,
                                                            encode_g3,
                                                            encode_g4)

    rng = np.random.default_rng(hash(mode) % 2**32)
    for trial in range(12):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(2, 70))
        bm = (_textish(h, w, trial) if trial % 2
              else (rng.random((h, w)) < 0.3).astype(np.uint8))
        if mode in ("g4", "g4ba"):
            ba = mode == "g4ba"
            got = decode_g4(encode_g4(bm, byte_align=ba), w, None,
                            byte_align=ba)
        elif mode in ("k2", "k2ba"):
            ba = mode == "k2ba"
            got = decode_g3(encode_g3(bm, k=2, byte_align=ba,
                                      rtc=True), w, None, k=2,
                            byte_align=ba)
        elif mode == "k0eol":
            got = decode_g3(encode_g3(bm, k=0, end_of_line=True,
                                      rtc=True), w, None, k=0,
                            end_of_line=True)
        else:                       # plain 1D: zero padding delimits
            got = decode_g3(encode_g3(bm, k=0), w, None, k=0)
        assert got.shape == (h, w), (mode, trial)
        assert np.array_equal(got, bm), (mode, trial)


def test_self_delimiting_error_gates():
    """h=None error paths stay inside CcittError."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (CcittError,
                                                            decode_g4,
                                                            encode_g4)

    with pytest.raises(CcittError):
        decode_g4(b"\x00\x10\x01", 5, None)      # EOFB only: no rows
    with pytest.raises(CcittError):
        decode_g4(b"", 5, None)
    # a valid unbounded stream still respects the pixel bomb bound
    bm = np.zeros((4, 8), dtype=np.uint8)
    enc = encode_g4(bm)
    assert decode_g4(enc, 8, None).shape == (4, 8)


def test_pdf_ccitt_parameter_matrix():
    """/CCITTFaxDecode dict envelope: missing /Rows with default
    /EndOfBlock (self-delimiting), /EndOfBlock false fallback to
    /Height, /BlackIs1 with and without a compensating /Decode, and
    /Height crop/pad of over/under-length streams."""
    from archive_pdf_tools_spark.corpus.pdfgen import build_pdf
    from archive_pdf_tools_spark.kernels.ccittcodec import (encode_g3,
                                                            encode_g4)
    from archive_pdf_tools_spark.sources.pdf_meta import (
        extract_page_images, parse_pdf)

    rng = np.random.default_rng(41)
    w, h = 36, 22
    bm = (rng.random((h, w)) < 0.35).astype(np.uint8)
    ink = np.where(bm != 0, 0, 255)

    def run(img):
        pdf = build_pdf([{"width": 612, "height": 792,
                          "images": [img], "text": "x"}])
        meta = parse_pdf(pdf)
        im = meta["pages"][0]["images"][0]
        return dict(extract_page_images(pdf, 0, meta=meta))[im["xref"]]

    base = {"w": w, "h": h, "gray": True, "ccitt": True}
    # 1. no /Rows + default /EndOfBlock: EOFB (G4) / RTC (K=4) decode
    arr = run(dict(base, ccitt_k=-1, ccitt_no_rows=True,
                   data=encode_g4(bm)))
    assert np.array_equal(arr, ink)
    arr = run(dict(base, ccitt_k=4, ccitt_no_rows=True,
                   data=encode_g3(bm, k=4, rtc=True)))
    assert np.array_equal(arr, ink)
    # 2. /BlackIs1 true + /Decode [1 0]: pixel-identical to default
    arr = run(dict(base, ccitt_k=-1, ccitt_black1=True,
                   data=encode_g4(bm)))
    assert np.array_equal(arr, ink)
    # 3. /BlackIs1 true WITHOUT /Decode: samples flip -> inverted gray
    arr = run(dict(base, ccitt_k=-1, ccitt_black1=True,
                   ccitt_flip_decode=False, data=encode_g4(bm)))
    assert np.array_equal(arr, 255 - ink)
    # 4. /Decode [1 0] alone flips too
    arr = run(dict(base, ccitt_k=-1, ccitt_black1=False,
                   ccitt_flip_decode=True, data=encode_g4(bm)))
    assert np.array_equal(arr, 255 - ink)
    # 5. /Height crops a longer self-delimited stream ...
    tall = np.vstack([bm, (rng.random((9, w)) < 0.35).astype(np.uint8)])
    arr = run(dict(base, ccitt_k=-1, ccitt_no_rows=True,
                   data=encode_g4(tall)))
    assert arr.shape == (h, w) and np.array_equal(arr, ink)
    # ... and pads a shorter one with white
    short = bm[: h - 5]
    arr = run(dict(base, ccitt_k=-1, ccitt_no_rows=True,
                   data=encode_g4(short)))
    assert arr.shape == (h, w)
    assert np.array_equal(arr[: h - 5], ink[: h - 5])
    assert (arr[h - 5:] == 255).all()
    # 6. /EndOfBlock false + no /Rows: decode exactly /Height rows
    arr = run(dict(base, ccitt_k=-1, ccitt_no_rows=True,
                   ccitt_eob_false=True, data=encode_g4(bm)))
    assert np.array_equal(arr, ink)


def test_self_delimiting_terminators_foreign_shapes():
    """Terminator shapes the engine's own encoder does not emit but
    conformant foreign encoders do (r7 review findings):

    1. K=0 /EndOfBlock: PDF 1.7 says the end-of-block pattern for
       Group 3 is RTC — a pure-1D stream ending in six EOLs must
       decode, not raise (the rows themselves carry no EOLs).
    2. G4 + EncodedByteAlign: T.6 alignment applies to coded LINES;
       an encoder may emit EOFB unpadded right after the last line.
       The decoder must peek for EOFB before aligning."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (
        _BitWriter, _encode_2d_row, _row_changes, decode_g3, decode_g4,
        encode_g3)

    rng = np.random.default_rng(47)
    w, h = 30, 11
    bm = (rng.random((h, w)) < 0.4).astype(np.uint8)

    # 1. plain-1D stream + RTC appended (encode_g3 pads with zeros
    # first; fill zeros before an EOL are legal T.4 §4.1.2)
    rtc = bytearray()
    acc = ""
    for _ in range(6):
        acc += "000000000001"
    while len(acc) % 8:
        acc += "0"
    for i in range(0, len(acc), 8):
        rtc.append(int(acc[i:i + 8], 2))
    data = encode_g3(bm, k=0) + bytes(rtc)
    got = decode_g3(data, w, None, k=0)
    assert got.shape == (h, w) and np.array_equal(got, bm)

    # 2. byte-aligned G4 lines with an UNALIGNED EOFB
    bw = _BitWriter()
    ref = [w, w]
    for y in range(h):
        bw.align()
        cur = _row_changes(bm[y], w)
        _encode_2d_row(bw, cur, ref, w)
        ref = cur
    bw.put(0x001, 12)                        # EOFB straight after data
    bw.put(0x001, 12)
    bw.align()
    got = decode_g4(bytes(bw.out), w, None, byte_align=True)
    assert got.shape == (h, w) and np.array_equal(got, bm)

"""Compiled-kernel (kernels/native) parity: the Python decode paths
are the oracle; the C transcription must match them bit-for-bit on
fuzzed inputs, including the awkward shapes (non-nominal AT pixels,
TPGDON/TPGRON, USESKIP, bypass segments, 1-pixel-wide blocks)."""

import numpy as np
import pytest

import archive_pdf_tools_spark.kernels.jbig2codec as jb
from archive_pdf_tools_spark.kernels import native
from archive_pdf_tools_spark.kernels.jp2codec import (_mq_decode_fn,
                                                      t1_decode,
                                                      t1_encode)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler in environment")


def test_kernels_active_in_container():
    assert native.status() == "compiled kernels active"


def _py_generic(data, w, h, template, at, tpgdon, skip=None):
    states = [0] * 65536
    mps = [0] * 65536
    return jb._decode_generic(_mq_decode_fn(data, states, mps), w, h,
                              template, at, tpgdon, skip=skip)


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_parity_nominal(template, tpgdon):
    rng = np.random.default_rng(template * 10 + tpgdon)
    for shape in [(57, 83), (4, 4), (1, 40), (33, 1)]:
        bm = (rng.random(shape) < 0.35).astype(np.uint8)
        stream = jb.encode_jbig2(bm, template=template, tpgdon=tpgdon)
        # pull the embedded generic-region data out by decoding the
        # whole file both ways instead of re-parsing segment headers
        nat = jb.decode_jbig2(stream)
        try:
            native_save, native._lib = native._lib, None
            py = jb.decode_jbig2(stream)
        finally:
            native._lib = native_save
        assert np.array_equal(nat, py)
        assert np.array_equal(nat, bm)


def test_generic_parity_arbitrary_at():
    """Foreign encoders may move AT pixels anywhere causal — the C
    walk must agree with the Python general path, not just the
    nominal fast path."""
    rng = np.random.default_rng(99)
    w, h = 61, 47
    bm = (rng.random((h, w)) < 0.4).astype(np.uint8)
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns
    for at in [((-2, 5), (-1, -3), (-2, 2), (-2, -2)),
               ((0, -2), (-1, -3), (-2, 2), (-2, -2)),
               ((-1, 127), (-1, -3), (-2, 2), (-2, -2))]:
        states = [0] * 65536
        mps = [0] * 65536
        encode, flush = _mq_encode_fns(states, mps)
        jb._encode_generic_at(encode, bm, 0, at)
        data = flush()
        ses = native.generic_session(data)
        assert ses is not None
        nat = ses.decode_generic(w, h, 0, at, False)
        py = _py_generic(data, w, h, 0, at, False)
        assert np.array_equal(nat, py)
        assert np.array_equal(nat, bm)


def test_generic_parity_skip_and_shared_state():
    """Halftone shape: several planes share one coder, with USESKIP."""
    rng = np.random.default_rng(7)
    w, h = 37, 29
    planes = [(rng.random((h, w)) < 0.3).astype(np.uint8)
              for _ in range(4)]
    skip = (rng.random((h, w)) < 0.2).astype(np.uint8)
    for p in planes:
        p[skip == 1] = 0                     # skipped pixels carry 0
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns
    states = [0] * 65536
    mps = [0] * 65536
    encode, flush = _mq_encode_fns(states, mps)
    at = jb._NOMINAL_AT[0]
    for p in planes:
        jb._encode_generic(encode, p, 0, False, skip=skip)
    data = flush()

    ses = native.generic_session(data)
    nat = [ses.decode_generic(w, h, 0, at, False, skip=skip)
           for _ in planes]
    st = [0] * 65536
    mp = [0] * 65536
    dec = _mq_decode_fn(data, st, mp)
    py = [jb._decode_generic(dec, w, h, 0, at, False, skip=skip)
          for _ in planes]
    for a, b, want in zip(nat, py, planes):
        assert np.array_equal(a, b)
        assert np.array_equal(a, want)


@pytest.mark.parametrize("template", [0, 1])
@pytest.mark.parametrize("tpgron", [False, True])
def test_refinement_parity(template, tpgron):
    rng = np.random.default_rng(template * 2 + tpgron)
    base = (rng.random((44, 70)) < 0.5).astype(np.uint8)
    refined = base.copy()
    refined[rng.random((44, 70)) < 0.05] ^= 1
    stream = jb.encode_jbig2_refinement(base, refined,
                                        template=template,
                                        tpgron=tpgron)
    nat = jb.decode_jbig2(stream)
    try:
        native_save, native._lib = native._lib, None
        py = jb.decode_jbig2(stream)
    finally:
        native._lib = native_save
    assert np.array_equal(nat, py)
    assert np.array_equal(nat, refined)


@pytest.mark.parametrize("band", ["LL", "HL", "HH"])
@pytest.mark.parametrize("bypass", [False, True])
def test_t1_parity_fuzz(band, bypass):
    rng = np.random.default_rng(hash((band, bypass)) % 2**32)
    for shape in [(64, 64), (64, 1), (1, 64), (3, 5), (13, 64)]:
        h, w = shape
        for density in (0.05, 0.5, 0.95):
            coefs = rng.integers(-2**14, 2**14, size=shape)
            coefs[rng.random(shape) >= density] = 0
            coefs = coefs.astype(np.int64)
            data, npasses, numbps = t1_encode(coefs, band,
                                              bypass=bypass)
            if numbps == 0:
                continue
            segs = data if bypass else None
            raw = b"" if bypass else data
            py = t1_decode(raw, npasses, numbps, w, h, band,
                           segments=segs, _native=False)
            nat = t1_decode(raw, npasses, numbps, w, h, band,
                            segments=segs)
            assert np.array_equal(py, nat), (shape, density)


def test_t1_truncated_passes_parity():
    """Partial decode (fewer passes than encoded) — the progressive /
    lossy path."""
    rng = np.random.default_rng(5)
    coefs = rng.integers(-4000, 4000, size=(32, 32)).astype(np.int64)
    coefs[rng.random((32, 32)) < 0.5] = 0
    data, npasses, numbps = t1_encode(coefs, "LL")
    for n in range(1, npasses):
        py = t1_decode(data, n, numbps, 32, 32, "LL", _native=False)
        nat = t1_decode(data, n, numbps, 32, 32, "LL")
        assert np.array_equal(py, nat), n


def test_jpeg_scan_and_finish_parity():
    """Baseline Huffman walk + fused IDCT/YCbCr finishers: gray, RGB
    4:2:0/4:4:4, restart intervals, 12-bit extended — all byte-equal
    to the Python paths."""
    from archive_pdf_tools_spark.kernels import jpegcodec as jc

    rng = np.random.default_rng(77)
    gray = np.clip(rng.normal(180, 40, (120, 88)), 0, 255).astype(
        np.uint8)
    rgb = np.stack([gray, 255 - gray,
                    np.roll(gray, 7, axis=1)], axis=-1)
    streams = [
        jc.encode_baseline(gray, quality=85),
        jc.encode_baseline(rgb, quality=85),
        jc.encode_baseline(rgb, quality=40, subsample=(2, 2)),
        jc.encode_baseline(rgb, quality=85, restart_interval=4),
        jc.encode_extended(
            rng.integers(0, 4096, (56, 40, 3)).astype(np.uint16),
            quality=90),
    ]
    for i, data in enumerate(streams):
        nat = jc.decode_baseline(data)
        try:
            save, native._lib = native._lib, None
            py = jc.decode_baseline(data)
        finally:
            native._lib = save
        assert np.array_equal(nat, py), i


def test_jpeg_progressive_parity():
    """Progressive scans (DC first/refine, AC first with EOBn runs,
    AC refinement correction bits, DRI) through the compiled walk."""
    from archive_pdf_tools_spark.kernels import jpegcodec as jc

    rng = np.random.default_rng(55)
    cases = [((120, 200, 3), dict(quality=80, subsample=(2, 2))),
             ((64, 64), dict(quality=90)),
             ((97, 61, 3), dict(quality=40, subsample=(2, 1))),
             ((120, 200, 3), dict(quality=80, restart_interval=4))]
    for shape, kw in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        d = jc.encode_progressive(img, **kw)
        nat = jc.decode_baseline(d)
        try:
            save, native._lib = native._lib, None
            py = jc.decode_baseline(d)
        finally:
            native._lib = save
        assert np.array_equal(nat, py), (shape, kw)


def test_jpeg_lossless_parity():
    """SOF3: all seven predictors, 8/16-bit, point transform,
    interleaved and multi-scan layouts through the compiled walk."""
    from archive_pdf_tools_spark.kernels import jpegcodec as jc

    rng = np.random.default_rng(66)
    for pred in range(1, 8):
        for shape, dtype in [((40, 56), np.uint8),
                             ((24, 30, 3), np.uint8),
                             ((20, 22), np.uint16)]:
            hi = 256 if dtype == np.uint8 else 60000
            img = rng.integers(0, hi, shape).astype(dtype)
            for il in (True, False):
                for pt in (0, 2):
                    d = jc.encode_lossless(img, predictor=pred,
                                           point_transform=pt,
                                           interleave=il)
                    nat = jc.decode_baseline(d)
                    try:
                        save, native._lib = native._lib, None
                        py = jc.decode_baseline(d)
                    finally:
                        native._lib = save
                    assert np.array_equal(nat, py), (pred, shape, il,
                                                     pt)


def test_jpeg_truncated_stream_matches_python():
    """A truncated entropy segment must raise the same JpegError
    whether the C walk or the Python walk sees it first (the C kernel
    reports an error code and Python re-raises from its own walk)."""
    from archive_pdf_tools_spark.kernels import jpegcodec as jc

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    data = jc.encode_baseline(img, quality=85)
    bad = data[:len(data) // 2] + b"\xff\xd9"
    with pytest.raises(jc.JpegError):
        jc.decode_baseline(bad)
    try:
        save, native._lib = native._lib, None
        with pytest.raises(jc.JpegError):
            jc.decode_baseline(bad)
    finally:
        native._lib = save


@pytest.mark.parametrize("levels", [1, 2, 3, 5])
def test_dwt_parity(levels):
    """Inverse DWTs: int64 5/3 and float64 9/7 must be bit-identical
    to the numpy lifting (the C build pins -ffp-contract=off so gcc
    cannot fuse the 9/7 multiplies into FMAs)."""
    from archive_pdf_tools_spark.kernels import jp2codec as jp

    rng = np.random.default_rng(levels)
    for dims in [(64, 64), (63, 61), (1, 50), (50, 1), (2, 3),
                 (255, 129)]:
        a = rng.integers(-10000, 10000, size=dims).astype(np.int64)
        f = jp.dwt53_forward(a, levels)
        nat = jp.dwt53_inverse(f, levels)
        af = rng.normal(0, 1000, size=dims)
        f97 = jp.dwt97_forward(af, levels)
        nat97 = jp.dwt97_inverse(f97, levels)
        try:
            save, native._lib = native._lib, None
            py = jp.dwt53_inverse(f, levels)
            py97 = jp.dwt97_inverse(f97, levels)
        finally:
            native._lib = save
        assert np.array_equal(nat, py)
        assert np.array_equal(nat, a)        # perfect reconstruction
        assert np.array_equal(nat97, py97)   # bit parity, not allclose


@pytest.mark.parametrize("bypass", [False, True])
def test_t1_encode_byte_parity(bypass):
    """Compiled T1 ENCODER must emit byte-identical codeword segments
    (the pinned whole-PDF md5s depend on it)."""
    rng = np.random.default_rng(13 + bypass)
    for shape in [(64, 64), (61, 33), (1, 7), (64, 1), (13, 21)]:
        h, w = shape
        for dens in (0.1, 0.7):
            coefs = rng.integers(-20000, 20000, size=shape)
            coefs[rng.random(shape) >= dens] = 0
            coefs = coefs.astype(np.int64)
            for band in ("LL", "HL", "HH"):
                nat = t1_encode(coefs, band, bypass=bypass)
                try:
                    save, native._lib = native._lib, None
                    py = t1_encode(coefs, band, bypass=bypass)
                finally:
                    native._lib = save
                assert nat == py, (shape, dens, band)


def test_jbig2_encode_byte_parity():
    """Generic / halftone / refinement-base encoders through the
    shared-session MQ encode kernel: byte-identical streams."""
    rng = np.random.default_rng(9)
    bm = (rng.random((70, 90)) < 0.4).astype(np.uint8)
    bm[10:20] = 0
    pats = [np.full((6, 5), v % 2, np.uint8) for v in range(4)]
    gray = rng.integers(0, 4, (9, 11))
    base = (rng.random((40, 60)) < 0.5).astype(np.uint8)
    ref = base.copy()
    ref[5:9, 7:20] ^= 1

    def everything():
        out = []
        for tmpl in range(4):
            for tpgdon in (False, True):
                out.append(jb.encode_jbig2(bm, template=tmpl,
                                           tpgdon=tpgdon))
        for skip in (False, True):
            out.append(jb.encode_jbig2_halftone(gray, pats,
                                                enable_skip=skip))
        out.append(jb.encode_jbig2_refinement(base, ref))
        return out

    nat = everything()
    try:
        save, native._lib = native._lib, None
        py = everything()
    finally:
        native._lib = save
    assert nat == py
    assert np.array_equal(jb.decode_jbig2(nat[1]), bm)


def test_optimise2_parity():
    """MRC fill kernel (FIR+IIR windows, integer divisions): C vs the
    vectorized numpy path, single and batch, gray and RGB."""
    from archive_pdf_tools_spark.kernels.optimise import (
        optimise_gray2, optimise_gray2_batch, optimise_rgb2)

    rng = np.random.default_rng(19)
    for (h, w) in [(1, 1), (5, 7), (64, 64), (31, 129)]:
        for n in (1, 2, 10, 40):
            mask = (rng.random((h, w)) < 0.3).astype(np.uint8)
            g = rng.integers(0, 256, (h, w)).astype(np.uint8)
            rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            batch_m = np.stack([mask, 1 - mask])
            batch_i = np.stack([g, 255 - g])
            nat = (optimise_gray2(mask.copy(), g.copy(), n),
                   optimise_rgb2(mask.copy(), rgb.copy(), n),
                   optimise_gray2_batch(batch_m, batch_i, n))
            try:
                save, native._lib = native._lib, None
                py = (optimise_gray2(mask.copy(), g.copy(), n),
                      optimise_rgb2(mask.copy(), rgb.copy(), n),
                      optimise_gray2_batch(batch_m, batch_i, n))
            finally:
                native._lib = save
            for a, b in zip(nat, py):
                assert np.array_equal(a, b), (h, w, n)


def test_sauvola_parity():
    """Sauvola C kernel vs the numpy expressions: same clamped-window
    sums, same C-truncated divisions, same float64 operand order —
    bit parity across windows (incl. > 2*width), signs of k, tiny
    shapes."""
    from archive_pdf_tools_spark.kernels.sauvola import sauvola_mask

    rng = np.random.default_rng(12)
    for (h, w) in [(1, 1), (5, 7), (64, 64), (31, 257)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        for (ww, wh) in [(3, 3), (51, 51), (15, 7), (2 * w + 3, 5)]:
            for k in (0.34, -0.2, 0.0):
                nat = sauvola_mask(img, ww, wh, k, 128.0)
                try:
                    save, native._lib = native._lib, None
                    py = sauvola_mask(img, ww, wh, k, 128.0)
                finally:
                    native._lib = save
                assert np.array_equal(nat, py), (h, w, ww, wh, k)


def test_lzw_parity():
    """TIFF-variant LZW: byte-identical encode, identical decode vs
    the Python walk, across content mixes incl. table resets."""
    from archive_pdf_tools_spark.kernels.tiffcodec import (lzw_decode,
                                                           lzw_encode)

    rng = np.random.default_rng(4)
    cases = [b"", b"A", b"AAAA" * 100,
             bytes(rng.integers(0, 256, 60000)),
             bytes(rng.integers(0, 4, 200000)),  # resets exercised
             b"pagepagepage" * 3000]
    for i, d in enumerate(cases):
        nat = lzw_encode(d)
        out = lzw_decode(nat, len(d))
        try:
            save, native._lib = native._lib, None
            py = lzw_encode(d)
            out_py = lzw_decode(nat, len(d))
        finally:
            native._lib = save
        assert nat == py, i
        assert out == out_py == d, i


def test_g4_parity():
    """T.6 pure-2D coder: byte-identical encode, pixel-identical
    decode vs the Python changing-elements walk, across densities,
    degenerate shapes and byte alignment."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (decode_g4,
                                                            encode_g4)

    rng = np.random.default_rng(6)
    for (h, w) in [(1, 1), (3, 17), (64, 64), (100, 1), (31, 257)]:
        for dens in (0.0, 0.05, 0.5, 1.0):
            for ba in (False, True):
                bm = (rng.random((h, w)) < dens).astype(np.uint8)
                nat = encode_g4(bm, byte_align=ba)
                out = decode_g4(nat, w, h, byte_align=ba)
                try:
                    save, native._lib = native._lib, None
                    py = encode_g4(bm, byte_align=ba)
                    out_py = decode_g4(nat, w, h, byte_align=ba)
                finally:
                    native._lib = save
                assert nat == py
                assert np.array_equal(out, out_py)
                assert np.array_equal(out, bm)


def test_g4_truncated_falls_back_to_python_error():
    from archive_pdf_tools_spark.kernels.ccittcodec import (CcittError,
                                                            decode_g4,
                                                            encode_g4)

    rng = np.random.default_rng(2)
    bm = (rng.random((64, 64)) < 0.4).astype(np.uint8)
    data = encode_g4(bm)
    with pytest.raises(CcittError):
        decode_g4(data[:len(data) // 4], 64, 64)


@pytest.mark.parametrize("levels", [1, 3])
def test_dwt_forward_parity(levels):
    from archive_pdf_tools_spark.kernels import jp2codec as jp

    rng = np.random.default_rng(levels + 40)
    for dims in [(64, 64), (63, 61), (1, 50), (50, 1), (255, 129)]:
        a = rng.integers(-10000, 10000, size=dims).astype(np.int64)
        nat = jp.dwt53_forward(a, levels)
        af = rng.normal(0, 1000, size=dims)
        nat97 = jp.dwt97_forward(af, levels)
        try:
            save, native._lib = native._lib, None
            py = jp.dwt53_forward(a, levels)
            py97 = jp.dwt97_forward(af, levels)
        finally:
            native._lib = save
        assert np.array_equal(nat, py)
        assert np.array_equal(nat97, py97)
        assert np.array_equal(jp.dwt53_inverse(nat, levels), a)


def test_t1_numbps_out_of_range_falls_back():
    """numbps > 31 exceeds the C kernel's uint32 magnitudes — the
    wrapper must hand the call back to Python, not truncate."""
    assert native.t1_native(b"\x00", 1, 32, 2, 2, "LL") is None


def test_aes_rc4_parity():
    """AES-CBC both directions across key sizes / data sizes / pad
    modes, and RC4, byte-identical to the Python/numpy paths."""
    import archive_pdf_tools_spark.kernels.pdfcrypt as pc

    rng = np.random.default_rng(8)
    for klen in (16, 32):
        key = bytes(rng.integers(0, 256, klen).astype(np.uint8))
        for n in (0, 1, 16, 17, 1024):
            data = bytes(rng.integers(0, 256, n).astype(np.uint8))
            iv = bytes(rng.integers(0, 256, 16).astype(np.uint8))
            enc = pc.aes_cbc_encrypt(key, iv, data)
            dec = pc.aes_cbc_decrypt(key, enc)
            try:
                save, native._lib = native._lib, None
                enc_py = pc.aes_cbc_encrypt(key, iv, data)
                dec_py = pc.aes_cbc_decrypt(key, enc)
            finally:
                native._lib = save
            assert enc == enc_py
            assert dec == dec_py == data
    key = b"\x01\x02\x03\x04\x05"
    data = bytes(rng.integers(0, 256, 999).astype(np.uint8))
    a = pc.rc4(key, data)
    try:
        save, native._lib = native._lib, None
        b = pc.rc4(key, data)
    finally:
        native._lib = save
    assert a == b


def test_garbage_streams_no_crash_and_match_python():
    """Adversarial bytes through every C decode walk: either the same
    decoded array as pure Python or the same typed error — and never
    a crash (the zero-run G4 growth guard, LZW table overflow, MQ
    tail feeds, truncated JPEG segments all funnel through here)."""
    from archive_pdf_tools_spark.kernels import ccittcodec as cc
    from archive_pdf_tools_spark.kernels import jpegcodec as jc
    from archive_pdf_tools_spark.kernels import tiffcodec as tc

    rng = np.random.default_rng(123)

    def both(fn):
        try:
            a = ("ok", fn())
        except Exception as e:
            a = ("err", type(e).__name__)
        try:
            save, native._lib = native._lib, None
            try:
                b = ("ok", fn())
            except Exception as e:
                b = ("err", type(e).__name__)
        finally:
            native._lib = save
        assert a[0] == b[0]
        if a[0] == "ok":
            va, vb = a[1], b[1]
            if isinstance(va, np.ndarray):
                assert np.array_equal(va, vb)
            else:
                assert va == vb
        else:
            assert a[1] == b[1]

    for seed in range(12):
        blob = bytes(rng.integers(0, 256, 400).astype(np.uint8))
        both(lambda b=blob: cc.decode_g4(b, 64, 64))
        both(lambda b=blob: jb.decode_jbig2(
            jb.encode_jbig2(np.zeros((8, 8), np.uint8))[:40] + b[:80]))
        both(lambda b=blob: tc.lzw_decode(b, 512))


def test_native_kill_switch(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CKERN", "0")
    monkeypatch.setattr(native, "_tried", False)
    monkeypatch.setattr(native, "_lib", None)
    assert not native.available()
    assert "disabled" in native.status()


def test_gauss2d_parity():
    """Separable-Gaussian C kernel vs the numpy path in
    kernels/noise.py: np.pad-'reflect' boundary (incl. multi-fold when
    the radius exceeds the axis, and single-sample axes), ascending-tap
    float64 accumulation, per-axis cast-back — bit parity across
    dtypes, sigmas and degenerate shapes."""
    from archive_pdf_tools_spark.kernels.noise import gaussian_filter

    rng = np.random.default_rng(9)
    shapes = [(1, 1), (1, 23), (17, 1), (2, 2), (40, 56), (31, 257)]
    for (h, w) in shapes:
        for sigma in (0.3, 0.85, 2.4, 7.0):   # 7.0: radius > tiny axes
            for dt in (np.float64, np.float32, np.uint8):
                a = (rng.integers(0, 256, (h, w)).astype(np.uint8)
                     if dt == np.uint8
                     else rng.normal(100, 40, (h, w)).astype(dt))
                nat = gaussian_filter(a, sigma)
                try:
                    save, native._lib = native._lib, None
                    py = gaussian_filter(a, sigma)
                finally:
                    native._lib = save
                assert nat.dtype == py.dtype
                assert np.array_equal(nat, py), (h, w, sigma, dt)


def test_gauss2d_non_2d_uses_python_path():
    """1-D and 3-D inputs bypass the C kernel (it only serves 2-D) and
    still produce the documented numpy result."""
    from archive_pdf_tools_spark.kernels.noise import gaussian_filter

    rng = np.random.default_rng(10)
    a3 = rng.normal(100, 30, (9, 11, 3))
    nat = gaussian_filter(a3, 1.2)
    try:
        save, native._lib = native._lib, None
        py = gaussian_filter(a3, 1.2)
    finally:
        native._lib = save
    assert np.array_equal(nat, py)


def test_png_unfilter_parity():
    """Whole-sub-image PNG unfilter C kernel vs the Python walk:
    byte parity across filters 0-4, color types, bit depths and
    degenerate shapes (the Average/Paeth rows are the sequential
    CPython floor the kernel exists to lift)."""
    from archive_pdf_tools_spark.kernels import pngcodec as P

    rng = np.random.default_rng(21)
    shapes = [(1, 1), (1, 17), (9, 1), (13, 19)]
    for (h, w) in shapes:
        for ch in (None, 2, 3, 4):       # gray / GA / RGB / RGBA
            img = (rng.integers(0, 256, (h, w), dtype=np.uint8)
                   if ch is None else
                   rng.integers(0, 256, (h, w, ch), dtype=np.uint8))
            for ft in range(5):
                blob = P.encode_png(img, filter_type=ft)
                nat = P.decode_png(blob)
                try:
                    save, native._lib = native._lib, None
                    py = P.decode_png(blob)
                finally:
                    native._lib = save
                assert np.array_equal(nat, py), (h, w, ch, ft)
    # 1-bit bilevel masks (bpp=1 packed rows) through the same path
    mask = (rng.random((23, 31)) < 0.4)
    blob = P.encode_png(mask, bilevel=True)
    nat = P.decode_png(blob)
    try:
        save, native._lib = native._lib, None
        py = P.decode_png(blob)
    finally:
        native._lib = save
    assert np.array_equal(nat, py)


def test_mask_denoise_native_parity():
    """apts_mask_denoise == fast_mask_denoise_slow per page, including
    the sequential same-window feedback, n_size=0 (window = the pixel
    itself, NOT a no-op), and degenerate/small shapes."""
    from archive_pdf_tools_spark.kernels.native import mask_denoise_native
    from archive_pdf_tools_spark.kernels.optimise import (
        fast_mask_denoise_slow)

    rng = np.random.default_rng(31)
    for _ in range(60):
        h, w = rng.integers(1, 48, 2)
        n = int(rng.integers(0, 4))
        mincnt = int(rng.integers(0, 8))
        m = rng.random((h, w)) < rng.uniform(0.05, 0.9)
        got = mask_denoise_native(m[None], mincnt, n)
        if got is None:      # no compiler in this environment
            return
        assert np.array_equal(got[0].view(bool),
                              fast_mask_denoise_slow(m, mincnt, n)), \
            (h, w, n, mincnt)
    batch = rng.random((7, 33, 29)) < 0.5
    got = mask_denoise_native(batch, 4, 2)
    for b in range(7):
        assert np.array_equal(got[b].view(bool),
                              fast_mask_denoise_slow(batch[b], 4, 2))


def test_dwt2_hh_native_parity():
    """apts_dwt2_hh is bit-identical to the NumPy _dwt_axis pair
    (symmetric pad incl. repeated folds on tiny inputs, ascending-tap
    accumulation)."""
    from archive_pdf_tools_spark.kernels.native import dwt2_hh_native
    from archive_pdf_tools_spark.kernels.noise import _dwt_axis, _DB2_HI

    rng = np.random.default_rng(32)
    for _ in range(60):
        h, w = rng.integers(1, 70, 2)
        a = rng.random((h, w)) * 255
        got = dwt2_hh_native(a, _DB2_HI)
        if got is None:
            return
        ref = _dwt_axis(_dwt_axis(a, _DB2_HI, 0), _DB2_HI, 1)
        assert got.shape == ref.shape and np.array_equal(got, ref), (h, w)

"""Pluggable image-codec registry — the tested native-swap contract.

The engine decodes every PDF image family through from-scratch
pure-Python codecs (``kernels.jpegcodec`` / ``jp2codec`` /
``jbig2codec`` / ``ccittcodec``).  Their PLAN shape is already the
100-TB shape (per-image work inside ``mapInPandas``; 1000 executors
decode streams concurrently and the plan does not change), but their
per-CORE throughput is the honest bottleneck for JP2/JBIG2-heavy
corpora: the round-6 floor analyses (``BENCH/jp2_decode_r6.md``,
``BENCH/jbig2_r6.md``) measured ~0.23 Mpx/s/core for JP2 EBCOT and
~1.7 Mpx/s/core for dense JBIG2 against 5-200 Mpx/s for native
decoders, and established that pure-CPython T1 has hit its
decision-cost floor (~5.2 MQ decisions/px x 250-350 ns).  The remedy
at scale is therefore NOT more micro-optimization — it is swapping a
native decoder (PyMuPDF, openjpeg, jbig2dec, libjpeg/Pillow) in
HERE, leaving the Spark plan untouched.  ``BENCH/codec_swap_r7.md``
carries the 100-TB wall-time projection with and without the swap.

This module makes that swap a TESTED CONTRACT instead of a comment
(round-7 VERDICT ask #2):

* ``get_decoder(fmt)`` is the only decode entry point the PDF scan
  uses (``sources/pdf_meta.py::extract_page_images``).
* ``register_decoder(fmt, fn)`` installs a drop-in decoder and — by
  default — first runs it through ``verify_decoder``, the same
  true-arithmetic oracle family the driver correctness gate uses
  (closed-form pixels through the engine's own encoders; constant
  8x8 tiles at quality 100 for JPEG, where ANY conformant decoder is
  bit-exact).  A decoder that corrupts even one pixel is rejected.
* Registered decoders are exception-wrapped: any failure surfaces as
  the format's typed error (``DecodeError`` subclassing the
  built-in codec's error class), so the per-image metadata-only
  fallback contract of ``extract_page_images`` survives the swap —
  a foreign decoder's stray exception can never fail a whole
  ``mapInPandas`` task.

Decoder call signatures (normalized to the built-ins):

=========  =========================================================
JPEG       ``fn(raw: bytes) -> np.ndarray`` (uint8 gray or RGB)
JPEG2000   ``fn(raw: bytes) -> np.ndarray`` (uint8 gray or RGB)
JBIG2      ``fn(raw: bytes, globals_data: bytes) -> np.ndarray``
           (0/1 uint8 ink mask)
CCITT      ``fn(raw, columns, rows, *, k, byte_align, end_of_line)
           -> np.ndarray`` (0/1 uint8 ink mask; ``rows=None`` =
           self-delimiting /EndOfBlock stream — decode to EOFB/RTC)
TIFF       ``fn(raw: bytes, page: int = 0) -> np.ndarray`` (uint8;
           ``page`` walks the next-IFD chain)
PNG        ``fn(raw: bytes) -> np.ndarray`` (uint8 gray / gray+alpha
           / RGB / RGBA — alpha handling is the CALLER's job)
PNM        ``fn(raw: bytes) -> np.ndarray`` (uint8 gray or RGB)
=========  =========================================================

The imagestack front door (``operators/imagestack.py``) routes its
page formats through the same seam, so a native swap covers stacks
and PDFs alike.

Reference parity: the reference engine delegates exactly these
decodes to external binaries/libraries (kakadu/openjpeg subprocess
``jpeg2000.py:63-148``, jbig2 subprocess ``mrc.py:502-509``, PyMuPDF
``pdfhacks.py:106-177``, Pillow ``recode.py:351``); this registry is
the idiomatic seam for the same delegation under Spark.
"""

from __future__ import annotations

import numpy as np

from .ccittcodec import CcittError, decode_g3, encode_g3, encode_g4
from .jbig2codec import (Jbig2Error, decode_jbig2, encode_jbig2,
                         encode_jbig2_symbols)
from .jp2codec import Jp2Error, decode_jp2, encode_jp2
from .jpegcodec import JpegError, decode_baseline, encode_baseline
from .pngcodec import PngError, decode_png, encode_png
from .pnmcodec import PnmError, decode_pnm, encode_pnm
from .tiffcodec import (TiffError, decode_tiff, encode_tiff,
                        encode_tiff_multi)

FORMATS = ("JPEG", "JPEG2000", "JBIG2", "CCITT", "TIFF", "PNG", "PNM")

_ERROR_CLASS = {"JPEG": JpegError, "JPEG2000": Jp2Error,
                "JBIG2": Jbig2Error, "CCITT": CcittError,
                "TIFF": TiffError, "PNG": PngError, "PNM": PnmError}

_BUILTINS = {
    "JPEG": decode_baseline,
    "JPEG2000": decode_jp2,
    "JBIG2": decode_jbig2,
    "CCITT": decode_g3,
    "TIFF": decode_tiff,
    "PNG": decode_png,
    "PNM": decode_pnm,
}

_decoders = dict(_BUILTINS)

# DecodeError subclasses per format: a wrapped drop-in decoder raises
# the SAME typed error call sites already catch, so swapping a codec
# cannot widen the exception surface of the extraction pipeline.
_DECODE_ERRORS = {
    fmt: type(f"{fmt.title()}DecodeError", (_ERROR_CLASS[fmt],), {})
    for fmt in FORMATS
}


class ContractViolation(AssertionError):
    """A candidate decoder failed the true-arithmetic contract suite."""


def get_decoder(fmt: str):
    """The decode callable the extraction pipeline must use for
    ``fmt`` (one of ``FORMATS``)."""
    return _decoders[fmt]


def builtin_decoder(fmt: str):
    """The engine's own from-scratch decoder for ``fmt``."""
    return _BUILTINS[fmt]


def register_decoder(fmt: str, fn, *, verify: bool = True):
    """Install a drop-in decoder for ``fmt``.

    ``verify=True`` (default) first runs ``verify_decoder`` — the
    drop-in must reproduce the closed-form oracle pixels the driver
    correctness gate pins, or ``ContractViolation`` is raised and the
    registry is left untouched.  The installed callable is
    exception-wrapped into the format's typed error."""
    if fmt not in FORMATS:
        raise KeyError(fmt)
    if verify:
        verify_decoder(fmt, fn)
    err = _DECODE_ERRORS[fmt]

    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as exc:  # noqa: BLE001 — typed-error contract
            raise err(f"drop-in {fmt} decoder failed: "
                      f"{type(exc).__name__}: {exc}") from exc

    wrapped.__wrapped__ = fn
    _decoders[fmt] = wrapped
    return wrapped


def reset_decoder(fmt: str | None = None):
    """Restore the built-in decoder(s)."""
    if fmt is None:
        _decoders.update(_BUILTINS)
    else:
        _decoders[fmt] = _BUILTINS[fmt]


def contract_cases(fmt: str):
    """Yield ``(args, kwargs, expected)`` oracle cases for ``fmt``.

    The cases are the same family the driver correctness gate runs
    (``queries.py`` jpeg_decode / jp2_decode / jbig2_decode /
    ccitt_decode): closed-form pixel content through the engine's own
    encoders.  Every case is EXACT — lossless codestreams for the
    lossless families, and constant-8x8-tile quality-100 streams for
    JPEG, which any conformant decoder reproduces bit-exactly (DC-only
    blocks with all-ones quant tables have an exact IDCT)."""
    if fmt == "JPEG":
        for i in (0, 3, 7):
            w, h = 8 * (4 + i % 5), 8 * (3 + i % 4)
            img = np.zeros((h, w), dtype=np.uint8)
            for ty in range(h // 8):
                for tx in range(w // 8):
                    img[8 * ty:8 * ty + 8, 8 * tx:8 * tx + 8] = \
                        (37 * i + 11 * tx + 23 * ty) % 256
            yield ((encode_baseline(img, quality=100,
                                    restart_interval=i % 3),),
                   {}, img)
    elif fmt == "JPEG2000":
        for i in (0, 1, 5):
            w = 8 + (i * 7) % 41
            h = 8 + (i * 5) % 29
            yy, xx = np.mgrid[0:h, 0:w]
            base = 37 * i + 5 * xx + 11 * yy
            if i % 2 == 0:
                img = (base % 256).astype(np.uint8)
            else:
                img = np.stack([(base + 85 * c) % 256
                                for c in range(3)],
                               axis=-1).astype(np.uint8)
            yield ((encode_jp2(img, levels=1 + i % 3,
                               raw_codestream=bool(i % 5 == 0)),),
                   {}, img)
    elif fmt == "JBIG2":
        for i in (0, 4):
            w = 8 + (i * 13) % 50
            h = 8 + (i * 9) % 33
            yy, xx = np.mgrid[0:h, 0:w]
            bm = (((3 * i + 7 * xx + 5 * yy) % 11) < 4).astype(np.uint8)
            if i % 5 == 4:
                gw, gh = 2 + i % 3, 2 + (i // 2) % 3
                glyph = np.ones((gh, gw), np.uint8)
                pls = [(0, (k * 7 + i) % (w - gw + 1),
                        (k * 5 + 2 * i) % (h - gh + 1))
                       for k in range(3)]
                bm = np.zeros((h, w), np.uint8)
                for _g, x0, y0 in pls:
                    bm[y0:y0 + gh, x0:x0 + gw] = 1
                data = encode_jbig2_symbols([glyph], pls, w, h,
                                            template=i % 4)
            else:
                data = encode_jbig2(bm)
            yield ((data, b""), {}, bm)
    elif fmt == "CCITT":
        for i, k in ((0, -1), (1, 0), (2, 4)):
            w, h = 24 + 8 * i, 16 + 4 * i
            yy, xx = np.mgrid[0:h, 0:w]
            bm = (((3 * i + 7 * xx + 5 * yy) % 13) < 5).astype(np.uint8)
            data = encode_g4(bm) if k < 0 else encode_g3(bm, k=k)
            yield ((data, w, h), {"k": k}, bm)
        # self-delimiting /EndOfBlock shapes: rows=None, decode to
        # EOFB (G4) / RTC (mixed-2D G3) — any drop-in must honor them
        yy, xx = np.mgrid[0:20, 0:40]
        bm = (((7 * xx + 5 * yy) % 11) < 4).astype(np.uint8)
        yield ((encode_g4(bm), 40, None), {"k": -1}, bm)
        yield ((encode_g3(bm, k=2, rtc=True), 40, None), {"k": 2}, bm)
    elif fmt == "TIFF":
        yy, xx = np.mgrid[0:21, 0:34]
        gray = ((5 * xx + 11 * yy) % 256).astype(np.uint8)
        rgb = np.stack([(gray.astype(int) + 85 * c) % 256
                        for c in range(3)], axis=-1).astype(np.uint8)
        mask = np.where((3 * xx + 7 * yy) % 9 < 4, 0, 255
                        ).astype(np.uint8)
        yield ((encode_tiff(gray, compression="lzw_predictor",
                            rows_per_strip=6),), {}, gray)
        yield ((encode_tiff(rgb, compression="packbits"),), {}, rgb)
        yield ((encode_tiff(mask, compression="g4", bilevel=True),),
               {}, mask)
        # next-IFD chain: a drop-in must honor the page kwarg
        yield ((encode_tiff_multi([gray, mask], compression="lzw"),),
               {"page": 1}, mask)
        # tile organization and BigTIFF: drop-ins must honor both
        yield ((encode_tiff(rgb, compression="packbits",
                            tile=(16, 16)),), {}, rgb)
        yield ((encode_tiff(gray, compression="lzw",
                            bigtiff=True),), {}, gray)
    elif fmt == "PNG":
        yy, xx = np.mgrid[0:19, 0:27]
        gray = ((7 * xx + 13 * yy) % 256).astype(np.uint8)
        rgba = np.stack([(gray.astype(int) + 60 * c) % 256
                         for c in range(4)], axis=-1).astype(np.uint8)
        yield ((encode_png(gray, filter_type=4, interlace=True),),
               {}, gray)
        yield ((encode_png(rgba, filter_type=3),), {}, rgba)
        ink = ((3 * xx + 5 * yy) % 7) < 3
        yield ((encode_png(ink.astype(np.uint8), bilevel=True),),
               {}, np.where(ink, 255, 0).astype(np.uint8))
    elif fmt == "PNM":
        yy, xx = np.mgrid[0:17, 0:23]
        gray = ((11 * xx + 3 * yy) % 256).astype(np.uint8)
        rgb = np.stack([(gray.astype(int) + 85 * c) % 256
                        for c in range(3)], axis=-1).astype(np.uint8)
        ink = ((5 * xx + 7 * yy) % 8) < 3
        yield ((encode_pnm(gray),), {}, gray)
        yield ((encode_pnm(rgb),), {}, rgb)
        yield ((encode_pnm(ink.astype(np.uint8), bilevel=True),),
               {}, np.where(ink, 0, 255).astype(np.uint8))
    else:
        raise KeyError(fmt)


def verify_decoder(fmt: str, fn):
    """Run ``fn`` through the contract suite for ``fmt``; raise
    ``ContractViolation`` on any pixel mismatch."""
    for args, kwargs, expected in contract_cases(fmt):
        try:
            got = fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — report, then reject
            raise ContractViolation(
                f"{fmt} candidate raised on a contract stream: "
                f"{type(exc).__name__}: {exc}") from exc
        got = np.asarray(got)
        if got.shape != expected.shape or not np.array_equal(
                got, expected):
            raise ContractViolation(
                f"{fmt} candidate mismatches the true-arithmetic "
                f"oracle (shape {got.shape} vs {expected.shape})")


# ------------------------------------------------------------------
# Encoder seam (round 8).  The MRC PDF SINKS are encode-bound the way
# the scan is decode-bound: every output page pays two JP2 encodes
# (bg + fg, ~0.19 Mpx/s/core built-in) and one JBIG2 encode — at
# 100 TB the sink's wall-time is the JP2 encoder, exactly as the
# decode side's was the JP2 decoder.  The reference pays kakadu for
# this (``jpeg2000.py:63-84``, ``mrc.py:502-509`` jbig2enc); this is
# the same delegation as a verified plug point.  ``kernels/pdfsink``
# and ``kernels/pdfrewrite`` route every stream they emit through
# ``get_encoder``.
#
# Encoder call signatures (normalized to the built-ins):
#
# =========  ======================================================
# JPEG2000   ``fn(img: np.ndarray, *, irreversible: bool) -> bytes``
#            (uint8 gray or RGB in; a JP2 stream the engine's OWN
#            decoder can read back)
# JBIG2      ``fn(bitmap: np.ndarray) -> bytes`` (0/1 ink mask in; an
#            embeddable generic-region JBIG2 stream)
# =========  ======================================================
#
# Contract (``verify_encoder``): the candidate's output must decode
# through the BUILT-IN (trusted-arithmetic) decoder with the right
# shape/channels; bit-exact for JBIG2 and reversible JP2 (both
# lossless by definition), and within a mean-absolute-error bound for
# irreversible JP2 (encoders legitimately differ in rate allocation;
# a candidate that distorts the contract images beyond archival
# tolerance is rejected).

ENCODER_FORMATS = ("JPEG2000", "JBIG2", "JPEG", "CCITT")

_ENC_BUILTINS = {
    # ``step`` tunes the 9/7 quantizer for the --hq-pages path (smaller
    # = higher quality, default matches the historical sink output);
    # ignored in reversible mode.
    "JPEG2000": lambda img, *, irreversible=False, step=0.5: encode_jp2(
        np.asarray(img), irreversible=irreversible, step=step),
    "JBIG2": lambda bitmap: encode_jbig2(np.asarray(bitmap)),
    # --mrc-image-format jpeg: bg/fg as baseline DCT streams
    "JPEG": lambda img, *, quality=75: encode_baseline(
        np.asarray(img), quality=quality),
    # --mask-compression ccitt: pure 2-D T.6 (Group 4) + EOFB
    "CCITT": lambda bitmap: encode_g4(np.asarray(bitmap)),
}

_encoders = dict(_ENC_BUILTINS)

_ENCODE_ERRORS = {
    fmt: type(f"{fmt.title()}EncodeError", (_ERROR_CLASS[fmt],), {})
    for fmt in ENCODER_FORMATS
}


def get_encoder(fmt: str):
    """The encode callable the MRC sinks must use for ``fmt`` (one of
    ``ENCODER_FORMATS``)."""
    return _encoders[fmt]


def builtin_encoder(fmt: str):
    return _ENC_BUILTINS[fmt]


def register_encoder(fmt: str, fn, *, verify: bool = True):
    """Install a drop-in encoder for ``fmt``; ``verify=True`` runs
    ``verify_encoder`` first (round-trip through the built-in decoder)
    and rejects with ``ContractViolation`` on failure.  The installed
    callable is exception-wrapped into the format's typed error."""
    if fmt not in ENCODER_FORMATS:
        raise KeyError(fmt)
    if verify:
        verify_encoder(fmt, fn)
    err = _ENCODE_ERRORS[fmt]

    def wrapped(*a, **kw):
        try:
            return fn(*a, **kw)
        except Exception as exc:  # noqa: BLE001 — typed-error contract
            raise err(f"drop-in {fmt} encoder failed: "
                      f"{type(exc).__name__}: {exc}") from exc

    wrapped.__wrapped__ = fn
    _encoders[fmt] = wrapped
    return wrapped


def reset_encoder(fmt: str | None = None):
    """Restore the built-in encoder(s)."""
    if fmt is None:
        _encoders.update(_ENC_BUILTINS)
    else:
        _encoders[fmt] = _ENC_BUILTINS[fmt]


def encoder_contract_images(fmt: str):
    """Deterministic contract inputs for ``fmt`` encoders: the smooth
    paper-like and textured shapes the MRC components actually feed
    the sink (gray and RGB for JP2; sparse and dense ink for JBIG2)."""
    if fmt == "JPEG2000":
        yy, xx = np.mgrid[0:40, 0:56]
        smooth = (180 + 30 * np.sin(xx / 9.0)
                  + 20 * np.cos(yy / 7.0)).astype(np.uint8)
        yield smooth, False
        yield smooth, True
        rgb = np.stack([(smooth.astype(int) + 40 * c) % 256
                        for c in range(3)], axis=-1).astype(np.uint8)
        yield rgb, True
    elif fmt in ("JBIG2", "CCITT"):
        yy, xx = np.mgrid[0:33, 0:47]
        yield (((7 * xx + 5 * yy) % 13) < 4).astype(np.uint8), None
        yield (((3 * xx + 11 * yy) % 5) < 3).astype(np.uint8), None
    elif fmt == "JPEG":
        yy, xx = np.mgrid[0:40, 0:56]
        smooth = (180 + 30 * np.sin(xx / 9.0)
                  + 20 * np.cos(yy / 7.0)).astype(np.uint8)
        yield smooth, None
        rgb = np.stack([(smooth.astype(int) + 40 * c) % 256
                        for c in range(3)], axis=-1).astype(np.uint8)
        yield rgb, None
    else:
        raise KeyError(fmt)


def verify_encoder(fmt: str, fn):
    """Round-trip ``fn`` through the BUILT-IN decoder; raise
    ``ContractViolation`` on shape mismatch, lossless mismatch, or
    irreversible error beyond tolerance."""
    if fmt == "JPEG2000":
        dec = _BUILTINS["JPEG2000"]
        for img, irreversible in encoder_contract_images(fmt):
            try:
                stream = fn(img, irreversible=irreversible)
                got = dec(bytes(stream))
            except Exception as exc:  # noqa: BLE001
                raise ContractViolation(
                    f"JPEG2000 candidate failed round-trip: "
                    f"{type(exc).__name__}: {exc}") from exc
            got = np.asarray(got)
            if got.shape != img.shape:
                raise ContractViolation(
                    f"JPEG2000 candidate changed shape "
                    f"{img.shape} -> {got.shape}")
            if not irreversible:
                if not np.array_equal(got, img):
                    raise ContractViolation(
                        "JPEG2000 candidate not lossless in "
                        "reversible mode")
            else:
                mae = float(np.mean(np.abs(
                    got.astype(np.int16) - img.astype(np.int16))))
                if mae > 8.0:
                    raise ContractViolation(
                        f"JPEG2000 candidate too lossy (MAE {mae:.1f} "
                        "> 8.0 on smooth contract content)")
        # the sink's hq-pages/--jp2-step lane calls
        # fn(img, irreversible=True, step=...) — a candidate whose
        # signature lacks step= must be rejected here, not explode at
        # runtime inside an executor (round-8 ADVICE)
        img = next(iter(encoder_contract_images(fmt)))[0]
        try:
            got = np.asarray(dec(bytes(
                fn(img, irreversible=True, step=0.25))))
        except Exception as exc:  # noqa: BLE001
            raise ContractViolation(
                f"JPEG2000 candidate failed the step= contract call "
                f"(required by hq-pages): {type(exc).__name__}: "
                f"{exc}") from exc
        if got.shape != img.shape:
            raise ContractViolation(
                "JPEG2000 candidate changed shape under step=")
        mae = float(np.mean(np.abs(
            got.astype(np.int16) - img.astype(np.int16))))
        if mae > 8.0:
            raise ContractViolation(
                f"JPEG2000 candidate too lossy under step=0.25 "
                f"(MAE {mae:.1f} > 8.0)")
    elif fmt == "JBIG2":
        dec = _BUILTINS["JBIG2"]
        for bm, _ in encoder_contract_images(fmt):
            try:
                got = np.asarray(dec(bytes(fn(bm)), b""))
            except Exception as exc:  # noqa: BLE001
                raise ContractViolation(
                    f"JBIG2 candidate failed round-trip: "
                    f"{type(exc).__name__}: {exc}") from exc
            if got.shape != bm.shape or not np.array_equal(got, bm):
                raise ContractViolation(
                    "JBIG2 candidate is not bit-exact (JBIG2 generic "
                    "coding is lossless by definition)")
    elif fmt == "CCITT":
        dec = _BUILTINS["CCITT"]
        for bm, _ in encoder_contract_images(fmt):
            h, w = bm.shape
            try:
                got = np.asarray(dec(bytes(fn(bm)), w, h, k=-1))
            except Exception as exc:  # noqa: BLE001
                raise ContractViolation(
                    f"CCITT candidate failed round-trip: "
                    f"{type(exc).__name__}: {exc}") from exc
            if got.shape != bm.shape or not np.array_equal(got, bm):
                raise ContractViolation(
                    "CCITT candidate is not bit-exact (T.6 is "
                    "lossless by definition)")
    elif fmt == "JPEG":
        dec = _BUILTINS["JPEG"]
        for img, _ in encoder_contract_images(fmt):
            try:
                got = np.asarray(dec(bytes(fn(img))))
            except Exception as exc:  # noqa: BLE001
                raise ContractViolation(
                    f"JPEG candidate failed round-trip: "
                    f"{type(exc).__name__}: {exc}") from exc
            if got.shape != img.shape:
                raise ContractViolation(
                    f"JPEG candidate changed shape "
                    f"{img.shape} -> {got.shape}")
            mae = float(np.mean(np.abs(
                got.astype(np.int16) - img.astype(np.int16))))
            if mae > 8.0:
                raise ContractViolation(
                    f"JPEG candidate too lossy (MAE {mae:.1f} > 8.0 "
                    "on smooth contract content)")
        # the sink's --jpeg-quality lane calls fn(img, quality=N)
        img = next(iter(encoder_contract_images(fmt)))[0]
        try:
            got = np.asarray(dec(bytes(fn(img, quality=60))))
        except Exception as exc:  # noqa: BLE001
            raise ContractViolation(
                f"JPEG candidate failed the quality= contract call: "
                f"{type(exc).__name__}: {exc}") from exc
        if got.shape != img.shape:
            raise ContractViolation(
                "JPEG candidate changed shape under quality=")
    else:
        raise KeyError(fmt)


def maybe_register_native() -> list[str]:
    """Best-effort native-codec registration (opt-in at deploy time).

    Tries publicly-available native decoders and registers each ONLY
    if it passes the contract suite; returns the formats swapped.
    Nothing here is required — absence of every library leaves the
    built-ins in place.  (This container ships none of them, so the
    path is exercised in tests through fake drop-ins.)

    Orthogonal to this external-library seam, the BUILT-INS themselves
    carry compiled hot loops since round 8 (``kernels/native``: the MQ
    coder, JBIG2/JP2/JPEG/CCITT/LZW walks auto-compile with the system
    gcc at first use, bit-exact with silent pure-Python fallback) — so
    "no native library present" no longer means interpreter-speed
    decode; this function remains the path to kakadu-class rates on
    top of that."""
    swapped = []
    try:  # Pillow: libjpeg/libpng/libtiff-backed decodes
        import io

        from PIL import Image  # type: ignore

        def _pil_jpeg(raw: bytes):
            return np.asarray(Image.open(io.BytesIO(raw)))

        def _pil_png(raw: bytes):
            im = Image.open(io.BytesIO(raw))
            if im.mode == "P":      # registry contract: samples, not
                im = im.convert(    # palette indices
                    "RGBA" if "transparency" in im.info else "RGB")
            arr = np.asarray(im)
            if arr.dtype == bool:   # mode '1': True = white
                arr = np.where(arr, 255, 0).astype(np.uint8)
            return arr

        def _pil_tiff(raw: bytes, page: int = 0):
            im = Image.open(io.BytesIO(raw))
            im.seek(page)
            arr = np.asarray(im)
            if arr.dtype == bool:
                arr = np.where(arr, 255, 0).astype(np.uint8)
            return arr

        for _fmt, _fn in (("JPEG", _pil_jpeg), ("PNG", _pil_png),
                          ("PNM", _pil_png), ("TIFF", _pil_tiff)):
            try:
                register_decoder(_fmt, _fn)
                swapped.append(_fmt)
            except ContractViolation:
                pass

        def _pil_jp2_encode(img, *, irreversible=False, step=None):
            # step= accepted so the hq-pages/--jp2-step lane works
            # (round-8 ADVICE): PIL has no explicit quantizer-step
            # knob, so map step onto its quality_layers dB scale —
            # smaller step = higher fidelity.
            buf = io.BytesIO()
            kw = {}
            if irreversible and step is not None:
                kw["quality_mode"] = "dB"
                kw["quality_layers"] = [
                    max(20.0, 50.0 - 10.0 * float(np.log2(
                        max(float(step), 1e-6))))]
            Image.fromarray(np.asarray(img)).save(
                buf, format="JPEG2000",
                irreversible=bool(irreversible), **kw)
            return buf.getvalue()

        try:  # needs Pillow built against openjpeg; verify rejects
            register_encoder("JPEG2000", _pil_jp2_encode)
            swapped.append("JPEG2000-encode")
        except ContractViolation:
            pass
    except ImportError:
        pass
    try:  # PyMuPDF: JP2 + JBIG2 + CCITT via MuPDF
        import fitz  # type: ignore  # noqa: F401

        # wiring PyMuPDF's image decode needs per-format adapters
        # (Pixmap construction per stream family); left to the
        # deployment that actually ships it — the contract suite
        # above is what any adapter must pass.
    except ImportError:
        pass
    return swapped


# Deploy-time opt-in (job.py --native-codecs): registration must
# happen in EVERY python worker process, not just the driver — codecs
# run inside mapInPandas — so the switch is an env var the driver
# propagates via spark.executorEnv and this module honors at import.
# Contract-verified as always: a native decoder that fails the oracle
# suite is silently skipped and the built-in stays.
import os as _os  # noqa: E402

ENV_SWAPPED: list[str] = []
if _os.environ.get("SPARK_GRAFT_NATIVE_CODECS") == "1":
    ENV_SWAPPED = maybe_register_native()

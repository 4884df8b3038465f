"""From-scratch PNM (PBM/PGM/PPM) reader/writer.

PNM is the reference engine's CODEC INTERMEDIATE: its JPEG2000
wrapper round-trips every raster through a ``.pnm`` temp file when
driving kakadu (``jpeg2000.py:63-84`` — ``mkstemp(suffix='.pnm')``
then ``kdu_compress -i img.pnm`` / ``kdu_expand -o img.pnm``), and
archival imagestacks occasionally carry raw PNM pages.  The format
is a plain-text header (magic ``P1``-``P6``, ``#`` comments,
whitespace-separated dimensions and maxval) followed by ASCII or
binary samples — entirely algorithmic, no tables.

Scope: decode P1-P6 (ASCII and raw; 1- and 2-byte raw samples with
maxval scaling to the engine's uint8 contract; PBM ink bit 1 renders
black per the format definition); encode P4 (bilevel, nonzero ->
ink/black), P5 (gray), P6 (RGB) with maxval 255 — the shapes the
reference's kakadu hand-off writes.  ``PnmError`` on malformed data,
``max_pixels`` bomb guard; per-image work inside ``mapInPandas``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["PnmError", "decode_pnm", "encode_pnm"]


class PnmError(ValueError):
    """Malformed, truncated, or unsupported PNM data."""


def _tokens(data: bytes, n: int, pos: int):
    """Read ``n`` whitespace-separated integer tokens starting at
    ``pos``, honoring ``#`` comments; return (values, new pos)."""
    vals: list[int] = []
    cur = b""
    while len(vals) < n:
        if pos >= len(data):
            if cur:
                vals.append(int(cur))
                cur = b""
                continue
            raise PnmError("truncated PNM header/samples")
        ch = data[pos:pos + 1]
        pos += 1
        if ch == b"#":
            while pos < len(data) and data[pos:pos + 1] not in (
                    b"\n", b"\r"):
                pos += 1
        elif ch.isspace():
            if cur:
                vals.append(int(cur))
                cur = b""
        elif ch.isdigit():
            cur += ch
        else:
            raise PnmError(f"unexpected byte {ch!r} in PNM")
    return vals, pos


def decode_pnm(data: bytes, max_pixels: int = 64_000_000
               ) -> np.ndarray:
    """PNM bytes -> uint8 raster: (h, w) gray (PBM ink -> 0/black),
    (h, w, 3) RGB; maxval-scaled to 0..255."""
    magic = data[:2]
    if len(data) < 2 or magic[:1] != b"P" or \
            magic[1:2] not in b"123456":
        raise PnmError("bad PNM magic")
    kind = int(magic[1:2])
    bitmap = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    n_hdr = 2 if bitmap else 3
    hdr, pos = _tokens(data, n_hdr, 2)
    w, h = hdr[0], hdr[1]
    maxval = 1 if bitmap else hdr[2]
    if w <= 0 or h <= 0:
        raise PnmError("non-positive PNM dimensions")
    if w * h > max_pixels:
        raise PnmError(f"image exceeds max_pixels ({w}x{h})")
    if not 0 < maxval < 65536:
        raise PnmError(f"bad maxval {maxval}")

    if kind <= 3:                          # ASCII variants
        if kind == 1:
            # P1 digits may be unseparated; read raw 0/1 characters
            bits: list[int] = []
            while len(bits) < w * h:
                if pos >= len(data):
                    raise PnmError("truncated P1 samples")
                ch = data[pos:pos + 1]
                pos += 1
                if ch in (b"0", b"1"):
                    bits.append(ch == b"1")
                elif ch == b"#":
                    while pos < len(data) and data[pos:pos + 1] \
                            not in (b"\n", b"\r"):
                        pos += 1
                elif not ch.isspace():
                    raise PnmError(f"unexpected byte {ch!r} in P1")
            flat = np.array(bits, np.uint8)
        else:
            vals, pos = _tokens(data, w * h * channels, pos)
            # bound-check as Python ints BEFORE the uint32 conversion:
            # a huge ASCII token would otherwise wrap (or raise an
            # untyped OverflowError) instead of PnmError
            if max(vals) > maxval:
                raise PnmError("sample exceeds maxval")
            flat = np.array(vals, np.uint32)
    else:                                  # raw: one whitespace byte
        if pos > len(data):
            raise PnmError("truncated PNM")
        if kind == 4:
            rowbytes = (w + 7) // 8
            need = rowbytes * h
            if len(data) - pos < need:
                raise PnmError("truncated P4 samples")
            rows = np.frombuffer(data, np.uint8, need, pos).reshape(
                h, rowbytes)
            flat = np.unpackbits(rows, axis=1)[:, :w].reshape(-1)
        else:
            per = 2 if maxval > 255 else 1
            need = w * h * channels * per
            if len(data) - pos < need:
                raise PnmError("truncated PNM samples")
            if per == 1:
                flat = np.frombuffer(data, np.uint8, need, pos
                                     ).astype(np.uint32)
            else:                          # raw 2-byte is big-endian
                flat = np.frombuffer(data, ">u2", need // 2, pos
                                     ).astype(np.uint32)

    if flat.size != w * h * channels:
        raise PnmError("sample count mismatch")
    if bitmap:                             # PBM: 1 = black ink
        img = np.where(flat.reshape(h, w) != 0, 0, 255
                       ).astype(np.uint8)
        return img
    if int(flat.max(initial=0)) > maxval:
        raise PnmError("sample exceeds maxval")
    scaled = (flat * 255 // maxval).astype(np.uint8)
    return scaled.reshape(h, w) if channels == 1 else \
        scaled.reshape(h, w, 3)


def encode_pnm(img: np.ndarray, *, bilevel: bool = False) -> bytes:
    """uint8 raster -> raw PNM bytes: P4 (``bilevel=True``, nonzero
    -> ink/black bit 1), P5 for (h, w) gray, P6 for (h, w, 3) RGB."""
    img = np.asarray(img)
    if bilevel:
        if img.ndim != 2:
            raise PnmError("bilevel PNM needs a 2-D mask")
        h, w = img.shape
        packed = np.packbits((img != 0).astype(np.uint8), axis=1)
        return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
    if img.dtype != np.uint8:
        raise PnmError("encode_pnm expects uint8 samples")
    if img.ndim == 2:
        h, w = img.shape
        return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()
    if img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()
    raise PnmError(f"unsupported raster shape {img.shape}")

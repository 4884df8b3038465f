"""From-scratch PNG reader/writer (ISO/IEC 15948 / RFC 2083).

PNG is the reference engine's MRC MASK SINK: ``encode_mrc_mask``
always materializes the bilevel mask as a PNG (``mrc.py:477-520``,
``mask.save(mask_img_png, compress_level=0)``) and hands it either
to the ``jbig2`` subprocess or straight to mupdf (``recode.py:
378-419``); page scans inside archival imagestacks also ship as PNG.
This module re-derives that capability with no image library: DEFLATE
comes from the stdlib ``zlib`` (public), chunk CRCs from
``zlib.crc32``, and everything else — scanline filters 0-4 (None /
Sub / Up / Average / Paeth, the published predictor algorithms),
bit-depth unpacking, palette application, and Adam7 deinterlacing —
is algorithmic structure from the public specification.  The Adam7
pass geometry is DERIVED in code from the canonical 8x8 pass grid
(the spec's defining figure) rather than transcribing offset/step
tables, consistent with the repo's no-tables-from-memory rule.

Scope: all five color types; bit depths 1/2/4/8 exactly and 16
reduced to 8 via the high byte (the engine's raster contract is
uint8); interlace methods 0 and 1.  Ancillary chunks are skipped
except ``tRNS`` on palette images (alpha).  The encoder writes
non-paletted images (gray / gray+alpha / RGB / RGBA, plus 1-bit
gray for bilevel masks — the reference's mask shape) with a
selectable per-row filter and optional Adam7 interlace, so every
decoder path is exercisable by our own streams.

Safety mirrors the other codecs: ``PngError`` on malformed or
unsupported data, a ``max_pixels`` bomb guard, and the inflate runs
through ``decompressobj`` with an exact output bound so a crafted
IDAT cannot balloon memory.

Scale shape: per-image work inside ``mapInPandas`` (the imagestack
front door), no driver-side state.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngError", "decode_png", "encode_png", "png_dims"]

_SIG = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    """Malformed, truncated, or unsupported-profile PNG data."""


# channels per color type (ISO 15948 table 11.1 structure: gray,
# -, truecolor, palette-index, gray+alpha, -, truecolor+alpha)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

# The canonical Adam7 pass grid (the spec's defining 8x8 figure);
# per-pass origins and steps are derived from it below, not typed in.
_ADAM7_GRID = (
    (1, 6, 4, 6, 2, 6, 4, 6),
    (7, 7, 7, 7, 7, 7, 7, 7),
    (5, 6, 5, 6, 5, 6, 5, 6),
    (7, 7, 7, 7, 7, 7, 7, 7),
    (3, 6, 4, 6, 3, 6, 4, 6),
    (7, 7, 7, 7, 7, 7, 7, 7),
    (5, 6, 5, 6, 5, 6, 5, 6),
    (7, 7, 7, 7, 7, 7, 7, 7),
)


def _adam7_passes():
    """[(x0, y0, xstep, ystep)] for passes 1..7, derived from the
    grid: origin = first cell of the pass, step = spacing between
    its cells (8 when the pass has a single row/column in the tile)."""
    passes = []
    for p in range(1, 8):
        ys = sorted({y for y in range(8) for x in range(8)
                     if _ADAM7_GRID[y][x] == p})
        xs = sorted({x for x in range(8) for y in range(8)
                     if _ADAM7_GRID[y][x] == p})
        passes.append((xs[0], ys[0],
                       xs[1] - xs[0] if len(xs) > 1 else 8,
                       ys[1] - ys[0] if len(ys) > 1 else 8))
    return passes


_PASSES = _adam7_passes()


# ---------------------------------------------------------------- chunks

def _iter_chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if pos + 12 + ln > len(data):
            raise PngError("truncated chunk")
        body = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"chunk CRC mismatch ({ctype!r})")
        yield ctype, body
        pos += 12 + ln
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


# ---------------------------------------------------------------- filters

def _unfilter_image(raw: bytes, pos: int, w: int, h: int,
                    channels: int, depth: int):
    """Consume one filtered sub-image (h rows of 1+rowbytes) starting
    at ``pos``; return (rows ndarray (h, rowbytes) uint8, new pos)."""
    rowbytes = (w * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    need = h * (1 + rowbytes)
    if len(raw) - pos < need:
        raise PngError("IDAT too short for image dimensions")

    from . import native as _ckern

    res = _ckern.png_unfilter_native(raw, pos, h, rowbytes, bpp)
    if res is not None:                  # byte-identical C kernel
        return res
    out = np.empty((h, rowbytes), np.uint8) if h else \
        np.empty((0, rowbytes), np.uint8)
    prev = np.zeros(rowbytes, np.uint8)
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, np.uint8, rowbytes, pos + 1)
        pos += 1 + rowbytes
        if ft == 0:                       # None
            cur = row.copy()
        elif ft == 2:                     # Up
            cur = row + prev              # uint8 wraps mod 256
        elif ft == 1:                     # Sub: per-channel prefix sum
            k = -(-rowbytes // bpp)
            tmp = np.zeros(k * bpp, np.uint64)
            tmp[:rowbytes] = row
            c = tmp.reshape(k, bpp).cumsum(axis=0) & 0xFF
            cur = c.reshape(-1)[:rowbytes].astype(np.uint8)
        elif ft in (3, 4):                # Average / Paeth: sequential
            cur = _unfilter_seq(ft, row, prev, bpp)
        else:
            raise PngError(f"unknown filter type {ft}")
        out[y] = cur
        prev = cur
    return out, pos


def _unfilter_seq(ft: int, row, prev, bpp: int):
    """Average (3) / Paeth (4) reconstruction — inherently sequential
    along x, so a plain-int scan (published predictor pseudocode)."""
    cur = row.tolist()
    pv = prev.tolist()
    n = len(cur)
    if ft == 3:
        for i in range(n):
            left = cur[i - bpp] if i >= bpp else 0
            cur[i] = (cur[i] + ((left + pv[i]) >> 1)) & 0xFF
    else:
        for i in range(n):
            a = cur[i - bpp] if i >= bpp else 0
            b = pv[i]
            c = pv[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                    else c)
            cur[i] = (cur[i] + pr) & 0xFF
    return np.array(cur, np.uint8)


def _filter_rows(img_bytes: np.ndarray, bpp: int,
                 filter_type: int) -> bytes:
    """Filter an (h, rowbytes) byte image with one fixed filter type
    per row (the encoder side; exercises every decoder branch)."""
    h, rowbytes = img_bytes.shape
    prev = np.zeros(rowbytes, np.uint8)
    out = bytearray()
    for y in range(h):
        cur = img_bytes[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 1:
            left = np.zeros(rowbytes, np.uint8)
            left[bpp:] = cur[:-bpp]
            filt = cur - left
        elif filter_type in (3, 4):
            filt = _filter_seq(filter_type, cur, prev, bpp)
        else:
            raise PngError(f"unknown filter type {filter_type}")
        out.append(filter_type)
        out += filt.tobytes()
        prev = cur
    return bytes(out)


def _filter_seq(ft: int, cur, prev, bpp: int):
    c_ = cur.tolist()
    pv = prev.tolist()
    n = len(c_)
    filt = [0] * n
    for i in range(n):
        a = c_[i - bpp] if i >= bpp else 0
        b = pv[i]
        if ft == 3:
            filt[i] = (c_[i] - ((a + b) >> 1)) & 0xFF
        else:
            c2 = pv[i - bpp] if i >= bpp else 0
            p = a + b - c2
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c2)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                    else c2)
            filt[i] = (c_[i] - pr) & 0xFF
    return np.array(filt, np.uint8)


# ---------------------------------------------------------------- samples

def _rows_to_samples(rows: np.ndarray, w: int, channels: int,
                     depth: int) -> np.ndarray:
    """(h, rowbytes) filtered-out bytes -> (h, w, channels) uint8
    samples at native depth (16-bit reduced via the high byte)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :w * channels].reshape(h, w, channels)
    if depth == 16:
        return rows[:, :w * channels * 2].reshape(
            h, w, channels, 2)[..., 0]
    # sub-byte: MSB-first packed samples
    bits = np.unpackbits(rows, axis=1)
    vals = bits[:, :w * channels * depth].reshape(
        h, w * channels, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.uint16).astype(
        np.uint8).reshape(h, w, channels)


def _samples_to_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w, channels) uint8 samples -> (h, rowbytes) packed bytes."""
    h, w, channels = samples.shape
    if depth == 8:
        return samples.reshape(h, w * channels)
    flat = samples.reshape(h, w * channels)
    bits = np.unpackbits(flat[..., None], axis=2)[:, :, 8 - depth:]
    return np.packbits(bits.reshape(h, -1), axis=1)


# ---------------------------------------------------------------- decode

def png_dims(data: bytes):
    """(width, height, bit_depth, color_type) from IHDR only — the
    cheap header probe (the ``_jp2_dims`` analogue)."""
    for ctype, body in _iter_chunks(data):
        if ctype != b"IHDR" or len(body) != 13:
            raise PngError("first chunk is not a valid IHDR")
        w, h, depth, color = struct.unpack(">IIBB", body[:10])
        return w, h, depth, color
    raise PngError("empty PNG")


def decode_png(data: bytes, max_pixels: int = 64_000_000
               ) -> np.ndarray:
    """PNG bytes -> uint8 raster: (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, or (h, w, 4) RGBA.  Gray samples are scaled to
    0..255 (``v * 255 // (2**depth - 1)``); 16-bit channels reduce to
    their high byte."""
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    for ctype, body in _iter_chunks(data):
        if ihdr is None:
            if ctype != b"IHDR" or len(body) != 13:
                raise PngError("first chunk is not a valid IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3 or not body:
                raise PngError("bad PLTE length")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat += body
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if not w or not h:
        raise PngError("zero-dimension image")
    if w * h > max_pixels:
        raise PngError(f"image exceeds max_pixels ({w}x{h})")
    if comp or filt:
        raise PngError("unknown compression/filter method")
    if color not in _CHANNELS or depth not in _VALID_DEPTHS[color]:
        raise PngError(
            f"unsupported color type {color} / depth {depth}")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if color == 3 and plte is None:
        raise PngError("palette image without PLTE")
    channels = _CHANNELS[color]

    # exact inflate bound: total filtered bytes across sub-images
    def _sub_images():
        if interlace == 0:
            yield 0, 0, 1, 1, w, h
        else:
            for x0, y0, xs, ys in _PASSES:
                pw = (w - x0 + xs - 1) // xs if w > x0 else 0
                ph = (h - y0 + ys - 1) // ys if h > y0 else 0
                yield x0, y0, xs, ys, pw, ph

    bound = sum(ph * (1 + (pw * channels * depth + 7) // 8)
                for *_xy, pw, ph in _sub_images())
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(bytes(idat), bound)
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    if dec.decompress(b"", 1):
        raise PngError("IDAT inflates past the image size")

    out = np.zeros((h, w, channels), np.uint8)
    pos = 0
    for x0, y0, xs, ys, pw, ph in _sub_images():
        if not pw or not ph:
            continue
        rows, pos = _unfilter_image(raw, pos, pw, ph, channels, depth)
        out[y0::ys, x0::xs] = _rows_to_samples(rows, pw, channels,
                                               depth)
    if pos != len(raw):
        raise PngError("IDAT carries trailing image data")

    if color == 3:
        idx = out[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            if len(trns) > len(plte):
                raise PngError("tRNS longer than the palette")
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if depth < 8:                         # scale gray to full range
        out = (out.astype(np.uint16) * 255 // ((1 << depth) - 1)
               ).astype(np.uint8)
    return out[:, :, 0] if channels == 1 else out


# ---------------------------------------------------------------- encode

def encode_png(img: np.ndarray, *, compress_level: int = 6,
               filter_type: int = 2, bilevel: bool = False,
               interlace: bool = False) -> bytes:
    """uint8 raster -> PNG bytes.

    Shapes: (h, w) gray-8; (h, w, 2) gray+alpha; (h, w, 3) RGB;
    (h, w, 4) RGBA.  ``bilevel=True`` writes a 1-bit gray PNG
    (nonzero -> white) — the reference's mask-sink shape
    (``mrc.py:493-499`` saves the PIL '1' mask with
    ``compress_level=0``; pass that level for byte-parity intent).
    ``filter_type`` fixes the per-row filter (0-4) so tests can
    exercise each decoder branch; ``interlace`` writes Adam7."""
    img = np.asarray(img)
    if bilevel:
        if img.ndim != 2:
            raise PngError("bilevel PNG needs a 2-D mask")
        depth, color, channels = 1, 0, 1
        samples = (img != 0).astype(np.uint8)[:, :, None]
    else:
        if img.dtype != np.uint8:
            raise PngError("encode_png expects uint8 samples")
        if img.ndim == 2:
            img = img[:, :, None]
        if img.ndim != 3 or img.shape[2] not in (1, 2, 3, 4):
            raise PngError(f"unsupported raster shape {img.shape}")
        channels = img.shape[2]
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        depth = 8
        samples = img
    h, w = samples.shape[:2]
    if not h or not w:
        raise PngError("zero-dimension image")
    bpp = max(1, channels * depth // 8)

    filtered = bytearray()
    if interlace:
        for x0, y0, xs, ys in _PASSES:
            sub = samples[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                filtered += _filter_rows(
                    _samples_to_rows(sub, depth), bpp, filter_type)
    else:
        filtered += _filter_rows(_samples_to_rows(samples, depth),
                                 bpp, filter_type)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                       1 if interlace else 0)
    idat = zlib.compress(bytes(filtered), compress_level)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))

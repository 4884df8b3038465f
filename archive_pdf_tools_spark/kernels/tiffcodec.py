"""From-scratch TIFF reader/writer (TIFF 6.0, classic strip layout).

Archival imagestacks are literally ``*_tif.zip`` — the reference's
imagestack scan (``recode.py:595-597``) and its inverse tool
(``bin/pdf-to-imagestack:19-72``) hand every page file to PIL, which
reads/writes exactly these TIFFs (bilevel G4 fax pages, gray/RGB
scans).  This module re-derives that ingest capability on the
engine's own codecs: the CCITT tags decode through
``kernels/ccittcodec`` (the same T.4/T.6 machinery the PDF scan
uses), new-style JPEG (tag 7) through ``kernels/jpegcodec``, and the
byte-oriented TIFF schemes (LZW with horizontal predictor, PackBits)
are implemented here — all algorithmic structure from the public
TIFF 6.0 specification, no tables transcribed.

Scope (raised as ``TiffError``, honestly): classic (non-Big) TIFF,
first IFD, chunky planar configuration, strip-organized data (tiled
TIFFs raise), 1-bit bilevel and 8-bit gray/RGB samples.  The LZW
coder implements the spec's EARLY-CHANGE code-width schedule (the
variant every conforming writer emits); no foreign TIFF exists
in-container to cross-check, so the evidence model is bit-exact
round-trips plus hand-built byte-level pins — the same honesty note
as the other codecs.

Scale shape: identical to the other codecs — per-image work inside
``mapInPandas``; the imagestack front door maps (doc_id, page_file)
rows to decoded rasters with no driver-side state.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Malformed, truncated, or unsupported-profile TIFF data."""


# tag ids (TIFF 6.0 §8)
_T_WIDTH, _T_HEIGHT = 256, 257
_T_BPS, _T_COMP, _T_PHOTO = 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS, _T_STRIP_CNT = 273, 277, 278, 279
_T_PREDICTOR, _T_PLANAR = 317, 284
_T_T4OPTS, _T_T6OPTS = 292, 293
_T_TILE_W, _T_TILE_H = 322, 323
_T_JPEGTABLES = 347

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(data: bytes, lt: str, page: int = 0):
    """IFD ``page`` (next-IFD chain walk) -> {tag: [values]} (classic
    TIFF only)."""
    if len(data) < 8:
        raise TiffError("truncated TIFF header")
    off = struct.unpack(lt + "I", data[4:8])[0]
    for _ in range(page):
        if off + 2 > len(data):
            raise TiffError("IFD offset out of range")
        cnt0 = struct.unpack(lt + "H", data[off:off + 2])[0]
        nxt = off + 2 + 12 * cnt0
        if nxt + 4 > len(data):
            raise TiffError("truncated IFD chain")
        off = struct.unpack(lt + "I", data[nxt:nxt + 4])[0]
        if off == 0:
            raise TiffError("page beyond IFD chain")
    if off + 2 > len(data):
        raise TiffError("IFD offset out of range")
    n = struct.unpack(lt + "H", data[off:off + 2])[0]
    if n == 0 or n > 512:
        raise TiffError("implausible IFD entry count")
    tags = {}
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(data):
            raise TiffError("truncated IFD")
        tag, typ, cnt = struct.unpack(lt + "HHI", data[e:e + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue                         # unknown type: skip tag
        total = size * cnt
        if total <= 4:
            raw = data[e + 8:e + 8 + total]
        else:
            voff = struct.unpack(lt + "I", data[e + 8:e + 12])[0]
            if voff + total > len(data):
                raise TiffError("tag value out of range")
            raw = data[voff:voff + total]
        if typ in (1, 6, 7):
            vals = list(raw)
        elif typ in (3, 8):
            vals = list(struct.unpack(lt + "%dH" % cnt, raw))
        elif typ in (4, 9, 11):
            fmt = {4: "I", 9: "i", 11: "f"}[typ]
            vals = list(struct.unpack(lt + "%d%s" % (cnt, fmt), raw))
        else:
            vals = [raw]                     # rationals etc: opaque
        tags[tag] = vals
    return tags


# ------------------------------------------------------------ PackBits

def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:                          # literal run of b+1
            if i + b + 1 > n:
                raise TiffError("truncated PackBits literal")
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:                        # repeat next byte 257-b
            if i >= n:
                raise TiffError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    if len(out) < expected:
        raise TiffError("PackBits underrun")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:                       # repeat run
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run until the next >=3 repeat (2-byte repeats are
        # cheaper folded into the literal); folding advances j by 2,
        # so clamp to the 128-byte literal ceiling — without it a
        # 127+pair state emits header byte 0x80, the no-op code
        # (review finding, undecodable stream)
        j = i
        while j < n and j - i < 128:
            k = j + 1
            while k < n and k - j < 3 and data[k] == data[j]:
                k += 1
            if k - j >= 3:
                break
            j = min(k, i + 128)
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# ------------------------------------------------------------------ LZW

def lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (§13): MSB-first codes from 9 bits, Clear=256,
    EOI=257, EARLY code-width change (width grows when the next table
    index reaches 2^w - 1, one entry before generic LZW would)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:                  # Clear
                reset()
                width = 9
                prev = None
                continue
            if code == 257:                  # EOI
                if len(out) < expected:
                    raise TiffError("LZW underrun")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise TiffError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise TiffError("LZW code out of range")
            out += entry
            prev = entry
            # early change: grow width one entry before the table fills
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise TiffError("LZW stream ended without EOI")
    return bytes(out[:expected])


def lzw_encode(data: bytes) -> bytes:
    """Mirror of `lzw_decode` (early-change schedule, Clear emitted at
    start and on table overflow, EOI at the end)."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)                          # leading Clear (§13)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # the DECODER adds its mirror entry one code LATER (its first
        # post-clear code adds nothing), so its table length is
        # next_code - 1; it early-changes at length 2^w - 1, hence
        # the encoder changes when next_code reaches 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        elif next_code == 4094:              # 2^12 - 2: reset
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        put(table[cur], width)
    put(257, width)                          # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode_tiff(data: bytes, max_pixels: int = 64_000_000,
                page: int = 0) -> np.ndarray:
    """TIFF bytes -> uint8 array: (h, w) gray (bilevel rendered 0/255)
    or (h, w, 3) RGB.  ``page`` walks the next-IFD chain (multi-page
    book-scan TIFFs).  Contract mirrors the other codecs: malformed,
    truncated, adversarial, or unsupported-profile input raises
    ``TiffError`` — never crashes, never returns garbage silently."""
    try:
        return _decode_tiff(data, max_pixels, page)
    except TiffError:
        raise
    except Exception as exc:                 # noqa: BLE001 — typed gate
        raise TiffError(
            f"malformed TIFF ({type(exc).__name__}: {exc})") from exc


def tiff_page_count(data: bytes) -> int:
    """Number of IFDs on the next-IFD chain (pages)."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        lt = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        lt = ">"
    else:
        raise TiffError("not a classic TIFF (II*/MM* magic)")
    if len(data) < 8:
        raise TiffError("truncated TIFF header")
    off = struct.unpack(lt + "I", data[4:8])[0]
    n = 0
    while off and n < 65536:
        if off + 2 > len(data):
            raise TiffError("IFD offset out of range")
        cnt = struct.unpack(lt + "H", data[off:off + 2])[0]
        nxt = off + 2 + 12 * cnt
        if nxt + 4 > len(data):
            raise TiffError("truncated IFD chain")
        off = struct.unpack(lt + "I", data[nxt:nxt + 4])[0]
        n += 1
    return n


def _decode_tiff(data: bytes, max_pixels: int,
                 page: int = 0) -> np.ndarray:
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        lt = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        lt = ">"
    else:
        raise TiffError("not a classic TIFF (II*/MM* magic)")
    tags = _read_ifd(data, lt, page)
    if _T_TILE_W in tags or _T_TILE_H in tags:
        raise TiffError("tiled TIFF unsupported")

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return int(v[0])

    w, h = one(_T_WIDTH), one(_T_HEIGHT)
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise TiffError("bad dimensions")
    comp = one(_T_COMP, 1)
    photo = one(_T_PHOTO, 1)
    spp = one(_T_SPP, 1)
    bps = tags.get(_T_BPS, [1])
    if one(_T_PLANAR, 1) != 1:
        raise TiffError("planar configuration unsupported")
    if spp == 1 and all(int(b) == 1 for b in bps):
        depth = 1
    elif spp in (1, 3) and all(int(b) == 8 for b in bps):
        depth = 8
    else:
        raise TiffError("unsupported sample layout")
    if photo not in (0, 1) and not (photo == 2 and spp == 3) \
            and not (photo == 6 and spp == 3 and comp == 7):
        # YCbCr is only in scope where JPEG converts it internally —
        # raw YCbCr samples must not masquerade as RGB
        raise TiffError("unsupported photometric interpretation")

    offs = tags.get(_T_STRIP_OFF)
    cnts = tags.get(_T_STRIP_CNT)
    if not offs or not cnts or len(offs) != len(cnts):
        raise TiffError("missing strip layout")
    rows_per = one(_T_ROWS, h)
    if rows_per <= 0:
        raise TiffError("bad RowsPerStrip")

    if comp == 7 and photo == 6:
        photo = 1                            # JPEG handles YCbCr itself
    row_bytes = (w + 7) // 8 if depth == 1 else w * spp
    out_rows: list[np.ndarray] = []
    y = 0
    for off, cnt in zip(offs, cnts):
        off, cnt = int(off), int(cnt)
        if off + cnt > len(data):
            raise TiffError("strip out of range")
        strip = data[off:off + cnt]
        nrows = min(rows_per, h - y)
        if nrows <= 0:
            break
        expected = row_bytes * nrows
        if comp == 1:
            raw = strip[:expected]
            if len(raw) < expected:
                raise TiffError("uncompressed strip underrun")
            arr = _raster(raw, nrows, w, spp, depth)
        elif comp == 32773:
            arr = _raster(packbits_decode(strip, expected),
                          nrows, w, spp, depth)
        elif comp == 5:
            raw = lzw_decode(strip, expected)
            arr = _raster(raw, nrows, w, spp, depth)
            if one(_T_PREDICTOR, 1) == 2:
                # horizontal differencing, per SAMPLE CHANNEL against
                # the previous pixel (§14) — mod-256 prefix sum
                if depth != 8:
                    raise TiffError("predictor on non-8-bit samples")
                arr = (np.cumsum(arr.astype(np.int64), axis=1)
                       & 0xFF).astype(np.uint8)
        elif comp in (2, 3, 4):
            from .ccittcodec import CcittError, decode_g3, decode_g4
            if depth != 1:
                raise TiffError("CCITT on non-bilevel samples")
            try:
                if comp == 4:
                    bits = decode_g4(strip, w, nrows)
                elif comp == 2:
                    # modified Huffman: 1D rows, each byte-aligned,
                    # no EOLs (§ Compression=2)
                    bits = decode_g3(strip, w, nrows, k=0,
                                     byte_align=True)
                else:
                    t4 = one(_T_T4OPTS, 0)
                    bits = decode_g3(strip, w, nrows,
                                     k=4 if t4 & 1 else 0,
                                     end_of_line=True,
                                     byte_align=bool(t4 & 4))
            except CcittError as exc:
                raise TiffError(f"bad CCITT strip: {exc}") from exc
            # CCITT 1 = black; photometric 0 (the fax norm) = min is
            # white, so black renders 0
            arr = np.where(bits != 0, 0, 255).astype(np.uint8)
            if photo == 1:
                arr = 255 - arr
            out_rows.append(arr)
            y += nrows
            continue
        elif comp == 6:
            raise TiffError("old-style JPEG-in-TIFF unsupported")
        elif comp == 7:
            from .jpegcodec import JpegError
            from .registry import get_decoder
            jt = tags.get(_T_JPEGTABLES)
            blob = strip
            if jt:
                tbl = bytes(jt)
                if tbl[:2] == b"\xff\xd8" and tbl[-2:] == b"\xff\xd9" \
                        and blob[:2] == b"\xff\xd8":
                    blob = tbl[:-2] + blob[2:]
            try:
                arr = get_decoder("JPEG")(blob)
            except JpegError as exc:
                raise TiffError(f"bad JPEG strip: {exc}") from exc
            if (arr.ndim == 2) != (spp == 1):
                raise TiffError("JPEG strip component mismatch")
            # validate against the IFD-claimed geometry: y advances by
            # IFD rows, so a lying strip must raise, not silently
            # return a wrong-sized raster (review finding)
            if arr.shape[1] != w or arr.shape[0] < nrows:
                raise TiffError("JPEG strip dimensions mismatch")
            arr = arr[:nrows]
        else:
            raise TiffError(f"compression {comp} unsupported")
        if depth == 1:
            arr = np.where(arr != 0,
                           0 if photo == 0 else 255,
                           255 if photo == 0 else 0).astype(np.uint8)
        elif photo == 0:
            arr = (255 - arr).astype(np.uint8)
        out_rows.append(arr)
        y += nrows
    if y < h:
        raise TiffError("strips cover fewer rows than ImageLength")
    img = np.concatenate(out_rows, axis=0)[:h]
    return img if spp == 3 else img.reshape(h, w)


def _raster(raw: bytes, nrows: int, w: int, spp: int,
            depth: int) -> np.ndarray:
    if depth == 1:
        rb = (w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(raw[:rb * nrows], np.uint8).reshape(nrows, rb),
            axis=1)[:, :w]
        return bits
    a = np.frombuffer(raw[:w * spp * nrows], np.uint8)
    if spp == 3:
        return a.reshape(nrows, w, 3)
    return a.reshape(nrows, w)


# ------------------------------------------------------------- encoder

def _page_parts(img: np.ndarray, compression: str,
                rows_per_strip: int | None, bilevel: bool):
    """One page's (IFD entries, strips) — shared by the single- and
    multi-page writers."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (h, w) or (h, w, 3)")
    rgb = img.ndim == 3
    if rgb and (img.shape[2] != 3 or bilevel):
        raise ValueError("RGB must be (h, w, 3) and 8-bit")
    if compression in ("g3", "g4") and not bilevel:
        raise ValueError("CCITT compressions require bilevel=True")
    if compression == "jpeg" and bilevel:
        raise ValueError("jpeg compression is 8-bit only")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if rows_per_strip is None:
        rows_per_strip = h if compression in ("g3", "g4", "jpeg") \
            else max(1, min(h, 8192 // max(1, w // 64)))

    strips: list[bytes] = []
    photo = 2 if rgb else 1
    if bilevel:
        bits = (img < 128).astype(np.uint8)  # 1 = black
        photo = 0                            # min-is-white, fax norm
    for y0 in range(0, h, rows_per_strip):
        y1 = min(y0 + rows_per_strip, h)
        if compression == "g4":
            from .ccittcodec import encode_g4
            strips.append(encode_g4(bits[y0:y1]))
        elif compression == "g3":
            from .ccittcodec import encode_g3
            strips.append(encode_g3(bits[y0:y1], k=0,
                                    end_of_line=True))
        elif compression == "jpeg":
            from .jpegcodec import encode_baseline
            strips.append(encode_baseline(img[y0:y1]))
        else:
            if bilevel:
                raw = np.packbits(bits[y0:y1], axis=1).tobytes()
            else:
                raw = np.ascontiguousarray(img[y0:y1]).tobytes()
            if compression == "none":
                strips.append(raw)
            elif compression == "packbits":
                strips.append(packbits_encode(raw))
            elif compression == "lzw":
                strips.append(lzw_encode(raw))
            elif compression == "lzw_predictor":
                if bilevel:
                    raise ValueError("predictor needs 8-bit samples")
                block = img[y0:y1].astype(np.int16)
                diff = np.empty_like(block)
                diff[:, 0] = block[:, 0]
                diff[:, 1:] = block[:, 1:] - block[:, :-1]
                strips.append(lzw_encode(
                    (diff & 0xFF).astype(np.uint8).tobytes()))
            else:
                raise ValueError(f"unknown compression {compression}")

    comp_id = {"none": 1, "packbits": 32773, "lzw": 5,
               "lzw_predictor": 5, "g3": 3, "g4": 4, "jpeg": 7}[
        compression]
    spp = 3 if rgb else 1
    bps = [1] if bilevel else [8] * spp

    entries = []                             # (tag, type, count, values)

    def ent(tag, typ, vals):
        entries.append((tag, typ, vals))

    ent(_T_WIDTH, 4, [w])
    ent(_T_HEIGHT, 4, [h])
    ent(_T_BPS, 3, bps)
    ent(_T_COMP, 3, [comp_id])
    ent(_T_PHOTO, 3, [photo])
    ent(_T_SPP, 3, [spp])
    ent(_T_ROWS, 4, [rows_per_strip])
    ent(_T_STRIP_CNT, 4, [len(s) for s in strips])
    ent(_T_STRIP_OFF, 4, [0] * len(strips))  # patched below
    if compression == "lzw_predictor":
        ent(_T_PREDICTOR, 3, [2])
    if compression == "g3":
        ent(_T_T4OPTS, 4, [0])
    entries.sort()

    return entries, strips


def _val_bytes(typ, vals):
    fmt = {3: "H", 4: "I"}[typ]
    return b"".join(struct.pack("<" + fmt, v) for v in vals)


def _block_len(entries, strips) -> int:
    """Byte length of one [IFD][out-of-line values][strips] block."""
    tail = 0
    for _tag, typ, vals in entries:
        b = _val_bytes(typ, vals)
        if len(b) > 4:
            tail += len(b)
    return (2 + 12 * len(entries) + 4) + tail \
        + sum(len(s) for s in strips)


def _emit_ifd_block(entries, strips, base: int,
                    next_ifd: int) -> bytes:
    """One page block at absolute offset ``base``: IFD (next-IFD
    pointer = ``next_ifd``), out-of-line tag values, strip data —
    every offset absolute, so blocks chain into multi-page files."""
    ifd_size = 2 + 12 * len(entries) + 4
    tail_base = base + ifd_size
    # first pass measures the out-of-line tail so strip offsets are
    # known before the IFD is emitted
    tail_len = 0
    for _tag, typ, vals in entries:
        b = _val_bytes(typ, vals)
        if len(b) > 4:
            tail_len += len(b)
    data_off = tail_base + tail_len
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    out = bytearray()
    out += struct.pack("<H", len(entries))
    tail = bytearray()
    voff = tail_base
    for tag, typ, vals in entries:
        if tag == _T_STRIP_OFF:
            vals = strip_offs
        b = _val_bytes(typ, vals)
        out += struct.pack("<HHI", tag, typ, len(vals))
        if len(b) <= 4:
            out += b + b"\x00" * (4 - len(b))
        else:
            out += struct.pack("<I", voff)
            tail += b
            voff += len(b)
    out += struct.pack("<I", next_ifd)
    out += tail
    for s in strips:
        out += s
    return bytes(out)


def encode_tiff(img: np.ndarray, compression: str = "none",
                rows_per_strip: int | None = None,
                bilevel: bool = False) -> bytes:
    """uint8 (h, w) gray / (h, w, 3) RGB -> classic little-endian TIFF.
    ``compression``: none | packbits | lzw | lzw_predictor | g4 | g3 |
    jpeg.  ``bilevel=True`` thresholds gray at 128 and writes a 1-bit
    fax-style page (required for g3/g4).  Lossless for every scheme
    except jpeg (which uses the baseline encoder's default quality)."""
    entries, strips = _page_parts(img, compression, rows_per_strip,
                                  bilevel)
    return (b"II*\x00" + struct.pack("<I", 8)
            + _emit_ifd_block(entries, strips, 8, 0))


def encode_tiff_multi(imgs, compression: str = "none",
                      rows_per_strip: int | None = None,
                      bilevel: bool = False) -> bytes:
    """Multi-page TIFF (next-IFD chain — the multi-page book-scan
    layout): one IFD block per image, each pointing at the next.
    ``compression``/``bilevel`` may be single values or per-page
    lists.  Pages decode back with ``decode_tiff(data, page=k)`` /
    ``tiff_page_count``."""
    imgs = list(imgs)
    if not imgs:
        raise ValueError("no pages")
    n = len(imgs)

    def per_page(v, name):
        if isinstance(v, (list, tuple)):
            if len(v) != n:
                raise ValueError(f"{name} list length != page count")
            return list(v)
        return [v] * n

    comps = per_page(compression, "compression")
    bils = per_page(bilevel, "bilevel")
    parts = [_page_parts(im, c, rows_per_strip, b)
             for im, c, b in zip(imgs, comps, bils)]
    bases = []
    pos = 8
    for entries, strips in parts:
        bases.append(pos)
        pos += _block_len(entries, strips)
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    for k, (entries, strips) in enumerate(parts):
        nxt = bases[k + 1] if k + 1 < n else 0
        out += _emit_ifd_block(entries, strips, bases[k], nxt)
    return bytes(out)

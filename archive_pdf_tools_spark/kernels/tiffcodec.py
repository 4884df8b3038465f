"""From-scratch TIFF reader/writer (TIFF 6.0, classic strip layout).

Archival imagestacks are literally ``*_tif.zip`` — the reference's
imagestack scan (``recode.py:595-597``) and its inverse tool
(``bin/pdf-to-imagestack:19-72``) hand every page file to PIL, which
reads/writes exactly these TIFFs (bilevel G4 fax pages, gray/RGB
scans).  This module re-derives that ingest capability on the
engine's own codecs: the CCITT tags decode through
``kernels/ccittcodec`` (the same T.4/T.6 machinery the PDF scan
uses), new-style JPEG (tag 7) through ``kernels/jpegcodec``, and the
byte-oriented TIFF schemes (LZW with horizontal predictor,
PackBits, and Deflate via the stdlib zlib — codes 8 and 32946) are
implemented here — all algorithmic structure from the public
TIFF 6.0 specification, no tables transcribed.

Scope (raised as ``TiffError``, honestly): classic AND BigTIFF
(version 43, 8-byte offsets — the >4 GB book-scan shape), next-IFD
multi-page chains, strip- AND tile-organized data (§15), chunky and
planar (PlanarConfiguration=2, byte-scheme RGB strips) sample
layouts, 1-bit bilevel, 8-bit gray/RGB and 16-bit scan-master
samples (reduced to the high byte, the PNG codec's convention; the
predictor differences at native width first), and old-style
JPEG (compression 6) in its common JPEGInterchangeFormat shape;
fax/JPEG planes, planar tiles and per-strip old-style JPEG
(JPEGProc tables) raise.  The LZW
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
_T_TILE_OFF, _T_TILE_CNT = 324, 325
_T_JPEG_IF, _T_JPEG_IF_LEN = 513, 514       # old-style JPEG pointer
_T_JPEGTABLES = 347

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8,
              16: 8, 17: 8, 18: 8}           # BigTIFF LONG8/SLONG8/IFD8


def _header(data: bytes):
    """TIFF header -> (lt, big, first-IFD offset).  Classic (version
    42, 4-byte offsets) and BigTIFF (version 43, 8-byte offsets — the
    >4 GB book-scan layout)."""
    if len(data) < 8:
        raise TiffError("truncated TIFF header")
    if data[:1] == b"I" and data[1:2] == b"I":
        lt = "<"
    elif data[:2] == b"MM":
        lt = ">"
    else:
        raise TiffError("not a TIFF (II*/MM* magic)")
    ver = struct.unpack(lt + "H", data[2:4])[0]
    if ver == 42:
        return lt, False, struct.unpack(lt + "I", data[4:8])[0]
    if ver == 43:
        if len(data) < 16:
            raise TiffError("truncated BigTIFF header")
        bytesize, zero = struct.unpack(lt + "HH", data[4:8])
        if bytesize != 8 or zero != 0:
            raise TiffError("bad BigTIFF header constants")
        return lt, True, struct.unpack(lt + "Q", data[8:16])[0]
    raise TiffError("not a TIFF (II*/MM* magic)")


def _ifd_geometry(big: bool):
    """(count size, entry size, pointer size, inline value capacity)."""
    return (8, 20, 8, 8) if big else (2, 12, 4, 4)


def _ifd_count(data: bytes, lt: str, big: bool, off: int) -> int:
    cs = 8 if big else 2
    if off + cs > len(data):
        raise TiffError("IFD offset out of range")
    return struct.unpack(lt + ("Q" if big else "H"),
                         data[off:off + cs])[0]


def _read_ifd(data: bytes, page: int = 0):
    """IFD ``page`` (next-IFD chain walk) -> (byte order, {tag:
    [values]})."""
    lt, big, off = _header(data)
    cs, es, ps, cap = _ifd_geometry(big)
    pfmt = "Q" if big else "I"
    for _ in range(page):
        cnt0 = _ifd_count(data, lt, big, off)
        nxt = off + cs + es * cnt0
        if nxt + ps > len(data):
            raise TiffError("truncated IFD chain")
        off = struct.unpack(lt + pfmt, data[nxt:nxt + ps])[0]
        if off == 0:
            raise TiffError("page beyond IFD chain")
    n = _ifd_count(data, lt, big, off)
    if n == 0 or n > 512:
        raise TiffError("implausible IFD entry count")
    if off + cs + es * n > len(data):
        raise TiffError("truncated IFD")
    tags = {}
    for k in range(n):
        e = off + cs + es * k
        tag, typ = struct.unpack(lt + "HH", data[e:e + 4])
        cnt = struct.unpack(lt + ("Q" if big else "I"),
                            data[e + 4:e + 4 + (8 if big else 4)])[0]
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue                         # unknown type: skip tag
        vbase = e + 4 + (8 if big else 4)
        total = size * cnt
        if total > 1 << 31:
            raise TiffError("implausible tag value size")
        if total <= cap:
            raw = data[vbase:vbase + total]
        else:
            voff = struct.unpack(lt + pfmt, data[vbase:vbase + ps])[0]
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
        elif typ in (16, 17, 18):
            fmt = "q" if typ == 17 else "Q"
            vals = list(struct.unpack(lt + "%d%s" % (cnt, fmt), raw))
        else:
            vals = [raw]                     # rationals etc: opaque
        tags[tag] = vals
    return lt, tags


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
    from . import native as _ckern

    res = _ckern.lzw_decode_native(bytes(data), expected)
    if res is not None:                      # byte-identical C walk
        return res
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
            # keep only the unconsumed low bits: an unmasked
            # accumulator grows into an O(stream)-digit bignum and
            # every shift turns quadratic (measured 0.04 -> ~4 Mpx/s
            # on a 3.7 Mpx page, BENCH/codec_swap_r8.md)
            acc &= (1 << nbits) - 1
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
    from . import native as _ckern

    res = _ckern.lzw_encode_native(bytes(data))
    if res is not None:                      # byte-identical C walk
        return res
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1          # same bignum guard as decode

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
    lt, big, off = _header(data)
    cs, es, ps, _cap = _ifd_geometry(big)
    pfmt = "Q" if big else "I"
    n = 0
    while off and n < 65536:
        cnt = _ifd_count(data, lt, big, off)
        nxt = off + cs + es * cnt
        if nxt + ps > len(data):
            raise TiffError("truncated IFD chain")
        off = struct.unpack(lt + pfmt, data[nxt:nxt + ps])[0]
        n += 1
    return n


def _decode_tiff(data: bytes, max_pixels: int,
                 page: int = 0) -> np.ndarray:
    lt, tags = _read_ifd(data, page)

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
    planar = one(_T_PLANAR, 1)
    tiled = _T_TILE_W in tags or _T_TILE_H in tags
    if planar not in (1, 2):
        raise TiffError("bad planar configuration")
    if planar == 2 and (spp == 1 or tiled or comp in (2, 3, 4, 6, 7)):
        # planar is only meaningful for multi-sample byte schemes;
        # fax/JPEG planes and planar tiles are out of scope (honest)
        raise TiffError("unsupported planar layout")
    if spp == 1 and all(int(b) == 1 for b in bps):
        depth = 1
    elif spp in (1, 3) and all(int(b) == 8 for b in bps):
        depth = 8
    elif spp in (1, 3) and all(int(b) == 16 for b in bps):
        # 16-bit scan masters: reduced to the high byte (the same
        # convention as the PNG codec — the engine raster is uint8)
        depth = 16
        if comp in (2, 3, 4, 6, 7):
            raise TiffError("16-bit samples with fax/JPEG "
                            "compression unsupported")
    else:
        raise TiffError("unsupported sample layout")
    if photo not in (0, 1) and not (photo == 2 and spp == 3) \
            and not (photo == 6 and spp == 3 and comp in (6, 7)):
        # YCbCr is only in scope where JPEG converts it internally —
        # raw YCbCr samples must not masquerade as RGB
        raise TiffError("unsupported photometric interpretation")
    if comp in (6, 7) and photo == 6:
        photo = 1                            # JPEG handles YCbCr itself
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        # an unknown predictor would return still-differenced garbage
        # (review finding) — the module contract is typed errors only
        raise TiffError(f"predictor {predictor} unsupported")
    jpegtables = tags.get(_T_JPEGTABLES)

    if comp == 6:
        # old-style JPEG (TIFF 6.0 §22, deprecated): only the common
        # JPEGInterchangeFormat shape — tags 513/514 point at ONE
        # whole JFIF stream — is in scope; the per-strip
        # JPEGProc/QTables machinery stays gated (no conformant
        # writer survives that emits it)
        if _T_JPEG_IF not in tags:
            raise TiffError("old-style JPEG without "
                            "JPEGInterchangeFormat unsupported")
        from .jpegcodec import JpegError
        from .registry import get_decoder
        joff = one(_T_JPEG_IF)
        jlen = one(_T_JPEG_IF_LEN, len(data) - joff)
        if joff < 0 or jlen <= 0 or joff + jlen > len(data):
            raise TiffError("JPEGInterchangeFormat out of range")
        try:
            arr = get_decoder("JPEG")(data[joff:joff + jlen])
        except JpegError as exc:
            raise TiffError(f"bad old-style JPEG: {exc}") from exc
        if (arr.ndim == 2) != (spp == 1) or arr.shape[0] < h \
                or arr.shape[1] != w:
            raise TiffError("old-style JPEG dimensions mismatch")
        img = arr[:h]
        if photo == 0:
            img = (255 - img).astype(np.uint8)
        return img if spp == 3 else img.reshape(h, w)

    def segment(blob: bytes, nrows: int, width: int,
                seg_spp: int) -> np.ndarray:
        """Decode ONE strip or tile to its uint8 sample array:
        depth-1 -> 0/1 bits, depth-8 -> raw bytes, depth-16 -> high
        byte (after any predictor, which works at native width);
        photometric applied by the caller on the assembled image."""
        if depth == 1:
            row_bytes = (width + 7) // 8
        else:
            row_bytes = width * seg_spp * (depth // 8)
        expected = row_bytes * nrows

        def finish(arr):
            if predictor == 2 and comp in (5, 8, 32946):
                # horizontal differencing, per SAMPLE CHANNEL against
                # the previous pixel (§14) — prefix sum at the NATIVE
                # sample width; rows reset, so segment-local
                if depth == 8:
                    arr = (np.cumsum(arr.astype(np.int64), axis=1)
                           & 0xFF).astype(np.uint8)
                elif depth == 16:
                    arr = (np.cumsum(arr.astype(np.int64), axis=1)
                           & 0xFFFF).astype(np.uint16)
                else:
                    raise TiffError("predictor on bilevel samples")
            if depth == 16:
                arr = (arr >> 8).astype(np.uint8)
            return arr

        if comp == 1:
            raw = blob[:expected]
            if len(raw) < expected:
                raise TiffError("uncompressed segment underrun")
            return finish(_raster(raw, nrows, width, seg_spp, depth,
                                  lt))
        if comp == 32773:
            return finish(_raster(packbits_decode(blob, expected),
                                  nrows, width, seg_spp, depth, lt))
        if comp == 5:
            return finish(_raster(lzw_decode(blob, expected),
                                  nrows, width, seg_spp, depth, lt))
        if comp in (8, 32946):
            # Deflate (8 = the TIFF-F/Adobe code, 32946 = the
            # original assignment) — stdlib zlib with an exact bound
            import zlib
            try:
                dec = zlib.decompressobj()
                raw = dec.decompress(blob, expected)
            except zlib.error as exc:
                raise TiffError(f"bad deflate segment: {exc}") from exc
            if len(raw) < expected:
                raise TiffError("deflate segment underrun")
            return finish(_raster(raw, nrows, width, seg_spp, depth,
                                  lt))
        if comp in (2, 3, 4):
            from .ccittcodec import CcittError, decode_g3, decode_g4
            if depth != 1:
                raise TiffError("CCITT on non-bilevel samples")
            try:
                if comp == 4:
                    return decode_g4(blob, width, nrows)
                if comp == 2:
                    # modified Huffman: 1D rows, each byte-aligned,
                    # no EOLs (§ Compression=2)
                    return decode_g3(blob, width, nrows, k=0,
                                     byte_align=True)
                t4 = one(_T_T4OPTS, 0)
                return decode_g3(blob, width, nrows,
                                 k=4 if t4 & 1 else 0,
                                 end_of_line=True,
                                 byte_align=bool(t4 & 4))
            except CcittError as exc:
                raise TiffError(f"bad CCITT segment: {exc}") from exc
        if comp == 6:
            raise TiffError("old-style JPEG-in-TIFF unsupported")
        if comp == 7:
            from .jpegcodec import JpegError
            from .registry import get_decoder
            if jpegtables:
                tbl = bytes(jpegtables)
                if tbl[:2] == b"\xff\xd8" and tbl[-2:] == b"\xff\xd9" \
                        and blob[:2] == b"\xff\xd8":
                    blob = tbl[:-2] + blob[2:]
            try:
                arr = get_decoder("JPEG")(blob)
            except JpegError as exc:
                raise TiffError(f"bad JPEG segment: {exc}") from exc
            if (arr.ndim == 2) != (seg_spp == 1):
                raise TiffError("JPEG segment component mismatch")
            # validate against the IFD-claimed geometry: a lying
            # segment must raise, not silently return a wrong-sized
            # raster (review finding)
            if arr.shape[1] != width or arr.shape[0] < nrows:
                raise TiffError("JPEG segment dimensions mismatch")
            return arr[:nrows]
        raise TiffError(f"compression {comp} unsupported")

    def read_seg(off, cnt) -> bytes:
        off, cnt = int(off), int(cnt)
        if off < 0 or cnt < 0 or off + cnt > len(data):
            raise TiffError("segment out of range")
        return data[off:off + cnt]

    if tiled:
        # tile-organized data (§15): a grid of fixed-size tiles, each
        # compressed independently; edge tiles are full-size with
        # padding the decoder crops
        tw, th = one(_T_TILE_W), one(_T_TILE_H)
        if tw <= 0 or th <= 0 or tw * th > max_pixels:
            raise TiffError("bad tile dimensions")
        offs = tags.get(_T_TILE_OFF)
        cnts = tags.get(_T_TILE_CNT)
        across = -(-w // tw)
        down = -(-h // th)
        # bound the AGGREGATE decode work, not just one tile: the
        # padded grid of a legitimate file is < 4x the image area, so
        # a grid whose total pixel work exceeds that is a
        # decompression-amplification shape (e.g. w=1 with tw=4000),
        # not a real layout (review finding)
        if across * tw * down * th > 4 * max_pixels:
            raise TiffError("tile grid exceeds max_pixels")
        if not offs or not cnts or len(offs) != len(cnts) \
                or len(offs) < across * down:
            raise TiffError("missing tile layout")
        shape = (h, w, spp) if spp == 3 else (h, w)
        img = np.zeros(shape, np.uint8)
        for ty in range(down):
            for tx in range(across):
                blob = read_seg(*[
                    v[ty * across + tx] for v in (offs, cnts)])
                arr = segment(blob, th, tw, spp)
                y0, x0 = ty * th, tx * tw
                img[y0:y0 + th, x0:x0 + tw] = \
                    arr[:h - y0, :w - x0]
    else:
        offs = tags.get(_T_STRIP_OFF)
        cnts = tags.get(_T_STRIP_CNT)
        if not offs or not cnts or len(offs) != len(cnts):
            raise TiffError("missing strip layout")
        rows_per = one(_T_ROWS, h)
        if rows_per <= 0:
            raise TiffError("bad RowsPerStrip")
        strips_per_plane = -(-h // rows_per)
        planes = spp if planar == 2 else 1

        def plane_rows(p: int, seg_spp: int):
            out_rows, y = [], 0
            for k in range(strips_per_plane):
                idx = p * strips_per_plane + k
                if idx >= len(offs):
                    raise TiffError("strip index out of range")
                nrows = min(rows_per, h - y)
                if nrows <= 0:
                    break
                out_rows.append(segment(read_seg(offs[idx], cnts[idx]),
                                        nrows, w, seg_spp))
                y += nrows
            if y < h:
                raise TiffError("strips cover fewer rows than "
                                "ImageLength")
            return np.concatenate(out_rows, axis=0)[:h]

        if planar == 2:
            if len(offs) < planes * strips_per_plane:
                raise TiffError("missing strip layout")
            img = np.stack([plane_rows(p, 1) for p in range(planes)],
                           axis=-1)
        else:
            img = plane_rows(0, spp)

    # photometric rendering, applied once on the assembled samples:
    # depth 1 -> sample 1 is black under min-is-white (photo 0, the
    # fax norm; T.4's black bit has the same sample-1 identity),
    # white under min-is-black; depth 8 photo 0 inverts
    if depth == 1:
        img = np.where(img != 0,
                       0 if photo == 0 else 255,
                       255 if photo == 0 else 0).astype(np.uint8)
    elif photo == 0:
        img = (255 - img).astype(np.uint8)
    return img if spp == 3 else img.reshape(h, w)


def _raster(raw: bytes, nrows: int, w: int, spp: int,
            depth: int, lt: str = "<") -> np.ndarray:
    if depth == 1:
        rb = (w + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(raw[:rb * nrows], np.uint8).reshape(nrows, rb),
            axis=1)[:, :w]
        return bits
    if depth == 16:
        a = np.frombuffer(raw[:w * spp * nrows * 2], lt + "u2")
    else:
        a = np.frombuffer(raw[:w * spp * nrows], np.uint8)
    if spp == 3:
        return a.reshape(nrows, w, 3)
    return a.reshape(nrows, w)


# ------------------------------------------------------------- encoder

def _encode_block(block: np.ndarray, compression: str,
                  bilevel: bool) -> bytes:
    """Compress one strip/tile worth of samples."""
    if compression == "g4":
        from .ccittcodec import encode_g4
        return encode_g4(block)
    if compression == "g3":
        from .ccittcodec import encode_g3
        return encode_g3(block, k=0, end_of_line=True)
    if compression == "jpeg":
        from .jpegcodec import encode_baseline
        return encode_baseline(block)
    wide = block.dtype == np.uint16
    if bilevel:
        raw = np.packbits(block, axis=1).tobytes()
    elif compression in ("lzw_predictor", "deflate_predictor"):
        bi = block.astype(np.int64)
        diff = np.empty_like(bi)
        diff[:, 0] = bi[:, 0]
        diff[:, 1:] = bi[:, 1:] - bi[:, :-1]
        if wide:
            raw = (diff & 0xFFFF).astype("<u2").tobytes()
        else:
            raw = (diff & 0xFF).astype(np.uint8).tobytes()
    elif wide:
        raw = np.ascontiguousarray(block.astype("<u2")).tobytes()
    else:
        raw = np.ascontiguousarray(block).tobytes()
    if compression == "none":
        return raw
    if compression == "packbits":
        return packbits_encode(raw)
    if compression in ("lzw", "lzw_predictor"):
        return lzw_encode(raw)
    if compression in ("deflate", "deflate_predictor"):
        import zlib
        return zlib.compress(raw, 6)
    raise ValueError(f"unknown compression {compression}")


def _page_parts(img: np.ndarray, compression: str,
                rows_per_strip: int | None, bilevel: bool,
                tile: tuple | None = None, planar: bool = False):
    """One page's (IFD entries, segments) — shared by the single- and
    multi-page writers.  ``tile=(tw, th)`` writes tile organization
    (each dimension a multiple of 16, §15); ``planar=True`` writes
    RGB as three separate sample planes (PlanarConfiguration=2)."""
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16) or \
            img.ndim not in (2, 3):
        raise ValueError("expected uint8/uint16 (h, w) or (h, w, 3)")
    wide = img.dtype == np.uint16
    rgb = img.ndim == 3
    if rgb and (img.shape[2] != 3 or bilevel):
        raise ValueError("RGB must be (h, w, 3)")
    if compression in ("g3", "g4") and not bilevel:
        raise ValueError("CCITT compressions require bilevel=True")
    if compression == "jpeg" and (bilevel or wide):
        raise ValueError("jpeg compression is 8-bit only")
    if wide and bilevel:
        raise ValueError("bilevel thresholding expects uint8")
    if planar and (not rgb or tile is not None
                   or compression in ("g3", "g4", "jpeg")):
        raise ValueError("planar requires RGB strips with a "
                         "byte-oriented compression")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    src = img
    if bilevel:
        src = (img < 128).astype(np.uint8)   # 1 = black

    comp_id = {"none": 1, "packbits": 32773, "lzw": 5,
               "lzw_predictor": 5, "deflate": 8,
               "deflate_predictor": 8, "g3": 3, "g4": 4, "jpeg": 7}[
        compression]
    spp = 3 if rgb else 1
    bps = [1] if bilevel else [16 if wide else 8] * spp
    photo = 0 if bilevel else (2 if rgb else 1)

    entries = []                             # (tag, type, values)

    def ent(tag, typ, vals):
        entries.append((tag, typ, vals))

    segs: list[bytes] = []
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16 or tw <= 0 or th <= 0:
            raise ValueError("tile dims must be positive multiples "
                             "of 16")
        if compression == "g3":
            raise ValueError("G3 tiles unsupported (EOL framing is "
                             "strip-shaped)")
        # pad to full tiles (decoder crops); edge padding = 0
        ph, pw = -(-h // th) * th, -(-w // tw) * tw
        pad = [(0, ph - h), (0, pw - w)] + \
            ([(0, 0)] if rgb else [])
        padded = np.pad(src, pad)
        for y0 in range(0, ph, th):
            for x0 in range(0, pw, tw):
                segs.append(_encode_block(
                    padded[y0:y0 + th, x0:x0 + tw], compression,
                    bilevel))
        ent(_T_TILE_W, 4, [tw])
        ent(_T_TILE_H, 4, [th])
        ent(_T_TILE_CNT, 4, [len(s) for s in segs])
        ent(_T_TILE_OFF, 4, [0] * len(segs))   # patched below
    else:
        if rows_per_strip is None:
            rows_per_strip = h if compression in ("g3", "g4", "jpeg") \
                else max(1, min(h, 8192 // max(1, w // 64)))
        planes = ([src[:, :, c] for c in range(3)] if planar
                  else [src])
        for plane in planes:
            for y0 in range(0, h, rows_per_strip):
                segs.append(_encode_block(
                    plane[y0:y0 + rows_per_strip], compression,
                    bilevel))
        ent(_T_ROWS, 4, [rows_per_strip])
        ent(_T_STRIP_CNT, 4, [len(s) for s in segs])
        ent(_T_STRIP_OFF, 4, [0] * len(segs))  # patched below

    ent(_T_WIDTH, 4, [w])
    ent(_T_HEIGHT, 4, [h])
    ent(_T_BPS, 3, bps)
    ent(_T_COMP, 3, [comp_id])
    ent(_T_PHOTO, 3, [photo])
    ent(_T_SPP, 3, [spp])
    if planar:
        ent(_T_PLANAR, 3, [2])
    if compression in ("lzw_predictor", "deflate_predictor"):
        ent(_T_PREDICTOR, 3, [2])
    if compression == "g3":
        ent(_T_T4OPTS, 4, [0])
    entries.sort()

    return entries, segs


def _val_bytes(typ, vals):
    fmt = {3: "H", 4: "I", 16: "Q"}[typ]
    return b"".join(struct.pack("<" + fmt, v) for v in vals)


def _wire_entries(entries, n_segs: int, big: bool):
    """Entries as they go on the wire: segment offsets get a
    placeholder list of the right width (LONG8 under BigTIFF, so
    >4 GB files stay addressable)."""
    out = []
    for tag, typ, vals in entries:
        if tag in (_T_STRIP_OFF, _T_TILE_OFF):
            typ = 16 if big else 4
            vals = [0] * n_segs
        elif big and tag in (_T_STRIP_CNT, _T_TILE_CNT):
            typ = 16
        out.append((tag, typ, vals))
    return out


def _block_len(entries, segs, big: bool = False) -> int:
    """Byte length of one [IFD][out-of-line values][segments] block."""
    cs, es, ps, cap = _ifd_geometry(big)
    tail = 0
    for _tag, typ, vals in _wire_entries(entries, len(segs), big):
        b = _val_bytes(typ, vals)
        if len(b) > cap:
            tail += len(b)
    return (cs + es * len(entries) + ps) + tail \
        + sum(len(s) for s in segs)


def _emit_ifd_block(entries, segs, base: int, next_ifd: int,
                    big: bool = False) -> bytes:
    """One page block at absolute offset ``base``: IFD (next-IFD
    pointer = ``next_ifd``), out-of-line tag values, segment data —
    every offset absolute, so blocks chain into multi-page files."""
    cs, es, ps, cap = _ifd_geometry(big)
    cfmt = "Q" if big else "H"
    pfmt = "Q" if big else "I"
    wire = _wire_entries(entries, len(segs), big)
    ifd_size = cs + es * len(wire) + ps
    tail_base = base + ifd_size
    # first pass measures the out-of-line tail so segment offsets are
    # known before the IFD is emitted
    tail_len = 0
    for _tag, typ, vals in wire:
        b = _val_bytes(typ, vals)
        if len(b) > cap:
            tail_len += len(b)
    data_off = tail_base + tail_len
    seg_offs = []
    pos = data_off
    for s in segs:
        seg_offs.append(pos)
        pos += len(s)
    out = bytearray()
    out += struct.pack("<" + cfmt, len(wire))
    tail = bytearray()
    voff = tail_base
    for tag, typ, vals in wire:
        if tag in (_T_STRIP_OFF, _T_TILE_OFF):
            vals = seg_offs
        b = _val_bytes(typ, vals)
        out += struct.pack("<HH" + pfmt, tag, typ, len(vals))
        if len(b) <= cap:
            out += b + b"\x00" * (cap - len(b))
        else:
            out += struct.pack("<" + pfmt, voff)
            tail += b
            voff += len(b)
    out += struct.pack("<" + pfmt, next_ifd)
    out += tail
    for s in segs:
        out += s
    return bytes(out)


def encode_tiff(img: np.ndarray, compression: str = "none",
                rows_per_strip: int | None = None,
                bilevel: bool = False, tile: tuple | None = None,
                bigtiff: bool = False) -> bytes:
    """uint8 or uint16 (h, w) gray / (h, w, 3) RGB -> little-endian
    TIFF (16-bit input writes BitsPerSample=16; our decoder reduces
    it to the high byte).  ``compression``: none | packbits | lzw |
    lzw_predictor | deflate | deflate_predictor | g4 | g3 | jpeg.
    ``bilevel=True`` thresholds uint8 gray at 128 and writes a 1-bit
    fax-style page (required for g3/g4).  ``tile=(tw, th)`` writes
    tile organization (multiples of 16, §15); ``bigtiff=True`` writes
    the version-43 layout (8-byte offsets — the >4 GB shape).
    Lossless for every scheme except jpeg (which uses the baseline
    encoder's default quality)."""
    entries, segs = _page_parts(img, compression, rows_per_strip,
                                bilevel, tile=tile)
    if bigtiff:
        hdr = b"II+\x00" + struct.pack("<HHQ", 8, 0, 16)
        return hdr + _emit_ifd_block(entries, segs, 16, 0, big=True)
    return (b"II*\x00" + struct.pack("<I", 8)
            + _emit_ifd_block(entries, segs, 8, 0))


def encode_tiff_planar(img: np.ndarray, compression: str = "lzw",
                       rows_per_strip: int | None = None) -> bytes:
    """(h, w, 3) RGB -> classic TIFF with PlanarConfiguration=2
    (three separate sample planes, each its own strip sequence)."""
    entries, segs = _page_parts(img, compression, rows_per_strip,
                                False, planar=True)
    return (b"II*\x00" + struct.pack("<I", 8)
            + _emit_ifd_block(entries, segs, 8, 0))


def encode_tiff_multi(imgs, compression: str = "none",
                      rows_per_strip: int | None = None,
                      bilevel: bool = False,
                      bigtiff: bool = False) -> bytes:
    """Multi-page TIFF (next-IFD chain — the multi-page book-scan
    layout): one IFD block per image, each pointing at the next.
    ``compression``/``bilevel`` may be single values or per-page
    lists; ``bigtiff=True`` writes version 43 (8-byte offsets — the
    shape a >4 GB multi-page master actually needs).  Pages decode
    back with ``decode_tiff(data, page=k)`` / ``tiff_page_count``."""
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
    hdr_len = 16 if bigtiff else 8
    bases = []
    pos = hdr_len
    for entries, strips in parts:
        bases.append(pos)
        pos += _block_len(entries, strips, big=bigtiff)
    if bigtiff:
        out = bytearray(b"II+\x00" + struct.pack("<HHQ", 8, 0,
                                                 hdr_len))
    else:
        out = bytearray(b"II*\x00" + struct.pack("<I", hdr_len))
    for k, (entries, strips) in enumerate(parts):
        nxt = bases[k + 1] if k + 1 < n else 0
        out += _emit_ifd_block(entries, strips, bases[k], nxt,
                               big=bigtiff)
    return bytes(out)

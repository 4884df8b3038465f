"""From-scratch CCITT Group 4 (ITU-T T.6, "MMR") bitonal codec.

Real archival PDFs older than the JBIG2 era overwhelmingly carry
their text masks as ``/CCITTFaxDecode`` images with ``/K < 0`` (pure
two-dimensional T.6 coding); the reference leaves that entire family
to PyMuPDF ("We can't do that for ccitt currently",
``internetarchivepdf/pdfhacks.py:124-126``).  This module implements
decode + encode natively:

* T.6 2D modes per coding line against the reference line — pass
  (``0001``), horizontal (``001`` + two T.4 run-length codes),
  vertical V(0)/VR(1-3)/VL(1-3) — over CHANGING-ELEMENT lists, so the
  cost per row is O(color changes), not O(pixels): long white margins
  are near-free, which is exactly the shape scanned pages have.
* The T.4 modified-Huffman run-length tables (terminating 0-63,
  make-up 64-1728 per color, shared extended make-ups 1792-2560),
  decoded through 13-bit prefix LUTs.
* EOFB tolerated at the end; ``EncodedByteAlign`` supported (row
  starts align to byte boundaries).

The same T.6 coding IS JBIG2's "MMR" path (T.88 §6.2.6 delegates
generic-region MMR to T.4/T.6), so ``kernels/jbig2codec.py`` routes
``MMR=1`` generic regions here instead of raising.

Everything derives from the published ITU-T T.4/T.6 spec tables and
the classic changing-element algorithm (also described in RFC 804 and
countless open implementations).  No third-party CCITT codec exists
in-container, so parity follows the repo's codec evidence model:
bit-exact decode(encode(x)) round-trips over fuzz corpora, plus
structural pins of the public tables (spot values like white-0 =
``00110101``, black-1 = ``010``, EOL = ``000000000001``; global
prefix-freeness per color class, which any transcription collision
breaks).  1=black in the returned bitmaps (the PDF ``BlackIs1``
byte-sample convention only affects the sample packing this module
never produces).
"""

from __future__ import annotations

import numpy as np


class CcittError(Exception):
    """Unsupported or malformed CCITT stream (documented codec gate)."""


# ----------------------------------------------------- T.4 code tables
# (run, code-length, code-value); terminating codes then make-ups.

_WHITE_CODES = (
    (0, 8, 0x35), (1, 6, 0x07), (2, 4, 0x07), (3, 4, 0x08),
    (4, 4, 0x0B), (5, 4, 0x0C), (6, 4, 0x0E), (7, 4, 0x0F),
    (8, 5, 0x13), (9, 5, 0x14), (10, 5, 0x07), (11, 5, 0x08),
    (12, 6, 0x08), (13, 6, 0x03), (14, 6, 0x34), (15, 6, 0x35),
    (16, 6, 0x2A), (17, 6, 0x2B), (18, 7, 0x27), (19, 7, 0x0C),
    (20, 7, 0x08), (21, 7, 0x17), (22, 7, 0x03), (23, 7, 0x04),
    (24, 7, 0x28), (25, 7, 0x2B), (26, 7, 0x13), (27, 7, 0x24),
    (28, 7, 0x18), (29, 8, 0x02), (30, 8, 0x03), (31, 8, 0x1A),
    (32, 8, 0x1B), (33, 8, 0x12), (34, 8, 0x13), (35, 8, 0x14),
    (36, 8, 0x15), (37, 8, 0x16), (38, 8, 0x17), (39, 8, 0x28),
    (40, 8, 0x29), (41, 8, 0x2A), (42, 8, 0x2B), (43, 8, 0x2C),
    (44, 8, 0x2D), (45, 8, 0x04), (46, 8, 0x05), (47, 8, 0x0A),
    (48, 8, 0x0B), (49, 8, 0x52), (50, 8, 0x53), (51, 8, 0x54),
    (52, 8, 0x55), (53, 8, 0x24), (54, 8, 0x25), (55, 8, 0x58),
    (56, 8, 0x59), (57, 8, 0x5A), (58, 8, 0x5B), (59, 8, 0x4A),
    (60, 8, 0x4B), (61, 8, 0x32), (62, 8, 0x33), (63, 8, 0x34),
    (64, 5, 0x1B), (128, 5, 0x12), (192, 6, 0x17), (256, 7, 0x37),
    (320, 8, 0x36), (384, 8, 0x37), (448, 8, 0x64), (512, 8, 0x65),
    (576, 8, 0x68), (640, 8, 0x67), (704, 9, 0xCC), (768, 9, 0xCD),
    (832, 9, 0xD2), (896, 9, 0xD3), (960, 9, 0xD4), (1024, 9, 0xD5),
    (1088, 9, 0xD6), (1152, 9, 0xD7), (1216, 9, 0xD8),
    (1280, 9, 0xD9), (1344, 9, 0xDA), (1408, 9, 0xDB),
    (1472, 9, 0x98), (1536, 9, 0x99), (1600, 9, 0x9A),
    (1664, 6, 0x18), (1728, 9, 0x9B),
)

_BLACK_CODES = (
    (0, 10, 0x37), (1, 3, 0x02), (2, 2, 0x03), (3, 2, 0x02),
    (4, 3, 0x03), (5, 4, 0x03), (6, 4, 0x02), (7, 5, 0x03),
    (8, 6, 0x05), (9, 6, 0x04), (10, 7, 0x04), (11, 7, 0x05),
    (12, 7, 0x07), (13, 8, 0x04), (14, 8, 0x07), (15, 9, 0x18),
    (16, 10, 0x17), (17, 10, 0x18), (18, 10, 0x08), (19, 11, 0x67),
    (20, 11, 0x68), (21, 11, 0x6C), (22, 11, 0x37), (23, 11, 0x28),
    (24, 11, 0x17), (25, 11, 0x18), (26, 12, 0xCA), (27, 12, 0xCB),
    (28, 12, 0xCC), (29, 12, 0xCD), (30, 12, 0x68), (31, 12, 0x69),
    (32, 12, 0x6A), (33, 12, 0x6B), (34, 12, 0xD2), (35, 12, 0xD3),
    (36, 12, 0xD4), (37, 12, 0xD5), (38, 12, 0xD6), (39, 12, 0xD7),
    (40, 12, 0x6C), (41, 12, 0x6D), (42, 12, 0xDA), (43, 12, 0xDB),
    (44, 12, 0x54), (45, 12, 0x55), (46, 12, 0x56), (47, 12, 0x57),
    (48, 12, 0x64), (49, 12, 0x65), (50, 12, 0x52), (51, 12, 0x53),
    (52, 12, 0x24), (53, 12, 0x37), (54, 12, 0x38), (55, 12, 0x27),
    (56, 12, 0x28), (57, 12, 0x58), (58, 12, 0x59), (59, 12, 0x2B),
    (60, 12, 0x2C), (61, 12, 0x5A), (62, 12, 0x66), (63, 12, 0x67),
    (64, 10, 0x0F), (128, 12, 0xC8), (192, 12, 0xC9), (256, 12, 0x5B),
    (320, 12, 0x33), (384, 12, 0x34), (448, 12, 0x35), (512, 13, 0x6C),
    (576, 13, 0x6D), (640, 13, 0x4A), (704, 13, 0x4B), (768, 13, 0x4C),
    (832, 13, 0x4D), (896, 13, 0x72), (960, 13, 0x73), (1024, 13, 0x74),
    (1088, 13, 0x75), (1152, 13, 0x76), (1216, 13, 0x77),
    (1280, 13, 0x52), (1344, 13, 0x53), (1408, 13, 0x54),
    (1472, 13, 0x55), (1536, 13, 0x5A), (1600, 13, 0x5B),
    (1664, 13, 0x64), (1728, 13, 0x65),
)

# extended make-ups 1792-2560 are shared by both colors (T.4 Table 3c)
_EXT_CODES = (
    (1792, 11, 0x08), (1856, 11, 0x0C), (1920, 11, 0x0D),
    (1984, 12, 0x12), (2048, 12, 0x13), (2112, 12, 0x14),
    (2176, 12, 0x15), (2240, 12, 0x16), (2304, 12, 0x17),
    (2368, 12, 0x1C), (2432, 12, 0x1D), (2496, 12, 0x1E),
    (2560, 12, 0x1F),
)

_MAXLEN = 13


def _build_lut(codes):
    """13-bit-peek prefix LUT: index -> (run, code length)."""
    lut = [None] * (1 << _MAXLEN)
    for run, ln, val in codes:
        base = val << (_MAXLEN - ln)
        for k in range(1 << (_MAXLEN - ln)):
            if lut[base + k] is not None:
                raise AssertionError("T.4 table prefix collision")
            lut[base + k] = (run, ln)
    return lut


_WHITE_LUT = _build_lut(_WHITE_CODES + _EXT_CODES)
_BLACK_LUT = _build_lut(_BLACK_CODES + _EXT_CODES)
_ENC_WHITE = {run: (ln, val) for run, ln, val in _WHITE_CODES + _EXT_CODES}
_ENC_BLACK = {run: (ln, val) for run, ln, val in _BLACK_CODES + _EXT_CODES}
_MAKEUPS = sorted(r for r in _ENC_WHITE if r >= 64)


class _Bits:
    """MSB-first bit reader with a 13-bit peek; past end feeds 0s and
    counts the overrun so truncation raises instead of spinning."""

    __slots__ = ("data", "n", "pos", "over", "_lastnz")

    def __init__(self, data: bytes):
        # 4 zero pad bytes let peek13 read one 32-bit window
        # unconditionally (past-end bits are 0 by construction)
        self.data = bytes(data) + b"\x00\x00\x00\x00"
        self.n = len(data) * 8
        self.pos = 0
        self.over = 0
        # last nonzero byte index, found once: makes the per-row
        # only_padding_left() O(1) instead of an O(stream) rescan
        # (quadratic over a self-delimited decode)
        nz = np.nonzero(np.frombuffer(data, dtype=np.uint8))[0]
        self._lastnz = int(nz[-1]) if nz.size else -1

    def peek13(self) -> int:
        # one 4-byte window instead of 13 single-bit reads — this is
        # the per-code hot path (review finding r6)
        p = self.pos
        byte = p >> 3
        return (int.from_bytes(self.data[byte:byte + 4], "big")
                >> (19 - (p & 7))) & 0x1FFF

    def skip(self, k: int):
        self.pos += k
        if self.pos > self.n:
            self.over += self.pos - self.n
            if self.over > 64:
                raise CcittError("truncated CCITT stream")

    def read(self) -> int:
        if self.pos >= self.n:
            self.skip(1)
            return 0
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def only_padding_left(self) -> bool:
        """True when every remaining bit is 0 (or none remain) — the
        end-of-data condition for self-delimiting streams without an
        explicit terminator."""
        p = self.pos
        if p >= self.n:
            return True
        first = p >> 3
        if first > self._lastnz:
            return True
        if first < self._lastnz:
            return False
        # the last nonzero byte: mask the consumed high bits
        return not (self.data[first] & (0xFF >> (p & 7)))

    def at_eofb(self) -> bool:
        """Peek (no consume): two EOLs in a row from here?  At an
        UNALIGNED position a single EOL is ambiguous — byte-pad zeros
        plus a code word's leading zeros can total 11 — but row data
        can never follow with a second 11-zero run, so the double-EOL
        peek is the unambiguous EOFB test for byte-aligned streams
        whose encoder wrote EOFB unpadded after the last line."""
        p = self.pos
        for _ in range(2):
            zeros = 0
            while True:
                if p >= self.n or zeros > 64 + 11:
                    return False
                if (self.data[p >> 3] >> (7 - (p & 7))) & 1:
                    break
                zeros += 1
                p += 1
            if zeros < 11:
                return False
            p += 1                           # the EOL's closing 1
        return True

    def at_eol(self) -> bool:
        """Peek (no consume): do >= 11 zero bits then a 1 start here?
        Fill zeros before the EOL are part of the match (T.4 §4.1.2);
        legitimate T.4/T.6 codewords never open with 11 zeros, so the
        answer is unambiguous."""
        p = self.pos
        zeros = 0
        while p < self.n and zeros <= 64 + 11:
            b = (self.data[p >> 3] >> (7 - (p & 7))) & 1
            if b:
                return zeros >= 11
            zeros += 1
            p += 1
        return False


def _read_run(bits: _Bits, color: int) -> int:
    """One T.4 run length: make-ups accumulate until a terminating
    code (< 64) arrives."""
    total = 0
    lut = _BLACK_LUT if color else _WHITE_LUT
    while True:
        ent = lut[bits.peek13()]
        if ent is None:
            raise CcittError("bad run-length code")
        run, ln = ent
        bits.skip(ln)
        total += run
        if run < 64:
            return total
        lut = _BLACK_LUT if color else _WHITE_LUT


def _decode_2d_row(bits: _Bits, ref: list, w: int) -> list:
    """One T.4/T.6 two-dimensional coding line against ``ref``; returns
    the changing-element list (without the trailing sentinels)."""
    cur: list = []
    a0 = -1                                  # imaginary start element
    color = 0
    ri0 = 0                                  # monotone: a0 only grows,
    nref = len(ref)                          # so the b1 scan resumes
    while a0 < w:                            # (O(changes) per row, not
        # b1: first reference change STRICTLY right of a0 whose index
        # parity flips to the opposite of the current color (even
        # index = white->black transition)   # O(changes^2))
        while ri0 < nref and ref[ri0] <= a0:
            ri0 += 1
        ri = ri0
        if (ri & 1) != color:
            ri += 1
        b1 = ref[ri] if ri < nref else w
        b2 = ref[ri + 1] if ri + 1 < nref else w
        if bits.read():                      # 1 -> V0
            a1 = b1
        elif bits.read():                    # 01x -> VR1 / VL1
            a1 = b1 + 1 if bits.read() else b1 - 1
        elif bits.read():                    # 001 -> horizontal
            a0c = a0 if a0 > 0 else 0
            r1 = _read_run(bits, color)
            r2 = _read_run(bits, color ^ 1)
            a1 = a0c + r1
            a2 = a1 + r2
            if a2 > w or a1 < a0c:
                raise CcittError("horizontal runs overrun line")
            cur.append(min(a1, w))
            cur.append(min(a2, w))
            a0 = a2
            continue
        elif bits.read():                    # 0001 -> pass
            a0 = b2
            continue
        elif bits.read():                    # 00001x -> V2
            a1 = b1 + 2 if bits.read() else b1 - 2
        elif bits.read():                    # 000001x -> V3
            a1 = b1 + 3 if bits.read() else b1 - 3
        else:
            # 0000000...: EOL/EOFB prefix mid-row = malformed here
            raise CcittError("EOL inside 2D line")
        if a1 <= a0 or a1 > w:
            raise CcittError("vertical move out of line")
        cur.append(min(a1, w))
        a0 = a1
        color ^= 1
    return cur


def _decode_1d_row(bits: _Bits, w: int) -> list:
    """One T.4 one-dimensional (MH) coding line; runs alternate
    starting white and must sum exactly to the line width."""
    cur: list = []
    total = 0
    color = 0
    while total < w:
        run = _read_run(bits, color)
        total += run
        if total > w:
            raise CcittError("1D runs overrun line")
        cur.append(total)
        color ^= 1
    return cur


def _fill_row(row, cur: list, w: int) -> None:
    """Materialize a row from its changing-element list."""
    pos = 0
    col = 0
    for c in cur + [w, w]:
        if c > pos and col:
            row[pos:c] = 1
        if c >= w:
            break
        pos = c
        col ^= 1


def _decode_g4_plane(bits: _Bits, rows: np.ndarray, w: int,
                     byte_align: bool = False) -> None:
    """Decode ``rows.shape[0]`` pure-2D coding lines into ``rows``
    against a fresh imaginary all-white reference line (shared by the
    single-image and multi-plane decoders)."""
    ref = [w, w]
    for y in range(rows.shape[0]):
        if byte_align:
            bits.align()
        cur = _decode_2d_row(bits, ref, w)
        _fill_row(rows[y], cur, w)
        ref = cur + [w, w]


def decode_g4(data: bytes, w: int, h: int | None,
              byte_align: bool = False) -> np.ndarray:
    """Decode pure 2D T.6 data to an (h, w) uint8 bitmap, 1 = black.

    ``h=None`` (PDF ``/EndOfBlock`` true with no ``/Rows``): the
    stream is self-delimiting — rows decode until the EOFB marker
    (EOL+EOL, T.6 §4.2.1.3.1 via the /EndOfBlock contract) or the
    data runs out; the decoded row count defines the height."""
    if w <= 0 or (h is not None and (h <= 0 or w * h > 64_000_000)):
        raise CcittError("bad dimensions")
    if h is not None:
        from . import native as _ckern

        res = _ckern.g4_decode_native(bytes(data), w, h, byte_align)
        if res is not None:                  # bit-identical C walk
            return res
    bits = _Bits(data)
    if h is not None:
        rows = np.zeros((h, w), dtype=np.uint8)
        _decode_g4_plane(bits, rows, w, byte_align)
        return rows
    max_rows = 64_000_000 // w
    out = []
    ref = [w, w]
    while True:
        if bits.only_padding_left():
            break
        if byte_align:
            # T.6 byte alignment applies to coded lines, and a foreign
            # encoder may emit EOFB unpadded right after the last line
            # — aligning first would eat 1-7 of EOFB's leading zeros.
            # The pre-align peek must demand BOTH EOLs: pad zeros plus
            # a code's leading zeros can mimic a single one.
            if bits.at_eofb():
                break
            bits.align()
            if bits.only_padding_left() or bits.at_eol():
                break
        elif bits.at_eol():
            break                            # EOFB opens with an EOL
        if len(out) >= max_rows:
            raise CcittError("self-delimited G4 exceeds pixel bound")
        cur = _decode_2d_row(bits, ref, w)
        row = np.zeros(w, dtype=np.uint8)
        _fill_row(row, cur, w)
        out.append(row)
        ref = cur + [w, w]
    if not out:
        raise CcittError("no rows before EOFB")
    return np.stack(out)


def decode_g4_planes(data: bytes, w: int, h: int, count: int,
                     max_pixels: int = 64_000_000) -> list:
    """Decode ``count`` (h, w) pure-2D T.6 planes from ONE coded
    stream, the reference line resetting to the imaginary all-white
    row at each plane start — the JBIG2 gray-scale bitplane shape
    (T.88 Annex C.5 with HMMR=1).  EOL/EOFB sequences BETWEEN planes
    are consumed when present and not required: interop decoders
    (pdf.js, jbig2dec) read C.5 as each bitplane carrying its own
    EOFB terminator, while a bare single-trailing-EOFB concatenation
    also exists — a legal 2D coding line can never open with 11 zero
    bits, so the two layouts are unambiguous to distinguish and both
    decode.  ``max_pixels`` bounds one plane (same semantic as the
    arithmetic halftone path's per-plane region cap)."""
    if w <= 0 or h <= 0 or count < 0 or w * h > max_pixels \
            or count > 64:
        raise CcittError("bad plane dimensions")
    bits = _Bits(data)
    planes = []
    for _ in range(count):
        rows = np.zeros((h, w), dtype=np.uint8)
        _decode_g4_plane(bits, rows, w)
        planes.append(rows)
        while bits.at_eol():                 # per-plane EOFB / fill
            _eat_eol(bits)
    return planes


def _eat_eol(bits: _Bits) -> None:
    """Consume fill zeros + one EOL (11+ zeros then a 1, T.4 §4.1.2)."""
    zeros = 0
    while True:
        b = bits.read()
        if b:
            if zeros < 11:
                raise CcittError("expected EOL")
            return
        zeros += 1
        if zeros > 64 + 11:
            raise CcittError("runaway EOL fill")


def decode_g3(data: bytes, w: int, h: int | None, k: int = 0,
              byte_align: bool = False,
              end_of_line: bool = False) -> np.ndarray:
    """Decode Group-3 data to an (h, w) uint8 bitmap, 1 = black.

    ``k == 0``: pure one-dimensional MH lines (the PDF default layout:
    no EOLs unless ``end_of_line``).  ``k > 0``: mixed 2D — every line
    is prefixed by EOL + a 1-bit tag (1 = 1D, 0 = 2D against the
    previous line), per T.4 §4.2.1.

    ``h=None`` (PDF ``/EndOfBlock`` true with no ``/Rows``): rows
    decode until RTC (T.4 §4.1.3: six EOLs in 1D mode, six EOL+1 in
    2D mode — the first sequence consumed as the next line's prefix,
    the second EOL detected right behind it) or until only padding
    remains; the decoded row count defines the height."""
    if w <= 0 or (h is not None and (h <= 0 or w * h > 64_000_000)):
        raise CcittError("bad dimensions")
    if k < 0:
        return decode_g4(data, w, h, byte_align=byte_align)
    bits = _Bits(data)
    unbounded = h is None
    max_rows = (64_000_000 // w) if unbounded else h
    rows_out = [] if unbounded else np.zeros((h, w), dtype=np.uint8)
    ref = [w, w]
    y = 0
    while y < max_rows:
        if byte_align:
            bits.align()
        if unbounded and bits.only_padding_left():
            break
        if k > 0:
            _eat_eol(bits)
            if unbounded and bits.only_padding_left():
                break
            one_d = bits.read() == 1
            # RTC in 2D mode is six EOL+1 sequences (T.4 §4.2.1.3.5):
            # the tag bit belongs to the EOL, so the second EOL is only
            # visible AFTER consuming the tag.  Row data never opens
            # with 11 zeros and rows are never empty, so this peek is
            # unambiguous.
            if unbounded and (bits.at_eol()
                              or bits.only_padding_left()):
                break
        else:
            if end_of_line:
                _eat_eol(bits)
                if unbounded and (bits.at_eol()
                                  or bits.only_padding_left()):
                    break
            elif unbounded and bits.at_eol():
                break       # RTC terminator on an EOL-less 1D stream
            one_d = True
        cur = (_decode_1d_row(bits, w) if one_d
               else _decode_2d_row(bits, ref, w))
        if unbounded:
            row = np.zeros(w, dtype=np.uint8)
            _fill_row(row, cur, w)
            rows_out.append(row)
        else:
            _fill_row(rows_out[y], cur, w)
        ref = cur + [w, w]
        y += 1
    if not unbounded:
        return rows_out
    if unbounded and y >= max_rows:
        raise CcittError("self-delimited G3 exceeds pixel bound")
    if not rows_out:
        raise CcittError("no rows before RTC")
    return np.stack(rows_out)


class _BitWriter:
    """MSB-first bit writer shared by the G3/G4 encoders."""

    __slots__ = ("out", "buf", "nb")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nb = 0

    def put(self, val: int, ln: int):
        self.buf = (self.buf << ln) | val
        self.nb += ln
        while self.nb >= 8:
            self.nb -= 8
            self.out.append((self.buf >> self.nb) & 0xFF)
        # mask the drained bits or buf grows into an O(stream)-digit
        # bignum and every shift turns O(stream) — the same quadratic
        # the round-8 LZW fix closed (tiffcodec.py lzw_encode)
        self.buf &= (1 << self.nb) - 1

    def put_run(self, run: int, color: int):
        table = _ENC_BLACK if color else _ENC_WHITE
        # T.4: runs >= 64 take one or more make-up codes (concatenated
        # for runs past 2623) plus a terminating code
        while run >= 64:
            mk = 64
            for m in _MAKEUPS:
                if m <= run:
                    mk = m
                else:
                    break
            ln, val = table[mk]
            self.put(val, ln)
            run -= mk
        ln, val = table[run]
        self.put(val, ln)

    def align(self):
        if self.nb:
            self.put(0, 8 - self.nb)


_VCODES = {0: (0b1, 1), 1: (0b011, 3), -1: (0b010, 3),
           2: (0b000011, 6), -2: (0b000010, 6),
           3: (0b0000011, 7), -3: (0b0000010, 7)}


def _row_changes(row, w: int) -> list:
    d = np.nonzero(np.diff(np.concatenate(([0], row))))[0]
    return d.tolist() + [w, w]


def _encode_2d_row(bw: _BitWriter, cur: list, ref: list, w: int):
    a0 = -1
    color = 0
    ci0 = ri0 = 0                            # monotone scan pointers
    ncur, nref = len(cur), len(ref)          # (a0 only grows)
    while a0 < w:
        while ci0 < ncur and cur[ci0] <= a0:
            ci0 += 1
        ci = ci0
        if (ci & 1) != color:
            ci += 1
        a1 = cur[ci] if ci < ncur else w
        a2 = cur[ci + 1] if ci + 1 < ncur else w
        while ri0 < nref and ref[ri0] <= a0:
            ri0 += 1
        ri = ri0
        if (ri & 1) != color:
            ri += 1
        b1 = ref[ri] if ri < nref else w
        b2 = ref[ri + 1] if ri + 1 < nref else w
        if b2 < a1:
            bw.put(0b0001, 4)                # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            code, ln = _VCODES[d]
            bw.put(code, ln)
            a0 = a1
            color ^= 1
            continue
        bw.put(0b001, 3)                     # horizontal
        a0c = a0 if a0 > 0 else 0
        bw.put_run(a1 - a0c, color)
        bw.put_run(a2 - a1, color ^ 1)
        a0 = a2


def _encode_1d_row(bw: _BitWriter, cur: list, w: int):
    pos = 0
    color = 0
    for c in cur:
        if c >= w:
            break
        bw.put_run(c - pos, color)
        pos = c
        color ^= 1
    bw.put_run(w - pos, color)


def _encode_g4_plane(bw: _BitWriter, bm: np.ndarray,
                     byte_align: bool = False) -> None:
    """Encode one {0,1} plane as pure-2D coding lines against a fresh
    all-white reference line (shared by the single-image and
    multi-plane encoders)."""
    h, w = bm.shape
    ref = [w, w]
    for y in range(h):
        if byte_align:
            bw.align()
        cur = _row_changes(bm[y], w)
        _encode_2d_row(bw, cur, ref, w)
        ref = cur


def encode_g4(bitmap: np.ndarray, byte_align: bool = False) -> bytes:
    """Encode an (h, w) {0,1} bitmap as pure 2D T.6 + EOFB.  Lossless:
    ``decode_g4(encode_g4(b), w, h) == b`` bit-exactly."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    if bm.ndim != 2 or 0 in bm.shape:
        raise ValueError("bad bitmap shape")
    from . import native as _ckern

    res = _ckern.g4_encode_native(bm, byte_align)
    if res is not None:                      # byte-identical C walk
        return res
    bw = _BitWriter()
    _encode_g4_plane(bw, bm, byte_align)
    if byte_align:
        bw.align()          # EOFB starts a coding line: align it too,
        #                     so the self-delimiting decoder's
        #                     align-then-peek finds the full EOL
    bw.put(0x001, 12)                        # EOFB = EOL + EOL
    bw.put(0x001, 12)
    bw.align()
    return bytes(bw.out)


def encode_g4_planes(planes) -> bytes:
    """Mirror of `decode_g4_planes`: concatenated pure-2D T.6 planes
    of ONE shared shape, reference line reset per plane, EACH plane
    terminated by its own EOFB (the interop layout pdf.js/jbig2dec
    expect for C.5 MMR grayscale; the mirror decoder also accepts the
    bare single-trailing-EOFB concatenation), byte pad at the end."""
    bms = [(np.asarray(p) != 0).astype(np.uint8) for p in planes]
    if not bms:
        raise ValueError("no planes")
    if bms[0].ndim != 2 or 0 in bms[0].shape \
            or any(b.shape != bms[0].shape for b in bms):
        raise ValueError("planes must share one non-empty 2D shape")
    bw = _BitWriter()
    for bm in bms:
        _encode_g4_plane(bw, bm)
        bw.put(0x001, 12)                    # EOFB = EOL + EOL
        bw.put(0x001, 12)
    bw.align()
    return bytes(bw.out)


def encode_g3(bitmap: np.ndarray, k: int = 0,
              byte_align: bool = False,
              end_of_line: bool = False,
              rtc: bool = False) -> bytes:
    """Encode as Group 3: ``k == 0`` pure MH lines (EOLs only with
    ``end_of_line``, matching the PDF default); ``k > 0`` mixed 2D —
    every line prefixed by EOL + tag, one 1D line per K lines (T.4
    §4.2.1).  ``rtc=True`` appends return-to-control (T.4 §4.1.3 /
    §4.2.1.3.5: six EOLs, tagged ``+1`` in 2D mode) so the stream is
    self-delimiting — the shape a PDF ``/EndOfBlock`` stream without
    ``/Rows`` carries.  For ``k == 0`` without ``end_of_line`` there
    is no EOL vocabulary; such streams self-delimit by zero padding
    and ``rtc`` is a no-op."""
    bm = (np.asarray(bitmap) != 0).astype(np.uint8)
    if bm.ndim != 2 or 0 in bm.shape:
        raise ValueError("bad bitmap shape")
    if k < 0:
        return encode_g4(bm, byte_align=byte_align)
    h, w = bm.shape
    bw = _BitWriter()
    ref = [w, w]
    for y in range(h):
        if byte_align:
            bw.align()
        cur = _row_changes(bm[y], w)
        if k > 0:
            one_d = y % k == 0
            bw.put(0x001, 12)                # EOL
            bw.put(1 if one_d else 0, 1)     # tag bit
            if one_d:
                _encode_1d_row(bw, cur, w)
            else:
                _encode_2d_row(bw, cur, ref, w)
        else:
            if end_of_line:
                bw.put(0x001, 12)
            _encode_1d_row(bw, cur, w)
        ref = cur
    if rtc and (k > 0 or end_of_line):
        if byte_align:
            bw.align()      # RTC starts a coding line (see encode_g4)
        for _ in range(6):
            bw.put(0x001, 12)                # RTC = six EOLs ...
            if k > 0:
                bw.put(1, 1)                 # ... tagged +1 in 2D mode
    bw.align()
    return bytes(bw.out)

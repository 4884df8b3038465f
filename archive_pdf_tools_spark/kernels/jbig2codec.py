"""From-scratch JBIG2 (ITU-T T.88) generic-region codec.

The reference's DEFAULT mask sink is JBIG2: ``internetarchivepdf/
mrc.py:474-520`` (``encode_mrc_mask``) shells out to the external
``jbig2`` binary (jbig2enc, ``-p`` for PDF-embedded output) and
``pdfhacks.py:60-70,106-177`` wires the result into the PDF as a 1-bit
DeviceGray SMask with ``/Filter /JBIG2Decode``.  This module replaces
the subprocess with a native codec: embedded-stream segment parsing
(T.88 §7.2), the page-information segment (§7.4.8), arithmetic-coded
generic-region decoding (§6.2.5.7, templates 0-3, TPGDON typical
prediction, arbitrary AT pixel placement) and a matching encoder
producing the same embedded organization jbig2enc ``-p`` emits (page
info + immediate lossless generic region + end-of-page).

SYMBOL MODE too (round-6 late addition): symbol dictionaries (§6.5)
and text regions (§6.4) decode on the arithmetic path — height-class
glyph decoding with shared generic-region contexts, export runs, the
§A.2/A.3 arithmetic integer procedures (IADH/IADW/IAEX/IADT/IAFS/
IADS/IAIT/IAID), strip-ordered instance placement — and
``encode_jbig2_symbols`` emits the organization jbig2enc's symbol
coder (``-s``) produces, which is how real archival PDFs usually
compress text masks (one glyph per repeated character shape).

The MQ arithmetic coder is shared with the JPEG2000 codec
(``kernels/jp2codec.py``): T.88 Annex E and T.800 Annex C specify the
identical coder; JBIG2 merely uses a different context model — one
all-zero-initialised (state 0, MPS 0, §6.2.5.7 step 2) context per
possible template neighbourhood value (2^16 for template 0).

Everything here derives from the published ITU-T T.88 spec text
(section/figure numbers cited inline).  Structural pins entered from
the spec, not reconstructed from memory: the four TPGDON pseudo-pixel
contexts (0x9B25/0x0795/0x00E5/0x0195, §6.2.5.7) and the template
pixel layouts (figures 4-7).  No third-party JBIG2 codec exists
in-container, so cross-codec parity is evidenced the same way as the
JP2 codec: bit-exact decode(encode(x)) round-trips over fuzz corpora
plus those spec-structure pins (see COVERAGE.md).

MMR (=1) generic regions decode via the shared T.6 path
(``kernels/ccittcodec.py`` — T.88 §6.2.6 delegates to T.4/T.6).

REFINEMENT (round 7): generic refinement regions (§6.3, templates 0-1,
TPGRON typical prediction, segment types 42/43 refining the page per
§7.4.7.2), SBREFINE text-region instances (§6.4.11) and SDREFAGG
symbol dictionaries with REFAGGNINST=1 (§6.5.8.2) — together the
jbig2enc lossy ``-r`` organization — all decode and the matching
encoders (``encode_jbig2_refinement``, ``encode_jbig2_symbols(...,
refinements=...)``) round-trip bit-exactly.  HALFTONE too: pattern
dictionaries (§6.7) and halftone regions (§6.6, Annex-C gray-coded
bitplanes, 8.8 fixed-point grid stamping) with
``encode_jbig2_halftone`` — both the arithmetic and the HDMMR/HMMR
paths (C.5 MMR grayscale: bitplanes in one T.6 stream with per-plane
EOFB terminators, the pdf.js/jbig2dec interop layout; bare
concatenations decode too — ``ccittcodec.decode_g4_planes``).

TRANSPOSED text regions (§6.4.5 (viii)/(xi), vertical-text strips)
and HENABLESKIP halftones (§6.6.5.1 HSKIP + USESKIP bitplane decode)
decode and encode since late round 7.

Aggregate symbols (REFAGGNINST > 1 — the glyph decoded as a nested
text region over the symbols so far, §6.5.8.2.1 with the Table-17
parameters and the dictionary's persistent contexts) decode since
late round 7 too (``encode_jbig2_aggregate`` emits the two-dictionary
organization).

Intermediate regions (§8.2 — types 4/20/36/40 retained as reference
buffers for refinement chains) and unknown-length immediate generic
segments (§7.2.7, FF AC + row count) decode since late round 7.

Scope (raised as ``Jbig2Error``, honestly): Huffman-coded segments
and unknown-length MMR regions (the 00 00 terminator can collide
with legitimate T.6 bytes; no conformance stream exists here to pin
the disambiguation).  jbig2enc's modes and this
module's own encoders use none of these.  The Huffman path's
standard tables (T.88 Annex B.4-B.15) are NOT reconstructed from
memory for the same reason the MQ conformance vector is not (see
``jp2codec``): a misremembered spec table decodes self-consistent
fixtures while silently corrupting foreign streams — the worst
failure mode a codec gate exists to prevent.

DECISION (round 9, revisited per review): the gate STAYS.  The
published-spec-content posture that legitimized the derived ICC
profile and AES S-box does not transfer here — those derive from
compact published *axioms* (field arithmetic, colorimetry equations)
whose correctness is self-checking, whereas the Annex B tables are
~15 arbitrary line-by-line constant tables with no in-sandbox
conformance stream to validate a transcription against.  An
implementation whose only evidence is round-tripping its own
fixtures would CLAIM foreign-stream coverage this repo cannot
honestly assert; a hard, typed error that names the gap is the
correct contract for the rare (no known encoder emits it by
default) Huffman family.  Revisit if a conformance-stream corpus or
the tables in machine-readable form enter the environment.  The refinement
template pixel SETS and the halftone grid/gray-code procedures are
algorithmic figure-level structure (same class as the generic
templates, whose transcription reproduces the published TPGDON
constants); the residual foreign-parity caveat is transcription-
level bit ordering, recorded here.
"""

from __future__ import annotations

import numpy as np

from . import native as _cnative
from .jp2codec import _mq_decode_fn, _mq_encode_fns


class Jbig2Error(Exception):
    """Unsupported or malformed JBIG2 stream (documented codec gate)."""


# ----------------------------------------------------------- templates
# Fixed template pixels per GBTEMPLATE (T.88 figures 4-7), as (dy, dx);
# the adaptive (AT) pixels are appended and the whole set is ordered by
# (dy, dx) — first pixel contributes the context MSB (§6.2.5.7).
_FIXED = (
    ((-2, -1), (-2, 0), (-2, 1),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
     (0, -4), (0, -3), (0, -2), (0, -1)),
    ((-2, -1), (-2, 0), (-2, 1), (-2, 2),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
     (0, -3), (0, -2), (0, -1)),
    ((-2, -1), (-2, 0), (-2, 1),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1),
     (0, -2), (0, -1)),
    ((-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1),
     (0, -4), (0, -3), (0, -2), (0, -1)),
)

# Nominal AT positions (§6.2.5.3): template 0 has A1-A4, 1-3 only A1.
_NOMINAL_AT = (
    ((-1, 3), (-1, -3), (-2, 2), (-2, -2)),
    ((-1, 3),),
    ((-1, 2),),
    ((-1, 2),),
)

# TPGDON pseudo-pixel contexts per template (§6.2.5.7).
_TPGDON_CTX = (0x9B25, 0x0795, 0x00E5, 0x0195)

# Standalone .jb2 file magic (§9.1; embedded PDF streams omit it).
FILE_MAGIC = b"\x97JB2\r\n\x1a\n"


def _sorted_template(template: int, at):
    """AT pixels merged into the fixed set, (dy, dx)-sorted; MSB first."""
    pix = list(_FIXED[template]) + [tuple(p) for p in at]
    pix.sort()
    return pix


def _fast_params(template: int):
    """Sliding-window constants for the NOMINAL-AT fast path.

    With nominal AT pixels every template is three contiguous runs —
    row y-2 spanning [x-a2..x+b2], row y-1 [x-a1..x+b1], row y
    [x-a0..x-1] — so the context is three registers shifted left one
    bit per pixel (the same lane trick jbig2dec/pdf.js use).
    Returns (a2, b2, n2, a1, b1, n1, n0) with n2==0 for template 3.
    """
    if template == 0:
        return (2, 2, 5, 3, 3, 7, 4)
    if template == 1:
        return (1, 2, 4, 2, 3, 6, 3)
    if template == 2:
        return (1, 1, 3, 2, 2, 5, 2)
    return (0, 0, 0, 3, 2, 6, 4)


def _is_nominal(template: int, at) -> bool:
    return tuple(tuple(p) for p in at) == _NOMINAL_AT[template]


def _decode_generic(decode, w: int, h: int, template: int, at,
                    tpgdon: bool, skip=None) -> np.ndarray:
    """Generic region decoding procedure (§6.2.5.7), arithmetic only.

    ``decode`` is the shared MQ decoder closure bound to this region's
    2^16-context state.  Returns an (h, w) uint8 bitmap of {0, 1}.
    ``skip`` (USESKIP, §6.2.5.7 step 3(c)): an (h, w) {0,1} bitmap —
    pixels where it is 1 are set to 0 WITHOUT consuming a decision
    (the HENABLESKIP halftone path); the context windows see the 0s.
    """
    bitmap = np.zeros((h, w), dtype=np.uint8)
    ltp = 0
    tp_ctx = _TPGDON_CTX[template]
    if _is_nominal(template, at):
        a2, b2, n2, a1, b1, n1, n0 = _fast_params(template)
        m2, m1, m0 = (1 << n2) - 1, (1 << n1) - 1, (1 << n0) - 1
        s2, s1 = n1 + n0, n0
        pad = [0] * (max(b2, b1) + 2)
        zrow = [0] * w + pad
        for y in range(h):
            if tpgdon:
                ltp ^= decode(tp_ctx)
                if ltp:
                    if y:
                        bitmap[y] = bitmap[y - 1]
                    continue
            r2 = (bitmap[y - 2].tolist() + pad) if y >= 2 and n2 else zrow
            r1 = (bitmap[y - 1].tolist() + pad) if y >= 1 else zrow
            # initial windows at x=0 (left-of-image pixels are 0)
            c2 = _init_window(r2, a2, b2) if n2 else 0
            c1 = _init_window(r1, a1, b1)
            c0 = 0
            row = bitmap[y]
            out = row.tolist()
            rd2, rd1 = b2 + 1, b1 + 1
            if skip is None:                 # hot path: no per-pixel test
                for x in range(w):
                    bit = decode((c2 << s2) | (c1 << s1) | c0)
                    out[x] = bit
                    c2 = ((c2 << 1) | r2[x + rd2]) & m2
                    c1 = ((c1 << 1) | r1[x + rd1]) & m1
                    c0 = ((c0 << 1) | bit) & m0
            else:
                sk = skip[y].tolist()
                for x in range(w):
                    bit = 0 if sk[x] else                         decode((c2 << s2) | (c1 << s1) | c0)
                    out[x] = bit
                    c2 = ((c2 << 1) | r2[x + rd2]) & m2
                    c1 = ((c1 << 1) | r1[x + rd1]) & m1
                    c0 = ((c0 << 1) | bit) & m0
            bitmap[y] = out
        return bitmap

    # general path: arbitrary AT placement (foreign encoders may move
    # A1-A4 anywhere in the causal neighbourhood) — per-pixel gather
    pix = _sorted_template(template, at)
    nb = len(pix)
    for y in range(h):
        if tpgdon:
            ltp ^= decode(tp_ctx)
            if ltp:
                if y:
                    bitmap[y] = bitmap[y - 1]
                continue
        rows = {}
        for dy, dx in pix:
            yy = y + dy
            if yy not in rows:
                rows[yy] = (bitmap[yy].tolist()
                            if 0 <= yy < h else None)
        row = [0] * w
        rows[y] = row
        sk = skip[y].tolist() if skip is not None else None
        for x in range(w):
            if sk is not None and sk[x]:
                continue                     # row[x] stays 0, no decision
            ctx = 0
            for dy, dx in pix:
                xx = x + dx
                r = rows[y + dy]
                ctx = (ctx << 1) | (r[xx]
                                    if r is not None and 0 <= xx < w
                                    else 0)
            row[x] = decode(ctx)
        bitmap[y] = row
    return bitmap


def _generic_region(data: bytes, w: int, h: int, template: int, at,
                    tpgdon: bool, skip=None) -> np.ndarray:
    """One-shot generic region decode: compiled kernel when available
    (kernels/native — bit-identical by self-test, fuzz and pin tests),
    else the Python `_decode_generic` path (the oracle)."""
    ses = _cnative.generic_session(data)
    if ses is not None:
        try:
            return ses.decode_generic(w, h, template, at, tpgdon, skip)
        except _cnative.NativeError:
            pass
    states = [0] * 65536                     # §6.2.5.7 step 2: all-zero
    mps = [0] * 65536
    return _decode_generic(_mq_decode_fn(data, states, mps), w, h,
                           template, at, tpgdon, skip=skip)


def _refinement_region(data: bytes, w: int, h: int, template: int,
                       rat, ref: np.ndarray, tpgron: bool) -> np.ndarray:
    """One-shot refinement region decode (segment-level, dx=dy=0):
    compiled kernel when available, else the Python path."""
    ses = _cnative.generic_session(data)
    if ses is not None:
        try:
            return ses.decode_refinement(w, h, template, rat, ref,
                                         0, 0, tpgron)
        except _cnative.NativeError:
            pass
    states = [0] * _REF_CTX_SIZE
    mps = [0] * _REF_CTX_SIZE
    return _decode_refinement(_mq_decode_fn(data, states, mps), w, h,
                              template, rat, ref, 0, 0, tpgron)


def _mq_region_codeword(regions) -> bytes:
    """Encode a sequence of generic regions through ONE shared MQ
    coder and flush — compiled kernel when available, else the Python
    encoders.  ``regions``: iterable of (bitmap, template, at, tpgdon,
    skip); ``at=None`` means nominal (the Python fast path); explicit
    ``at`` implies tpgdon=False/skip=None (the pattern-dictionary
    shape)."""
    regions = list(regions)
    cap = sum(int(np.asarray(bm).size) for bm, *_ in regions) // 2 \
        + 2048
    ses = _cnative.generic_encode_session(cap)
    if ses is not None:
        try:
            for bm, template, at, tpgdon, skip in regions:
                ses.encode_generic(bm, template, at, tpgdon, skip)
            return ses.flush()
        except _cnative.NativeError:
            pass
    states = [0] * 65536
    mps = [0] * 65536
    encode, flush = _mq_encode_fns(states, mps)
    for bm, template, at, tpgdon, skip in regions:
        if at is None:
            _encode_generic(encode, np.asarray(bm, dtype=np.uint8),
                            template, tpgdon, skip=skip)
        else:
            _encode_generic_at(encode, np.asarray(bm, dtype=np.uint8),
                               template, at)
    return flush()


def _init_window(r, a: int, b: int) -> int:
    """Window [x-a .. x+b] value at x=0 (pixels left of the image = 0)."""
    c = 0
    for k in range(b + 1):
        c = (c << 1) | r[k]
    return c


def _encode_generic(encode, bitmap: np.ndarray, template: int,
                    tpgdon: bool, skip=None) -> None:
    """Mirror of `_decode_generic` over the nominal-AT fast path (the
    encoder always emits nominal AT pixels, like jbig2enc).  ``skip``
    mirrors the decoder's USESKIP: those pixels (which must be 0 in
    ``bitmap``) emit no decision."""
    h, w = bitmap.shape
    at = _NOMINAL_AT[template]
    a2, b2, n2, a1, b1, n1, n0 = _fast_params(template)
    m2, m1, m0 = (1 << n2) - 1, (1 << n1) - 1, (1 << n0) - 1
    s2, s1 = n1 + n0, n0
    tp_ctx = _TPGDON_CTX[template]
    pad = [0] * (max(b2, b1) + 2)
    zrow = [0] * w + pad
    ltp = 0
    prev = None
    for y in range(h):
        row = bitmap[y].tolist()
        if tpgdon:
            typical = 1 if (row == prev if prev is not None
                            else not any(row)) else 0
            encode(tp_ctx, typical ^ ltp)
            ltp = typical
            if typical:
                prev = row
                continue
        prev = row
        r2 = (bitmap[y - 2].tolist() + pad) if y >= 2 and n2 else zrow
        r1 = (bitmap[y - 1].tolist() + pad) if y >= 1 else zrow
        c2 = _init_window(r2, a2, b2) if n2 else 0
        c1 = _init_window(r1, a1, b1)
        c0 = 0
        rd2, rd1 = b2 + 1, b1 + 1
        sk = skip[y].tolist() if skip is not None else None
        for x in range(w):
            bit = row[x]
            if sk is None or not sk[x]:
                encode((c2 << s2) | (c1 << s1) | c0, bit)
            c2 = ((c2 << 1) | r2[x + rd2]) & m2
            c1 = ((c1 << 1) | r1[x + rd1]) & m1
            c0 = ((c0 << 1) | bit) & m0


# ------------------------------------------- refinement regions (§6.3)
#
# Generic refinement region decoding: each pixel's context combines
# already-decoded neighbours in the bitmap being produced (the "coding"
# pixels, causal) with a 3x3-ish window of an existing REFERENCE bitmap
# shifted by (GRREFERENCEDX, GRREFERENCEDY).  This is how jbig2enc's
# lossy refinement mode (``-r``) upgrades an approximate page/symbol to
# the exact original, and how SDREFAGG symbol dictionaries define new
# glyphs as deltas of existing ones.
#
# Template pixel sets per GRTEMPLATE (§6.3.5.3 figures 12-13), (dy, dx);
# context = coding pixels then reference pixels, first listed pixel =
# MSB — the same figure-reading-order convention as the generic
# templates above (whose transcription reproduces the published TPGDON
# constants, the strongest available cross-check without spec text
# in-container).  Template 0 appends A1 to the coding set and A2 to the
# reference set (13-bit contexts); template 1 is fixed (10-bit).
_REF_CODING = (
    ((-1, 0), (-1, 1), (0, -1)),
    ((-1, -1), (-1, 0), (-1, 1), (0, -1)),
)
_REF_REFERENCE = (
    ((-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1),
     (1, -1), (1, 0), (1, 1)),
    ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0), (1, 1)),
)
# TPGRON pseudo-pixel context (§6.3.5.6): the context value whose only
# set bit is the reference bitmap's centre pixel — 0x0020 / 0x0008
# under the ordering above.
_TPGRON_CTX = (0x0020, 0x0008)
# Nominal refinement AT positions (§6.3.5.3), (dy, dx).
_REF_NOMINAL_AT = ((-1, -1), (-1, -1))
_REF_CTX_SIZE = 1 << 13


def _ref_typical(ref, ry: int, rx: int):
    """TPGRON typicality (§6.3.5.6): the 3x3 reference window centred
    at (ry, rx) — pixels outside the reference count as 0.  Returns 0
    (all-zero), 1 (all-one) or None (mixed: pixel must be coded).
    ``ref`` is a list-of-row-lists."""
    rh = len(ref)
    rw = len(ref[0]) if rh else 0
    total = 0
    for yy in range(ry - 1, ry + 2):
        if 0 <= yy < rh:
            for xx in range(rx - 1, rx + 2):
                if 0 <= xx < rw and ref[yy][xx]:
                    total += 1
    if total == 0:
        return 0
    if total == 9:
        return 1
    return None


def _decode_refinement(decode, w: int, h: int, template: int, at,
                       ref: np.ndarray, dx: int, dy: int,
                       tpgron: bool, base: int = 0) -> np.ndarray:
    """Generic refinement region decoding procedure (§6.3.5.6).

    ``ref`` is the reference bitmap; output pixel (y, x) reads the
    reference around (y - dy, x - dx).  ``base`` offsets this
    procedure's context block within the segment's shared MQ state (a
    text region interleaves refinement contexts with its IAx blocks).
    """
    coding = list(_REF_CODING[template])
    refpix = list(_REF_REFERENCE[template])
    if template == 0:
        coding.append(tuple(at[0]))
        refpix.append(tuple(at[1]))
    refl = [r.tolist() for r in np.asarray(ref)]
    rh, rw = ref.shape
    rows: list = []
    ltp = 0
    tp_ctx = base + _TPGRON_CTX[template]
    for y in range(h):
        if tpgron:
            ltp ^= decode(tp_ctx)
        row = [0] * w
        rows.append(row)
        for x in range(w):
            if ltp:
                tv = _ref_typical(refl, y - dy, x - dx)
                if tv is not None:
                    row[x] = tv
                    continue
            ctx = 0
            for dy_, dx_ in coding:
                yy, xx = y + dy_, x + dx_
                ctx = (ctx << 1) | (rows[yy][xx]
                                    if 0 <= yy < h and 0 <= xx < w
                                    else 0)
            for dy_, dx_ in refpix:
                yy, xx = y - dy + dy_, x - dx + dx_
                ctx = (ctx << 1) | (refl[yy][xx]
                                    if 0 <= yy < rh and 0 <= xx < rw
                                    else 0)
            row[x] = decode(base + ctx)
    return np.array(rows, dtype=np.uint8).reshape(h, w)


def _encode_refinement(encode, bitmap: np.ndarray, template: int,
                       ref: np.ndarray, dx: int, dy: int,
                       tpgron: bool, base: int = 0) -> None:
    """Mirror of `_decode_refinement` (nominal AT pixels, like the
    generic encoder).  With ``tpgron`` a row is marked typical when
    every uniform-reference pixel already equals its reference value —
    those pixels are then skipped exactly as the decoder skips them."""
    at = _REF_NOMINAL_AT
    coding = list(_REF_CODING[template])
    refpix = list(_REF_REFERENCE[template])
    if template == 0:
        coding.append(at[0])
        refpix.append(at[1])
    h, w = bitmap.shape
    rows = [r.tolist() for r in bitmap]
    refl = [r.tolist() for r in np.asarray(ref)]
    rh, rw = ref.shape
    ltp = 0
    tp_ctx = base + _TPGRON_CTX[template]
    for y in range(h):
        typ = [None] * w
        if tpgron:
            row_typical = 1
            for x in range(w):
                tv = _ref_typical(refl, y - dy, x - dx)
                typ[x] = tv
                if tv is not None and tv != rows[y][x]:
                    row_typical = 0
                    break
            encode(tp_ctx, row_typical ^ ltp)
            ltp = row_typical
        for x in range(w):
            if ltp and typ[x] is not None:
                continue                     # decoder copies from ref
            ctx = 0
            for dy_, dx_ in coding:
                yy, xx = y + dy_, x + dx_
                ctx = (ctx << 1) | (rows[yy][xx]
                                    if 0 <= yy < h and 0 <= xx < w
                                    else 0)
            for dy_, dx_ in refpix:
                yy, xx = y - dy + dy_, x - dx + dx_
                ctx = (ctx << 1) | (refl[yy][xx]
                                    if 0 <= yy < rh and 0 <= xx < rw
                                    else 0)
            encode(base + ctx, rows[y][x])


# --------------------------------------- arithmetic integer coding (A.2/A.3)
#
# Each IAx procedure owns 512 MQ contexts reached through the PREV
# chaining (capped at 9 bits); IAID owns 2^(SYMCODELEN+1).  All share
# the segment's single MQ decoder — bases partition one context array.

_IA_SIZE = 512


def _make_int_decode(decode, base):
    """A.2 integer decoding bound to context block ``base``; returns a
    callable yielding an int or None for OOB."""
    def dec():
        prev = 1
        b = decode(base + prev)
        prev = (prev << 1) | b
        s = b
        b = decode(base + prev)
        prev = (prev << 1) | b
        if not b:
            n, off = 2, 0
        else:
            b = decode(base + prev)
            prev = (prev << 1) | b
            if not b:
                n, off = 4, 4
            else:
                b = decode(base + prev)
                prev = (prev << 1) | b
                if not b:
                    n, off = 6, 20
                else:
                    b = decode(base + prev)
                    prev = (prev << 1) | b
                    if not b:
                        n, off = 8, 84
                    else:
                        b = decode(base + prev)
                        prev = (prev << 1) | b
                        n, off = (12, 340) if not b else (32, 4436)
        v = 0
        for _ in range(n):
            b = decode(base + prev)
            prev = ((prev << 1) | b) if prev < 256 else \
                ((((prev << 1) | b) & 511) | 256)
            v = (v << 1) | b
        v += off
        if s:
            return None if v == 0 else -v    # s=1, v=0 encodes OOB
        return v
    return dec


def _make_int_encode(encode, base):
    """Mirror of `_make_int_decode` (v=None encodes OOB)."""
    def enc(v):
        if v is None:
            s, mag = 1, 0
        elif v < 0:
            s, mag = 1, -v
        else:
            s, mag = 0, v
        if mag < 4:
            sel, n, off = (0,), 2, 0
        elif mag < 20:
            sel, n, off = (1, 0), 4, 4
        elif mag < 84:
            sel, n, off = (1, 1, 0), 6, 20
        elif mag < 340:
            sel, n, off = (1, 1, 1, 0), 8, 84
        elif mag < 4436:
            sel, n, off = (1, 1, 1, 1, 0), 12, 340
        else:
            sel, n, off = (1, 1, 1, 1, 1), 32, 4436
        prev = 1

        def put(b):
            nonlocal prev
            encode(base + prev, b)
            prev = ((prev << 1) | b) if prev < 256 else \
                ((((prev << 1) | b) & 511) | 256)

        put(s)
        for b in sel:
            put(b)
        val = mag - off
        for k in range(n - 1, -1, -1):
            put((val >> k) & 1)
    return enc


def _iaid_decode(decode, base, codelen):
    """A.3: symbol-ID decoding (codelen bits through a tree of
    contexts); codelen 0 (single symbol) reads nothing."""
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | decode(base + prev)
    return prev - (1 << codelen)


def _iaid_encode(encode, base, codelen, sid):
    prev = 1
    for k in range(codelen - 1, -1, -1):
        b = (sid >> k) & 1
        encode(base + prev, b)
        prev = (prev << 1) | b


# --------------------------------- halftone regions (§6.6) + patterns (§6.7)

def _pattern_dict_at(template: int, hdpw: int):
    """Pattern-dictionary AT pixels (§6.7.5.2): A1 = (0, -HDPW) ties
    each pattern's context to the previous pattern in the collective
    bitmap; A2-A4 (template 0) keep their nominal generic values."""
    if template == 0:
        return ((0, -hdpw), (-1, -3), (-2, 2), (-2, -2))
    return ((0, -hdpw),)


def _decode_pattern_dict(seg: bytes, max_pixels: int):
    """§6.7: one collective generic region of (GRAYMAX+1) patterns
    side by side, then split.  Returns the pattern list."""
    if len(seg) < 7:
        raise Jbig2Error("truncated pattern dictionary")
    flags = seg[0]
    mmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = seg[1], seg[2]
    graymax = _u32(seg, 3)
    if hdpw == 0 or hdph == 0:
        raise Jbig2Error("zero pattern size")
    if graymax > 10_000:
        raise Jbig2Error("implausible GRAYMAX")
    cw = (graymax + 1) * hdpw
    if cw * hdph > max_pixels:
        raise Jbig2Error("pattern dictionary exceeds max_pixels")
    if mmr:
        from .ccittcodec import CcittError, decode_g4
        try:
            coll = decode_g4(seg[7:], cw, hdph)
        except CcittError as exc:
            raise Jbig2Error(f"bad MMR pattern dict: {exc}") from exc
    else:
        coll = _generic_region(seg[7:], cw, hdph, template,
                               _pattern_dict_at(template, hdpw),
                               False)
    return [coll[:, k * hdpw:(k + 1) * hdpw].copy()
            for k in range(graymax + 1)]


def _halftone_skip(hgw, hgh, hgx, hgy, hrx, hry, hpw, hph,
                   rw, rh) -> np.ndarray:
    """HSKIP (§6.6.5.1): grid cells whose pattern placement lies
    entirely outside the region — their grayscale bits are never
    coded (USESKIP in the bitplane decode)."""
    mg = np.arange(hgh)[:, None]
    ng = np.arange(hgw)[None, :]
    x = (hgx + mg * hry + ng * hrx) >> 8
    y = (hgy + mg * hrx - ng * hry) >> 8
    out = ((x + hpw <= 0) | (x >= rw)
           | (y + hph <= 0) | (y >= rh))
    return out.astype(np.uint8)


def _decode_halftone(seg: bytes, patterns: list, max_pixels: int):
    """§6.6: grayscale image via Annex-C gray-coded bitplanes (all
    planes share one MQ decoder + context), then one pattern stamped
    per grid cell.  Returns (region bitmap, x, y, external comb)."""
    if len(seg) < 38:
        raise Jbig2Error("truncated halftone region")
    if not patterns:
        raise Jbig2Error("halftone region without patterns")
    rw, rh = _u32(seg, 0), _u32(seg, 4)
    rx, ry = _u32(seg, 8), _u32(seg, 12)
    ext_comb = seg[16] & 7
    flags = seg[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    combop = (flags >> 4) & 7
    defpix = (flags >> 7) & 1
    hgw, hgh = _u32(seg, 18), _u32(seg, 22)
    hgx = int.from_bytes(seg[26:30], "big", signed=True)
    hgy = int.from_bytes(seg[30:34], "big", signed=True)
    hrx, hry = _u16(seg, 34), _u16(seg, 36)
    if rw * rh > max_pixels or hgw * hgh > max_pixels:
        raise Jbig2Error("halftone region exceeds max_pixels")
    bits = max(len(patterns) - 1, 0).bit_length()
    if mmr:
        # C.5 HMMR=1: bitplanes in ONE MMR stream; per-plane EOFB
        # terminators (the pdf.js/jbig2dec interop layout) and the
        # bare concatenation both decode; USESKIP is an
        # arithmetic-path feature and does not apply here.
        from .ccittcodec import CcittError, decode_g4_planes
        try:
            planes = decode_g4_planes(seg[38:], hgw, hgh, bits,
                                      max_pixels=max_pixels)
        except CcittError as exc:
            raise Jbig2Error(f"bad MMR grayscale: {exc}") from exc
    else:
        at = _NOMINAL_AT[template]
        hph_, hpw_ = patterns[0].shape
        hskip = (_halftone_skip(hgw, hgh, hgx, hgy, hrx, hry,
                                hpw_, hph_, rw, rh)
                 if enable_skip else None)
        # all planes share one MQ coder + context (C.5, MSB first):
        # the compiled session carries the coder state across planes
        planes = None
        ses = _cnative.generic_session(seg[38:])
        if ses is not None:
            try:
                planes = [ses.decode_generic(hgw, hgh, template, at,
                                             False, skip=hskip)
                          for _ in range(bits)]
            except _cnative.NativeError:
                planes = None
        if planes is None:
            states = [0] * 65536
            mps = [0] * 65536
            decode = _mq_decode_fn(seg[38:], states, mps)
            planes = [_decode_generic(decode, hgw, hgh, template, at,
                                      False, skip=hskip)
                      for _ in range(bits)]
    # Gray decode: bit_j = plane_j ^ bit_{j+1}
    value = np.zeros((hgh, hgw), dtype=np.int64)
    bit = np.zeros((hgh, hgw), dtype=np.uint8)
    for plane in planes:
        bit = plane ^ bit
        value = (value << 1) | bit
    if int(value.max(initial=0)) >= len(patterns):
        raise Jbig2Error("gray value beyond pattern dictionary")
    hph, hpw = patterns[0].shape
    bitmap = np.full((rh, rw), defpix, dtype=np.uint8)
    # Fast path: the ubiquitous axis-aligned seamless grid (vector
    # (pitch, 0) with pitch == the square pattern size, whole-pixel
    # anchor).  Cells are disjoint and tile the grid block, so one
    # array assembly + one clipped combine is cell-for-cell identical
    # to the placement loop below (which remains the general path for
    # skewed/overlapping grids).
    if (hry == 0 and hrx == (hpw << 8) and hph == hpw
            and hgx % 256 == 0 and hgy % 256 == 0):
        pats_arr = np.stack(patterns)
        tile = (pats_arr[value]                  # (hgh, hgw, ph, pw)
                .transpose(0, 2, 1, 3)
                .reshape(hgh * hph, hgw * hpw))
        y0, x0 = hgy >> 8, hgx >> 8
        ys, xs = max(y0, 0), max(x0, 0)
        ye = min(y0 + tile.shape[0], rh)
        xe = min(x0 + tile.shape[1], rw)
        if ye > ys and xe > xs:
            src = tile[ys - y0:ye - y0, xs - x0:xe - x0]
            tgt = bitmap[ys:ye, xs:xe]
            if combop == 0:
                tgt |= src
            elif combop == 1:
                tgt &= src
            elif combop == 2:
                tgt ^= src
            elif combop == 3:
                tgt[...] = 1 - (tgt ^ src)
            else:
                tgt[...] = src
        return bitmap, rx, ry, ext_comb
    for mg in range(hgh):
        for ng in range(hgw):
            # §6.6.5.1 grid placement, 1/256-pixel fixed point
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            pat = patterns[int(value[mg, ng])]
            ys, xs = max(y, 0), max(x, 0)
            ye, xe = min(y + hph, rh), min(x + hpw, rw)
            if ye <= ys or xe <= xs:
                continue
            src = pat[ys - y:ye - y, xs - x:xe - x]
            tgt = bitmap[ys:ye, xs:xe]
            if combop == 0:
                tgt |= src
            elif combop == 1:
                tgt &= src
            elif combop == 2:
                tgt ^= src
            elif combop == 3:
                tgt[...] = 1 - (tgt ^ src)
            else:
                tgt[...] = src
    return bitmap, rx, ry, ext_comb


def _encode_generic_at(encode, bitmap: np.ndarray, template: int,
                       at) -> None:
    """General-path generic encoder for non-nominal AT pixels (the
    pattern dictionary's A1 = (0, -HDPW)); mirrors `_decode_generic`'s
    gather path."""
    h, w = bitmap.shape
    pix = _sorted_template(template, at)
    rows = [r.tolist() for r in bitmap]
    for y in range(h):
        for x in range(w):
            ctx = 0
            for dy, dx in pix:
                yy, xx = y + dy, x + dx
                ctx = (ctx << 1) | (rows[yy][xx]
                                    if 0 <= yy < h and 0 <= xx < w
                                    else 0)
            encode(ctx, rows[y][x])


def encode_jbig2_aggregate(members, agg_size, agg_placements,
                           placements, w: int, h: int,
                           template: int = 0) -> bytes:
    """Aggregate-symbol JBIG2 (§6.5.8.2.1, REFAGGNINST > 1): two
    symbol dictionaries — a plain one defining ``members`` (list of
    {0,1} bitmaps), then an SDREFAGG=1 dictionary whose single new
    glyph of shape ``agg_size`` = (ah, aw) is a NESTED TEXT REGION
    placing members at ``agg_placements`` [(member_idx, dx, dy)
    top-left offsets] — and a page text region placing the composite
    at ``placements`` [(x, y)].  Lossless: ``decode_jbig2``
    reproduces the OR of the member stamps at every placement."""
    ms = [(np.asarray(g) != 0).astype(np.uint8) for g in members]
    if not ms or not agg_placements or not placements:
        raise ValueError("members, agg_placements and placements "
                         "must be non-empty")
    ah, aw = agg_size
    for mi, dx, dy in agg_placements:
        mh, mw = ms[mi].shape
        if not (0 <= dx and dx + mw <= aw and 0 <= dy
                and dy + mh <= ah):
            raise ValueError("member placement outside aggregate")
    for x, y in placements:
        if not (0 <= x and x + aw <= w and 0 <= y and y + ah <= h):
            raise ValueError("aggregate placement outside page")

    # ---- dict A: plain, exports the members (height-class order)
    order = sorted(range(len(ms)), key=lambda k: (ms[k].shape[0], k))
    exp_id = {orig: e for e, orig in enumerate(order)}
    nctx = 65536 + 3 * _IA_SIZE
    st, mp = [0] * nctx, [0] * nctx
    enc, flush = _mq_encode_fns(st, mp)
    iadh = _make_int_encode(enc, 65536)
    iadw = _make_int_encode(enc, 65536 + _IA_SIZE)
    iaex = _make_int_encode(enc, 65536 + 2 * _IA_SIZE)
    hc = 0
    i = 0
    while i < len(order):
        gh = ms[order[i]].shape[0]
        iadh(gh - hc)
        hc = gh
        sw = 0
        while i < len(order) and ms[order[i]].shape[0] == hc:
            g = ms[order[i]]
            iadw(g.shape[1] - sw)
            sw = g.shape[1]
            _encode_generic(enc, g, template, False)
            i += 1
        iadw(None)
    iaex(0)
    iaex(len(order))
    dict_a = (((template << 10)).to_bytes(2, "big"))
    for ay, ax in _NOMINAL_AT[template]:
        dict_a += ax.to_bytes(1, "big", signed=True)
        dict_a += ay.to_bytes(1, "big", signed=True)
    dict_a += len(order).to_bytes(4, "big")
    dict_a += len(order).to_bytes(4, "big")
    dict_a += flush()

    # ---- dict B: SDREFAGG=1, one aggregate glyph via nested text
    codelen = len(ms).bit_length()           # insyms + 1 new - 1
    nctx = 65536 + 13 * _IA_SIZE
    b_iaid = nctx
    nctx += 1 << (codelen + 1)
    b_ref = nctx
    nctx += _REF_CTX_SIZE
    st2, mp2 = [0] * nctx, [0] * nctx
    enc2, flush2 = _mq_encode_fns(st2, mp2)
    iadh2 = _make_int_encode(enc2, 65536)
    iadw2 = _make_int_encode(enc2, 65536 + _IA_SIZE)
    iaex2 = _make_int_encode(enc2, 65536 + 2 * _IA_SIZE)
    iaai2 = _make_int_encode(enc2, 65536 + 3 * _IA_SIZE)
    iadt2 = _make_int_encode(enc2, 65536 + 6 * _IA_SIZE)
    iafs2 = _make_int_encode(enc2, 65536 + 7 * _IA_SIZE)
    iads2 = _make_int_encode(enc2, 65536 + 8 * _IA_SIZE)
    iari2 = _make_int_encode(enc2, 65536 + 10 * _IA_SIZE)
    iadh2(ah)
    iadw2(aw)
    iaai2(len(agg_placements))
    # nested text region: strips=1, TL, OR, SBREFINE=1 (Table 17)
    inst = sorted((dy, dx, exp_id[mi])
                  for mi, dx, dy in agg_placements)
    iadt2(0)                                 # STRIPT = 0
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][0]
        iadt2(t - prev_t)
        prev_t = t
        _t, s0, sid = inst[k]
        iafs2(s0 - firsts)
        firsts = s0
        _iaid_encode(enc2, b_iaid, codelen, sid)
        iari2(0)
        curs = s0 + ms[order[sid]].shape[1] - 1
        k += 1
        while k < len(inst) and inst[k][0] == t:
            _t2, s2, sid2 = inst[k]
            iads2(s2 - curs)
            _iaid_encode(enc2, b_iaid, codelen, sid2)
            iari2(0)
            curs = s2 + ms[order[sid2]].shape[1] - 1
            k += 1
        iads2(None)
    iadw2(None)                              # end of height class
    iaex2(len(ms))                           # skip the input symbols
    iaex2(1)                                 # export the aggregate
    flags_b = (template << 10) | 2           # SDREFAGG
    dict_b = flags_b.to_bytes(2, "big")
    for ay, ax in _NOMINAL_AT[template]:
        dict_b += ax.to_bytes(1, "big", signed=True)
        dict_b += ay.to_bytes(1, "big", signed=True)
    for ay, ax in _REF_NOMINAL_AT:           # SDRAT (rtemplate 0)
        dict_b += ax.to_bytes(1, "big", signed=True)
        dict_b += ay.to_bytes(1, "big", signed=True)
    dict_b += (1).to_bytes(4, "big")         # SDNUMEXSYMS
    dict_b += (1).to_bytes(4, "big")         # SDNUMNEWSYMS
    dict_b += flush2()

    # ---- page text region placing the aggregate (symbol id 0: dict
    # B's export is the region's only referred symbol)
    st3, mp3 = [0] * (4 * _IA_SIZE + 2), [0] * (4 * _IA_SIZE + 2)
    enc3, flush3 = _mq_encode_fns(st3, mp3)
    iadt3 = _make_int_encode(enc3, 0)
    iafs3 = _make_int_encode(enc3, _IA_SIZE)
    iads3 = _make_int_encode(enc3, 2 * _IA_SIZE)
    b_iaid3 = 4 * _IA_SIZE
    pinst = sorted((y, x) for x, y in placements)
    iadt3(0)
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(pinst):
        t = pinst[k][0]
        iadt3(t - prev_t)
        prev_t = t
        _t, x0 = pinst[k]
        iafs3(x0 - firsts)
        firsts = x0
        _iaid_encode(enc3, b_iaid3, 0, 0)
        curs = x0 + aw - 1
        k += 1
        while k < len(pinst) and pinst[k][0] == t:
            _t2, x2 = pinst[k]
            iads3(x2 - curs)
            _iaid_encode(enc3, b_iaid3, 0, 0)
            curs = x2 + aw - 1
            k += 1
        iads3(None)
    tr_payload = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                  + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                  + b"\x00"
                  + (1 << 4).to_bytes(2, "big")    # TL corner
                  + len(pinst).to_bytes(4, "big") + flush3())

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + b"\x01" + (0).to_bytes(2, "big"))
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 0, 1, dict_a)
            + _segment(2, 0, 1, dict_b, refs=(1,))
            + _segment(3, 7, 1, tr_payload, refs=(2,))
            + _segment(4, 49, 1, b""))


def encode_jbig2_halftone(gray, patterns, template: int = 0,
                          pitch: int | None = None,
                          grid_offset: tuple = (0, 0),
                          enable_skip: bool = False,
                          mmr: bool = False) -> bytes:
    """Encode a halftone page: pattern dictionary (§6.7) + immediate
    lossless halftone region (§6.6) + end of page.  ``gray`` is an
    (HGH, HGW) array of pattern indices; ``patterns`` a list of equal-
    shape {0,1} cells; ``pitch`` the grid spacing in pixels (defaults
    to the pattern width).  Lossless: ``decode_jbig2`` reproduces the
    OR-stamped grid exactly.

    ``grid_offset`` = (HGX, HGY) in whole pixels (may be negative —
    cells then fall partly or fully outside the region and clip);
    ``enable_skip=True`` sets HENABLESKIP and omits the grayscale bits
    of fully-outside cells from the bitstream (USESKIP, §6.6.5.1) —
    the decoder recomputes the same HSKIP and stays in sync.
    ``mmr=True`` codes both the pattern dictionary (HDMMR) and the
    gray-code bitplanes (HMMR, one continuous T.6 stream per C.5)
    with MMR instead of arithmetic; USESKIP is arithmetic-only, so
    the combination with ``enable_skip`` is rejected."""
    if mmr and enable_skip:
        raise ValueError("HENABLESKIP is arithmetic-only (no MMR)")
    pats = [(np.asarray(p) != 0).astype(np.uint8) for p in patterns]
    if not pats:
        raise ValueError("no patterns")
    hph, hpw = pats[0].shape
    if any(p.shape != (hph, hpw) for p in pats):
        raise ValueError("patterns must share one shape")
    if not (0 < hpw < 256 and 0 < hph < 256):
        raise ValueError("pattern dims must fit one byte")
    g = np.asarray(gray, dtype=np.int64)
    if g.ndim != 2 or g.min(initial=0) < 0 \
            or g.max(initial=0) >= len(pats):
        raise ValueError("gray values must index the pattern list")
    hgh, hgw = g.shape
    pitch = hpw if pitch is None else pitch
    if not 0 < pitch < 256:
        raise ValueError("pitch must fit the 8.8 grid vector")
    graymax = len(pats) - 1

    # ---- pattern dictionary (type 16): collective bitmap
    coll = np.concatenate(pats, axis=1)
    if mmr:
        from .ccittcodec import encode_g4
        pd_data = encode_g4(coll)
        pd_flags = 1
    else:
        pd_data = _mq_region_codeword(
            [(coll, template, _pattern_dict_at(template, hpw), False,
              None)])
        pd_flags = template << 1
    pd_payload = (bytes((pd_flags,)) + bytes((hpw, hph))
                  + graymax.to_bytes(4, "big") + pd_data)

    # ---- halftone region (type 23)
    w = (hgw - 1) * pitch + hpw
    h = (hgh - 1) * pitch + hph
    gx, gy = grid_offset
    hskip = None
    if enable_skip:
        hskip = _halftone_skip(hgw, hgh, gx << 8, gy << 8,
                               pitch << 8, 0, hpw, hph, w, h)
        g = np.where(hskip != 0, 0, g)       # uncoded cells decode to 0
    bits = max(graymax, 0).bit_length()
    planes = []
    bit = np.zeros((hgh, hgw), dtype=np.uint8)
    for j in range(bits - 1, -1, -1):        # MSB first
        b = ((g >> j) & 1).astype(np.uint8)
        planes.append(b ^ bit)               # Gray encode
        bit = b
    if mmr:
        from .ccittcodec import encode_g4_planes
        gray_data = encode_g4_planes(planes)
    else:
        gray_data = _mq_region_codeword(
            [(plane, template, None, False, hskip)
             for plane in planes])
    ht_flags = ((1 if mmr else 0) | (template << 1)
                | ((1 << 3) if enable_skip else 0))
    ht_payload = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                  + bytes(8)
                  + b"\x00"                  # external comb op OR
                  + bytes((ht_flags,))       # HMMR + template + skip, OR
                  + hgw.to_bytes(4, "big") + hgh.to_bytes(4, "big")
                  + (gx << 8).to_bytes(4, "big", signed=True)
                  + (gy << 8).to_bytes(4, "big", signed=True)
                  + (pitch << 8).to_bytes(2, "big")
                  + (0).to_bytes(2, "big")
                  + gray_data)

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + bytes(8) + b"\x01" + bytes(2))
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 16, 1, pd_payload)
            + _segment(2, 23, 1, ht_payload, refs=(1,))
            + _segment(3, 49, 1, b""))


# ------------------------------------ symbol dictionary + text region

def _decode_symbol_dict(seg: bytes, max_pixels: int, insyms=None):
    """§6.5, arithmetic path (SDHUFF=0): height classes ascending,
    widths as deltas (OOB ends a class), each glyph decoded by the
    generic procedure with contexts and the MQ coder SHARED across the
    whole segment; export runs select the output symbols over input +
    new symbols.  SDREFAGG=1 with REFAGGNINST=1 decodes new glyphs as
    refinements of existing ones (§6.5.8.2 — jbig2enc's ``-r`` shape);
    REFAGGNINST>1 decodes the glyph as a nested text region over the
    symbols so far (§6.5.8.2.1, Table-17 parameters, late round 7)."""
    if len(seg) < 2:
        raise Jbig2Error("truncated symbol dictionary")
    insyms = insyms or []
    flags = _u16(seg, 0)
    if flags & 1:
        raise Jbig2Error("Huffman symbol dictionary unsupported")
    refagg = bool(flags & 2)
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    i = 2
    n_at = 4 if template == 0 else 1
    at = []
    for _ in range(n_at):
        ax = int.from_bytes(seg[i:i + 1], "big", signed=True)
        ay = int.from_bytes(seg[i + 1:i + 2], "big", signed=True)
        at.append((ay, ax))
        i += 2
    rat = list(_REF_NOMINAL_AT)
    if refagg and rtemplate == 0:            # SDRAT (§7.4.3.1.3)
        rat = []
        for _ in range(2):
            ax = int.from_bytes(seg[i:i + 1], "big", signed=True)
            ay = int.from_bytes(seg[i + 1:i + 2], "big", signed=True)
            rat.append((ay, ax))
            i += 2
    numex = _u32(seg, i)
    numnew = _u32(seg, i + 4)
    i += 8
    if numnew > 100_000 or numex > 100_000:
        raise Jbig2Error("implausible symbol counts")
    area_budget = max_pixels                 # cumulative glyph area cap
    # SBSYMCODELEN over input + new symbols (§6.5.8.2.3)
    codelen = max(len(insyms) + numnew - 1, 0).bit_length()
    # IA slots 0-5 always; 6-12 are the Table-17 text-region contexts
    # a REFAGGNINST>1 aggregate shares across the whole dictionary
    nctx = 65536 + (13 if refagg else 6) * _IA_SIZE
    b_iaid = nctx
    nctx += 1 << (codelen + 1)
    b_ref = nctx
    nctx += _REF_CTX_SIZE if refagg else 0
    states = [0] * nctx
    mps = [0] * nctx
    decode = _mq_decode_fn(seg[i:], states, mps)
    iadh = _make_int_decode(decode, 65536)
    iadw = _make_int_decode(decode, 65536 + _IA_SIZE)
    iaex = _make_int_decode(decode, 65536 + 2 * _IA_SIZE)
    iaai = _make_int_decode(decode, 65536 + 3 * _IA_SIZE)
    iardx = _make_int_decode(decode, 65536 + 4 * _IA_SIZE)
    iardy = _make_int_decode(decode, 65536 + 5 * _IA_SIZE)
    agg_pos = agg_ref = None
    if refagg:
        agg_pos = tuple(_make_int_decode(decode, 65536 + k * _IA_SIZE)
                        for k in (6, 7, 8, 9))   # IADT/IAFS/IADS/IAIT
        agg_ref = (_make_int_decode(decode, 65536 + 10 * _IA_SIZE),
                   _make_int_decode(decode, 65536 + 11 * _IA_SIZE),
                   _make_int_decode(decode, 65536 + 12 * _IA_SIZE),
                   iardx, iardy)                 # IARI/IARDW/IARDH/+
    symbols = []
    hc = 0
    classes = 0
    while len(symbols) < numnew:
        classes += 1
        if classes > numnew + 1:
            # garbage data can decode valid (dh, OOB) pairs forever
            # once the MQ feeds past-end 0xFF — empty height classes
            # cannot outnumber the declared symbols (fuzz-found hang)
            raise Jbig2Error("runaway height classes")
        dh = iadh()
        if dh is None:
            raise Jbig2Error("OOB height-class delta")
        hc += dh
        if hc <= 0:
            raise Jbig2Error("non-positive symbol height")
        sw = 0
        while True:
            dw = iadw()
            if dw is None:
                break                        # end of height class
            sw += dw
            if sw <= 0 or sw * hc > max_pixels:
                raise Jbig2Error("bad symbol dims")
            area_budget -= sw * hc
            if area_budget < 0:
                # a few-hundred-byte stream may not demand unbounded
                # decode work (slow-loop bomb guard, fuzz-found)
                raise Jbig2Error("symbol areas exceed max_pixels")
            if len(symbols) >= numnew:
                raise Jbig2Error("more symbols than declared")
            if refagg:
                ninst_agg = iaai()
                if ninst_agg is None or ninst_agg <= 0 \
                        or ninst_agg > min(sw * hc + 1, 10_000_000):
                    raise Jbig2Error("bad aggregate instance count")
                if ninst_agg == 1:
                    # §6.5.8.2.2 shortcut: one refinement, no nested
                    # text region
                    sid = _iaid_decode(decode, b_iaid, codelen)
                    allsyms = insyms + symbols
                    if not 0 <= sid < len(allsyms):
                        raise Jbig2Error("refinement symbol id out of "
                                         "range")
                    rdx = iardx()
                    rdy = iardy()
                    if rdx is None or rdy is None:
                        raise Jbig2Error("bad refinement offset")
                    symbols.append(_decode_refinement(
                        decode, sw, hc, rtemplate, rat, allsyms[sid],
                        rdx, rdy, False, base=b_ref))
                else:
                    # §6.5.8.2.1: the glyph is a nested text region
                    # over the symbols decoded so far, with Table-17
                    # fixed parameters and the dictionary's contexts
                    allsyms = insyms + symbols
                    if not allsyms:
                        raise Jbig2Error(
                            "aggregate before any symbol")
                    symbols.append(_text_body(
                        decode, agg_pos, agg_ref, allsyms, sw, hc,
                        ninst_agg, 1, 1, 0, 0, 0, 0, True,
                        rtemplate, rat, codelen, b_iaid, b_ref,
                        max_pixels))
            else:
                symbols.append(
                    _decode_generic(decode, sw, hc, template, at,
                                    False))
    allsyms = insyms + symbols
    ex = []
    flag = 0
    runs = 0
    while len(ex) < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 2:      # zero-runs forever: hang
            raise Jbig2Error("runaway export runs")
        run = iaex()
        if run is None or run < 0 or len(ex) + run > len(allsyms):
            raise Jbig2Error("bad export run")
        ex.extend([flag] * run)
        flag ^= 1
    exported = [s for s, f in zip(allsyms, ex) if f]
    if len(exported) != numex:
        raise Jbig2Error("export count mismatch")
    return exported


def _decode_text_region(seg: bytes, syms: list, max_pixels: int):
    """§6.4, arithmetic path (SBHUFF=0, TRANSPOSED=0): strip-ordered
    symbol instances placed by (S, T) deltas; SBREFINE instances may
    replace their symbol with an in-stream refinement (§6.4.11).
    Returns (region bitmap, x, y, external comb op)."""
    if len(seg) < 23:
        raise Jbig2Error("truncated text region")
    rw, rh = _u32(seg, 0), _u32(seg, 4)
    rx, ry = _u32(seg, 8), _u32(seg, 12)
    ext_comb = seg[16] & 7
    flags = _u16(seg, 17)
    if flags & 1:
        raise Jbig2Error("Huffman text region unsupported")
    refine = bool((flags >> 1) & 1)
    strips = 1 << ((flags >> 2) & 3)
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    combop = (flags >> 7) & 3
    defpix = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    rtemplate = (flags >> 15) & 1
    i = 19
    rat = list(_REF_NOMINAL_AT)
    if refine and rtemplate == 0:            # SBRAT (§7.4.4.1.2)
        rat = []
        for _ in range(2):
            ax = int.from_bytes(seg[i:i + 1], "big", signed=True)
            ay = int.from_bytes(seg[i + 1:i + 2], "big", signed=True)
            rat.append((ay, ax))
            i += 2
    if len(seg) < i + 4:
        raise Jbig2Error("truncated text region")
    ninst = _u32(seg, i)
    i += 4
    if rw * rh > max_pixels or ninst > min(rw * rh + 1, 10_000_000):
        # one instance per pixel is already absurd for real text, and
        # a huge declared count (with a big OR tiny region) is a
        # slow-loop bomb — keep the absolute ceiling too
        raise Jbig2Error("implausible text region")
    numsyms = len(syms)
    if numsyms == 0:
        raise Jbig2Error("text region without symbols")
    codelen = max(numsyms - 1, 0).bit_length()
    n_ia = 9 if refine else 4
    nctx = n_ia * _IA_SIZE
    b_iaid = nctx
    nctx += 1 << (codelen + 1)
    b_ref = nctx
    nctx += _REF_CTX_SIZE if refine else 0
    states = [0] * nctx
    mps = [0] * nctx
    decode = _mq_decode_fn(seg[i:], states, mps)
    iadt = _make_int_decode(decode, 0)
    iafs = _make_int_decode(decode, _IA_SIZE)
    iads = _make_int_decode(decode, 2 * _IA_SIZE)
    iait = _make_int_decode(decode, 3 * _IA_SIZE)
    ia = None
    if refine:
        ia = (_make_int_decode(decode, 4 * _IA_SIZE),
              _make_int_decode(decode, 5 * _IA_SIZE),
              _make_int_decode(decode, 6 * _IA_SIZE),
              _make_int_decode(decode, 7 * _IA_SIZE),
              _make_int_decode(decode, 8 * _IA_SIZE))
    bitmap = _text_body(
        decode, (iadt, iafs, iads, iait), ia, syms, rw, rh, ninst,
        strips, refcorner, transposed, combop, defpix, dsoffset,
        refine, rtemplate, rat, codelen, b_iaid, b_ref, max_pixels)
    return bitmap, rx, ry, ext_comb


def _text_body(decode, pos_ia, ref_ia, syms, rw, rh, ninst, strips,
               refcorner, transposed, combop, defpix, dsoffset,
               refine, rtemplate, rat, codelen, b_iaid, b_ref,
               max_pixels):
    """The §6.4.5 strip-placement loop, shared by standalone text
    regions and REFAGGNINST>1 aggregate symbols in a dictionary
    (§6.5.8.2.1 invokes this procedure with the dictionary's own
    persistent integer contexts and Table-17 fixed parameters)."""
    iadt, iafs, iads, iait = pos_ia
    if refine:
        iari, iardw, iardh, iardx, iardy = ref_ia
    numsyms = len(syms)
    bitmap = np.full((rh, rw), defpix, dtype=np.uint8)

    dt0 = iadt()
    if dt0 is None:
        raise Jbig2Error("bad STRIPT")
    stript = -dt0 * strips
    firsts = 0
    inst = 0
    while inst < ninst:
        dt = iadt()
        if dt is None:
            raise Jbig2Error("bad strip delta")
        stript += dt * strips
        dfs = iafs()
        if dfs is None:
            raise Jbig2Error("bad first-S delta")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = iads()
                if ids is None:
                    break                    # end of strip
                curs += ids + dsoffset
            first = False
            if inst >= ninst:
                raise Jbig2Error("more instances than declared")
            curt = 0 if strips == 1 else iait()
            if curt is None:
                raise Jbig2Error("bad T offset")
            t = stript + curt
            sid = _iaid_decode(decode, b_iaid, codelen)
            if not 0 <= sid < numsyms:
                raise Jbig2Error("symbol id out of range")
            sb = syms[sid]
            hs, ws = sb.shape
            if refine:
                ri = iari()
                if ri is None:
                    raise Jbig2Error("bad refinement flag")
                if ri:
                    rdw, rdh = iardw(), iardh()
                    rdx, rdy = iardx(), iardy()
                    if None in (rdw, rdh, rdx, rdy):
                        raise Jbig2Error("bad refinement deltas")
                    ws2, hs2 = ws + rdw, hs + rdh
                    if (ws2 <= 0 or hs2 <= 0
                            or ws2 * hs2 > max_pixels):
                        raise Jbig2Error("bad refined instance dims")
                    # §6.4.11: GRREFERENCEDX/DY centre the old symbol
                    # in the refined bitmap, then shift by RDX/RDY
                    sb = _decode_refinement(
                        decode, ws2, hs2, rtemplate, rat, sb,
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy, False,
                        base=b_ref)
                    hs, ws = hs2, ws2
            if transposed:
                # §6.4.5 (viii)/(xi): S runs down the page, T across;
                # the advance-before rule for BOTTOM corners makes the
                # S span [CURS, CURS+HI-1] for every corner, and the
                # L/R bit places the T edge
                y0 = curs
                x0 = t if refcorner in (0, 1) else t - ws + 1
            else:
                y0 = t if refcorner in (1, 3) else t - hs + 1
                x0 = curs
            # clip to the region (conformant streams stay inside)
            ys, xs = max(y0, 0), max(x0, 0)
            ye, xe = min(y0 + hs, rh), min(x0 + ws, rw)
            if ye > ys and xe > xs:
                src = sb[ys - y0:ye - y0, xs - x0:xe - x0]
                tgt = bitmap[ys:ye, xs:xe]
                if combop == 0:
                    tgt |= src
                elif combop == 1:
                    tgt &= src
                elif combop == 2:
                    tgt ^= src
                else:
                    tgt[...] = 1 - (tgt ^ src)
            curs += (hs if transposed else ws) - 1
            inst += 1
    return bitmap


# ------------------------------------------------------ segment layer

def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 4], "big")


def _u16(b: bytes, i: int) -> int:
    return int.from_bytes(b[i:i + 2], "big")


def _parse_segment_header(data: bytes, pos: int):
    """T.88 §7.2: returns (segnum, seg_type, refs, page, data_len,
    hdr_end) — ``refs`` are the referred-to segment numbers (a text
    region names its symbol dictionaries through them)."""
    if pos + 11 > len(data):
        raise Jbig2Error("truncated segment header")
    segnum = _u32(data, pos)
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    i = pos + 5
    rts = data[i]
    if (rts >> 5) == 7:                      # long form (§7.2.4)
        count = _u32(data, i) & 0x1FFFFFFF
        i += 4 + (count + 8) // 8            # retain bits, ceil((n+1)/8)
    else:
        count = rts >> 5
        i += 1
    ref_size = 1 if segnum <= 256 else (2 if segnum <= 65536 else 4)
    if i + count * ref_size > len(data):
        # a mutated long-form count can claim ~2^29 refs; each needs
        # at least ref_size real bytes (list-building bomb, fuzz-found)
        raise Jbig2Error("referred-segment list overruns stream")
    refs = [int.from_bytes(data[i + k * ref_size:
                                i + (k + 1) * ref_size], "big")
            for k in range(count)]
    i += count * ref_size
    if page_assoc_4:
        page = _u32(data, i)
        i += 4
    else:
        page = data[i]
        i += 1
    data_len = _u32(data, i)
    i += 4
    return segnum, seg_type, refs, page, data_len, i


def decode_jbig2(data: bytes, globals_data: bytes = b"",
                 max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (§7.2 organization, no file
    header — exactly what ``/JBIG2Decode`` carries) to an (h, w) uint8
    bitmap of {0, 1} where 1 = black (the filter's contract).

    ``globals_data`` is the optional ``/JBIG2Globals`` stream; its
    segments are processed first — jbig2enc's symbol coder puts the
    shared symbol dictionaries there, and text regions in ``data``
    refer to them across the stream boundary.

    Contract mirrors the sibling codecs (``decode_baseline`` /
    ``decode_jp2``): malformed, truncated, adversarial, or unsupported
    input raises ``Jbig2Error`` and nothing else, so callers'
    metadata-only fallbacks stay scoped to the one bad image.
    """
    try:
        return _decode_jbig2(data, globals_data, max_pixels)
    except (Jbig2Error, MemoryError):
        raise
    except Exception as exc:  # noqa: BLE001 — contract: Jbig2Error only
        raise Jbig2Error(
            f"malformed JBIG2 ({type(exc).__name__}: {exc})") from exc


def _decode_jbig2(data: bytes, globals_data: bytes,
                  max_pixels: int) -> np.ndarray:
    page_w = page_h = None
    page_default = 0
    bitmap = None
    h_known = True

    def _alloc(w, h, default):
        return np.full((h, w), default, dtype=np.uint8)

    def _compose(region, rx, ry, comb):
        """Place a decoded region onto the page with the external
        combination operator, growing unknown-height pages."""
        nonlocal bitmap, page_h
        rh_, rw_ = region.shape
        if not h_known and page_w * (ry + rh_) > max_pixels:
            # Striped-page bomb guard: a small region (rw*rh within its
            # own cap) placed at a huge ry would otherwise force an
            # arbitrarily large allocation below — mirror the
            # known-height page-info max_pixels check here.
            raise Jbig2Error("striped page grows past max_pixels bound")
        if bitmap is None:
            if not h_known:
                page_h = ry + rh_
                bitmap = _alloc(page_w, page_h, page_default)
            else:
                raise Jbig2Error("region before page info")
        elif not h_known and ry + rh_ > bitmap.shape[0]:
            grown = _alloc(page_w, ry + rh_, page_default)
            grown[:bitmap.shape[0]] = bitmap
            bitmap = grown
        if ry + rh_ > bitmap.shape[0] or rx + rw_ > bitmap.shape[1]:
            raise Jbig2Error("region outside page")
        tgt = bitmap[ry:ry + rh_, rx:rx + rw_]
        if comb == 0:                        # OR
            tgt |= region
        elif comb == 1:                      # AND
            tgt &= region
        elif comb == 2:                      # XOR
            tgt ^= region
        elif comb == 3:                      # XNOR
            tgt[...] = 1 - (tgt ^ region)
        else:                                # REPLACE
            tgt[...] = region

    if data[:8] == FILE_MAGIC:               # standalone file (§9.1)
        if len(data) < 9:
            raise Jbig2Error("truncated file header")
        flags = data[8]
        if flags & 1:                        # sequential organization
            data = data[9 + (0 if flags & 2 else 4):]
        else:
            raise Jbig2Error(
                "random-access file organization unsupported")

    sym_store: dict[int, list] = {}      # segnum -> exported symbols
    pat_store: dict[int, list] = {}      # segnum -> halftone patterns
    aux_store: dict[int, tuple] = {}     # segnum -> intermediate region
    for blob in (globals_data, data):
        pos = 0
        n = len(blob)
        while pos < n:
            (segnum, seg_type, refs, page, data_len,
             body) = _parse_segment_header(blob, pos)
            if data_len == 0xFFFFFFFF:
                # §7.2.7: unknown length is legal only for immediate
                # generic regions; MQ data terminates with FF AC (a
                # pair byte-stuffing can never emit) + 4-byte row
                # count.  MMR unknown-length stays gated: its 00 00
                # terminator can collide with legitimate T.6 bytes
                # and no conformance stream exists here to pin the
                # disambiguation rule.
                if seg_type not in (38, 39):
                    raise Jbig2Error(
                        "unknown length outside generic region")
                rest = blob[body:]
                if len(rest) >= 18 and rest[17] & 1:
                    raise Jbig2Error(
                        "unknown-length MMR region unsupported")
                # search starts PAST the AT-pixel bytes: a legal AT
                # pair like (-1, -84) is itself FF AC (review finding)
                tmpl = (rest[17] >> 1) & 3 if len(rest) >= 18 else 0
                data_start = 18 + (8 if tmpl == 0 else 2)
                term = rest.find(b"\xff\xac", data_start)
                if term < 0 or term + 6 > len(rest):
                    raise Jbig2Error("unterminated unknown-length "
                                     "segment")
                rows = _u32(rest, term + 2)
                seg = rest[:term + 2]
                pos = body + term + 6
                unknown_rows = rows
            else:
                if body + data_len > n:
                    raise Jbig2Error("segment data overruns stream")
                seg = blob[body:body + data_len]
                pos = body + data_len
                unknown_rows = None

            if seg_type == 48:               # page information (§7.4.8)
                if len(seg) < 19:
                    raise Jbig2Error("short page info segment")
                page_w, page_h = _u32(seg, 0), _u32(seg, 4)
                page_default = (seg[16] >> 2) & 1
                if page_h == 0xFFFFFFFF:     # striped page, height later
                    h_known = False
                    bitmap = None
                else:
                    if page_w * page_h > max_pixels:
                        raise Jbig2Error("page exceeds max_pixels bound")
                    bitmap = _alloc(page_w, page_h, page_default)
            elif seg_type in (36, 38, 39):   # generic region
                if page_w is None:
                    raise Jbig2Error("region before page info")
                rw, rh = _u32(seg, 0), _u32(seg, 4)
                rx, ry = _u32(seg, 8), _u32(seg, 12)
                if unknown_rows is not None:
                    # region info declared the height unknown; the
                    # trailing row count is the authority (§7.2.7)
                    if rh not in (0xFFFFFFFF, unknown_rows):
                        raise Jbig2Error("unknown-length height "
                                         "mismatch")
                    rh = unknown_rows
                comb = seg[16] & 7
                gflags = seg[17]
                if gflags & 1:
                    # MMR generic region (7.4.6.2, MMR=1): no AT
                    # pixels, the data IS T.6 — shared with the CCITT
                    # codec (T.88 §6.2.6 delegates to T.4/T.6)
                    from .ccittcodec import CcittError, decode_g4
                    if rw * rh > max_pixels:
                        raise Jbig2Error("region exceeds max_pixels")
                    try:
                        region = decode_g4(seg[18:], rw, rh)
                    except CcittError as exc:
                        raise Jbig2Error(f"bad MMR region: {exc}") \
                            from exc
                    if seg_type == 36:       # intermediate: retained
                        aux_store[segnum] = (region, rx, ry, comb)
                    else:
                        _compose(region, rx, ry, comb)
                    continue
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                i = 18
                n_at = 4 if template == 0 else 1
                at = []
                for _ in range(n_at):
                    ax = int.from_bytes(seg[i:i + 1], "big", signed=True)
                    ay = int.from_bytes(seg[i + 1:i + 2], "big",
                                        signed=True)
                    at.append((ay, ax))
                    i += 2
                if rw * rh > max_pixels:
                    raise Jbig2Error("region exceeds max_pixels bound")
                region = _generic_region(seg[i:], rw, rh, template, at,
                                         tpgdon)
                if seg_type == 36:           # intermediate: retained
                    aux_store[segnum] = (region, rx, ry, comb)
                else:
                    _compose(region, rx, ry, comb)
            elif seg_type in (40, 42, 43):   # refinement region (§7.4.7)
                if bitmap is None and seg_type != 40:
                    raise Jbig2Error("refinement before page info")
                if len(seg) < 18:
                    raise Jbig2Error("truncated refinement region")
                rw, rh = _u32(seg, 0), _u32(seg, 4)
                rx, ry = _u32(seg, 8), _u32(seg, 12)
                comb = seg[16] & 7
                rflags = seg[17]
                template = rflags & 1
                tpgron = bool(rflags & 2)
                j = 18
                rat = list(_REF_NOMINAL_AT)
                if template == 0:
                    rat = []
                    for _ in range(2):
                        ax = int.from_bytes(seg[j:j + 1], "big",
                                            signed=True)
                        ay = int.from_bytes(seg[j + 1:j + 2], "big",
                                            signed=True)
                        rat.append((ay, ax))
                        j += 2
                if rw * rh > max_pixels:
                    raise Jbig2Error("region exceeds max_pixels bound")
                aux_refs = [r for r in refs if r in aux_store]
                if aux_refs:
                    # §7.4.7.2: a referred INTERMEDIATE region is the
                    # reference buffer (dx/dy 0 — dims must agree)
                    ref = aux_store[aux_refs[-1]][0]
                    if ref.shape != (rh, rw):
                        raise Jbig2Error(
                            "refinement/intermediate dims mismatch")
                else:
                    if seg_type == 40 or bitmap is None:
                        raise Jbig2Error(
                            "intermediate refinement without a "
                            "referred region")
                    if (ry + rh > bitmap.shape[0]
                            or rx + rw > bitmap.shape[1]):
                        # no referred intermediate region: the
                        # reference is the page's current content —
                        # which must already cover the region
                        raise Jbig2Error("refinement outside page")
                    ref = bitmap[ry:ry + rh, rx:rx + rw].copy()
                region = _refinement_region(seg[j:], rw, rh, template,
                                            rat, ref, tpgron)
                if seg_type == 40:           # intermediate: retained
                    aux_store[segnum] = (region, rx, ry, comb)
                else:
                    _compose(region, rx, ry, comb)
            elif seg_type == 0:              # symbol dictionary (6.5)
                insyms = []
                for rseg in refs:
                    insyms.extend(sym_store.get(rseg, []))
                sym_store[segnum] = _decode_symbol_dict(
                    seg, max_pixels, insyms)
            elif seg_type in (4, 6, 7):      # text region (6.4)
                if page_w is None:
                    raise Jbig2Error("region before page info")
                syms = []
                for rseg in refs:
                    syms.extend(sym_store.get(rseg, []))
                region, rx, ry, comb = _decode_text_region(
                    seg, syms, max_pixels)
                if seg_type == 4:            # intermediate: retained
                    aux_store[segnum] = (region, rx, ry, comb)
                else:
                    _compose(region, rx, ry, comb)
            elif seg_type == 16:             # pattern dictionary (6.7)
                pat_store[segnum] = _decode_pattern_dict(seg,
                                                         max_pixels)
            elif seg_type in (20, 22, 23):   # halftone region (6.6)
                if page_w is None:
                    raise Jbig2Error("region before page info")
                pats = []
                for rseg in refs:
                    pats.extend(pat_store.get(rseg, []))
                region, rx, ry, comb = _decode_halftone(
                    seg, pats, max_pixels)
                if seg_type == 20:           # intermediate: retained
                    aux_store[segnum] = (region, rx, ry, comb)
                else:
                    _compose(region, rx, ry, comb)
            elif seg_type == 50:             # end of stripe: y coordinate
                continue
            elif seg_type in (49, 51):       # end of page / file
                continue
            elif seg_type == 62:             # extension: skippable
                continue
            else:
                raise Jbig2Error(
                    f"segment type {seg_type} unsupported "
                    "(Huffman-coded segments out of scope)")
    if bitmap is None:
        raise Jbig2Error("no page produced")
    return bitmap


def _segment(segnum: int, seg_type: int, page: int,
             payload: bytes, refs: tuple = ()) -> bytes:
    """Emit one §7.2 segment header + payload (short-form referred
    list, 1-byte page association — all our segment numbers are
    tiny)."""
    if len(refs) > 4:
        raise ValueError("short-form header supports <= 4 refs")
    return (segnum.to_bytes(4, "big")
            + bytes((seg_type,))
            + bytes((len(refs) << 5,))       # count in the top 3 bits
            + bytes(refs)
            + bytes((page,))
            + len(payload).to_bytes(4, "big")
            + payload)


def encode_jbig2(bitmap: np.ndarray, template: int = 0,
                 tpgdon: bool = True) -> bytes:
    """Encode an (h, w) {0,1} bitmap as a PDF-embedded JBIG2 stream —
    the jbig2enc ``-p`` organization the reference stores via
    ``pdfhacks.py:106-177``: page info, one immediate lossless generic
    region covering the page, end-of-page.  Lossless:
    ``decode_jbig2(encode_jbig2(b)) == b`` bit-exactly.
    """
    bm = np.asarray(bitmap)
    if bm.ndim != 2:
        raise ValueError("bitmap must be 2-D")
    if not 0 <= template <= 3:
        raise ValueError("template must be 0..3")
    bm = (bm != 0).astype(np.uint8)
    h, w = bm.shape

    mq = _mq_region_codeword([(bm, template, None, tpgdon, None)])

    at = _NOMINAL_AT[template]
    gflags = (template << 1) | (8 if tpgdon else 0)
    region = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
              + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
              + b"\x00"                      # external comb op OR
              + bytes((gflags,)))
    for ay, ax in at:
        region += ax.to_bytes(1, "big", signed=True)
        region += ay.to_bytes(1, "big", signed=True)
    region += mq

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + b"\x01"                   # page flags: lossless
                 + (0).to_bytes(2, "big"))   # no striping

    return (_segment(0, 48, 1, page_info)
            + _segment(1, 39, 1, region)
            + _segment(2, 49, 1, b""))


def encode_jbig2_refinement(base: np.ndarray, refined: np.ndarray,
                            template: int = 0,
                            tpgron: bool = True) -> bytes:
    """Encode the jbig2enc ``-r`` two-stage organization: a generic
    region carrying ``base`` (the approximation) followed by an
    immediate lossless generic refinement region (type 43) that
    upgrades the page to ``refined`` exactly — the refinement's
    reference is the page content per §7.4.7.2.  Lossless:
    ``decode_jbig2`` returns ``refined`` bit-exactly."""
    bb = (np.asarray(base) != 0).astype(np.uint8)
    rb = (np.asarray(refined) != 0).astype(np.uint8)
    if bb.shape != rb.shape or bb.ndim != 2:
        raise ValueError("base and refined must share a 2-D shape")
    if template not in (0, 1):
        raise ValueError("refinement template must be 0 or 1")
    h, w = bb.shape

    base_mq = _mq_region_codeword([(bb, 0, None, True, None)])
    base_region = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                   + bytes(8) + b"\x00"
                   + bytes(((0 << 1) | 8,)))
    for ay, ax in _NOMINAL_AT[0]:
        base_region += ax.to_bytes(1, "big", signed=True)
        base_region += ay.to_bytes(1, "big", signed=True)
    base_region += base_mq

    st2 = [0] * _REF_CTX_SIZE
    mp2 = [0] * _REF_CTX_SIZE
    enc2, flush2 = _mq_encode_fns(st2, mp2)
    _encode_refinement(enc2, rb, template, bb, 0, 0, tpgron)
    rflags = template | (2 if tpgron else 0)
    ref_region = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                  + bytes(8)
                  + b"\x04"                  # external comb: REPLACE
                  + bytes((rflags,)))
    if template == 0:
        for ay, ax in _REF_NOMINAL_AT:
            ref_region += ax.to_bytes(1, "big", signed=True)
            ref_region += ay.to_bytes(1, "big", signed=True)
    ref_region += flush2()

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + bytes(8)
                 + b"\x21"                   # lossless, REPLACE allowed
                 + bytes(2))
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 39, 1, base_region)
            + _segment(2, 43, 1, ref_region)
            + _segment(3, 49, 1, b""))


def encode_jbig2_symbols(glyphs, placements, w: int, h: int,
                         template: int = 0,
                         split_globals: bool = False,
                         refinements: dict | None = None,
                         transposed: bool = False):
    """Symbol-mode embedded JBIG2 — the organization jbig2enc's symbol
    coder (``-s``) produces and real archival PDFs carry: page info +
    symbol dictionary (§6.5, arithmetic) + immediate lossless text
    region (§6.4, TL reference corner, SBSTRIPS=1) + end-of-page.

    ``glyphs``: list of {0,1} bitmaps; ``placements``: (glyph_idx, x,
    y) top-left positions on the (w, h) page.  Lossless:
    ``decode_jbig2`` reproduces exactly the OR-composition of the
    placed glyphs.

    ``split_globals=True`` returns ``(globals_bytes, page_bytes)`` —
    the PDF two-stream shape jbig2enc emits, with the symbol
    dictionary in the shared ``/JBIG2Globals`` stream (page
    association 0) and the page stream's text region referring to it
    across the boundary.

    ``refinements`` maps a placement index to an exact target bitmap
    for that instance: the text region then sets SBREFINE and encodes
    an in-stream refinement (§6.4.11) of the placed glyph into the
    target — the jbig2enc ``-s -r`` lossy-symbol-plus-refinement
    organization.  Decode reproduces each target bit-exactly.

    ``transposed=True`` emits a TRANSPOSED=1 text region (§6.4.5
    (viii)/(xi): strips run across the page, S down it — the vertical-
    text organization), TL corner; placements still name top-left
    (x, y) positions and decode to the identical composition.
    """
    if not 0 <= template <= 3:
        raise ValueError("template must be 0..3")
    refinements = {
        pi: (np.asarray(t) != 0).astype(np.uint8)
        for pi, t in (refinements or {}).items()}
    gs = [(np.asarray(g) != 0).astype(np.uint8) for g in glyphs]
    if not gs:
        raise ValueError("no glyphs")
    for g in gs:
        if g.ndim != 2 or 0 in g.shape:
            raise ValueError("bad glyph shape")
    for pi, (gi, x, y) in enumerate(placements):
        tgt = refinements.get(pi)
        if tgt is not None and (tgt.ndim != 2 or 0 in tgt.shape):
            raise ValueError("bad refinement target shape")
        gh, gw = tgt.shape if tgt is not None else gs[gi].shape
        if not (0 <= x and x + gw <= w and 0 <= y and y + gh <= h):
            raise ValueError("placement outside page")

    # export order = decode order: height classes ascending, widths in
    # emission order within a class
    order = sorted(range(len(gs)), key=lambda k: (gs[k].shape[0], k))
    exp_id = {orig: e for e, orig in enumerate(order)}

    # ---- symbol dictionary (type 0)
    nctx = 65536 + 3 * _IA_SIZE
    st, mp = [0] * nctx, [0] * nctx
    enc, flush = _mq_encode_fns(st, mp)
    iadh = _make_int_encode(enc, 65536)
    iadw = _make_int_encode(enc, 65536 + _IA_SIZE)
    iaex = _make_int_encode(enc, 65536 + 2 * _IA_SIZE)
    hc = 0
    i = 0
    while i < len(order):
        gh = gs[order[i]].shape[0]
        iadh(gh - hc)
        hc = gh
        sw = 0
        while i < len(order) and gs[order[i]].shape[0] == hc:
            g = gs[order[i]]
            iadw(g.shape[1] - sw)
            sw = g.shape[1]
            _encode_generic(enc, g, template, False)
            i += 1
        iadw(None)                           # OOB: end of height class
    iaex(0)                                  # first run: 0 not-exported
    iaex(len(order))                         # export everything
    sd_payload = (((template << 10)).to_bytes(2, "big"))
    for ay, ax in _NOMINAL_AT[template]:
        sd_payload += ax.to_bytes(1, "big", signed=True)
        sd_payload += ay.to_bytes(1, "big", signed=True)
    sd_payload += len(order).to_bytes(4, "big")      # SDNUMEXSYMS
    sd_payload += len(order).to_bytes(4, "big")      # SDNUMNEWSYMS
    sd_payload += flush()

    # ---- text region (type 7), SBSTRIPS=1 so T deltas are exact rows
    refine = bool(refinements)
    codelen = max(len(order) - 1, 0).bit_length()
    n_ia = 9 if refine else 4
    b_iaid = n_ia * _IA_SIZE
    b_ref = b_iaid + (1 << (codelen + 1))
    nctx2 = b_ref + (_REF_CTX_SIZE if refine else 0)
    st2, mp2 = [0] * nctx2, [0] * nctx2
    enc2, flush2 = _mq_encode_fns(st2, mp2)
    iadt = _make_int_encode(enc2, 0)
    iafs = _make_int_encode(enc2, _IA_SIZE)
    iads = _make_int_encode(enc2, 2 * _IA_SIZE)
    if refine:
        iari = _make_int_encode(enc2, 4 * _IA_SIZE)
        iardw = _make_int_encode(enc2, 5 * _IA_SIZE)
        iardh = _make_int_encode(enc2, 6 * _IA_SIZE)
        iardx = _make_int_encode(enc2, 7 * _IA_SIZE)
        iardy = _make_int_encode(enc2, 8 * _IA_SIZE)

    def _emit_instance(sid, pi):
        """Symbol code (+ optional §6.4.11 refinement); returns the
        instance's effective (height, width) for CURS advancement."""
        _iaid_encode(enc2, b_iaid, codelen, sid)
        g = gs[order[sid]]
        tgt = refinements.get(pi)
        if refine:
            if tgt is None:
                iari(0)
            else:
                iari(1)
                rdh = tgt.shape[0] - g.shape[0]
                rdw = tgt.shape[1] - g.shape[1]
                iardw(rdw)
                iardh(rdh)
                iardx(0)
                iardy(0)
                _encode_refinement(enc2, tgt, 0, g, rdw >> 1,
                                   rdh >> 1, False, base=b_ref)
                return tgt.shape
        return g.shape

    # strip coordinate T, in-strip coordinate S: (y, x) normally,
    # (x, y) when transposed (§6.4.5 — strips run across the page)
    if transposed:
        inst = sorted((x, y, exp_id[gi], pi)
                      for pi, (gi, x, y) in enumerate(placements))
    else:
        inst = sorted((y, x, exp_id[gi], pi)
                      for pi, (gi, x, y) in enumerate(placements))
    adv = (lambda hw: hw[0]) if transposed else (lambda hw: hw[1])
    iadt(0)                                  # STRIPT starts at 0
    prev_t = 0
    firsts = 0
    k = 0
    while k < len(inst):
        t = inst[k][0]
        iadt(t - prev_t)
        prev_t = t
        _t, s0, sid, pi = inst[k]
        iafs(s0 - firsts)
        firsts = s0
        curs = s0 + adv(_emit_instance(sid, pi)) - 1
        k += 1
        while k < len(inst) and inst[k][0] == t:
            _t2, s2, sid2, pi2 = inst[k]
            iads(s2 - curs)                  # SBDSOFFSET = 0
            curs = s2 + adv(_emit_instance(sid2, pi2)) - 1
            k += 1
        iads(None)                           # OOB: end of strip
    tr_flags = ((1 << 4) | ((1 << 1) if refine else 0)   # TL corner
                | ((1 << 6) if transposed else 0))
    tr_payload = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                  + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                  + b"\x00"                  # external comb op OR
                  + tr_flags.to_bytes(2, "big"))
    if refine:                               # SBRAT (template 0)
        for ay, ax in _REF_NOMINAL_AT:
            tr_payload += ax.to_bytes(1, "big", signed=True)
            tr_payload += ay.to_bytes(1, "big", signed=True)
    tr_payload += len(inst).to_bytes(4, "big") + flush2()

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                 + b"\x01" + (0).to_bytes(2, "big"))
    if split_globals:
        glob = _segment(0, 0, 0, sd_payload)     # file-scope: page 0
        page = (_segment(1, 48, 1, page_info)
                + _segment(2, 7, 1, tr_payload, refs=(0,))
                + _segment(3, 49, 1, b""))
        return glob, page
    return (_segment(0, 48, 1, page_info)
            + _segment(1, 0, 1, sd_payload)
            + _segment(2, 7, 1, tr_payload, refs=(1,))
            + _segment(3, 49, 1, b""))

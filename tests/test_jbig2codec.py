"""JBIG2 generic-region codec (kernels/jbig2codec.py, T.88).

The reference's default mask sink shells out to jbig2enc
(internetarchivepdf/mrc.py:474-520); this codec replaces it natively.
No third-party JBIG2 decoder exists in-container, so the evidence model
mirrors the JP2 codec's: bit-exact round-trips over fuzz corpora plus
structural pins entered from the public spec (TPGDON contexts, template
pixel counts, segment header grammar).
"""

import numpy as np
import pytest

from archive_pdf_tools_spark.kernels import jbig2codec as jb
from archive_pdf_tools_spark.kernels.jbig2codec import (
    Jbig2Error, decode_jbig2, encode_jbig2)


def _textish(h, w, seed):
    """Mask-like bitmap: horizontal runs of black (text strokes)."""
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), dtype=np.uint8)
    for _ in range(max(1, h * w // 60)):
        y = rng.integers(0, h)
        x = rng.integers(0, w)
        ln = int(rng.integers(1, 12))
        bm[y, x:x + ln] = 1
    return bm


# ------------------------------------------------------------ round-trip

@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [True, False])
def test_roundtrip_all_templates(template, tpgdon):
    rng = np.random.default_rng(template * 2 + tpgdon)
    for shape in [(1, 1), (1, 17), (23, 1), (40, 56), (33, 7)]:
        for kind in ("random", "text", "zeros", "ones"):
            if kind == "random":
                bm = (rng.random(shape) < 0.3).astype(np.uint8)
            elif kind == "text":
                bm = _textish(*shape, seed=template)
            elif kind == "zeros":
                bm = np.zeros(shape, dtype=np.uint8)
            else:
                bm = np.ones(shape, dtype=np.uint8)
            data = encode_jbig2(bm, template=template, tpgdon=tpgdon)
            got = decode_jbig2(data)
            assert np.array_equal(got, bm), (template, tpgdon, shape,
                                             kind)


def test_roundtrip_large_text_page():
    """A realistically-sized (small) text mask round-trips and TPGDON
    actually pays: blank-row-heavy masks compress far below 1 bpp."""
    bm = _textish(220, 180, seed=7)
    data = encode_jbig2(bm)
    assert np.array_equal(decode_jbig2(data), bm)
    assert len(data) < 220 * 180 // 8        # beats raw packbits


def test_tpgdon_skips_duplicate_rows():
    """Typical prediction: a bitmap of repeated rows costs almost
    nothing per extra row (the LTP bit), far less than without."""
    row = (np.arange(64) % 7 == 0).astype(np.uint8)
    bm = np.tile(row, (50, 1))
    with_tp = encode_jbig2(bm, tpgdon=True)
    without = encode_jbig2(bm, tpgdon=False)
    assert np.array_equal(decode_jbig2(with_tp), bm)
    assert np.array_equal(decode_jbig2(without), bm)
    assert len(with_tp) < len(without)


# ------------------------------------------------------- structure pins

def test_spec_structure_pins():
    """Pins entered from ITU-T T.88: template pixel counts (figures
    4-7: 16/13/10/10 context bits), nominal AT placements (6.2.5.3),
    TPGDON pseudo-pixel contexts (6.2.5.7)."""
    assert [len(jb._FIXED[t]) + len(jb._NOMINAL_AT[t])
            for t in range(4)] == [16, 13, 10, 10]
    assert jb._NOMINAL_AT[0] == ((-1, 3), (-1, -3), (-2, 2), (-2, -2))
    assert jb._NOMINAL_AT[1] == ((-1, 3),)
    assert jb._NOMINAL_AT[2] == ((-1, 2),)
    assert jb._NOMINAL_AT[3] == ((-1, 2),)
    assert jb._TPGDON_CTX == (0x9B25, 0x0795, 0x00E5, 0x0195)


def test_fast_path_matches_general_path(monkeypatch):
    """The sliding-window fast path and the sorted-template gather path
    are the same context model: decoding one stream through both gives
    identical bitmaps."""
    bm = _textish(31, 45, seed=3)
    streams = [(t, encode_jbig2(bm, template=t)) for t in range(4)]
    fast = [decode_jbig2(d) for _, d in streams]
    monkeypatch.setattr(jb, "_is_nominal", lambda *a: False)
    slow = [decode_jbig2(d) for _, d in streams]
    for (t, _), f, s in zip(streams, fast, slow):
        assert np.array_equal(f, bm), t
        assert np.array_equal(s, bm), t


def test_segment_header_grammar():
    """Our emitted stream parses segment-by-segment per 7.2: page info
    (48) + immediate lossless generic region (39) + end of page (49),
    all on page 1."""
    data = encode_jbig2(np.ones((5, 9), dtype=np.uint8))
    pos, seen = 0, []
    while pos < len(data):
        segnum, styp, _refs, page, dlen, body = jb._parse_segment_header(
            data, pos)
        seen.append((segnum, styp, page))
        pos = body + dlen
    assert seen == [(0, 48, 1), (1, 39, 1), (2, 49, 1)]
    assert pos == len(data)


def test_non_nominal_at_decode():
    """Foreign encoders may move the AT pixels (6.2.5.3): encode with a
    displaced A1 through a test-local gather encoder, patch the region
    segment's AT bytes, and the general path must round-trip."""
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns

    bm = _textish(19, 27, seed=11)
    h, w = bm.shape
    at = ((-2, 4),)                          # A1 moved off-nominal
    template = 2
    pix = jb._sorted_template(template, at)
    states, mps = [0] * 65536, [0] * 65536
    encode, flush = _mq_encode_fns(states, mps)
    grid = bm.tolist()
    for y in range(h):
        for x in range(w):
            ctx = 0
            for dy, dx in pix:
                yy, xx = y + dy, x + dx
                ctx = (ctx << 1) | (grid[yy][xx]
                                    if 0 <= yy < h and 0 <= xx < w
                                    else 0)
            encode(ctx, grid[y][x])
    mq = flush()
    gflags = template << 1                   # no TPGDON
    region = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
              + bytes(8) + b"\x00" + bytes((gflags,))
              + (4).to_bytes(1, "big", signed=True)
              + (-2).to_bytes(1, "big", signed=True)
              + mq)
    page = (w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(8)
            + b"\x00" + bytes(2))
    data = (jb._segment(0, 48, 1, page) + jb._segment(1, 39, 1, region)
            + jb._segment(2, 49, 1, b""))
    assert np.array_equal(decode_jbig2(data), bm)


def test_region_composition_ops():
    """Two generic regions compose onto the page with the external
    combination operator (XOR here), not overwrite."""
    a = np.ones((4, 6), dtype=np.uint8)
    seg_a = encode_jbig2(a)
    # reuse the encoded region segment twice: OR then XOR of identical
    # content — OR keeps ones, second XOR region clears them
    pos = 0
    parts = []
    while pos < len(seg_a):
        _, styp, _, _, dlen, body = jb._parse_segment_header(seg_a, pos)
        parts.append((styp, seg_a[pos:body + dlen],
                      seg_a[body:body + dlen]))
        pos = body + dlen
    page_seg = parts[0][1]
    region_payload = parts[1][2]
    xor_payload = bytearray(region_payload)
    xor_payload[16] = (xor_payload[16] & ~7) | 2     # comb op = XOR
    data = (page_seg + jb._segment(1, 39, 1, region_payload)
            + jb._segment(2, 39, 1, bytes(xor_payload))
            + jb._segment(3, 49, 1, b""))
    assert not decode_jbig2(data).any()


def test_unknown_height_page_grows():
    """Striped pages declare height 0xFFFFFFFF; the page buffer grows
    to cover the regions (7.4.8.1.2)."""
    bm = _textish(12, 20, seed=5)
    data = encode_jbig2(bm)
    _, _, _, _, dlen, body = jb._parse_segment_header(data, 0)
    patched = bytearray(data)
    patched[body + 4:body + 8] = b"\xff\xff\xff\xff"
    assert np.array_equal(decode_jbig2(bytes(patched)), bm)


# ------------------------------------------------- refinement (§6.3)

@pytest.mark.parametrize("template", [0, 1])
@pytest.mark.parametrize("tpgron", [True, False])
def test_refinement_region_roundtrip(template, tpgron):
    """Generic refinement region (type 43) refining the page content
    (§7.4.7.2): decode returns the refined bitmap bit-exactly, for
    both templates, with and without TPGRON."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_refinement)
    rng = np.random.default_rng(template * 2 + tpgron)
    for shape in [(1, 1), (7, 13), (40, 56), (23, 9)]:
        base = (rng.random(shape) < 0.3).astype(np.uint8)
        refined = base.copy()
        refined[rng.random(shape) < 0.05] ^= 1
        data = encode_jbig2_refinement(base, refined,
                                       template=template,
                                       tpgron=tpgron)
        assert np.array_equal(decode_jbig2(data), refined), shape


def test_refinement_tpgron_skips_typical_pixels(monkeypatch):
    """TPGRON's payoff is skipped WORK, not bytes (the adaptive MQ
    coder already compresses match-the-reference pixels to almost
    nothing): on a sparse-text refinement most pixels sit in uniform
    3x3 reference windows and are copied without an MQ decision."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_refinement)
    base = _textish(80, 100, seed=21)
    refined = base.copy()
    refined[40, 50] ^= 1
    with_tp = encode_jbig2_refinement(base, refined, tpgron=True)
    without = encode_jbig2_refinement(base, refined, tpgron=False)

    # decision counting instruments the Python closure — force the
    # Python path (the compiled kernel skips the same pixels but
    # can't be counted from here)
    monkeypatch.setattr(jb._cnative, "generic_session",
                        lambda data: None)
    counts = []
    real = jb._mq_decode_fn

    def counting(data, states, mps):
        decode = real(data, states, mps)
        n = [0]
        counts.append(n)

        def wrapped(ctx):
            n[0] += 1
            return decode(ctx)
        return wrapped

    monkeypatch.setattr(jb, "_mq_decode_fn", counting)
    assert np.array_equal(decode_jbig2(with_tp), refined)
    tp_decisions = counts[-1][0]             # refinement segment's MQ
    counts.clear()
    assert np.array_equal(decode_jbig2(without), refined)
    plain_decisions = counts[-1][0]
    assert plain_decisions >= 80 * 100       # one per pixel, no skip
    assert tp_decisions < plain_decisions // 2


def test_halftone_fast_tiling_matches_cellwise():
    """The aligned-grid stamping fast path must be cell-for-cell the
    placement loop: rebuild the expected page from the gray grid and
    patterns directly."""
    rng = np.random.default_rng(31)
    pats = [((np.arange(16).reshape(4, 4) < v)).astype(np.uint8)
            for v in range(17)]
    for (gh, gw) in [(9, 11), (120, 90)]:
        gray = rng.integers(0, 17, (gh, gw))
        data = jb.encode_jbig2_halftone(gray, pats)
        out = decode_jbig2(data)
        want = np.zeros_like(out)
        for mg in range(gh):
            for ng in range(gw):
                want[mg * 4:(mg + 1) * 4,
                     ng * 4:(ng + 1) * 4] = pats[int(gray[mg, ng])]
        assert np.array_equal(out, want), (gh, gw)


def test_refinement_spec_structure_pins():
    """Pins entered from T.88 §6.3.5: template pixel counts (13-bit /
    10-bit contexts incl. AT), the reference set is the full 3x3
    window for template 0, and the TPGRON pseudo-context is the
    context whose only set bit is the reference centre pixel."""
    t0_bits = len(jb._REF_CODING[0]) + 1 + len(jb._REF_REFERENCE[0]) + 1
    t1_bits = len(jb._REF_CODING[1]) + len(jb._REF_REFERENCE[1])
    assert (t0_bits, t1_bits) == (13, 10)
    assert set(jb._REF_REFERENCE[0]) == {
        (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)} - {(-1, -1)}
    # centre-pixel-only context under the coding-then-reference MSB
    # ordering: position of ref(0,0) from the LSB end
    concat0 = (list(jb._REF_CODING[0]) + [None]
               + list(jb._REF_REFERENCE[0]) + [None])
    pos0 = len(concat0) - 1 - (4 + jb._REF_REFERENCE[0].index((0, 0)))
    assert jb._TPGRON_CTX[0] == 1 << pos0 == 0x0020
    concat1 = list(jb._REF_CODING[1]) + list(jb._REF_REFERENCE[1])
    pos1 = len(concat1) - 1 - concat1.index((0, 0), 4)
    assert jb._TPGRON_CTX[1] == 1 << pos1 == 0x0008


def test_text_region_sbrefine_roundtrip():
    """SBREFINE instances (§6.4.11) replace the placed glyph with an
    in-stream refinement of it; unrefined instances in the same region
    still place the dictionary glyph."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_symbols)
    g1 = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.uint8)
    g2 = np.array([[0, 1], [1, 1]], dtype=np.uint8)
    tgt = np.array([[1, 1, 1, 0], [1, 0, 0, 1], [0, 1, 1, 1]],
                   dtype=np.uint8)                   # g1 grown by RDW=1
    placements = [(0, 2, 1), (1, 10, 3), (0, 20, 1)]
    data = encode_jbig2_symbols([g1, g2], placements, 30, 10,
                                refinements={0: tgt})
    exp = np.zeros((10, 30), dtype=np.uint8)
    exp[1:4, 2:6] |= tgt
    exp[3:5, 10:12] |= g2
    exp[1:4, 20:23] |= g1
    assert np.array_equal(decode_jbig2(data), exp)
    # the split-globals (PDF two-stream) shape with shrunken + grown
    # refinement targets
    gl, pg = encode_jbig2_symbols(
        [g1, g2], placements, 30, 10, split_globals=True,
        refinements={0: tgt, 2: np.ones((2, 2), np.uint8)})
    exp2 = np.zeros((10, 30), dtype=np.uint8)
    exp2[1:4, 2:6] |= tgt
    exp2[3:5, 10:12] |= g2
    exp2[1:3, 20:22] |= 1
    assert np.array_equal(decode_jbig2(pg, gl), exp2)


def test_symbol_dict_refagg_roundtrip():
    """SDREFAGG=1 / REFAGGNINST=1 (§6.5.8.2): a second dictionary
    defines a new glyph as a refinement of a glyph imported from its
    referred dictionary; export runs span input + new symbols."""
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns

    g1 = _textish(9, 11, seed=31)
    g1[0, 0] = 1                             # ensure non-empty
    g1p = g1.copy()
    g1p[4, 5] ^= 1
    g1p[0, 3] ^= 1

    # dict A: one generic glyph, via the public encoder's dictionary
    sym_stream = jb.encode_jbig2_symbols(
        [g1], [(0, 0, 0)], g1.shape[1], g1.shape[0])
    pos, segs = 0, []
    while pos < len(sym_stream):
        _, styp, _, _, dlen, body = jb._parse_segment_header(
            sym_stream, pos)
        segs.append((styp, sym_stream[body:body + dlen]))
        pos = body + dlen
    dict_a_payload = next(p for t, p in segs if t == 0)

    # dict B: SDREFAGG, refines input symbol 0 into g1p
    IA = jb._IA_SIZE

    def dict_b_payload(ninst_agg):
        codelen = 1                          # 1 input + 1 new symbol
        b_iaid = 65536 + 6 * IA
        b_ref = b_iaid + (1 << (codelen + 1))
        nctx = b_ref + jb._REF_CTX_SIZE
        st, mp = [0] * nctx, [0] * nctx
        enc, flush = _mq_encode_fns(st, mp)
        iadh = jb._make_int_encode(enc, 65536)
        iadw = jb._make_int_encode(enc, 65536 + IA)
        iaex = jb._make_int_encode(enc, 65536 + 2 * IA)
        iaai = jb._make_int_encode(enc, 65536 + 3 * IA)
        iardx = jb._make_int_encode(enc, 65536 + 4 * IA)
        iardy = jb._make_int_encode(enc, 65536 + 5 * IA)
        iadh(g1p.shape[0])
        iadw(g1p.shape[1])
        iaai(ninst_agg)
        jb._iaid_encode(enc, b_iaid, codelen, 0)
        iardx(0)
        iardy(0)
        jb._encode_refinement(enc, g1p, 0, g1, 0, 0, False,
                              base=b_ref)
        iadw(None)
        iaex(1)                              # skip the imported g1
        iaex(1)                              # export the refined g1p
        flags = 2 | (0 << 10) | (0 << 12)    # SDREFAGG, templates 0
        payload = flags.to_bytes(2, "big")
        for ay, ax in jb._NOMINAL_AT[0]:
            payload += ax.to_bytes(1, "big", signed=True)
            payload += ay.to_bytes(1, "big", signed=True)
        for ay, ax in jb._REF_NOMINAL_AT:    # SDRAT
            payload += ax.to_bytes(1, "big", signed=True)
            payload += ay.to_bytes(1, "big", signed=True)
        payload += (1).to_bytes(4, "big")    # SDNUMEXSYMS
        payload += (1).to_bytes(4, "big")    # SDNUMNEWSYMS
        payload += flush()
        return payload

    payload = dict_b_payload(1)

    # text region placing the refined glyph via dict B
    h, w = 14, 18
    trs = jb.encode_jbig2_symbols([g1p], [(0, 3, 2)], w, h)
    pos, tr_payload = 0, None
    while pos < len(trs):
        _, styp, _, _, dlen, body = jb._parse_segment_header(trs, pos)
        if styp == 7:
            tr_payload = trs[body:body + dlen]
        pos = body + dlen
    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + bytes(8) + b"\x01" + bytes(2))
    data = (jb._segment(0, 48, 1, page_info)
            + jb._segment(1, 0, 1, dict_a_payload)
            + jb._segment(2, 0, 1, payload, refs=(1,))
            + jb._segment(3, 7, 1, tr_payload, refs=(2,))
            + jb._segment(4, 49, 1, b""))
    exp = np.zeros((h, w), dtype=np.uint8)
    exp[2:2 + g1p.shape[0], 3:3 + g1p.shape[1]] = g1p
    assert np.array_equal(decode_jbig2(data), exp)

    # REFAGGNINST=2 on a stream whose payload was built for the
    # one-instance shortcut decodes as a (garbage) nested text region
    # since late round 7: crash-safety only — real aggregate
    # semantics are pinned in test_aggregate_symbols_roundtrip
    data2 = (jb._segment(0, 48, 1, page_info)
             + jb._segment(1, 0, 1, dict_a_payload)
             + jb._segment(2, 0, 1, dict_b_payload(2), refs=(1,))
             + jb._segment(3, 7, 1, tr_payload, refs=(2,))
             + jb._segment(4, 49, 1, b""))
    try:
        out = decode_jbig2(data2)
        assert isinstance(out, np.ndarray)
    except Jbig2Error:
        pass


# --------------------------------------------------- halftone (§6.6)

@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_halftone_roundtrip(template):
    """Pattern dictionary (§6.7, collective bitmap with the
    A1=(0,-HDPW) AT) + halftone region (§6.6, Annex-C gray-coded
    bitplanes, grid stamping) round-trips for every template."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_halftone)
    rng = np.random.default_rng(template)
    pats = []
    for k in range(4):
        p = np.zeros((4, 4), np.uint8)
        p.flat[rng.permutation(16)[:k * 5]] = 1
        pats.append(p)
    for shape in [(1, 1), (5, 7), (12, 9)]:
        gray = rng.integers(0, 4, shape)
        data = encode_jbig2_halftone(gray, pats, template=template)
        hgh, hgw = shape
        exp = np.zeros(((hgh - 1) * 4 + 4, (hgw - 1) * 4 + 4),
                       np.uint8)
        for mg in range(hgh):
            for ng in range(hgw):
                exp[mg * 4:mg * 4 + 4,
                    ng * 4:ng * 4 + 4] |= pats[gray[mg, ng]]
        assert np.array_equal(decode_jbig2(data), exp), shape


def test_halftone_pitch_and_gates():
    """Grid pitch beyond the pattern width leaves gaps (the 8.8
    fixed-point grid vector); HENABLESKIP and a gray value past the
    dictionary stay loudly gated."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_halftone)
    rng = np.random.default_rng(9)
    pats = [np.zeros((4, 4), np.uint8), np.ones((4, 4), np.uint8)]
    gray = rng.integers(0, 2, (3, 5))
    data = encode_jbig2_halftone(gray, pats, pitch=6)
    exp = np.zeros((2 * 6 + 4, 4 * 6 + 4), np.uint8)
    for mg in range(3):
        for ng in range(5):
            exp[mg * 6:mg * 6 + 4,
                ng * 6:ng * 6 + 4] |= pats[gray[mg, ng]]
    assert np.array_equal(decode_jbig2(data), exp)

    # flip HENABLESKIP in the halftone region flags byte: supported
    # since round 7 — with a zero offset every cell is inside the
    # region, HSKIP is empty and the composition is identical (the
    # skip machinery engages for real in
    # test_halftone_grid_offset_and_enableskip)
    pos, offs = 0, {}
    while pos < len(data):
        _, styp, _, _, dlen, body = jb._parse_segment_header(data, pos)
        offs[styp] = body
        pos = body + dlen
    flip = bytearray(data)
    flip[offs[23] + 17] |= 8
    assert np.array_equal(decode_jbig2(bytes(flip)), exp)


def test_halftone_mmr_roundtrip():
    """HDMMR pattern dictionary + HMMR grayscale (Annex C.5: all
    gray-code bitplanes in ONE continuous T.6 stream, no resync
    between planes, single trailing EOFB) round-trips, including a
    negative grid offset; HENABLESKIP is arithmetic-only and the
    encoder rejects the combination."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_halftone)
    rng = np.random.default_rng(23)
    pats = [rng.integers(0, 2, (6, 6), dtype=np.uint8)
            for _ in range(7)]
    gray = rng.integers(0, 7, (9, 13))
    for off in ((0, 0), (-3, 2)):
        data = encode_jbig2_halftone(gray, pats, pitch=6,
                                     grid_offset=off, mmr=True)
        arith = encode_jbig2_halftone(gray, pats, pitch=6,
                                      grid_offset=off, mmr=False)
        # the two coding paths must agree pixel-for-pixel
        assert np.array_equal(decode_jbig2(data), decode_jbig2(arith))
        gx, gy = off
        h, w = 8 * 6 + 6, 12 * 6 + 6
        exp = np.zeros((h, w), np.uint8)
        for mg in range(9):
            for ng in range(13):
                x, y = gx + ng * 6, gy + mg * 6
                ys, xs = max(y, 0), max(x, 0)
                ye, xe = min(y + 6, h), min(x + 6, w)
                if ye <= ys or xe <= xs:
                    continue
                exp[ys:ye, xs:xe] |= \
                    pats[gray[mg, ng]][ys - y:ye - y, xs - x:xe - x]
        assert np.array_equal(decode_jbig2(data), exp), off
    with pytest.raises(ValueError, match="arithmetic-only"):
        encode_jbig2_halftone(gray, pats, enable_skip=True, mmr=True)
    # typed-error fuzz over the MMR stream (small max_pixels so bomb
    # guards trip fast instead of grinding inside the default bound)
    base = bytearray(encode_jbig2_halftone(gray, pats, pitch=6,
                                           mmr=True))
    for i in range(0, len(base), 11):
        try:
            decode_jbig2(bytes(base[:i]), max_pixels=64 * 64)
        except Exception as exc:
            assert type(exc).__name__ == "Jbig2Error", exc
    for _ in range(150):
        d = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            d[int(rng.integers(0, len(d)))] = int(rng.integers(0, 256))
        try:
            decode_jbig2(bytes(d), max_pixels=64 * 64)
        except Exception as exc:
            assert type(exc).__name__ == "Jbig2Error", exc


def test_g4_planes_stream_shape():
    """decode_g4_planes consumes concatenated planes from a single
    bit position and accepts BOTH C.5 readings: per-plane EOFB
    terminators (the pdf.js/jbig2dec interop layout, what
    encode_g4_planes emits — no inter-plane byte alignment) and the
    bare concatenation with nothing between planes."""
    from archive_pdf_tools_spark.kernels.ccittcodec import (
        CcittError, _BitWriter, _encode_g4_plane, decode_g4_planes,
        encode_g4_planes)
    rng = np.random.default_rng(31)
    planes = [rng.integers(0, 2, (11, 23), dtype=np.uint8)
              for _ in range(5)]
    data = encode_g4_planes(planes)
    out = decode_g4_planes(data, 23, 11, 5)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)
    # bare layout: planes back-to-back, single trailing EOFB
    bw = _BitWriter()
    for p in planes:
        _encode_g4_plane(bw, p)
    bw.put(0x001, 12)
    bw.put(0x001, 12)
    bw.align()
    bare = bytes(bw.out)
    assert len(data) > len(bare)             # per-plane EOFBs emitted
    out = decode_g4_planes(bare, 23, 11, 5)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)
    # truncated stream raises rather than returning short planes
    with pytest.raises(CcittError):
        decode_g4_planes(data[:4], 23, 11, 5)
    # the max_pixels budget bounds ONE plane (same semantic as the
    # arithmetic halftone cap) and is threaded from the caller
    with pytest.raises(CcittError):
        decode_g4_planes(data, 23, 11, 5, max_pixels=100)
    # mixed-shape planes are rejected at encode time
    with pytest.raises(ValueError, match="one non-empty 2D shape"):
        encode_g4_planes([planes[0], planes[1][:, :20]])


def test_unknown_height_page_growth_is_bounded():
    """Striped-page bomb guard: a tiny region (within its own rw*rh
    cap) placed at a huge ry on an unknown-height page must raise
    Jbig2Error, not attempt a multi-GB allocation (the growth check
    mirrors the known-height page-info max_pixels check)."""
    bm = _textish(8, 16, seed=1)
    data = encode_jbig2(bm)
    # segment 0 = page info, segment 1 = region
    _, _, _, _, dlen0, body0 = jb._parse_segment_header(data, 0)
    pos1 = body0 + dlen0
    _, _, _, _, _, body1 = jb._parse_segment_header(data, pos1)
    patched = bytearray(data)
    patched[body0 + 4:body0 + 8] = b"\xff\xff\xff\xff"   # height unknown
    patched[body1 + 12:body1 + 16] = (2 ** 27).to_bytes(4, "big")  # ry
    with pytest.raises(Jbig2Error, match="max_pixels"):
        decode_jbig2(bytes(patched), max_pixels=64_000_000)


def test_standalone_file_header_and_sniffing():
    """Standalone .jb2 files (9.1 magic + flags + optional page count)
    decode; decode_image sniffs both the file magic and the embedded
    leading page-info segment."""
    from archive_pdf_tools_spark.functions.multimodal import decode_image
    from archive_pdf_tools_spark.kernels.jbig2codec import FILE_MAGIC

    bm = _textish(20, 30, seed=9)
    emb = encode_jbig2(bm)
    with_count = FILE_MAGIC + bytes([1]) + (1).to_bytes(4, "big") + emb
    no_count = FILE_MAGIC + bytes([3]) + emb
    assert np.array_equal(decode_jbig2(with_count), bm)
    assert np.array_equal(decode_jbig2(no_count), bm)
    expect = np.where(bm != 0, 0, 255).astype(np.uint8)
    assert np.array_equal(decode_image(emb), expect)
    assert np.array_equal(decode_image(with_count), expect)
    with pytest.raises(Jbig2Error, match="random-access"):
        decode_jbig2(FILE_MAGIC + bytes([0]) + (1).to_bytes(4, "big")
                     + emb)


def test_pdf_fixture_flow():
    """/JBIG2Decode fixture streams decode through the PDF page-image
    path: dims from the page-info header, pixels 0/255 grayscale."""
    from archive_pdf_tools_spark.corpus.pdfgen import (
        build_pdf, synth_jbig2_real)
    from archive_pdf_tools_spark.sources.pdf_meta import (
        _jbig2_dims, extract_page_images, parse_pdf)

    data = synth_jbig2_real(40, 30, seed=3)
    assert _jbig2_dims(data) == (40, 30, 1)
    pdf = build_pdf([{"width": 612, "height": 792,
                      "images": [{"w": 40, "h": 30, "gray": True,
                                  "jbig2": True, "data": data}],
                      "text": "hello"}])
    meta = parse_pdf(pdf)
    im = meta["pages"][0]["images"][0]
    assert (im["format"], im["mode"], im["bits"]) == ("JBIG2", "1", 1)
    imgs = dict(extract_page_images(pdf, 0, meta=meta))
    arr = imgs[im["xref"]]
    assert arr.shape == (30, 40) and set(np.unique(arr)) <= {0, 255}
    bits = decode_jbig2(data)
    assert np.array_equal(arr, np.where(bits != 0, 0, 255))


def test_error_gates():
    bm = np.ones((3, 3), dtype=np.uint8)
    data = bytearray(encode_jbig2(bm))
    # MMR bit on the generic region flags
    _, _, _, _, dlen, body = jb._parse_segment_header(data, 0)
    pos2 = body + dlen
    _, _, _, _, _, body2 = jb._parse_segment_header(data, pos2)
    mmr = bytearray(data)
    mmr[body2 + 17] |= 1
    with pytest.raises(Jbig2Error, match="MMR"):
        decode_jbig2(bytes(mmr))
    # unsupported segment type (53 = Huffman tables; generic /
    # symbol / refinement / halftone regions all decode now)
    sym = bytearray(data)
    sym[pos2 + 4] = (sym[pos2 + 4] & ~0x3F) | 53
    with pytest.raises(Jbig2Error, match="unsupported"):
        decode_jbig2(bytes(sym))
    # truncated stream
    with pytest.raises(Jbig2Error):
        decode_jbig2(bytes(data[:-6]))
    # region before any page info
    with pytest.raises(Jbig2Error, match="before page info"):
        decode_jbig2(bytes(data[pos2:]))
    with pytest.raises(ValueError):
        encode_jbig2(np.zeros((2, 2, 2), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jbig2(bm, template=4)


def test_default_pixel_one_page():
    """Page info default-pixel bit fills the page black; an OR region
    leaves it black everywhere."""
    bm = np.zeros((6, 8), dtype=np.uint8)
    data = bytearray(encode_jbig2(bm))
    _, _, _, _, _, body = jb._parse_segment_header(data, 0)
    data[body + 16] |= 4                     # default pixel = 1
    assert (decode_jbig2(bytes(data)) == 1).all()


# --------------------------------------------------------- symbol mode

def test_symbol_mode_roundtrip():
    """Symbol dictionary + text region (the organization jbig2enc -s
    emits): decode reproduces the OR-composition of placed glyphs
    exactly, across templates, glyph mixes and overlapping placements."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_symbols)

    rng = np.random.default_rng(4)
    for trial in range(6):
        nglyphs = int(rng.integers(1, 7))
        glyphs = []
        for _ in range(nglyphs):
            gh, gw = int(rng.integers(1, 9)), int(rng.integers(1, 9))
            g = (rng.random((gh, gw)) < 0.5).astype(np.uint8)
            g[0, 0] = 1                      # non-empty
            glyphs.append(g)
        W, H = int(rng.integers(30, 80)), int(rng.integers(20, 60))
        placements = []
        for k in range(int(rng.integers(1, 25))):
            gi = int(rng.integers(0, nglyphs))
            gh, gw = glyphs[gi].shape
            placements.append((gi, int(rng.integers(0, W - gw + 1)),
                               int(rng.integers(0, H - gh + 1))))
        data = encode_jbig2_symbols(glyphs, placements, W, H,
                                    template=trial % 4)
        expect = np.zeros((H, W), np.uint8)
        for gi, x, y in placements:
            gh, gw = glyphs[gi].shape
            expect[y:y + gh, x:x + gw] |= glyphs[gi]
        assert np.array_equal(decode_jbig2(data), expect), trial


def test_symbol_mode_single_glyph_and_strips():
    """codelen 0 (single symbol: IAID reads no bits), repeated same-row
    placements (one strip, negative IDS from overlaps), and multiple
    height classes all round-trip."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_symbols)

    g = np.array([[1, 0, 1], [0, 1, 0]], np.uint8)
    placements = [(0, 0, 3), (0, 2, 3), (0, 1, 3), (0, 10, 3)]
    data = encode_jbig2_symbols([g], placements, 20, 10)
    expect = np.zeros((10, 20), np.uint8)
    for _gi, x, y in placements:
        expect[y:y + 2, x:x + 3] |= g
    assert np.array_equal(decode_jbig2(data), expect)
    # distinct heights -> multiple height classes in the dictionary
    glyphs = [np.ones((2, 2), np.uint8), np.ones((4, 3), np.uint8),
              np.ones((2, 5), np.uint8), np.ones((6, 2), np.uint8)]
    placements = [(0, 0, 0), (1, 5, 1), (2, 12, 4), (3, 20, 2),
                  (1, 9, 10), (0, 27, 8)]
    data = encode_jbig2_symbols(glyphs, placements, 32, 18)
    expect = np.zeros((18, 32), np.uint8)
    for gi, x, y in placements:
        gh, gw = glyphs[gi].shape
        expect[y:y + gh, x:x + gw] |= glyphs[gi]
    assert np.array_equal(decode_jbig2(data), expect)


def test_symbol_mode_error_gates():
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_symbols)

    g = np.ones((3, 3), np.uint8)
    data = bytearray(encode_jbig2_symbols([g], [(0, 1, 1)], 10, 8))
    # locate the symbol dictionary segment (type 0, segnum 1)
    pos = 0
    offsets = {}
    while pos < len(data):
        snum, styp, _refs, _pg, dlen, body = jb._parse_segment_header(
            bytes(data), pos)
        offsets[styp] = (pos, body, dlen)
        pos = body + dlen
    sd_pos, sd_body, _ = offsets[0]
    tr_pos, tr_body, _ = offsets[7]
    # SDHUFF flag -> loud
    bad = bytearray(data)
    bad[sd_body + 1] |= 1
    with pytest.raises(Jbig2Error, match="Huffman"):
        decode_jbig2(bytes(bad))
    # refinement flag on a non-refinement stream -> loud misparse
    # (SDREFAGG itself decodes since round 7; the flag flip makes the
    # header's SDRAT bytes swallow the count fields)
    bad = bytearray(data)
    bad[sd_body + 1] |= 2
    with pytest.raises(Jbig2Error):
        decode_jbig2(bytes(bad))
    # flipping TRANSPOSED (bit 6 of the 16-bit flags word) on a
    # non-transposed stream reinterprets the (S, T) pairs with the
    # axes swapped: still a valid decode (crash-safety — the real
    # transposed semantics are pinned in the dedicated tests)
    bad = bytearray(data)
    bad[tr_body + 18] |= 0x40
    try:
        out = decode_jbig2(bytes(bad))
        assert isinstance(out, np.ndarray)
    except Jbig2Error:
        pass
    # text region referring to no symbols -> loud
    norefs = bytearray(data)
    # patch referred count to 0 in the text-region header: flags byte
    # at tr_pos+5 carries the count in its top 3 bits
    norefs[tr_pos + 5] = 0
    # removing the ref byte shifts the header; rebuild instead
    tr_payload = bytes(data[tr_body:tr_body + offsets[7][2]])
    rebuilt = (bytes(data[:tr_pos]) + jb._segment(2, 7, 1, tr_payload)
               + jb._segment(3, 49, 1, b""))
    with pytest.raises(Jbig2Error, match="without symbols"):
        decode_jbig2(rebuilt)


def test_exception_contract_and_split_globals():
    """Review findings (r6): (a) malformed streams raise Jbig2Error —
    never IndexError — matching the sibling codecs' contract; (b) the
    jbig2enc two-stream shape (symbol dictionary in /JBIG2Globals,
    text region referring across the boundary) decodes."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        encode_jbig2_symbols)

    # truncated type-39 payload and truncated header both stay typed
    data = bytearray(encode_jbig2(np.ones((6, 8), np.uint8)))
    for cut in (len(data) - 3, 29, 15, 7):
        with pytest.raises(Jbig2Error):
            decode_jbig2(bytes(data[:cut]))
    # header with a bogus referred count cutting into nothing
    bogus = (0).to_bytes(4, "big") + bytes([39, 0xBF])
    with pytest.raises(Jbig2Error):
        decode_jbig2(bogus)

    g1 = np.ones((3, 4), np.uint8)
    g2 = np.array([[1, 0], [0, 1], [1, 1]], np.uint8)
    pls = [(0, 2, 2), (1, 10, 5), (0, 20, 9), (1, 14, 2)]
    glob, page = encode_jbig2_symbols([g1, g2], pls, 30, 16,
                                      split_globals=True)
    expect = np.zeros((16, 30), np.uint8)
    for gi, x, y in pls:
        gh, gw = (g1 if gi == 0 else g2).shape
        expect[y:y + gh, x:x + gw] |= (g1 if gi == 0 else g2)
    assert np.array_equal(decode_jbig2(page, glob), expect)
    # page stream alone must fail loudly (its symbols live elsewhere)
    with pytest.raises(Jbig2Error, match="without symbols"):
        decode_jbig2(page)
    # single-stream form still equals the split decode
    single = encode_jbig2_symbols([g1, g2], pls, 30, 16)
    assert np.array_equal(decode_jbig2(single), expect)


def test_adversarial_fuzz_crash_safety():
    """Adversarial bytes must raise Jbig2Error (or decode), never any
    other exception and never hang — same crash-safety contract the
    JP2/JPEG codecs carry."""
    rng = np.random.default_rng(99)
    base = encode_jbig2(_textish(24, 30, seed=1))
    g, pg = __import__(
        "archive_pdf_tools_spark.kernels.jbig2codec",
        fromlist=["encode_jbig2_symbols"]).encode_jbig2_symbols(
            [np.ones((3, 3), np.uint8)], [(0, 1, 1)], 12, 10,
            split_globals=True)
    corpora = [base, g + pg, pg]
    n_ok = n_err = 0
    for trial in range(300):
        which = corpora[trial % 3]
        buf = bytearray(which)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(256))
        try:
            decode_jbig2(bytes(buf), max_pixels=64 * 64)
            n_ok += 1
        except Jbig2Error:
            n_err += 1
    # pure random garbage too
    for trial in range(100):
        blob = bytes(rng.integers(0, 256, int(rng.integers(1, 400)),
                                  dtype=np.uint8))
        try:
            decode_jbig2(blob, max_pixels=64 * 64)
            n_ok += 1
        except Jbig2Error:
            n_err += 1
    assert n_err > 0                         # mutations do get caught


def test_transposed_text_region_roundtrip_and_corner_semantics():
    """TRANSPOSED=1 text regions (T.88 §6.4.5 (viii)/(xi), r7):
    strips run across the page, S down it.  Round-trip through the
    encoder's transposed mode, then pin the corner semantics by
    patching the REFCORNER bits of a single-instance stream: the L/R
    bit moves the T edge by WS-1, the T/B bit must NOT move the S
    span (the spec's advance-before rule makes it span-neutral)."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        decode_jbig2, encode_jbig2_symbols)

    rng = np.random.default_rng(91)
    glyphs = [(rng.random((5 + i, 4 + 2 * i)) < 0.5).astype(np.uint8)
              for i in range(3)]
    placements = [(0, 2, 3), (1, 10, 3), (2, 2, 20), (0, 14, 22),
                  (1, 30, 8)]
    w, h = 48, 40
    exp = np.zeros((h, w), np.uint8)
    for gi, x, y in placements:
        g = glyphs[gi]
        exp[y:y + g.shape[0], x:x + g.shape[1]] |= g
    data = encode_jbig2_symbols(glyphs, placements, w, h,
                                transposed=True)
    assert np.array_equal(decode_jbig2(data), exp)
    # split-globals and refinement compose with transposed
    glob, page = encode_jbig2_symbols(glyphs, placements, w, h,
                                      transposed=True,
                                      split_globals=True)
    assert np.array_equal(decode_jbig2(page, globals_data=glob), exp)
    tgt = (rng.random(glyphs[1].shape) < 0.5).astype(np.uint8)
    datar = encode_jbig2_symbols(glyphs, placements, w, h,
                                 transposed=True, refinements={1: tgt})
    # expected: the refinement replaces instance 1's glyph entirely
    expr = np.zeros((h, w), np.uint8)
    for pi, (gi, x, y) in enumerate(placements):
        g = tgt if pi == 1 else glyphs[gi]
        expr[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert np.array_equal(decode_jbig2(datar), expr)

    # corner-bit pinning on a single instance (TL flags u16 == 0x0050)
    g = np.array([[1, 1, 1, 0], [1, 0, 0, 1], [1, 1, 1, 1]], np.uint8)
    one = encode_jbig2_symbols([g], [(0, 10, 5)], 24, 16,
                               transposed=True)
    assert one.count(b"\x00\x50") == 1
    base = np.zeros((16, 24), np.uint8)
    base[5:8, 10:14] = g
    assert np.array_equal(decode_jbig2(one), base)
    right = np.zeros((16, 24), np.uint8)
    right[5:8, 7:11] = g                     # x0 = T - WS + 1
    assert np.array_equal(
        decode_jbig2(one.replace(b"\x00\x50", b"\x00\x70")), right)
    assert np.array_equal(                   # BL: S span unchanged
        decode_jbig2(one.replace(b"\x00\x50", b"\x00\x40")), base)


def test_halftone_grid_offset_and_enableskip():
    """HGX/HGY grid offsets clip cells at the region edge;
    HENABLESKIP omits fully-outside cells' grayscale bits from the
    bitstream (USESKIP, §6.6.5.1) — verified against an independent
    stamping oracle and by the stream actually shrinking."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        decode_jbig2, encode_jbig2_halftone)

    rng = np.random.default_rng(92)
    pats = [(rng.random((6, 6)) < (k / 4)).astype(np.uint8)
            for k in range(4)]
    g = rng.integers(0, 4, (7, 9))

    def oracle(gx, gy):
        hgh, hgw = g.shape
        w, h = (hgw - 1) * 6 + 6, (hgh - 1) * 6 + 6
        out = np.zeros((h, w), np.uint8)
        for mg in range(hgh):
            for ng in range(hgw):
                x, y = gx + ng * 6, gy + mg * 6
                ys, xs = max(y, 0), max(x, 0)
                ye, xe = min(y + 6, h), min(x + 6, w)
                if ye <= ys or xe <= xs:
                    continue
                out[ys:ye, xs:xe] |= \
                    pats[int(g[mg, ng])][ys - y:ye - y, xs - x:xe - x]
        return out

    for gx, gy in [(-13, -7), (-6, 0), (-20, -20), (0, 0)]:
        plain = encode_jbig2_halftone(g, pats, grid_offset=(gx, gy))
        skipd = encode_jbig2_halftone(g, pats, grid_offset=(gx, gy),
                                      enable_skip=True)
        assert np.array_equal(decode_jbig2(plain), oracle(gx, gy))
        assert np.array_equal(decode_jbig2(skipd), oracle(gx, gy))
        if gx <= -12 or gy <= -12:           # fully-outside cells exist
            assert len(skipd) < len(plain)   # their bits were omitted


def test_aggregate_symbols_roundtrip():
    """REFAGGNINST > 1 (T.88 §6.5.8.2.1, late r7): an SDREFAGG
    dictionary whose glyph is a NESTED TEXT REGION over a plain
    dictionary's members — two-dictionary organization, cross-dict
    refs, Table-17 fixed parameters, shared persistent contexts.
    Lossless against an independent numpy stamping oracle."""
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        decode_jbig2, encode_jbig2_aggregate)

    rng = np.random.default_rng(93)
    for template in range(4):
        members = [(rng.random((4, 5)) < 0.6).astype(np.uint8),
                   (rng.random((3, 6)) < 0.6).astype(np.uint8),
                   (rng.random((5, 4)) < 0.6).astype(np.uint8)]
        # overlapping members, same-strip and multi-strip placements
        agg_pl = [(0, 1, 1), (1, 4, 2), (2, 2, 6), (1, 8, 8),
                  (0, 10, 1)]
        aw, ah = 16, 12
        agg = np.zeros((ah, aw), np.uint8)
        for mi, dx, dy in agg_pl:
            m = members[mi]
            agg[dy:dy + m.shape[0], dx:dx + m.shape[1]] |= m
        pls = [(2, 3), (20, 3), (2, 18), (22, 20)]
        w, h = 40, 34
        exp = np.zeros((h, w), np.uint8)
        for x, y in pls:
            exp[y:y + ah, x:x + aw] |= agg
        data = encode_jbig2_aggregate(members, (ah, aw), agg_pl, pls,
                                      w, h, template=template)
        assert np.array_equal(decode_jbig2(data), exp), template


def test_aggregate_gates_and_fuzz():
    from archive_pdf_tools_spark.kernels.jbig2codec import (
        decode_jbig2, encode_jbig2_aggregate)

    m = np.ones((3, 3), np.uint8)
    with pytest.raises(ValueError):          # member outside aggregate
        encode_jbig2_aggregate([m], (4, 4), [(0, 3, 0)], [(0, 0)],
                               10, 10)
    with pytest.raises(ValueError):          # aggregate outside page
        encode_jbig2_aggregate([m], (4, 4), [(0, 0, 0)], [(8, 8)],
                               10, 10)
    rng = np.random.default_rng(94)
    data = bytearray(encode_jbig2_aggregate(
        [m, np.ones((2, 4), np.uint8)], (8, 8),
        [(0, 0, 0), (1, 2, 5)], [(1, 1), (10, 10)], 20, 20))
    for i in range(0, len(data), 9):
        try:
            decode_jbig2(bytes(data[:i]))
        except Jbig2Error:
            pass
    for _ in range(200):
        d = bytearray(data)
        pos = int(rng.integers(0, len(d)))
        d[pos] = int(rng.integers(0, 256))
        try:
            decode_jbig2(bytes(d))
        except Jbig2Error:
            pass


def test_intermediate_region_refinement_chain():
    """Intermediate regions (T.88 §8.2, late r7): a type-36
    intermediate generic region is retained (not composed), a type-40
    intermediate refinement refines it via the referred-segment link,
    and a final type-43 immediate refinement composes the result onto
    the page — a three-stage progressive chain."""
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns

    rng = np.random.default_rng(97)
    h, w = 14, 22
    base = (rng.random((h, w)) < 0.35).astype(np.uint8)
    mid = base ^ ((rng.random((h, w)) < 0.08).astype(np.uint8))
    final = mid ^ ((rng.random((h, w)) < 0.08).astype(np.uint8))

    def generic_payload(bm):
        st, mp = [0] * 65536, [0] * 65536
        enc, flush = _mq_encode_fns(st, mp)
        jb._encode_generic(enc, bm, 0, True)
        payload = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                   + bytes(8) + b"\x00" + bytes(((0 << 1) | 8,)))
        for ay, ax in jb._NOMINAL_AT[0]:
            payload += ax.to_bytes(1, "big", signed=True)
            payload += ay.to_bytes(1, "big", signed=True)
        return payload + flush()

    def refine_payload(ref, tgt, comb):
        st, mp = [0] * jb._REF_CTX_SIZE, [0] * jb._REF_CTX_SIZE
        enc, flush = _mq_encode_fns(st, mp)
        jb._encode_refinement(enc, tgt, 0, ref, 0, 0, True)
        payload = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                   + bytes(8) + bytes((comb,)) + bytes((0 | 2,)))
        for ay, ax in jb._REF_NOMINAL_AT:
            payload += ax.to_bytes(1, "big", signed=True)
            payload += ay.to_bytes(1, "big", signed=True)
        return payload + flush()

    page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                 + bytes(8) + b"\x01" + bytes(2))
    data = (jb._segment(0, 48, 1, page_info)
            + jb._segment(1, 36, 1, generic_payload(base))
            + jb._segment(2, 40, 1, refine_payload(base, mid, 0),
                          refs=(1,))
            + jb._segment(3, 43, 1, refine_payload(mid, final, 4),
                          refs=(2,))
            + jb._segment(4, 49, 1, b""))
    assert np.array_equal(decode_jbig2(data), final)

    # dims mismatch between refinement and its intermediate: loud
    bad = (jb._segment(0, 48, 1, page_info)
           + jb._segment(1, 36, 1, generic_payload(base))
           + jb._segment(2, 43, 1,
                         refine_payload(base, final, 4)[:8].replace(
                             w.to_bytes(4, "big"),
                             (w + 1).to_bytes(4, "big"))
                         + refine_payload(base, final, 4)[8:],
                         refs=(1,))
           + jb._segment(3, 49, 1, b""))
    with pytest.raises(Jbig2Error):
        decode_jbig2(bad)
    # intermediate refinement with no referred region: loud
    orphan = (jb._segment(0, 48, 1, page_info)
              + jb._segment(1, 40, 1, refine_payload(base, mid, 0))
              + jb._segment(2, 49, 1, b""))
    with pytest.raises(Jbig2Error, match="intermediate refinement"):
        decode_jbig2(orphan)


def test_unknown_length_generic_segment():
    """§7.2.7 unknown-length immediate generic regions: data length
    0xFFFFFFFF, the MQ payload terminated by FF AC (a pair MQ
    byte-stuffing can never emit) + a 4-byte row count that supplies
    the height.  MMR unknown-length stays loudly gated."""
    bm = _textish(17, 26, seed=21)
    data = encode_jbig2(bm)
    # segments: page info (0), generic region (1), end of page (2)
    pos, spans = 0, []
    while pos < len(data):
        _, styp, _, _, dlen, body = jb._parse_segment_header(data, pos)
        spans.append((styp, pos, body, dlen))
        pos = body + dlen
    styp, spos, sbody, sdlen = spans[1]
    assert styp == 39
    payload = bytearray(data[sbody:sbody + sdlen])
    payload[4:8] = b"\xff\xff\xff\xff"       # height: unknown
    payload += b"\xff\xac" + (17).to_bytes(4, "big")
    hdr = bytearray(data[spos:sbody])
    hdr[-4:] = b"\xff\xff\xff\xff"           # data length: unknown
    patched = (data[:spos] + bytes(hdr) + bytes(payload)
               + data[sbody + sdlen:])
    assert np.array_equal(decode_jbig2(patched), bm)

    # lying trailing row count: loud mismatch with... the height was
    # declared unknown, so the count IS the authority — a wrong count
    # decodes a different height and the pixel content breaks the MQ
    # stream or the page bounds, either way never a silent pass
    wrong = patched.replace(b"\xff\xac" + (17).to_bytes(4, "big"),
                            b"\xff\xac" + (99).to_bytes(4, "big"))
    try:
        out = decode_jbig2(wrong)
        assert out.shape[0] >= 17
    except Jbig2Error:
        pass
    # unknown length on a non-region segment type: loud
    with pytest.raises(Jbig2Error):
        bad = bytearray(patched)
        # flip the patched segment's type byte to 48 (page info)
        tpos = spos + 4
        bad[tpos] = (bad[tpos] & ~0x3F) | 48
        decode_jbig2(bytes(bad))


def test_unknown_length_terminator_not_confused_by_at_bytes():
    """r7 review finding: an AT pixel pair (x=-1, y=-84) serializes as
    FF AC — exactly the unknown-length terminator.  The terminator
    search must start past the AT bytes, so such a stream decodes."""
    from archive_pdf_tools_spark.kernels.jp2codec import _mq_encode_fns

    bm = _textish(11, 19, seed=23)
    h, w = bm.shape
    at = ((-84, -1), (-1, -3), (-2, 2), (-2, -2))   # A1 = FF AC bytes
    template = 0
    pix = jb._sorted_template(template, at)
    states, mps = [0] * 65536, [0] * 65536
    encode, flush = _mq_encode_fns(states, mps)
    grid = bm.tolist()
    for y in range(h):
        for x in range(w):
            ctx = 0
            for dy, dx in pix:
                yy, xx = y + dy, x + dx
                ctx = (ctx << 1) | (grid[yy][xx]
                                    if 0 <= yy < h and 0 <= xx < w
                                    else 0)
            encode(ctx, grid[y][x])
    mq = flush()
    region = (w.to_bytes(4, "big") + b"\xff\xff\xff\xff"  # h unknown
              + bytes(8) + b"\x00" + bytes((template << 1,)))
    for ay, ax in at:
        region += ax.to_bytes(1, "big", signed=True)
        region += ay.to_bytes(1, "big", signed=True)
    assert b"\xff\xac" in region[18:26]      # the hazard is real
    region += mq + b"\xff\xac" + h.to_bytes(4, "big")
    page = (w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(8)
            + b"\x00" + bytes(2))
    # _segment emits header+payload; patch its data length to unknown
    hdr = bytearray(jb._segment(1, 39, 1, region))
    # the 4-byte data length sits at the end of the header (before
    # the payload): locate it as the bytes encoding len(region)
    enc_len = len(region).to_bytes(4, "big")
    li = bytes(hdr).find(enc_len)
    assert li >= 0
    hdr[li:li + 4] = b"\xff\xff\xff\xff"
    data = (jb._segment(0, 48, 1, page) + bytes(hdr)
            + jb._segment(2, 49, 1, b""))
    assert np.array_equal(decode_jbig2(data), bm)

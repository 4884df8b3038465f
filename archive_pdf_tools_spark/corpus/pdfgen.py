"""Minimal deterministic PDF builder (test/corpus fixture side).

Builds small but structurally real PDFs — xref table, page tree, per-page
content streams (Flate), image XObjects, optional text layer — so the
parser in ``sources/pdf_meta.py`` has honest inputs.  This is the fixture
counterpart of the reference's inverse tooling (``bin/pdf-to-imagestack``);
generation is seeded and pure.

Only public PDF 1.5 structure is used (ISO 32000 basics: objects, xref,
trailer, /Pages tree, /XObject /Image, Tj text operators).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

__all__ = ["build_pdf", "synth_pdf", "synth_jpeg", "synth_jp2",
           "synth_jpeg_real", "synth_jp2_real"]


def synth_jp2(w: int, h: int, gray: bool) -> bytes:
    """Structurally-honest JP2 bytes: signature box, ftyp box, and a
    jp2h superbox whose ihdr carries the real dims + component count
    (ISO/IEC 15444-1 §I.5).  No codestream — the engine only reads the
    headers (decode stays behind the codec gate)."""
    nc = 1 if gray else 3

    def box(btype: bytes, payload: bytes) -> bytes:
        return (len(payload) + 8).to_bytes(4, "big") + btype + payload

    sig = box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = box(b"ftyp", b"jp2 " + (0).to_bytes(4, "big") + b"jp2 ")
    ihdr = box(b"ihdr", h.to_bytes(4, "big") + w.to_bytes(4, "big")
               + nc.to_bytes(2, "big") + bytes([7, 7, 0, 0]))
    colr = box(b"colr", bytes([1, 0, 0])
               + (17 if gray else 16).to_bytes(4, "big"))
    jp2h = box(b"jp2h", ihdr + colr)
    return sig + ftyp + jp2h


def synth_jp2_real(w: int, h: int, gray: bool, seed: int = 0) -> bytes:
    """A DECODABLE lossless JP2 (round 5): seeded paper-like content
    encoded by the engine's own reversible JPEG2000 encoder
    (``kernels.jp2codec``), so /JPXDecode fixture streams flow through
    the full decode -> MRC path — the reference's PRIMARY codec
    (``internetarchivepdf/jpeg2000.py``) — instead of metadata-only.
    Content is seeded from (seed, w, h) only, like ``synth_jpeg_real``:
    no draws from any shared RNG stream, so adding these images never
    shifts sibling fixtures."""
    from ..kernels.jp2codec import encode_jp2

    rng = np.random.default_rng((seed * 6007) ^ (w << 16) ^ h)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 200 - 50 * np.sin(xx / 9.0) - 35 * np.cos(yy / 6.0)
    img = np.clip(base + rng.integers(-10, 11, (h, w)),
                  0, 255).astype(np.uint8)
    if not gray:
        img = np.stack([img, np.roll(img, 2, axis=0), 255 - img], axis=-1)
    return encode_jp2(img, levels=2)


def synth_jbig2_real(w: int, h: int, seed: int = 0) -> bytes:
    """A DECODABLE embedded JBIG2 stream (round 6): a seeded text-mask-
    like bitmap (horizontal strokes on white, the shape real MRC masks
    have) encoded by the engine's own generic-region encoder
    (``kernels.jbig2codec``) — the reference's DEFAULT mask compression
    (``internetarchivepdf/mrc.py:474-520`` via the jbig2enc subprocess).
    When ``(w + h) % 3 == 0`` the stream uses SYMBOL MODE instead
    (symbol dictionary + text region, jbig2enc ``-s`` organization —
    what real archival PDFs usually carry), and when
    ``(w + h) % 3 == 1`` the REFINEMENT organization (round 7: a
    corrupted base generic region + an immediate refinement region
    restoring the mask, jbig2enc ``-r`` shape), so all three families
    flow through the PDF -> MRC pins.  Seeded from (seed, w, h) only,
    like the other ``synth_*_real`` fixtures, so adding these never
    shifts sibling fixtures."""
    from ..kernels.jbig2codec import (encode_jbig2,
                                      encode_jbig2_refinement,
                                      encode_jbig2_symbols)

    rng = np.random.default_rng((seed * 7919) ^ (w << 16) ^ h)
    if (w + h) % 3 == 0 and w >= 8 and h >= 8:
        glyphs = [(rng.random((int(rng.integers(2, 5)),
                               int(rng.integers(2, 5)))) < 0.6
                   ).astype(np.uint8) for _ in range(3)]
        for g in glyphs:
            g[0, 0] = 1
        pls = []
        for _ in range(max(2, w * h // 80)):
            gi = int(rng.integers(0, 3))
            gh, gw = glyphs[gi].shape
            pls.append((gi, int(rng.integers(0, w - gw + 1)),
                        int(rng.integers(0, h - gh + 1))))
        return encode_jbig2_symbols(glyphs, pls, w, h,
                                    split_globals=True)
    bm = np.zeros((h, w), dtype=np.uint8)
    for _ in range(max(1, w * h // 50)):
        y = int(rng.integers(0, h))
        x = int(rng.integers(0, w))
        bm[y, x:x + int(rng.integers(1, 10))] = 1
    if (w + h) % 3 == 1 and w >= 8 and h >= 8:
        # jbig2enc -r shape: a seeded-corrupted approximation as the
        # base generic region, refined back to ``bm`` exactly
        flips = (rng.random((h, w)) < 0.03).astype(np.uint8)
        return encode_jbig2_refinement(bm ^ flips, bm,
                                       template=(w + h) % 2,
                                       tpgron=bool(seed % 2 == 0))
    return encode_jbig2(bm)


def synth_ccitt_real(w: int, h: int,
                     seed: int = 0) -> tuple[bytes, int]:
    """A DECODABLE /CCITTFaxDecode stream (round 6): seeded text-mask
    content encoded by the engine's own T.4/T.6 encoders
    (``kernels.ccittcodec``) — the pre-JBIG2 archival mask format the
    reference leaves entirely to PyMuPDF (``pdfhacks.py:124-126``).
    Returns ``(stream, k, no_rows)`` where ``k`` is the /K DecodeParms
    value the stream was encoded for (rotates -1/0/4 by ``(w + h) % 3``)
    and ``no_rows`` asks the PDF writer to OMIT /Rows so the default
    /EndOfBlock self-delimiting decode path (EOFB for G4, RTC for mixed
    G3, zero-padding for plain 1D) is what real corpora exercise.  Both
    rotations are pure functions of (w, h); seeded from (seed, w, h)
    only."""
    from ..kernels.ccittcodec import encode_g3, encode_g4

    rng = np.random.default_rng((seed * 9173) ^ (w << 16) ^ h)
    bm = np.zeros((h, w), dtype=np.uint8)
    for _ in range(max(1, w * h // 55)):
        y = int(rng.integers(0, h))
        x = int(rng.integers(0, w))
        bm[y, x:x + int(rng.integers(1, 9))] = 1
    # rotate through the /K families as a pure function of (w, h):
    # G4 (K=-1), 1D G3 (K=0) and mixed G3 (K=4) all flow through pins
    sel = (w + h) % 3
    no_rows = w % 2 == 0
    if sel == 1:
        return encode_g3(bm, k=0), 0, no_rows
    if sel == 2:
        # self-delimiting mixed-2D streams need an explicit RTC
        return encode_g3(bm, k=4, rtc=no_rows), 4, no_rows
    return encode_g4(bm), -1, no_rows


def _flate(data: bytes) -> bytes:
    return zlib.compress(data, 6)


def synth_jpeg(w: int, h: int, gray: bool, seed: int = 0) -> bytes:
    """Structurally-honest JPEG bytes: SOI, APP0/JFIF, SOF0 frame header
    carrying the real dimensions + component count (ISO/IEC 10918-1
    B.2.2), SOS and a little seeded entropy payload, EOI.  The scan data
    is not a decodable Huffman stream — the fixture exercises the
    metadata-without-decode path (header parse), which is all the engine
    does with DCT streams (decode stays behind the codec gate)."""
    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")                       # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(jfif) + 2).to_bytes(2, "big") + jfif
    sof = bytearray()
    sof += (8).to_bytes(1, "big")                      # precision
    sof += h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += ncomp.to_bytes(1, "big")
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])                 # id, 1x1 sampling, DQT 0
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    sos = bytes([ncomp]) + b"".join(bytes([c + 1, 0]) for c in range(ncomp)) \
        + b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    rng = np.random.default_rng(seed ^ (w << 16) ^ h)
    out += bytes(int(v) & 0x7F for v in rng.integers(0, 128, 24))
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def synth_jpeg_real(w: int, h: int, gray: bool, seed: int = 0,
                    quality: int = 92) -> bytes:
    """A DECODABLE JPEG (round 4): seeded paper-like content (smooth
    low-frequency field + mild noise) encoded by the engine's own
    encoder, so /DCTDecode fixture streams now flow through the full
    decode -> MRC path instead of metadata-only.  Content is seeded
    from (seed, w, h) only — no draws from any shared RNG stream, so
    adding/removing these images never shifts sibling fixtures.

    Round 5: images where ``(w + h) % 3 == 0`` are emitted PROGRESSIVE
    (SOF2) instead of baseline — a pure function of (w, h), and the
    decoded pixels are bit-identical either way (shared quantized
    coefficients), so downstream pinned MRC hashes do not move while
    the fixture corpus exercises the progressive decode path."""
    from ..kernels.jpegcodec import encode_baseline, encode_progressive

    rng = np.random.default_rng((seed * 7919) ^ (w << 16) ^ h)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 180 + 40 * np.sin(xx / 7.0) + 30 * np.cos(yy / 5.0)
    img = np.clip(base + rng.integers(-12, 13, (h, w)),
                  0, 255).astype(np.uint8)
    if not gray:
        img = np.stack([img, np.roll(img, 3, axis=1), 255 - img], axis=-1)
    enc = encode_progressive if (w + h) % 3 == 0 else encode_baseline
    return enc(img, quality=quality)


def build_pdf(pages: list[dict], modern: bool = False,
              encrypt: str | None = None,
              encrypt_password: bytes = b"",
              encrypt_owner_password: bytes | None = None,
              inherit_rotate: int | None = None) -> bytes:
    """pages: [{width, height, rotate, images: [{w, h, gray: bool,
    data: bytes}], text: str | None, links: [{uri, rect}],
    inherit: bool}] -> PDF bytes.

    ``links`` emits /Subtype /Link annotations with /S /URI actions
    (the field the reference surfaces as ``link_uri``,
    ``bin/pdf-metadata-json:368-380``); even-indexed links inline the
    /A action, odd-indexed ones make it an indirect object, and pages
    at an odd page index store /Annots as an indirect array — so both
    wire shapes are exercised.  ``inherit=True`` omits /MediaBox and
    /Resources from the page dictionary: they move up to the /Pages
    tree node (inheritable attributes, ISO 32000-1 §7.7.3.4; image
    names switch to the globally-unique /Im<objnum> form since the
    XObject dictionary is then shared).  ``inherit_rotate`` puts
    /Rotate on the tree node the same way.

    ``modern=True`` emits the PDF 1.5 file structure: dictionary-only
    objects (pages tree, page dicts, catalog) packed into a compressed
    /ObjStm, and a /Type /XRef cross-reference *stream* (W [1 4 2]
    binary rows) instead of the classic table + trailer.  Same logical
    document either way — the parser must produce identical metadata.

    ``encrypt`` wraps every stream in the standard security handler:
    "rc4_40" (R2), "rc4" (R3 128-bit), "aes" (R4 AESV2) or "aes256"
    (R6 AESV3) — by default with the EMPTY user password (the
    owner-locked archival shape the reference reads through PyMuPDF);
    ``encrypt_password`` / ``encrypt_owner_password`` set real user /
    owner passwords instead (readers must then supply one)."""
    objects: list[bytes] = []          # 1-indexed object bodies (sans header)
    has_stream: list[bool] = []

    def add(body: bytes, stream: bool = False) -> int:
        objects.append(body)
        has_stream.append(stream)
        return len(objects)

    page_obj_ids = []
    pages_tree_id_placeholder = None

    # Build image + content objects per page first; page objects reference
    # a /Pages id we reserve at the end (forward refs are fine in PDF).
    pending_pages = []
    for page in pages:
        img_ids = []
        for img in page.get("images", []):
            cs = b"/DeviceGray" if img.get("gray", True) else b"/DeviceRGB"
            dparms = b""
            if img.get("dct"):
                # DCT-filtered image: payload is JPEG bytes as-is; the
                # parser must take dims/components from the SOF header.
                data = img["data"]
                filt = b"/DCTDecode"
            elif img.get("jpx"):
                # JPX-filtered image: payload is JP2 bytes; the parser
                # must take dims/components from the ihdr box.
                data = img["data"]
                filt = b"/JPXDecode"
            elif img.get("ccitt"):
                # CCITT 1-bit mask with K/Columns DecodeParms (K=-1
                # G4, K=0 1D G3, K>0 mixed G3).  ccitt_no_rows omits
                # /Rows (the /EndOfBlock-default self-delimiting
                # shape); ccitt_black1 adds /BlackIs1 true paired with
                # an image-level /Decode [1 0] — sample sense and
                # decode map flip together, so pixels are identical
                data = img["data"]
                filt = b"/CCITTFaxDecode"
                dparms = (b" /DecodeParms << /K "
                          + str(img.get("ccitt_k", -1)).encode()
                          + b" /Columns " + str(img["w"]).encode())
                if not img.get("ccitt_no_rows"):
                    dparms += b" /Rows " + str(img["h"]).encode()
                if img.get("ccitt_black1"):
                    dparms += b" /BlackIs1 true"
                if img.get("ccitt_eob_false"):
                    dparms += b" /EndOfBlock false"
                dparms += b" >>"
                if img.get("ccitt_flip_decode",
                           img.get("ccitt_black1", False)):
                    dparms += b" /Decode [1 0]"
            elif img.get("jbig2"):
                # JBIG2-filtered 1-bit mask: payload is an embedded
                # JBIG2 stream (the reference's default mask sink,
                # pdfhacks.py:60-70 JBIG2_TEMPL — 1-bit DeviceGray).
                # Symbol-mode fixtures carry the jbig2enc two-stream
                # shape: shared dictionaries in a /JBIG2Globals stream
                data = img["data"]
                filt = b"/JBIG2Decode"
                g = img.get("jbig2_globals")
                if g:
                    gid = add(b"<< /Length " + str(len(g)).encode()
                              + b" >>\nstream\n" + g + b"\nendstream",
                              stream=True)
                    dparms = (b" /DecodeParms << /JBIG2Globals "
                              + str(gid).encode() + b" 0 R >>")
            else:
                data = _flate(img["data"])
                filt = b"/FlateDecode"
            bpc = (b"1" if img.get("jbig2") or img.get("ccitt")
                   else b"8")
            body = (b"<< /Type /XObject /Subtype /Image /Width "
                    + str(img["w"]).encode() + b" /Height "
                    + str(img["h"]).encode()
                    + b" /ColorSpace " + cs
                    + b" /BitsPerComponent " + bpc + b" /Filter " + filt
                    + dparms
                    + b" /Length "
                    + str(len(data)).encode() + b" >>\nstream\n"
                    + data + b"\nendstream")
            img_ids.append(add(body, stream=True))

        # inherit pages share the tree node's XObject dict, so their
        # image names must be globally unique: /Im<objnum>
        names = ([b"Im%d" % oid for oid in img_ids]
                 if page.get("inherit")
                 else [b"Im%d" % i for i in range(len(img_ids))])
        ops = []
        for nm, img in zip(names, page.get("images", [])):
            ops.append(b"q %d 0 0 %d 10 10 cm /%s Do Q"
                       % (img["w"], img["h"], nm))
        if page.get("text"):
            ops.append(b"BT /F1 12 Tf 72 700 Td ("
                       + page["text"].encode("latin-1", "replace")
                       + b") Tj ET")
        content = _flate(b"\n".join(ops) if ops else b"")
        content_id = add(b"<< /Filter /FlateDecode /Length "
                         + str(len(content)).encode() + b" >>\nstream\n"
                         + content + b"\nendstream", stream=True)

        # /Link annotations: /A inline (even index) or indirect (odd)
        annot_ids = []
        for k, ln in enumerate(page.get("links", [])):
            uri = ln["uri"].encode("ascii")
            uri = (uri.replace(b"\\", rb"\\")
                   .replace(b"(", rb"\(").replace(b")", rb"\)"))
            action = b"<< /Type /Action /S /URI /URI (" + uri + b") >>"
            if k % 2 == 1:
                a_ref = b"%d 0 R" % add(action)
            else:
                a_ref = action
            rect = b" ".join(_num(v) for v in ln["rect"])
            annot_ids.append(add(
                b"<< /Type /Annot /Subtype /Link /Rect [" + rect
                + b"] /Border [0 0 0] /A " + a_ref + b" >>"))
        annots_frag = b""
        if annot_ids:
            arr = (b"[" + b" ".join(b"%d 0 R" % a for a in annot_ids)
                   + b"]")
            if len(pending_pages) % 2 == 1:     # odd page index:
                annots_frag = (b" /Annots %d 0 R"  # indirect array
                               % add(arr))
            else:
                annots_frag = b" /Annots " + arr
        pending_pages.append((page, img_ids, names, content_id,
                              annots_frag))

    pages_tree_id = len(objects) + len(pending_pages) + 1
    tree_xobj: list[bytes] = []       # inherited entries (tree node)
    tree_mediabox: bytes | None = None
    for page, img_ids, names, content_id, annots_frag in pending_pages:
        xobj = b" ".join(b"/%s %d 0 R" % (nm, oid)
                         for nm, oid in zip(names, img_ids))
        if page.get("inherit"):
            # inheritable attributes live on the /Pages node
            if xobj:
                tree_xobj.append(xobj)
            if tree_mediabox is None:
                tree_mediabox = (b"[0 0 " + str(page["width"]).encode()
                                 + b" " + str(page["height"]).encode()
                                 + b"]")
            attr = b""
        else:
            attr = (b" /MediaBox [0 0 " + str(page["width"]).encode()
                    + b" " + str(page["height"]).encode() + b"]"
                    + b" /Resources << /XObject << " + xobj + b" >> >>")
        body = (b"<< /Type /Page /Parent " + str(pages_tree_id).encode()
                + b" 0 R" + attr
                + (b" /Rotate " + str(page["rotate"]).encode()
                   if page.get("rotate") else b"")
                + annots_frag
                + b" /Contents " + str(content_id).encode() + b" 0 R >>")
        page_obj_ids.append(add(body))

    kids = b" ".join(b"%d 0 R" % oid for oid in page_obj_ids)
    tree_attrs = b""
    if tree_mediabox is not None:
        tree_attrs += b" /MediaBox " + tree_mediabox
    if tree_xobj:
        tree_attrs += (b" /Resources << /XObject << "
                       + b" ".join(tree_xobj) + b" >> >>")
    if inherit_rotate is not None:
        tree_attrs += b" /Rotate " + str(inherit_rotate).encode()
    tree_id = add(b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                  + str(len(page_obj_ids)).encode() + tree_attrs
                  + b" >>")
    assert tree_id == pages_tree_id
    catalog_id = add(b"<< /Type /Catalog /Pages "
                     + str(tree_id).encode() + b" 0 R >>")
    del pages_tree_id_placeholder

    handler = None
    trailer_extra = b""
    if encrypt is not None:
        from ..kernels.pdfcrypt import StdSecurityHandler, make_credentials
        r = {"rc4_40": 2, "rc4": 3, "aes": 4, "aes256": 6}[encrypt]
        id0 = b"\x01" * 16
        cred = make_credentials(r, p=-4, id0=id0,
                                password=encrypt_password,
                                owner_password=encrypt_owner_password)
        handler = StdSecurityHandler(
            v=cred["V"], r=cred["R"], length_bits=cred["Length"],
            p=-4, o=cred["O"], u=cred["U"], id0=id0,
            oe=cred.get("OE", b""), ue=cred.get("UE", b""),
            cfm=cred.get("CFM"), password=encrypt_password)
        for k in range(len(objects)):
            if has_stream[k]:
                objects[k] = _encrypt_stream_obj(objects[k], handler,
                                                 k + 1)
            elif not modern and b"(" in objects[k]:
                # classic form: strings in top-level objects (link
                # URIs) encrypt per-object; the 1.5 form covers them
                # via the encrypted /ObjStm container instead
                objects[k] = _encrypt_strings_obj(objects[k], handler,
                                                  k + 1)

        def hx(b):
            return b"<" + b.hex().encode() + b">"

        ed = (b"<< /Filter /Standard /V %d /R %d /Length %d /P -4 /O %s"
              b" /U %s" % (cred["V"], cred["R"], cred["Length"],
                           hx(cred["O"]), hx(cred["U"])))
        if "CFM" in cred:
            klen = 32 if r == 6 else 16
            ed += (b" /CF << /StdCF << /CFM /" + cred["CFM"].encode()
                   + b" /Length %d >> >> /StmF /StdCF /StrF /StdCF"
                   % klen)
        if r == 6:
            ed += b" /OE %s /UE %s" % (hx(cred["OE"]), hx(cred["UE"]))
        ed += b" >>"
        # stream=True keeps the encryption dictionary out of any
        # /ObjStm (it must be readable before decryption)
        enc_id = add(ed, stream=True)
        trailer_extra = (b" /Encrypt %d 0 R /ID [%s %s]"
                         % (enc_id, hx(id0), hx(id0)))

    if modern:
        return _emit_modern(objects, has_stream, catalog_id, handler,
                            trailer_extra)

    out = bytearray(b"%PDF-1.5\n%\xde\xad\xbe\xef\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R" % (len(objects) + 1,
                                                    catalog_id)
            + trailer_extra
            + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


def _num(v) -> bytes:
    """Compact PDF number token (int stays int, float trims zeros)."""
    if isinstance(v, int) or float(v).is_integer():
        return str(int(v)).encode()
    return (b"%.4f" % float(v)).rstrip(b"0").rstrip(b".")


def _encrypt_strings_obj(body: bytes, handler, num: int) -> bytes:
    """Encrypt every literal string in a non-stream object body and
    re-emit each as a hex string (classic-xref encrypted builds only:
    in the 1.5 form these objects pack into the /ObjStm whose
    container stream is encrypted whole, ISO 32000-1 §7.6.2)."""
    pat = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)

    def enc(m: "re.Match[bytes]") -> bytes:
        raw = (m.group(0)[1:-1]
               .replace(rb"\(", b"(").replace(rb"\)", b")")
               .replace(rb"\\", b"\\"))
        ct = handler.encrypt(raw, num, 0,
                             iv=num.to_bytes(8, "big") * 2)
        return b"<" + ct.hex().upper().encode("ascii") + b">"

    return pat.sub(enc, body)


def _encrypt_stream_obj(body: bytes, handler, num: int) -> bytes:
    """Encrypt one object's raw stream payload in place (Algorithm 1
    applies before filters on read = after filters on write) and
    refresh /Length to the ciphertext size."""
    i = body.find(b"stream\n")
    if i < 0:
        return body
    head = body[:i]
    data = body[i + len(b"stream\n"):]
    if data.endswith(b"\nendstream"):
        data = data[:-len(b"\nendstream")]
    ct = handler.encrypt(data, num, 0,
                         iv=num.to_bytes(8, "big") * 2)
    head = re.sub(rb"/Length\s+\d+",
                  b"/Length %d" % len(ct), head, count=1)
    return head + b"stream\n" + ct + b"\nendstream"


def _emit_modern(objects: list[bytes], has_stream: list[bool],
                 catalog_id: int, handler=None,
                 trailer_extra: bytes = b"") -> bytes:
    """Serialize with an /ObjStm for dictionary objects and a /XRef
    cross-reference stream (ISO 32000-1 §7.5.7-7.5.8)."""
    out = bytearray(b"%PDF-1.5\n%\xde\xad\xbe\xef\n")
    objstm_id = len(objects) + 1
    xref_id = len(objects) + 2
    entries: dict[int, tuple] = {0: (0, 0, 65535)}

    packed: list[tuple[int, bytes]] = []
    for oid, (body, streamy) in enumerate(zip(objects, has_stream), start=1):
        if streamy:
            entries[oid] = (1, len(out), 0)
            out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
        else:
            entries[oid] = (2, objstm_id, len(packed))
            packed.append((oid, body))

    header = b" ".join(b"%d %d" % (oid, off) for oid, off in
                       zip([o for o, _ in packed],
                           _running_offsets([b for _, b in packed])))
    payload = header + b"\n" + b" ".join(b for _, b in packed)
    zdata = _flate(payload)
    if handler is not None:                  # /ObjStm is a stream too
        zdata = handler.encrypt(zdata, objstm_id, 0,
                                iv=objstm_id.to_bytes(8, "big") * 2)
    entries[objstm_id] = (1, len(out), 0)
    out += (b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (objstm_id, len(packed), len(header) + 1, len(zdata))
            + zdata + b"\nendstream\nendobj\n")

    xref_pos = len(out)
    size = xref_id + 1
    entries[xref_id] = (1, xref_pos, 0)
    rows = bytearray()
    for oid in range(size):
        t, a, b = entries.get(oid, (0, 0, 0))
        rows += bytes([t]) + a.to_bytes(4, "big") + b.to_bytes(2, "big")
    zrows = _flate(bytes(rows))
    out += (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root %d 0 R"
            % (xref_id, size, catalog_id)
            + trailer_extra
            + b" /Filter /FlateDecode /Length %d >>\nstream\n"
            % len(zrows)
            + zrows + b"\nendstream\nendobj\n")
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)


def _running_offsets(bodies: list[bytes]) -> list[int]:
    """Byte offset of each packed object inside the /ObjStm payload
    (bodies joined by single spaces, after the /First header)."""
    offs, cur = [], 0
    for body in bodies:
        offs.append(cur)
        cur += len(body) + 1                 # + separating space
    return offs


def synth_pdf(seed: int, modern: bool | None = None) -> bytes:
    """Seeded synthetic multi-page PDF with a gray/RGB image mix and an
    optional text layer per page.  ``modern`` picks the 1.5 file
    structure (xref stream + /ObjStm); None alternates by seed parity so
    mixed corpora exercise both forms."""
    if modern is None:
        modern = bool(seed % 2)
    rng = np.random.default_rng(seed)
    pages = []
    for _ in range(int(rng.integers(1, 6))):
        images = []
        for _ in range(int(rng.integers(0, 3))):
            gray = bool(rng.random() < 0.5)
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            u = rng.random()
            if u < 0.2:                   # DCT-filtered (JPEG) image,
                # real + decodable since round 4: exercises the baseline
                # decoder -> MRC path in every synth_pdf consumer
                images.append({"w": w, "h": h, "gray": gray, "dct": True,
                               "data": synth_jpeg_real(w, h, gray,
                                                       seed=seed)})
                continue
            if u < 0.35:                  # JPX-filtered (JPEG 2000) image,
                # real + losslessly decodable since round 5: exercises
                # the reversible JP2 decoder -> MRC path
                images.append({"w": w, "h": h, "gray": gray, "jpx": True,
                               "data": synth_jp2_real(w, h, gray,
                                                      seed=seed)})
                continue
            if 0.45 <= u < 0.52:          # CCITT 1-bit mask (round 6
                # late): the pre-JBIG2 archival format, decodable
                # through the T.4/T.6 codec -> MRC path.  Round 7:
                # even-width fixtures omit /Rows (self-delimiting
                # /EndOfBlock decode) and odd-height fixtures carry
                # /BlackIs1 true + /Decode [1 0] — pixel-identical by
                # construction, so the parameter envelope is exercised
                # without moving any decoded-content pin
                cdata, ck, cnr = synth_ccitt_real(w, h, seed=seed)
                images.append({"w": w, "h": h, "gray": True,
                               "ccitt": True, "ccitt_k": ck,
                               "ccitt_no_rows": cnr,
                               "ccitt_black1": h % 2 == 1,
                               "data": cdata})
                continue
            if u < 0.45:                  # JBIG2-filtered 1-bit mask,
                # real + losslessly decodable since round 6: exercises
                # the generic-region decoder -> MRC path (the
                # reference's default mask sink); symbol-mode fixtures
                # use the jbig2enc /JBIG2Globals two-stream shape
                jb = synth_jbig2_real(w, h, seed=seed)
                entry = {"w": w, "h": h, "gray": True, "jbig2": True}
                if isinstance(jb, tuple):
                    entry["jbig2_globals"], entry["data"] = jb
                else:
                    entry["data"] = jb
                images.append(entry)
                continue
            n = w * h * (1 if gray else 3)
            images.append({"w": w, "h": h, "gray": gray,
                           "data": rng.integers(0, 256, n,
                                                dtype=np.uint8).tobytes()})
        # ~40% of pages carry /Link URI annotations (round 9): the
        # reference's analyse() surfaces these as `hyperlinks`
        # (bin/pdf-metadata-json:367-380), and the recompress product
        # must carry them through untouched
        links = []
        if rng.random() < 0.4:
            for _k in range(int(rng.integers(1, 3))):
                x0 = float(rng.integers(20, 400))
                y0 = float(rng.integers(20, 600))
                links.append({
                    "uri": "https://archive.example/%d/%d"
                           % (seed, rng.integers(10000)),
                    "rect": [x0, y0, x0 + float(rng.integers(20, 160)),
                             y0 + float(rng.integers(8, 24))]})
        pages.append({
            "width": int(rng.choice([612, 595, 842])),
            "height": int(rng.choice([792, 842, 1191])),
            "rotate": int(rng.choice([0, 0, 0, 90, 180, 270])),
            "images": images,
            "links": links,
            "text": ("page text %d" % rng.integers(1000)
                     if rng.random() < 0.7 else None),
        })
    # every 7th doc is ENCRYPTED (standard security handler, empty
    # user password, revision rotating by seed) — parse output is
    # byte-identical to the plaintext build, so every pinned consumer
    # exercises the decrypt path without moving a pin (round 7)
    encrypt = (None if seed % 7
               else ["rc4", "aes", "rc4_40", "aes256"][(seed // 7) % 4])
    return build_pdf(pages, modern=modern, encrypt=encrypt)

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

import zlib

import numpy as np

__all__ = ["build_pdf", "synth_pdf"]


def _flate(data: bytes) -> bytes:
    return zlib.compress(data, 6)


def build_pdf(pages: list[dict]) -> bytes:
    """pages: [{width, height, rotate, images: [{w, h, gray: bool,
    data: bytes}], text: str | None}] -> PDF bytes."""
    objects: list[bytes] = []          # 1-indexed object bodies (sans header)

    def add(body: bytes) -> int:
        objects.append(body)
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
            data = _flate(img["data"])
            body = (b"<< /Type /XObject /Subtype /Image /Width "
                    + str(img["w"]).encode() + b" /Height "
                    + str(img["h"]).encode()
                    + b" /ColorSpace " + cs
                    + b" /BitsPerComponent 8 /Filter /FlateDecode /Length "
                    + str(len(data)).encode() + b" >>\nstream\n"
                    + data + b"\nendstream")
            img_ids.append(add(body))

        ops = []
        for i, img in enumerate(page.get("images", [])):
            ops.append(b"q %d 0 0 %d 10 10 cm /Im%d Do Q"
                       % (img["w"], img["h"], i))
        if page.get("text"):
            ops.append(b"BT /F1 12 Tf 72 700 Td ("
                       + page["text"].encode("latin-1", "replace")
                       + b") Tj ET")
        content = _flate(b"\n".join(ops) if ops else b"")
        content_id = add(b"<< /Filter /FlateDecode /Length "
                         + str(len(content)).encode() + b" >>\nstream\n"
                         + content + b"\nendstream")
        pending_pages.append((page, img_ids, content_id))

    pages_tree_id = len(objects) + len(pending_pages) + 1
    for page, img_ids, content_id in pending_pages:
        xobj = b" ".join(b"/Im%d %d 0 R" % (i, oid)
                         for i, oid in enumerate(img_ids))
        body = (b"<< /Type /Page /Parent " + str(pages_tree_id).encode()
                + b" 0 R /MediaBox [0 0 " + str(page["width"]).encode()
                + b" " + str(page["height"]).encode() + b"]"
                + (b" /Rotate " + str(page["rotate"]).encode()
                   if page.get("rotate") else b"")
                + b" /Resources << /XObject << " + xobj + b" >> >>"
                + b" /Contents " + str(content_id).encode() + b" 0 R >>")
        page_obj_ids.append(add(body))

    kids = b" ".join(b"%d 0 R" % oid for oid in page_obj_ids)
    tree_id = add(b"<< /Type /Pages /Kids [" + kids + b"] /Count "
                  + str(len(page_obj_ids)).encode() + b" >>")
    assert tree_id == pages_tree_id
    catalog_id = add(b"<< /Type /Catalog /Pages "
                     + str(tree_id).encode() + b" 0 R >>")
    del pages_tree_id_placeholder

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
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, catalog_id, xref_pos))
    return bytes(out)


def synth_pdf(seed: int) -> bytes:
    """Seeded synthetic multi-page PDF with a gray/RGB image mix and an
    optional text layer per page."""
    rng = np.random.default_rng(seed)
    pages = []
    for _ in range(int(rng.integers(1, 6))):
        images = []
        for _ in range(int(rng.integers(0, 3))):
            gray = bool(rng.random() < 0.5)
            w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
            n = w * h * (1 if gray else 3)
            images.append({"w": w, "h": h, "gray": gray,
                           "data": rng.integers(0, 256, n,
                                                dtype=np.uint8).tobytes()})
        pages.append({
            "width": int(rng.choice([612, 595, 842])),
            "height": int(rng.choice([792, 842, 1191])),
            "rotate": int(rng.choice([0, 0, 0, 90, 180, 270])),
            "images": images,
            "text": ("page text %d" % rng.integers(1000)
                     if rng.random() < 0.7 else None),
        })
    return build_pdf(pages)

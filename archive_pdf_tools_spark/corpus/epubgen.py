"""Deterministic EPUB fixtures for the epub-to-pdf front door.

``synth_epub(seed)`` builds a seeded EPUB 2 container: mimetype (first,
stored), META-INF/container.xml, an OPF package (dc: metadata, manifest,
spine), 2-4 XHTML chapters with headings/paragraphs, EXTERNAL links
(kept by the converter) and INTERNAL anchors (the reference's
LINK_NAMED skip case), and a nested ``toc.ncx`` navMap on odd seeds
(even seeds exercise the spine-order TOC fallback)."""

from __future__ import annotations

import io
import zipfile

import numpy as np

__all__ = ["build_epub", "synth_epub"]


def build_epub(chapters: list[dict], metadata: dict | None = None,
               ncx: bool = True) -> bytes:
    """chapters: [{title, paras: [str], ext_links: [(uri, anchor)],
    int_links: [str]}] -> EPUB bytes.  ``ncx=True`` adds a toc.ncx
    whose navMap nests every second chapter one level deeper."""
    md = dict(metadata or {})
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip",
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/container.xml", (
            '<?xml version="1.0"?>\n'
            '<container version="1.0" xmlns="urn:oasis:names:tc:'
            'opendocument:xmlns:container">\n'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            '\n</container>'))

        items, spine = [], []
        for i, ch in enumerate(chapters):
            href = f"ch{i}.xhtml"
            body = [f"<h1>{ch['title']}</h1>"]
            for k, para in enumerate(ch.get("paras", [])):
                body.append(f"<p>{para}</p>")
            for uri, anchor in ch.get("ext_links", []):
                body.append(f'<p>See <a href="{uri}">{anchor}</a> '
                            'for more.</p>')
            for target in ch.get("int_links", []):
                body.append(f'<p><a href="{target}">next</a></p>')
            zf.writestr(f"OEBPS/{href}", (
                '<?xml version="1.0" encoding="utf-8"?>\n'
                '<html xmlns="http://www.w3.org/1999/xhtml">'
                f"<head><title>{ch['title']}</title></head>"
                "<body>" + "".join(body) + "</body></html>"))
            items.append(f'<item id="c{i}" href="{href}" '
                         'media-type="application/xhtml+xml"/>')
            spine.append(f'<itemref idref="c{i}"/>')
        if ncx:
            items.append('<item id="ncx" href="toc.ncx" '
                         'media-type="application/x-dtbncx+xml"/>')
            nav = []
            for i, ch in enumerate(chapters):
                point = (f'<navPoint id="n{i}" playOrder="{i + 1}">'
                         f'<navLabel><text>{ch["title"]}</text>'
                         f'</navLabel><content src="ch{i}.xhtml"/>')
                if i % 2 == 1 and nav:          # nest under previous
                    nav[-1] = nav[-1][:-len("</navPoint>")] \
                        if nav[-1].endswith("</navPoint>") else nav[-1]
                    nav[-1] += point + "</navPoint></navPoint>"
                else:
                    nav.append(point + "</navPoint>")
            zf.writestr("OEBPS/toc.ncx", (
                '<?xml version="1.0"?>\n'
                '<ncx xmlns="http://www.daisy.org/z3986/2005/ncx/" '
                'version="2005-1"><navMap>' + "".join(nav)
                + "</navMap></ncx>"))
        zf.writestr("OEBPS/content.opf", (
            '<?xml version="1.0"?>\n'
            '<package xmlns="http://www.idpf.org/2007/opf" '
            'version="2.0" unique-identifier="id">'
            '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
            f"<dc:title>{md.get('title', 'Untitled')}</dc:title>"
            f"<dc:creator>{md.get('author', 'anon')}</dc:creator>"
            f"<dc:language>{md.get('language', 'en')}</dc:language>"
            "</metadata>"
            "<manifest>" + "".join(items) + "</manifest>"
            '<spine toc="ncx">' + "".join(spine) + "</spine>"
            "</package>"))
    return buf.getvalue()


_WORDS = ("archive scan page lexical corpus shard merge spark batch "
          "window codec raster mask layer outline").split()


def synth_epub(seed: int) -> bytes:
    rng = np.random.default_rng(900 + seed)
    n_ch = 2 + seed % 3
    chapters = []
    for i in range(n_ch):
        paras = []
        for p in range(2 + int(rng.integers(0, 3))):
            n = 12 + int(rng.integers(0, 30))
            paras.append(" ".join(
                _WORDS[int(w)] for w in rng.integers(0, len(_WORDS),
                                                     n)))
        ext, internal = [], []
        if i % 2 == 0:
            ext.append((f"https://archive.example/{seed}/{i}",
                        f"resource {i}"))
        if i + 1 < n_ch:
            internal.append(f"ch{i + 1}.xhtml#top")
        chapters.append({"title": f"Chapter {i + 1} of book {seed}",
                         "paras": paras, "ext_links": ext,
                         "int_links": internal})
    return build_epub(
        chapters,
        metadata={"title": f"Book {seed}", "author": f"Author {seed}",
                  "language": "en"},
        ncx=bool(seed % 2))

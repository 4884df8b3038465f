"""Deterministic HTML fixtures for the main-content extractor.

``synth_html`` wraps prose in realistic chrome (head junk, header, nav
link bar, link-dense sidebar, footer) around a ``<main>`` of 40-word
paragraphs, with an ``<img>`` after the first paragraph on every doc the
caller flags.  The generator's layout arithmetic is mirrored by the
``html_extract`` oracle SQL, so the extractor is verified to recover
exactly the main content and nothing else.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

__all__ = ["synth_html", "WORDS_PER_PARA", "MAX_WORDS"]

WORDS_PER_PARA = 40
MAX_WORDS = 400


def synth_html(doc_id: int, text: str, with_image: bool) -> str:
    words = text.split()[:MAX_WORDS]
    paras = [words[i:i + WORDS_PER_PARA]
             for i in range(0, len(words), WORDS_PER_PARA)]
    body = []
    for p_idx, chunk in enumerate(paras):
        body.append(f"<p>{escape(' '.join(chunk))}</p>")
        if with_image and p_idx == 0:
            body.append(f'<img src="img://doc/{doc_id}/0"/>')
    if with_image and not paras:
        body.append(f'<img src="img://doc/{doc_id}/0"/>')
    return f"""<html><head><title>doc {doc_id}</title>
<style>body {{ color: black }}</style>
<script>var x = {doc_id};</script></head>
<body>
<header><h1>Synthetic Site</h1></header>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/more">More pages here</a></nav>
<div class="sidebar"><a href="/l1">related link one</a> <a href="/l2">related link two</a> <a href="/l3">related link three</a></div>
<main>
{''.join(body)}
</main>
<footer><p>copyright boilerplate notice with enough words to look real</p></footer>
</body></html>"""

"""Text-layer extraction: reading order + baseline placement math.

Re-derives the reference's hOCR→PDF text-op renderer (itself a port of
Tesseract's pdfrenderer.cpp): ``internetarchivepdf/pdfrenderer.py:61-207``
(state machine), ``:449-549`` (baseline / affine / codepoint helpers).

The Spark pipeline does not write PDFs; the observable outputs here are

* the ordered per-line extracted text (paragraph → line → word traversal
  with the paragraph empty-skip of ``pdfrenderer.py:92-103`` and invalid
  codepoints dropped, ``pdfrenderer.py:529-544``), and
* the exact text-op stream bytes (``Tm/Td/Tf/Tz/TJ`` with ``prec``/
  ``floatbytes`` formatting) — used as a placement digest so the golden
  tests pin the placement math bit-for-bit.

Quirks preserved on purpose (they are the reference's semantics):

* ``first_word_of_line`` is only cleared in the ``Td`` branch
  (``pdfrenderer.py:160``), so the word after a ``Tm`` recomputes the line
  baseline.
* Fontsize fallback uses the *pixel-space* clipped line height
  (``pdfrenderer.py:168-177``).
* ``Tf`` renders ``str(fontsize)`` verbatim (int vs float spelling).
* Every word appends the synthetic space codepoint ``0020``
  (``pdfrenderer.py:190-192``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from math import atan2, cos, sin

__all__ = ["prec", "floatbytes", "dist2", "get_word_baseline",
           "affine_matrix", "clip_baseline", "codepoint_to_utf16be",
           "render_text_layer", "PageTextResult"]

WRITING_DIRECTION_UNSPECIFIED = 0
WRITING_DIRECTION_LEFT_TO_RIGHT = 1
WRITING_DIRECTION_RIGHT_TO_LEFT = 2
WRITING_DIRECTION_TOP_TO_BOTTOM = 3

K_CHAR_WIDTH = 2
K_DEFAULT_FONTSIZE = 8


def prec(x: float) -> float:
    """Round to 1/1000 avoiding -0 (``pdfrenderer.py:449-454``)."""
    kPrecision = 1000.0
    a = round(x * kPrecision) / kPrecision
    if a == -0:
        return 0.0
    return a


def floatbytes(v: float, precision: int = 8) -> bytes:
    """Fixed-point formatting, no scientific notation
    (``pdfrenderer.py:547-549``)."""
    return ("{:.%df}" % precision).format(v).encode("ascii")


def dist2(x1, y1, x2, y2):
    return (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)


def get_word_baseline(writing_direction, ppi, height,
                      word_x1, word_y1, word_x2, word_y2,
                      line_x1, line_y1, line_x2, line_y2):
    """Project the word origin onto the line baseline and convert to PDF
    points (``pdfrenderer.py:461-493``)."""
    if writing_direction == WRITING_DIRECTION_RIGHT_TO_LEFT:
        word_x1, word_x2 = word_x2, word_x1
        word_y1, word_y2 = word_y2, word_y1

    px, py = word_x1, word_y1
    l2 = float(dist2(line_x1, line_y1, line_x2, line_y2))
    if l2 == 0:
        x = line_x1
        y = line_y1
    else:
        t = ((px - line_x2) * (line_x2 - line_x1) +
             (py - line_y2) * (line_y2 - line_y1)) / l2
        x = line_x2 + t * (line_x2 - line_x1)
        y = line_y2 + t * (line_y2 - line_y1)

    word_length = float(dist2(word_x1, word_y1, word_x2, word_y2) ** 0.5)
    word_length = word_length * 72.0 / ppi
    x = x * 72 / ppi
    y = height - (y * 72.0 / ppi)
    return x, y, word_length


def affine_matrix(writing_direction, line_x1, line_y1, line_x2, line_y2):
    """Rotation from the baseline angle; RTL sign flip
    (``pdfrenderer.py:495-513``)."""
    theta = atan2(float(line_y1 - line_y2), float(line_x2 - line_x1))
    a, b, c, d = cos(theta), sin(theta), -sin(theta), cos(theta)
    if writing_direction == WRITING_DIRECTION_RIGHT_TO_LEFT:
        a, b = -a, -b
    return a, b, c, d


def clip_baseline(ppi, x1, y1, x2, y2):
    """Flatten near-horizontal baselines (``pdfrenderer.py:516-526``)."""
    line_x1, line_y1, line_x2, line_y2 = x1, y1, x2, y2
    rise = abs(y2 - y1) * 72
    run = abs(x2 - x1) * 72
    if rise < 2 * ppi and 2 * ppi < run:
        line_y1 = line_y2 = (y1 + y2) / 2
    return line_x1, line_y1, line_x2, line_y2


def codepoint_to_utf16be(code: int):
    """(ok, hex-bytes) — surrogate-pair split, invalid dropped
    (``pdfrenderer.py:529-544``)."""
    if ((code > 0xD7FF) and (code < 0xE000)) or (code > 0x10FFFF):
        return False, None
    if code < 0x10000:
        res = "%04X" % code
    else:
        a = code - 0x010000
        high = (0x03FF & (a >> 10)) + 0xD800
        low = (0x03FF & a) + 0xDC00
        res = "%04X%04X" % (high, low)
    return True, res.encode("ascii")


@dataclass
class PageTextResult:
    lines: list[str] = field(default_factory=list)      # per surviving line
    text_ops: bytes = b""                               # placement digest
    dropped_codepoints: int = 0


def render_text_layer(word_data: list, width: float, height: float,
                      ppi: float, hocr_ppi=None) -> PageTextResult:
    """The ``GetPDFTextObjects`` traversal (``pdfrenderer.py:61-207``),
    textonly, emitting (line texts, text-op bytes)."""
    res = PageTextResult()

    old_x = 0.0
    old_y = 0.0
    old_fontsize = 0
    old_writing_direction = WRITING_DIRECTION_LEFT_TO_RIGHT
    new_block = True
    a, b, c, d = 1.0, 0.0, 0.0, 1.0

    pdf_str = (b"q " + floatbytes(prec(width), 3) + b" 0 0 "
               + floatbytes(prec(height), 3) + b" 0 0 cm Q\n")

    line_x1 = line_y1 = line_x2 = line_y2 = 0
    writing_direction = WRITING_DIRECTION_LEFT_TO_RIGHT

    for paragraph in word_data:
        # Paragraph skip: whitespace-only concatenated text
        # (pdfrenderer.py:92-103).
        linetext = "".join(ch for line in paragraph["lines"]
                           for word in line["words"] for ch in word["text"])
        if linetext.strip() == "":
            continue

        pdf_str += b"BT\n3 Tr"
        old_fontsize = 0
        new_block = True

        for line in paragraph["lines"]:
            first_word_of_line = True
            line_words: list[str] = []
            for word in line["words"]:
                if first_word_of_line:
                    bx1, by1, bx2, by2 = line["bbox"]
                    slope, const = line["baseline"]
                    x1 = bx1
                    y1 = by2 + const
                    x2 = bx2
                    dx = x2 - x1
                    y2 = y1 + slope * dx
                    line_x1, line_y1, line_x2, line_y2 = \
                        clip_baseline(ppi, x1, y1, x2, y2)
                    writing_direction = word["writing_direction"]
                    if writing_direction == WRITING_DIRECTION_UNSPECIFIED:
                        writing_direction = WRITING_DIRECTION_LEFT_TO_RIGHT

                word_x1, word_y1, word_x2, word_y2 = word["bbox"]
                x, y, word_length = get_word_baseline(
                    writing_direction, ppi, height,
                    word_x1, word_y1, word_x2, word_y2,
                    line_x1, line_y1, line_x2, line_y2)

                if (writing_direction != old_writing_direction) or new_block:
                    a, b, c, d = affine_matrix(
                        writing_direction, line_x1, line_y1, line_x2, line_y2)
                    pdf_str += (b" " + floatbytes(prec(a)) +
                                b" " + floatbytes(prec(b)) +
                                b" " + floatbytes(prec(c)) +
                                b" " + floatbytes(prec(d)) +
                                b" " + floatbytes(prec(x)) +
                                b" " + floatbytes(prec(y)) +
                                b" Tm ")
                    new_block = False
                else:
                    dx = x - old_x
                    dy = y - old_y
                    pdf_str += b" " + floatbytes(prec(dx * a + dy * b))
                    pdf_str += b" " + floatbytes(prec(dx * c + dy * d))
                    pdf_str += b" Td "
                    first_word_of_line = False

                old_x = x
                old_y = y
                old_writing_direction = writing_direction

                fontsize = word["fontsize"]
                if fontsize <= 0:                       # pdfrenderer.py:168-174
                    line_height = abs(line_y2 - line_y1)
                    fontsize = line_height
                    if fontsize <= 0:
                        fontsize = K_DEFAULT_FONTSIZE
                if fontsize != old_fontsize:
                    pdf_str += b"/f-0-0 " + str(fontsize).encode("ascii") + b" Tf "
                    old_fontsize = fontsize

                pdf_word = b""
                pdf_word_len = 0
                kept_chars: list[str] = []
                for char in word["text"]:
                    ok, utf16 = codepoint_to_utf16be(ord(char))
                    if ok:
                        pdf_word += utf16
                        pdf_word_len += 1
                        kept_chars.append(char)
                    else:
                        res.dropped_codepoints += 1

                pdf_word += b"0020"                     # pdfrenderer.py:190-192
                pdf_word_len += 1

                if word_length > 0 and pdf_word_len > 0:
                    h_stretch = K_CHAR_WIDTH * prec(
                        100.0 * word_length / (fontsize * pdf_word_len))
                    pdf_str += floatbytes(h_stretch) + b" Tz"
                    pdf_str += b" [ <" + pdf_word
                    pdf_str += b"> ] TJ"

                line_words.append("".join(kept_chars))

            pdf_str += b" \n"
            # The extracted line text: surviving word texts in order.
            line_text = " ".join(line_words)
            if line_text.strip() != "":
                res.lines.append(line_text)

        pdf_str += b"ET\n"

    res.text_ops = pdf_str
    return res

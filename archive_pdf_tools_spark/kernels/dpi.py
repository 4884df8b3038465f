"""DPI guessing and PDF/A page-geometry fallback chain.

Re-derives ``internetarchivepdf/recode.py:62-84`` (``guess_dpi``) and the
page-size clamp chain of ``recode.py:145-203`` (per-page dpi → document
dpi → guessed dpi → clamped minimum, with the PDFA_MIN/MAX_UNITS bounds of
``recode.py:56-57``).
"""

from __future__ import annotations

__all__ = ["guess_dpi", "page_geometry", "PDFA_MIN_UNITS", "PDFA_MAX_UNITS",
           "WARN_INVALID_PAGE_SIZE"]

PDFA_MIN_UNITS = 3
PDFA_MAX_UNITS = 14400

WARN_INVALID_PAGE_SIZE = "invalid-page-size"


def guess_dpi(w: int, h: int, expected_format=(8.27, 11.69),
              round_to=(72, 96, 150, 300, 600)) -> int:
    """Best-fit dpi from (w, h) against an expected A4 page
    (``recode.py:62-84``).  Stable sort => ties resolve to the earlier
    candidate, like the reference's ``sorted(...)[0]``."""
    w_dpi = w / expected_format[0]
    h_dpi = h / expected_format[1]
    diffs = [(dpi, abs(w_dpi - dpi) + abs(h_dpi - dpi)) for dpi in round_to]
    return sorted(diffs, key=lambda x: x[1])[0][0]


def page_geometry(imwidth: int, imheight: int, doc_dpi=None, per_page_dpi=None):
    """The imagestack page-geometry chain (``recode.py:145-203``).

    Returns ``(width, height, ppi, warnings)`` where width/height are PDF
    units and ppi the pixels-per-inch used for text placement.
    """
    warnings: list[str] = []
    page_dpi = doc_dpi
    if per_page_dpi is not None:
        try:
            page_dpi = int(per_page_dpi)
        except (TypeError, ValueError):
            per_page_dpi = None  # keep item-wide dpi (recode.py:148-153)

    if page_dpi is None:
        page_dpi = guess_dpi(imwidth, imheight)

    page_width = imwidth / (page_dpi / 72)
    page_height_override = None
    if page_width <= PDFA_MIN_UNITS or page_width >= PDFA_MAX_UNITS:
        # recode.py:165-196 — 3-stage fallback
        if per_page_dpi is not None and doc_dpi:
            page_width = imwidth / (doc_dpi / 72)
        if page_width <= PDFA_MIN_UNITS or page_width >= PDFA_MAX_UNITS:
            page_dpi = guess_dpi(imwidth, imheight)
            page_width = imwidth / (page_dpi / 72)
        if page_width <= PDFA_MIN_UNITS or page_width >= PDFA_MAX_UNITS:
            page_width = PDFA_MIN_UNITS + 1
            page_height_override = PDFA_MIN_UNITS + 1
        warnings.append(WARN_INVALID_PAGE_SIZE)

    scaler = page_width / imwidth
    ppi = 72.0 / scaler
    width = page_width
    height = imheight * scaler
    # NOTE: the reference computes page_height = MIN+1 in the final clamp
    # but then still derives height from the scaler (recode.py:191-203);
    # we preserve that (page_height_override is informational only).
    del page_height_override
    return width, height, ppi, warnings


def pick_font_scaler(hocr_dpi, ppi: float) -> float:
    """``recode.py:205-209``."""
    if hocr_dpi is not None:
        return hocr_dpi / ppi
    return 72.0 / ppi

"""Page-selection helpers: HQ-page flags and box-mean downsampling.

* ``parse_hq_pages`` — semantics of ``recode.py:657-675``: comma list of
  1-indexed page numbers, negative values index from the end, values 0
  pass through as index 0... precisely: ``i > 0`` becomes ``i-1`` (so 0
  stays 0 == first page, matching the reference); out-of-range entries
  (by ``abs(i)``) are silently ignored "for automation purposes".
* ``downsample_box`` — C23 stand-in for the reference's PIL
  ``thumbnail(LANCZOS)`` (``recode.py:368-371``, ``mrc.py:420-434,
  454-468``): integer target size ``(w//f, h//f)``; *documented
  deviation*: box-mean resampling instead of Lanczos (PIL is not on the
  cluster; the hash contract uses this kernel on both sides).  Returns
  ``(array, warned)`` where ``warned`` mirrors the
  too-small-to-downsample runtime warning
  (``RECODE_RUNTIME_WARNING_TOO_SMALL_TO_DOWNSAMPLE``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_hq_pages", "downsample_box", "downsample_lanczos",
           "WARN_TOO_SMALL_TO_DOWNSAMPLE"]

WARN_TOO_SMALL_TO_DOWNSAMPLE = "too-small-to-downsample"


def parse_hq_pages(hq_pages: str | None, page_count: int) -> list[bool]:
    flags = [False] * page_count
    if hq_pages is None or hq_pages == "":
        return flags
    for tok in hq_pages.split(","):
        i = int(tok)
        if i > 0:
            i = i - 1
        if abs(i) >= page_count:
            continue          # silently ignore (recode.py:667-672)
        flags[i] = True
    return flags


def downsample_box(img: np.ndarray, factor: float):
    """(h, w[, ch]) uint8 -> box-mean downsample to (h//f, w//f)."""
    h, w = img.shape[:2]
    w_t = int(w / factor)
    h_t = int(h / factor)
    if w_t <= 0 or h_t <= 0:
        return img, True      # too small: unchanged + warning (mrc.py:429-431)
    ch = img.shape[2:]
    if img.dtype == np.uint8:
        from . import native as _ckern

        res = _ckern.box_downsample_native(img, h_t, w_t)
        if res is not None:
            return res, False
    # Integer box edges (area mapping): pixel j of the output averages
    # source cols [j*w//w_t, (j+1)*w//w_t) — exact integer arithmetic.
    ys = (np.arange(h_t + 1) * h) // h_t
    xs = (np.arange(w_t + 1) * w) // w_t
    acc = np.add.reduceat(np.add.reduceat(
        img.astype(np.int64), ys[:-1], axis=0), xs[:-1], axis=1)
    counts = ((ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :])
    if ch:
        counts = counts[:, :, None]
    out = (acc // counts).astype(np.uint8)
    return out, False


def _lanczos_weights(n_src: int, n_dst: int, a: int = 3) -> np.ndarray:
    """(n_dst, n_src) row-stochastic Lanczos-a resampling matrix for one
    axis (the public windowed-sinc filter PIL's LANCZOS implements:
    kernel sinc(x)*sinc(x/a) on |x|<a, stretched by the scale factor
    when minifying, weights normalized per output pixel)."""
    scale = n_src / n_dst
    stretch = max(scale, 1.0)
    support = a * stretch
    centers = (np.arange(n_dst) + 0.5) * scale          # in source coords
    lo = np.floor(centers - support).astype(np.int64)
    width = int(np.ceil(2 * support)) + 2
    idx = lo[:, None] + np.arange(width)[None, :]       # candidate taps
    x = ((idx + 0.5) - centers[:, None]) / stretch
    with np.errstate(invalid="ignore", divide="ignore"):
        k = np.sinc(x) * np.sinc(x / a)
    k[np.abs(x) >= a] = 0.0
    valid = (idx >= 0) & (idx < n_src)
    k = np.where(valid, k, 0.0)
    k /= k.sum(axis=1, keepdims=True)
    W = np.zeros((n_dst, n_src))
    np.add.at(W, (np.repeat(np.arange(n_dst), width),
                  np.clip(idx, 0, n_src - 1).ravel()), k.ravel())
    return W


def downsample_lanczos(img: np.ndarray, factor: float):
    """C23 — Lanczos-3 resample to (h//f, w//f), the reference's PIL
    ``Image.LANCZOS`` semantics (``recode.py:368-371``) re-derived as a
    separable weight-matrix product.  Algorithmic fidelity, not PIL
    bit-parity (PIL's fixed-point path is not reproducible without PIL;
    deviation documented, same standing as the skimage kernels).
    Returns (array, too_small_warning) like ``downsample_box``."""
    h, w = img.shape[:2]
    w_t = int(w / factor)
    h_t = int(h / factor)
    if w_t <= 0 or h_t <= 0:
        return img, True
    Wy = _lanczos_weights(h, h_t)
    Wx = _lanczos_weights(w, w_t)
    src = img.astype(np.float64)
    if img.ndim == 3:
        out = np.einsum("yh,hwc,xw->yxc", Wy, src, Wx, optimize=True)
    else:
        out = Wy @ src @ Wx.T
    return np.clip(np.round(out), 0, 255).astype(np.uint8), False

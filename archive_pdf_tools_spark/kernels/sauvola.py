"""Sauvola binarization, vectorized.

Re-derives the semantics of the reference's incremental integral-image
Sauvola kernel (``cython/sauvola.pyx:29-222``) and its wrapper
``threshold_image`` (``internetarchivepdf/mrc.py:58-87``) as whole-image
NumPy expressions (2-D cumulative-sum integral images instead of the
reference's row-sliding column integrals — same arithmetic, O(1)/pixel).

Semantics reproduced exactly (verified against the slow per-pixel oracle in
tests):

* Window geometry: for window (ww, wh) the pixel at (y, x) sees columns
  ``[x-l+1, x+r]`` and rows ``[y-o+1, y+u]`` clamped to the image, with
  ``l=(ww+1)//2, r=ww//2, o=(wh+1)//2, u=wh//2`` (``sauvola.pyx:74-77``).
  ``count`` is the clamped pixel count (the reference's three-phase
  left/middle/right sweep, ``sauvola.pyx:131-218``).
* Integer division: the reference is compiled with ``cdivision(True)`` so
  ``mean = sum/count`` and ``square_sum/count`` are C *truncated integer*
  divisions (``sauvola.pyx:144-145``); all inputs are non-negative so this
  is floor division.
* Decision (``sauvola.pyx:143-152``): with ``k2 = k*k/R/R``,
  ``tmp = px + mean*(k-1)``; for ``k >= 0`` a pixel is "ink" iff
  ``tmp <= 0 or tmp*tmp <= mean*mean*k2*variance``; for ``k < 0`` iff
  ``tmp <= 0 and tmp*tmp >= mean*mean*k2*variance``.
* The wrapper (``mrc.py:58-87``) derives window = ``int(dpi/4)`` forced odd
  (default 51 when dpi is None), k defaults 0.34, R=128, and *inverts* the
  raw kernel output, so the returned boolean mask is True on ink.

Documented deviations:

* ``window >= 2*width`` is undefined behaviour in the reference (its
  ``dr3`` sweep, ``sauvola.pyx:158-175``, walks ``index`` past the row and
  the phase-count formula can reach zero or negative counts).  We define
  the clamped-window semantics for that regime instead.
* The reference accumulates per-column integrals in int32
  (``sauvola.pyx:64-65``); overflow would need window heights > ~33000 rows
  at 255 intensity.  We accumulate in int64 (no wraparound).
"""

from __future__ import annotations

import numpy as np

__all__ = ["sauvola_mask", "threshold_image", "sauvola_mask_slow"]


def _window_geometry(window_width: int, window_height: int):
    l = (window_width + 1) // 2
    r = window_width // 2
    o = (window_height + 1) // 2
    u = window_height // 2
    return l, r, o, u


from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=64)
def _geometry_cached(h: int, w: int, window_width: int, window_height: int):
    """Only the O(h)+O(w) index vectors are cached — a cached (h, w)
    count matrix would pin megabytes per shape per worker."""
    l, r, o, u = _window_geometry(window_width, window_height)
    ys = np.arange(h)
    xs = np.arange(w)
    r0 = np.maximum(ys - o + 1, 0)          # first row in window
    r1 = np.minimum(ys + u, h - 1)          # last row in window
    c0 = np.maximum(xs - l + 1, 0)          # first col
    c1 = np.minimum(xs + r, w - 1)          # last col
    for a in (r0, r1, c0, c1):
        a.setflags(write=False)
    return r0, r1, c0, c1


def sauvola_mask(img: np.ndarray, window_width: int, window_height: int,
                 k: float, R: float) -> np.ndarray:
    """Vectorized Sauvola. Returns bool array, True where "ink" (the
    reference's raw output is 0 there; ``threshold_image`` inverts it —
    ``mrc.py:85``)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if h == 0 or w == 0:
        return np.zeros((h, w), dtype=bool)

    from . import native as _ckern

    res = _ckern.sauvola_native(img, window_width, window_height, k, R)
    if res is not None:                      # bit-identical C kernel
        return res

    from .optimise import _integral_dtype, _windowed_sum_2d

    # Page shapes repeat heavily across a corpus — memoize the clamped
    # window index vectors per (h, w, window).
    r0, r1, c0, c1 = _geometry_cached(h, w, window_width, window_height)
    count = (r1 - r0 + 1)[:, None] * (c1 - c0 + 1)[None, :]

    # Clamped-window sums via padded integral images.  Integer sums are
    # value-exact in any non-overflowing dtype; pick the narrowest (the
    # kernel is memory-bandwidth-bound).
    px16 = img.astype(np.uint16)
    sum_ = _windowed_sum_2d(img, r0, r1, c0, c1,
                            _integral_dtype(h, w, 255))
    sq = _windowed_sum_2d(px16 * px16, r0, r1, c0, c1,
                          _integral_dtype(h, w, 255 * 255))

    # C-truncated integer division (non-negative => floor).  The float
    # expressions below match the reference's operand order exactly
    # (IEEE ops are deterministic); in-place variants only reuse buffers.
    mean_i = sum_ // count
    var_i = sq // count
    var_i -= mean_i * mean_i                # integer variance

    mean = mean_i.astype(np.float64)
    variance = var_i.astype(np.float64)
    k2 = k * k / R / R
    tmp = mean * (k - 1.0)
    tmp += img                              # px + mean*(k-1)
    rhs = mean * mean
    rhs *= k2
    rhs *= variance
    t2 = tmp * tmp
    if k >= 0:
        ink = (tmp <= 0) | (t2 <= rhs)
    else:
        ink = (tmp <= 0) & (t2 >= rhs)
    return ink


def sauvola_mask_slow(img: np.ndarray, window_width: int, window_height: int,
                      k: float, R: float) -> np.ndarray:
    """Slow per-pixel oracle: the direct windowed mean/variance formula with
    identical integer-division semantics. Test-only."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    l, r, o, u = _window_geometry(window_width, window_height)
    out = np.zeros((h, w), dtype=bool)
    k2 = k * k / R / R
    for y in range(h):
        rr0 = max(y - o + 1, 0)
        rr1 = min(y + u, h - 1)
        for x in range(w):
            cc0 = max(x - l + 1, 0)
            cc1 = min(x + r, w - 1)
            win = img[rr0:rr1 + 1, cc0:cc1 + 1].astype(np.int64)
            count = win.size
            s = int(win.sum())
            q = int((win * win).sum())
            mean = float(s // count)
            variance = float(q // count) - mean * mean
            px = float(img[y, x])
            tmp = px + mean * (k - 1.0)
            if k >= 0:
                ink = (tmp <= 0) or (tmp * tmp <= mean * mean * k2 * variance)
            else:
                ink = (tmp <= 0) and (tmp * tmp >= mean * mean * k2 * variance)
            out[y, x] = ink
    return out


def threshold_image(img: np.ndarray, dpi: int | None, k: float = 0.34) -> np.ndarray:
    """Sauvola wrapper, semantics of ``mrc.py:58-87``: window = int(dpi/4)
    forced odd (51 when dpi is None), R=128; returns bool mask, True on ink."""
    window_size = 51
    if dpi is not None:
        window_size = int(dpi / 4)
        if window_size % 2 == 0:
            window_size += 1
    return sauvola_mask(img, window_size, window_size, k, 128.0)

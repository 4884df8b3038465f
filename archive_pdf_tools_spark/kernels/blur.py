"""Masked partial blurs (C8) and image-mode normalization (C22).

* ``partial_blur`` / ``partial_boxblur`` re-derive ``mrc.py:111-150,
  153-185``: blur ``img*mask`` and ``mask`` separately, divide with the
  +1e-5 epsilon, then restore the mask pixels from the original.  In the
  production pipeline these are superseded by the optimise kernels
  (``mrc.py:409-449``) — only the debug tools use them — but they are part
  of the reference's public surface.  ``uniform_filter`` follows the
  scipy.ndimage semantics (reflect boundary, float accumulation, origin
  at the window centre with the left-biased offset scipy uses for even
  sizes).
* ``normalize_mode``: RGBA->RGB, LA->L, P(palette)->RGB, the mode folding
  of ``recode.py:351-355`` / ``mrc.py:401-404`` (alpha dropped, palette
  looked up).
"""

from __future__ import annotations

import numpy as np

from .noise import gaussian_filter

__all__ = ["uniform_filter", "partial_blur", "partial_boxblur",
           "normalize_mode"]


def uniform_filter(img: np.ndarray, size: int = 5) -> np.ndarray:
    """Separable box mean, reflect boundary, float64 accumulation cast
    back per axis (scipy.ndimage.uniform_filter semantics)."""
    a = np.asarray(img)
    dtype = a.dtype
    left = size // 2
    for axis in range(a.ndim):
        ap = np.pad(a.astype(np.float64),
                    [(left, size - 1 - left) if i == axis else (0, 0)
                     for i in range(a.ndim)], mode="reflect")
        ap = np.moveaxis(ap, axis, -1)
        c = np.zeros(ap.shape[:-1] + (ap.shape[-1] + 1,), dtype=np.float64)
        np.cumsum(ap, axis=-1, out=c[..., 1:])
        n = a.shape[axis]
        y = (c[..., size:size + n] - c[..., 0:n]) / size
        a = np.moveaxis(y, -1, axis).astype(dtype)
    return a


def _masked_blur(mask: np.ndarray, img: np.ndarray, blur_fn) -> np.ndarray:
    maskf = mask.astype(np.float32)
    if img.ndim == 3:
        out = np.copy(img)
        weights = blur_fn(maskf)
        for ch in range(img.shape[2]):
            chan = blur_fn(img[:, :, ch] * maskf)
            out[:, :, ch] = chan / (weights + 0.00001)
        out[mask.astype(bool)] = img[mask.astype(bool)]
        return out
    imgf = img.astype(np.float32)
    filt = blur_fn(imgf * maskf)
    weights = blur_fn(maskf)
    out = (filt / (weights + 0.00001)).astype(np.uint8)
    out[mask.astype(bool)] = img[mask.astype(bool)]
    return out


def partial_blur(mask: np.ndarray, img: np.ndarray, sigma: float = 5,
                 mode: str | None = None) -> np.ndarray:
    """Gaussian masked blur (``mrc.py:111-150``)."""
    del mode  # signature parity; channel handling derives from img.ndim
    return _masked_blur(mask, img, lambda a: gaussian_filter(a, sigma))


def partial_boxblur(mask: np.ndarray, img: np.ndarray, size: int = 5,
                    mode: str | None = None) -> np.ndarray:
    """Uniform masked blur (``mrc.py:153-185``)."""
    del mode
    return _masked_blur(mask, img, lambda a: uniform_filter(a, size))


def normalize_mode(img: np.ndarray, mode: str,
                   palette: np.ndarray | None = None):
    """Fold special modes to L/RGB (``recode.py:351-355``,
    ``mrc.py:401-404``): RGBA->RGB and LA->L drop alpha; P->RGB via the
    palette lookup.  Returns (array, new_mode)."""
    if mode == "RGBA":
        return np.ascontiguousarray(img[:, :, :3]), "RGB"
    if mode == "LA":
        return np.ascontiguousarray(img[:, :, 0]), "L"
    if mode == "P":
        if palette is None:
            raise ValueError("P mode needs a palette")
        return palette[img], "RGB"
    return img, mode

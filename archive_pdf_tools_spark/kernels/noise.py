"""Noise estimation and Gaussian pre-blur.

The reference calls ``skimage.restoration.estimate_sigma`` (wavelet MAD
estimator) and ``scipy.ndimage.gaussian_filter`` (``mrc.py:52-55, 273-329``).
Neither library ships on the target cluster (or this sandbox), so both are
re-derived here from their published algorithms:

* ``estimate_sigma``: the Donoho–Johnstone robust noise estimate
  sigma = median(|d|) / Phi^-1(0.75) over the diagonal ('dd') detail
  coefficients of a single-level 2-D Daubechies-2 DWT with symmetric
  signal extension, exactly-zero coefficients excluded.  This is the
  documented skimage algorithm; bit-parity with skimage is unverifiable
  in-sandbox, so THIS implementation is the project's spec (deviation
  documented — see FIXTURES.md §7).  Used by ``estimate_noise``
  (``mrc.py:273-296``: centre half-crop sampling) and the hOCR-mask sigma
  comparisons (``mrc.py:250-266``).
* ``gaussian_filter``: separable 0th-order Gaussian, kernel radius
  ``int(4.0*sigma + 0.5)``, weights ``exp(-x^2/(2 sigma^2))`` normalized,
  'reflect' boundary, float64 accumulation cast back to the input dtype per
  axis — the scipy.ndimage formulation.
"""

from __future__ import annotations

import numpy as np

__all__ = ["estimate_sigma", "mean_estimate_sigma", "estimate_noise",
           "gaussian_filter"]

# Daubechies-2 decomposition filters (public constants).
_DB2_LO = np.array([-0.12940952255092145, 0.22414386804185735,
                    0.836516303737469, 0.48296291314469025], dtype=np.float64)
_DB2_HI = np.array([-0.48296291314469025, 0.836516303737469,
                    -0.22414386804185735, -0.12940952255092145], dtype=np.float64)

# Phi^-1(0.75), the Gaussian MAD scale factor.
_MAD_DENOM = 0.6744897501960817


def _sym_pad_1d(a: np.ndarray, pad: int, axis: int) -> np.ndarray:
    return np.pad(a, [(pad, pad) if i == axis else (0, 0)
                      for i in range(a.ndim)], mode="symmetric")


def _dwt_axis(a: np.ndarray, filt: np.ndarray, axis: int) -> np.ndarray:
    """Single-level DWT along one axis: symmetric-pad by len(filt)-1,
    correlate, downsample by 2 starting at index 1."""
    L = len(filt)
    ap = _sym_pad_1d(np.asarray(a, dtype=np.float64), L - 1, axis)
    ap = np.moveaxis(ap, axis, -1)
    out_len = (a.shape[axis] + L - 1) // 2
    # correlation: y[m] = sum_k filt[k] * ap[..., m+k], sampled at
    # m=1,3,5,...  The sample index 1 + 2*(out_len-1) + kk never exceeds
    # n-1 (2*out_len <= shape+L-1 and n = shape+2(L-1)), so each tap is
    # a plain strided slice — same values, same accumulation order as
    # the old clamped-gather form, ~3x less time per call.
    y = np.zeros(ap.shape[:-1] + (out_len,), dtype=np.float64)
    for kk in range(L):
        y += filt[kk] * ap[..., 1 + kk:1 + kk + 2 * out_len:2]
    return np.moveaxis(y, -1, axis)


def estimate_sigma(img: np.ndarray) -> float:
    """Wavelet-MAD noise sigma of a 2-D array (see module docstring)."""
    from . import native as _ckern

    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        return 0.0
    dd = _ckern.dwt2_hh_native(a, _DB2_HI)
    if dd is None:
        hi_rows = _dwt_axis(a, _DB2_HI, 0)
        dd = _dwt_axis(hi_rows, _DB2_HI, 1)
    coeffs = np.abs(dd[dd != 0])
    if coeffs.size == 0:
        return 0.0
    return float(np.median(coeffs) / _MAD_DENOM)


def mean_estimate_sigma(arr: np.ndarray) -> float:
    """``mrc.py:52-55`` — mean of per-channel sigmas; 2-D input is just the
    scalar estimate."""
    return estimate_sigma(arr)


def estimate_noise(imgf: np.ndarray) -> float:
    """Centre half-crop sigma estimate, semantics of ``mrc.py:273-296``."""
    h, w = imgf.shape
    MUL = 4
    hs = int(h / 2 - h / MUL)
    he = int(h / 2 + h / MUL)
    ws = int(w / 2 - w / MUL)
    we = int(w / 2 + w / MUL)
    if he == 0 or we == 0:
        hs, he, ws, we = 0, h, 0, w
    return mean_estimate_sigma(imgf[hs:he, ws:we])


def _gauss_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return phi / phi.sum()


def gaussian_filter(img: np.ndarray, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """Separable Gaussian blur, 'reflect' boundary, per-axis cast back to
    the input dtype (scipy.ndimage semantics; used at ``mrc.py:311``)."""
    a = np.asarray(img)
    dtype = a.dtype
    kern = _gauss_kernel(sigma, truncate)
    radius = (len(kern) - 1) // 2
    if radius > 0 and a.ndim == 2:
        from . import native as _ckern

        res = _ckern.gauss2d_native(a, kern)
        if res is not None:              # bit-identical C kernel
            return res
    for axis in range(a.ndim):
        if radius == 0:
            continue
        ap = np.pad(a.astype(np.float64),
                    [(radius, radius) if i == axis else (0, 0)
                     for i in range(a.ndim)], mode="reflect")
        ap = np.moveaxis(ap, axis, -1)
        n = a.shape[axis]
        y = np.zeros(ap.shape[:-1] + (n,), dtype=np.float64)
        for kk in range(len(kern)):
            y += kern[kk] * ap[..., kk:kk + n]
        a = np.moveaxis(y, -1, axis).astype(dtype)
    return a

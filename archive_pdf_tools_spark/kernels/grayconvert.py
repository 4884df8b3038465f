"""Grayscale conversion kernels.

* ``rgb_to_gray``: the standard ITU-R 601-2 integer luma transform used by
  the reference's ``image.convert('L')`` (``mrc.py:361``):
  ``L = (19595*R + 38470*G + 7471*B + 32768) >> 16``.
* ``special_gray_convert``: value-exact re-derivation of
  ``internetarchivepdf/grayconvert.py:24-66`` (channel stats → brightness
  adjust → per-channel level stretch → HSV → L = V*(1 - S/2)), with the
  skimage ``rgb2hsv`` S/V math inlined in NumPy (input scaled to [0,1]).
"""

from __future__ import annotations

import numpy as np

__all__ = ["rgb_to_gray", "special_gray_convert", "level_arr"]


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) uint8, ITU-R 601-2 with PIL's fixed-point
    rounding."""
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((19595 * r + 38470 * g + 7471 * b + 32768) >> 16).astype(np.uint8)


def _perc2val(x: float) -> float:
    # grayconvert.py:22
    return (x * 255) / 100


def level_arr(arr: np.ndarray, minv: float = 0, maxv: float = 255) -> np.ndarray:
    """Linear level stretch with clamping — ``grayconvert.py:24-31``.
    Operates like the reference: float math assigned back into the uint8
    array (C-cast truncation), then clamp pixels outside [minv, maxv]."""
    interval = (maxv / 255.0) - (minv / 255.0)
    arr_zero = arr < minv
    arr_max = arr > maxv
    stretched = (arr.astype(np.float64) - minv) / interval
    out = stretched.astype(arr.dtype)  # same uint8 wrap/trunc as the in-place ref
    out[arr_zero] = 0
    out[arr_max] = 255
    return out


def special_gray_convert(imd: np.ndarray) -> np.ndarray:
    """Value-exact port of ``grayconvert.py:38-66`` (see module docstring)."""
    d = {}
    for i, kchan in enumerate(("r", "g", "b")):
        chan = imd[:, :, i]
        d[kchan + "_min"] = float(np.min(chan)) / 255.0
        d[kchan + "_max"] = float(np.max(chan)) / 255.0
        d[kchan + "_mean"] = float(np.mean(chan)) / 255.0
        d[kchan + "_std"] = float(np.std(chan)) / 255.0

    bright_adjust = round(
        d["r_mean"] * d["g_mean"] * d["b_mean"]
        / (d["b_max"] * (1 - d["r_std"]) * (1 - d["g_std"]) * (1 - d["b_std"])),
        4,
    )

    low_thres = min(int((196 * d["r_min"] + 14.5) / 1), 50)
    high_thres = {
        "r": min(int((35.66 * bright_adjust + 48.5) / 1), 95),
        "g": min(int((39.22 * bright_adjust + 44.5) / 1), 95),
        "b": min(int((45.16 * bright_adjust + 36.5) / 1), 95),
    }

    new_imd = np.copy(imd)
    for i, c in enumerate(("r", "g", "b")):
        new_imd[:, :, i] = level_arr(new_imd[:, :, i],
                                     minv=_perc2val(low_thres),
                                     maxv=_perc2val(high_thres[c]))

    # skimage rgb2hsv S and V on [0,1]-scaled input.
    rgbf = new_imd.astype(np.float64) / 255.0
    v = rgbf.max(axis=2)
    delta = v - rgbf.min(axis=2)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(v == 0, 0.0, delta / v)
    # L = V * (1 - S/2)  (grayconvert.py:65 — hsv[...,2]=V, hsv[...,1]=S)
    l = v * (1 - s / 2)
    return np.array(l * 255, dtype=np.uint8)

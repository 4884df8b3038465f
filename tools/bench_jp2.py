"""JPEG2000 codec micro-benchmark — fixed content, best-of-N.

Usage:  python tools/bench_jp2.py [N]   (default N=3)

Measures single-core encode/decode Mpx/s of `kernels/jp2codec.py` on
two fixed images (seeded, identical every round so cross-round ratios
are meaningful — the r5 numbers in BENCH/jp2_decode_r5.md were from an
unrecorded ad-hoc script; from r6 on THIS file is the methodology):

* smooth page-like gray 512x384, 3 levels (scan-like content)
* uniform-random gray 256x256 (worst case, dense planes)

To compare against an older commit in the SAME window (the host is
burstable — cross-window numbers are meaningless), check the old tree
out to a temp dir and pass it as SPARK_GRAFT_JP2_OLD:

    git worktree add /tmp/r5tree <commit>
    SPARK_GRAFT_JP2_OLD=/tmp/r5tree python tools/bench_jp2.py
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import time

import numpy as np


def _content():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:384, 0:512]
    smooth = np.clip(200 - 50 * np.sin(xx / 9.0) - 35 * np.cos(yy / 6.0)
                     + rng.integers(-10, 11, (384, 512)),
                     0, 255).astype(np.uint8)
    rnd = rng.integers(0, 256, (256, 256)).astype(np.uint8)
    return [("smooth_512x384", smooth), ("random_256x256", rnd)]


def _bench_module(mod, n, enc_kwargs):
    out = {}
    for name, img in _content():
        px = img.shape[0] * img.shape[1]
        te = td = 1e18
        data = None
        for _ in range(n):
            t0 = time.perf_counter()
            data = mod.encode_jp2(img, levels=3, **enc_kwargs)
            te = min(te, time.perf_counter() - t0)
        for _ in range(n):
            t0 = time.perf_counter()
            dec = mod.decode_jp2(data)
            td = min(td, time.perf_counter() - t0)
        assert np.array_equal(dec, img), name   # lossless contract
        out[name] = {"encode_mpx_s": round(px / te / 1e6, 4),
                     "decode_mpx_s": round(px / td / 1e6, 4),
                     "bits_px": round(len(data) * 8 / px, 2)}
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import archive_pdf_tools_spark.kernels.jp2codec as cur
    res = {"new_bypass": _bench_module(cur, n, {}),
           "new_nobypass": _bench_module(cur, n, {"bypass": False})}
    old_dir = os.environ.get("SPARK_GRAFT_JP2_OLD")
    if old_dir:
        sys.path.insert(0, old_dir)
        for k in [k for k in sys.modules if "archive_pdf_tools_spark" in k]:
            del sys.modules[k]
        old = importlib.import_module(
            "archive_pdf_tools_spark.kernels.jp2codec")
        assert old.__file__.startswith(old_dir), old.__file__
        res["old"] = _bench_module(old, n, {})
        sys.path.pop(0)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

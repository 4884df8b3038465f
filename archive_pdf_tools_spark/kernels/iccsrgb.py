"""Minimal sRGB ICC profile, DERIVED from published colorimetry.

The reference ships a binary ICC blob (``data/tmp.icc``, wired by
``pdfhacks.py:181-209 write_pdfa``) as the PDF/A OutputIntent's
``/DestOutputProfile``.  This module constructs an equivalent profile
from first principles instead of embedding bytes:

* sRGB primaries and white point are the published IEC 61966-2-1 /
  ITU-R BT.709 chromaticities (R 0.64,0.33; G 0.30,0.60; B 0.15,0.06;
  D65 white 0.3127,0.3290);
* the RGB->XYZ matrix is solved from those chromaticities (each
  primary's XYZ column scaled so the matrix maps (1,1,1) to the white
  point) — the standard derivation, not a copied matrix;
* the D65->D50 chromatic adaptation uses the published Bradford cone
  matrix (Lam 1985, the transform named by the ICC spec);
* the tone curve is tabulated from the published sRGB EOTF
  (linear segment below 0.04045, else ((C+0.055)/1.055)^2.4).

The container is ICC.1 (v2) 'mntr' RGB with the required tag set
(desc, wtpt, cprt, rXYZ/gXYZ/bXYZ, rTRC/gTRC/bTRC) — the matrix/TRC
display-profile shape every PDF/A validator accepts for an sRGB
OutputIntent.  All multi-byte fields are big-endian; XYZ numbers are
s15Fixed16.  The profile is byte-deterministic (fixed header datetime),
so PDFs that embed it stay pin-stable.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["srgb_icc_profile"]

# Published chromaticities (IEC 61966-2-1 §4 / ITU-R BT.709).
_PRIMARIES = {"R": (0.64, 0.33), "G": (0.30, 0.60), "B": (0.15, 0.06)}
_D65 = (0.3127, 0.3290)
_D50 = (0.34567, 0.35850)        # CIE illuminant D50 chromaticity

# Bradford cone-response matrix (Lam 1985; named by ICC.1 as the
# recommended chromatic adaptation transform).
_BRADFORD = np.array([[0.8951, 0.2664, -0.1614],
                      [-0.7502, 1.7135, 0.0367],
                      [0.0389, -0.0685, 1.0296]])


def _xy_to_xyz(xy) -> np.ndarray:
    x, y = xy
    return np.array([x / y, 1.0, (1.0 - x - y) / y])


def _rgb_to_xyz_d50() -> np.ndarray:
    """Solve the sRGB->XYZ(D65) matrix from the chromaticities, then
    Bradford-adapt each primary to D50 (the ICC PCS illuminant)."""
    cols = np.stack([_xy_to_xyz(_PRIMARIES[c]) for c in "RGB"], axis=1)
    white_d65 = _xy_to_xyz(_D65)
    scale = np.linalg.solve(cols, white_d65)     # M @ (1,1,1) = white
    m_d65 = cols * scale

    # Bradford: cone responses of both whites; diagonal gain; back.
    cone_src = _BRADFORD @ white_d65
    cone_dst = _BRADFORD @ _xy_to_xyz(_D50)
    adapt = np.linalg.inv(_BRADFORD) @ np.diag(cone_dst / cone_src) \
        @ _BRADFORD
    return adapt @ m_d65


def _s15f16(v: float) -> bytes:
    return struct.pack(">i", int(round(v * 65536.0)))


def _xyz_tag(xyz) -> bytes:
    return b"XYZ \x00\x00\x00\x00" + b"".join(_s15f16(v) for v in xyz)


def _curv_tag(n: int = 1024) -> bytes:
    """sRGB EOTF tabulated as a curveType: n uint16 samples of the
    published formula over [0, 1]."""
    c = np.linspace(0.0, 1.0, n)
    lin = np.where(c <= 0.04045, c / 12.92,
                   ((c + 0.055) / 1.055) ** 2.4)
    samples = np.clip(np.round(lin * 65535.0), 0, 65535).astype(">u2")
    return (b"curv\x00\x00\x00\x00" + struct.pack(">I", n)
            + samples.tobytes())


def _desc_tag(text: str) -> bytes:
    """textDescriptionType: ASCII description + empty unicode/script
    blocks (the v2 layout)."""
    ascii_bytes = text.encode("ascii") + b"\x00"
    return (b"desc\x00\x00\x00\x00" + struct.pack(">I", len(ascii_bytes))
            + ascii_bytes
            + b"\x00\x00\x00\x00"      # unicode language code
            + b"\x00\x00\x00\x00"      # unicode count
            + b"\x00\x00"              # scriptcode
            + b"\x00"                  # macintosh desc length
            + b"\x00" * 67)            # macintosh desc block


def _text_tag(text: str) -> bytes:
    return b"text\x00\x00\x00\x00" + text.encode("ascii") + b"\x00"


def srgb_icc_profile() -> bytes:
    """Build the deterministic sRGB v2 display profile (see module
    docstring).  ~2.2 KB; cached after first build."""
    global _CACHED
    if _CACHED is not None:
        return _CACHED

    m = _rgb_to_xyz_d50()
    wtpt = _xy_to_xyz(_D50)
    trc = _curv_tag()
    tags = [
        (b"desc", _desc_tag("sRGB IEC61966-2.1 (derived)")),
        (b"wtpt", _xyz_tag(wtpt)),
        (b"cprt", _text_tag("public-domain sRGB derivation")),
        (b"rXYZ", _xyz_tag(m[:, 0])),
        (b"gXYZ", _xyz_tag(m[:, 1])),
        (b"bXYZ", _xyz_tag(m[:, 2])),
        (b"rTRC", trc),
        (b"gTRC", trc),
        (b"bTRC", trc),
    ]
    # Shared tag data (the three TRCs) may point at one block: ICC
    # explicitly allows offset reuse; we keep it simple and dedupe.
    header_size = 128
    table_size = 4 + 12 * len(tags)
    blocks: list[bytes] = []
    offsets: dict[bytes, int] = {}
    pos = header_size + table_size
    entries = []
    for sig, data in tags:
        key = data
        if key in offsets:
            entries.append((sig, offsets[key], len(data)))
            continue
        pad = (4 - pos % 4) % 4
        if pad:
            blocks.append(b"\x00" * pad)
            pos += pad
        offsets[key] = pos
        entries.append((sig, pos, len(data)))
        blocks.append(data)
        pos += len(data)
    body = b"".join(blocks)
    size = header_size + table_size + len(body)

    hdr = bytearray(128)
    struct.pack_into(">I", hdr, 0, size)
    hdr[4:8] = b"none"                       # CMM: none preferred
    struct.pack_into(">I", hdr, 8, 0x02100000)   # version 2.1.0
    hdr[12:16] = b"mntr"
    hdr[16:20] = b"RGB "
    hdr[20:24] = b"XYZ "
    # deterministic creation datetime (2020-01-01 00:00:00)
    struct.pack_into(">6H", hdr, 24, 2020, 1, 1, 0, 0, 0)
    hdr[36:40] = b"acsp"
    # platform/flags/manufacturer/model/attributes stay zero
    struct.pack_into(">I", hdr, 64, 0)       # intent: perceptual
    # PCS illuminant: D50, from the published chromaticity
    hdr[68:80] = b"".join(_s15f16(v) for v in _xy_to_xyz(_D50))
    # creator zero; remaining bytes reserved-zero

    table = struct.pack(">I", len(entries)) + b"".join(
        sig + struct.pack(">II", off, ln) for sig, off, ln in entries)
    _CACHED = bytes(hdr) + table + body
    return _CACHED


_CACHED: bytes | None = None

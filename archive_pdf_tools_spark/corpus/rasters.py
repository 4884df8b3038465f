"""Media raster regeneration from ``media_ref`` strings.

Media spans carry no binary payload (FIXTURES.md §3): the ref string
``img://{doc_id}/{offset}/{gen_id}`` *is* the content — a stable hash of
it seeds a generator that reproduces the page spec (dimensions, paper
tone, text-line layout with known texts, photo regions, noise) and the
raster itself.  Both the corpus generator (to embed ground truth) and the
extraction kernel (to regenerate pixels on the executor) call the same
functions, so there is a single source of truth and nothing large ever
sits in the table or the shuffle.

Size classes mirror FIXTURES.md §3: 64x48 … 512x384 unit-scale pages,
rare tiny (24x16) pages smaller than the Sauvola window, rare 1-bit
pages (the reference's passthrough branch, ``recode.py:376-396``), gray
and RGB modes, noise sigma in {0, 2, 8}.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["page_spec", "render_raster", "make_media_ref", "ref_seed"]

_WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs",
    "archive", "page", "scan", "text", "mask", "layer", "press",
    "volume", "chapter", "index", "folio", "plate", "figure",
]

_SIZES = [(64, 48), (96, 64), (128, 96), (192, 128), (256, 192), (320, 240)]
_BIG_SIZES = [(512, 384), (640, 480)]


def ref_seed(media_ref: str) -> int:
    """Stable 64-bit seed from the ref string (sha256 prefix)."""
    return int.from_bytes(hashlib.sha256(media_ref.encode()).digest()[:8], "big")


def make_media_ref(doc_id: str, offset: int, gen_id: int) -> str:
    return f"img://{doc_id}/{offset}/{gen_id}"


def page_spec(media_ref: str) -> dict:
    """Deterministic page spec derived only from the ref string."""
    rng = np.random.default_rng(ref_seed(media_ref))
    u = rng.random()
    if u < 0.05:
        w, h = 24, 16                      # tiny: smaller than Sauvola window
    elif u < 0.15:
        w, h = _BIG_SIZES[int(rng.integers(len(_BIG_SIZES)))]
    else:
        w, h = _SIZES[int(rng.integers(len(_SIZES)))]

    mode = "RGB" if rng.random() < 0.3 else "L"
    bitonal = rng.random() < 0.05          # recode.py:376-396 passthrough
    noise_sigma = float(rng.choice([0.0, 2.0, 8.0], p=[0.5, 0.3, 0.2]))
    paper = int(rng.integers(225, 245))
    dpi = int(rng.choice([None, 150, 300], p=[0.3, 0.35, 0.35]) or 0) or None

    # Text lines: known bboxes + texts (ground truth for span output).
    lines = []
    if not bitonal and h >= 32:
        n_lines = int(rng.integers(0, 5))
        line_h = max(6, h // 10)
        y = int(rng.integers(2, max(3, h // 8)))
        for li in range(n_lines):
            if y + line_h >= h - 2:
                break
            n_words = int(rng.integers(1, 5))
            x = int(rng.integers(2, max(3, w // 8)))
            words = []
            for wi in range(n_words):
                text = _WORDS[int(rng.integers(len(_WORDS)))]
                ww = max(4, int(len(text) * line_h * 0.45))
                if x + ww >= w - 2:
                    break
                conf = float(np.round(rng.uniform(55, 99), 1))
                if rng.random() < 0.08:
                    conf = float(np.round(rng.uniform(0, 19), 1))
                words.append({
                    "text": text,
                    "bbox": [x, y, x + ww, y + line_h],
                    "confidence": conf,
                    "fontsize": float(np.round(line_h * 0.8, 2)),
                    "writing_direction": 0,
                })
                x += ww + max(2, line_h // 3)
            if words:
                x0 = min(wd["bbox"][0] for wd in words)
                x1 = max(wd["bbox"][2] for wd in words)
                lines.append({
                    "bbox": [x0, y, x1, y + line_h],
                    "baseline": [float(np.round(rng.uniform(-0.02, 0.02), 4)), 0.0],
                    "words": words,
                })
            y += line_h + max(2, line_h // 2)

    # Photo regions: smooth gradients (must classify as media, not text).
    photos = []
    n_photos = int(rng.integers(0, 3)) if not bitonal else 0
    for _ in range(n_photos):
        pw = int(rng.integers(w // 4, max(w // 4 + 1, w // 2)))
        ph = int(rng.integers(h // 4, max(h // 4 + 1, h // 2)))
        px = int(rng.integers(0, max(1, w - pw)))
        py = int(rng.integers(0, max(1, h - ph)))
        photos.append({
            "bbox": [px, py, px + pw, py + ph],
            "kind": str(rng.choice(["gradient", "halftone"])),
            "base": int(rng.integers(60, 180)),
        })

    return {
        "media_ref": media_ref,
        "w": w, "h": h, "mode": mode, "bitonal": bitonal,
        "noise_sigma": noise_sigma, "paper": paper, "dpi": dpi,
        "lines": lines, "photos": photos,
    }


def render_raster(spec: dict) -> np.ndarray:
    """uint8 (h, w) gray or (h, w, 3) RGB page raster for a spec."""
    rng = np.random.default_rng(ref_seed(spec["media_ref"]) ^ 0x5EED)
    w, h = spec["w"], spec["h"]
    page = np.full((h, w), spec["paper"], dtype=np.float64)

    for photo in spec["photos"]:
        l, t, r, b = photo["bbox"]
        ph, pw = b - t, r - l
        yy, xx = np.mgrid[0:ph, 0:pw]
        if photo["kind"] == "gradient":
            region = photo["base"] + 60.0 * xx / max(pw - 1, 1) \
                + 30.0 * yy / max(ph - 1, 1)
        else:  # halftone: low-frequency checker
            region = photo["base"] + 40.0 * np.sin(xx / 3.0) * np.sin(yy / 3.0)
        page[t:b, l:r] = region

    for line in spec["lines"]:
        for word in line["words"]:
            l, t, r, b = word["bbox"]
            ink = rng.integers(5, 60)
            page[t:b, l:r] = ink

    if spec["noise_sigma"] > 0:
        page = page + rng.normal(0.0, spec["noise_sigma"], page.shape)

    page = np.clip(np.round(page), 0, 255).astype(np.uint8)

    if spec["bitonal"]:
        page = np.where(page > 128, 255, 0).astype(np.uint8)

    if spec["mode"] == "RGB":
        tint = rng.integers(-12, 13, size=3)
        rgb = np.clip(page[:, :, None].astype(np.int64) + tint[None, None, :],
                      0, 255).astype(np.uint8)
        return rgb
    return page


def spec_word_data(spec: dict) -> list:
    """The hOCR-like word data the extraction kernel feeds to the mask
    builder — one paragraph holding all known lines (ground truth)."""
    if not spec["lines"]:
        return []
    return [{"lines": spec["lines"]}]

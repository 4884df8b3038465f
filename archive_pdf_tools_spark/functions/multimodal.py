"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codec libraries, so the *decode* step is
stubbed (``CODECS_AVAILABLE`` gate / deterministic fake) while the Spark
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition-size control — is real and tested.  On a real cluster you swap
``_fake_decode`` for the codec call; nothing else changes.

``media_features``: (media_ref) -> decode -> per-image features
(w, h, mode, mean/std intensity, edge density via the Sauvola ink ratio).
The raster never leaves the executor: features only.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from ..corpus.rasters import page_spec, render_raster
from ..kernels.grayconvert import rgb_to_gray
from ..kernels.sauvola import threshold_image

__all__ = ["CODECS_AVAILABLE", "decode_image", "media_features",
           "FEATURES_SCHEMA_DDL"]

# Real codecs (PIL/ffmpeg/...) are not shipped in this environment.
CODECS_AVAILABLE = False

FEATURES_SCHEMA_DDL = ("media_ref string, width int, height int, "
                       "mode string, bitonal boolean, mean_intensity double, "
                       "std_intensity double, ink_ratio double")


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an encoded image payload.  Gated: raises until codecs are
    available; the pipeline path uses the deterministic synthetic decode
    (``corpus.rasters``) instead."""
    if not CODECS_AVAILABLE:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "media_ref-seeded synthetic decode is used instead")
    raise AssertionError("unreachable")


def _features_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        recs = []
        for ref in pdf["media_ref"].values:
            spec = page_spec(ref)
            raster = render_raster(spec)
            gray = rgb_to_gray(raster) if raster.ndim == 3 else raster
            ink = threshold_image(gray, spec["dpi"])
            recs.append((ref, spec["w"], spec["h"], spec["mode"],
                         bool(spec["bitonal"]),
                         round(float(gray.mean()), 4),
                         round(float(gray.std()), 4),
                         round(float(ink.mean()), 4)))
        yield pd.DataFrame(recs, columns=[
            "media_ref", "width", "height", "mode", "bitonal",
            "mean_intensity", "std_intensity", "ink_ratio"])


def media_features(documents_df):
    """documents (doc_id, spans) -> per-media-span feature rows."""
    from pyspark.sql import functions as F

    refs = (documents_df
            .select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "media")
            .select(F.col("s.media_ref").alias("media_ref")))
    return refs.mapInPandas(_features_batches, schema=FEATURES_SCHEMA_DDL)

"""Structured Streaming variant of the extraction pipeline."""

from .extract_stream import stream_extraction  # noqa: F401

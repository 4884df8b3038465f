"""Structured Streaming variants of the extraction + imagestack
pipelines."""

from .extract_stream import (stream_extraction,  # noqa: F401
                             stream_imagestack)

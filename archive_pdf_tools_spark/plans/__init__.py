"""End-to-end pipeline assembly."""

from .recode import run_extraction  # noqa: F401

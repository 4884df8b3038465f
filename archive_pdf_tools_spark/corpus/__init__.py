"""Deterministic synthetic corpus: the interleaved ``(doc_id, spans)``
input table (FIXTURES.md §1-§3) and on-demand media raster regeneration."""

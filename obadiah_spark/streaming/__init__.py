"""Structured Streaming variants (SURVEY §2.9).

- ``reorder`` — SRC5 watermark semantics: the reference's heap-buffer
  reorderer (python/obadiah/reorder.py:26-112) maps to event-time watermarks.
- ``ingest`` — incremental raw-events → level3 chaining (I1/I8 semantics as a
  per-batch transform + cross-batch tail state instead of row triggers),
  differential-tested against the batch synthesis.
"""

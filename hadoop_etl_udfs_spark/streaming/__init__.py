"""Streaming: incremental encode of arriving page files.

The reference is batch pull-only (SURVEY.md §2.7 — no watermarks, windows, or
state anywhere in its tree); a crawl pipeline at 10^12-doc scale ingests
continuously, so the engine adds an incremental path: Structured Streaming
file source -> foreachBatch(encode + append + lineage). Exactly-once comes
from the checkpointed source offsets plus content-addressed chunk ids (a
replayed micro-batch re-derives the same chunk ids and is skipped).
"""

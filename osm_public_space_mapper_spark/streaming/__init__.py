"""Streaming surface — intentionally empty in v0.

The reference is strictly one-shot batch (SURVEY.md §2.7: no watermarks,
windows, or stateful operators exist anywhere in it), and the north rule's
"resumable from checkpoint with per-partition lineage" maps to batch
incremental processing, implemented in tables/icelite.py:

  - per-partition lineage (row count + content hash) in snapshot manifests
  - `commit_resumable` anti-joins already-committed partitions → exact resume

A Structured Streaming ingest (readStream → cell-encode → Icelite append)
would layer cleanly on top of the same partition keys; it is deferred until a
streaming semantic actually exists to replicate.
"""

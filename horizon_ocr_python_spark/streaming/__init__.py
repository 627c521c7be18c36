"""Structured Streaming ingestion of the pages table.

The reference has no streaming (SURVEY §1.2) — this is the scale extension:
the same fused extraction stage bolted onto readStream, with watermarked
windowed aggregation for late data and a foreachBatch sink that reuses the
engine's snapshot-commit protocol (each micro-batch = one committed
snapshot, so a crashed stream resumes exactly like a crashed batch run).
"""

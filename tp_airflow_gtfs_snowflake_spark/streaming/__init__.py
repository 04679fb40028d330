"""Structured Streaming RT path: checkpointed file-source ingest
(subsumes A7 PURGE idempotence + A24 sensors), watermarked windowed
aggregations (B5 streaming flavor)."""

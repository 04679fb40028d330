"""Engine operators: incremental watermark loader, dedup family,
similarity search, latest-per-key/as-of, multimodal columns."""

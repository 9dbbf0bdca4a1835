"""Structured Streaming operators (windowed aggregation, watermarked dedup)."""

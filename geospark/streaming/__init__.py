"""Structured Streaming tier: watermarked ingest of late web captures."""

"""Structured Streaming surface (continuous ingest of fetched pages)."""

"""Structured Streaming adapters (incremental ingestion)."""

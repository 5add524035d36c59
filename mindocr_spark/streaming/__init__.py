"""Structured Streaming entry points for incremental extraction."""

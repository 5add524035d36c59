"""Deterministic corpus synthesis (spans + media parquet tables)."""
